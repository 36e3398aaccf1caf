"""DuckDB oracle SQL for the GTFS pipeline queries.

The driver runs each ``__spark_entry__.queries()`` entry AND the
matching SQL here side-by-side (sf0.01 parquet views pre-registered)
and compares row-count + schema + order-insensitive value hash. For the
GTFS operators the input is the synthesized sample feed, which we inline
as literal CTEs built from the very same fixture constants the Spark
side uses — one source of truth, two independent execution engines.
"""

from __future__ import annotations

from .fixtures import SAMPLE_FEED_CSV
from .schemas import GTFS_FILE_COLS

FEED_TZ = "Europe/Brussels"


def _values_cte(name: str, file_name: str) -> str:
    cols = GTFS_FILE_COLS[file_name]
    lines = [ln for ln in SAMPLE_FEED_CSV[file_name].split("\n") if ln.strip()]
    rows = []
    for ln in lines[1:]:
        vals = ln.split(",")
        vals += [""] * (len(cols) - len(vals))
        rows.append("(" + ", ".join("'" + v.replace("'", "''") + "'" for v in vals) + ")")
    collist = ", ".join(cols)
    return f"{name}({collist}) AS (VALUES\n  " + ",\n  ".join(rows) + "\n)"


def gtfs_base_ctes() -> str:
    return ",\n".join(
        [
            _values_cte("g_stop_times", "stop_times.txt"),
            _values_cte("g_trips", "trips.txt"),
            _values_cte("g_routes", "routes.txt"),
            _values_cte("g_stops", "stops.txt"),
            _values_cte("g_calendar", "calendar.txt"),
            _values_cte("g_calendar_dates", "calendar_dates.txt"),
        ]
    )


SERVICE_DAYS_CTE = """
g_added AS (
  SELECT service_id, date FROM g_calendar_dates WHERE exception_type = '1'
),
g_removed AS (
  SELECT service_id, date FROM g_calendar_dates WHERE exception_type = '2'
),
g_caldays AS (
  SELECT c.service_id, strftime(dd.d, '%Y%m%d') AS date
  FROM g_calendar c,
       LATERAL (
         SELECT CAST(unnest(generate_series(
           CAST(strptime(c.start_date, '%Y%m%d') AS DATE),
           CAST(strptime(c.end_date, '%Y%m%d') AS DATE),
           INTERVAL 1 DAY)) AS DATE) AS d
       ) dd
  WHERE list_extract(
          [c.sunday, c.monday, c.tuesday, c.wednesday, c.thursday, c.friday, c.saturday],
          dayofweek(dd.d) + 1) = '1'
),
g_service_days AS (
  SELECT service_id, date FROM g_added
  UNION
  SELECT cd.service_id, cd.date
  FROM g_caldays cd
  WHERE NOT EXISTS (
    SELECT 1 FROM g_removed r
    WHERE r.service_id = cd.service_id AND r.date = cd.date
  )
)
"""


def _dfm_seconds(col: str) -> str:
    return (
        f"(CAST(split_part({col}, ':', 1) AS BIGINT) * 3600"
        f" + CAST(split_part({col}, ':', 2) AS BIGINT) * 60"
        f" + CAST(COALESCE(NULLIF(split_part({col}, ':', 3), ''), '0') AS BIGINT))"
    )


RULES_CTE = """
g_paired AS (
  SELECT trip_id, arrival_time, departure_time, stop_id,
         CAST(stop_sequence AS INT) AS seq,
         pickup_type, drop_off_type,
         lag(stop_id) OVER w AS prev_stop_id,
         lag(departure_time) OVER w AS prev_departure_time,
         lag(pickup_type) OVER w AS prev_pickup_type,
         lag(stop_sequence) OVER w AS prev_stop_sequence,
         first_value(departure_time) OVER w AS trip_start_dfm
  FROM g_stop_times
  WINDOW w AS (PARTITION BY trip_id ORDER BY CAST(stop_sequence AS INT))
),
g_rules AS (
  SELECT p.*, t.service_id, t.route_id, t.trip_headsign,
         r.route_long_name,
         COALESCE(NULLIF(t.trip_headsign, ''), NULLIF(r.route_long_name, '')) AS headsign
  FROM g_paired p
  JOIN g_stops sd ON sd.stop_id = p.prev_stop_id
  JOIN g_stops sa ON sa.stop_id = p.stop_id
  JOIN g_trips t ON t.trip_id = p.trip_id
  JOIN g_routes r ON r.route_id = t.route_id
  WHERE p.prev_stop_id IS NOT NULL
    AND NOT (p.arrival_time = '' AND p.departure_time = '')
)
"""


def _epoch(date_col: str, dfm_col: str) -> str:
    return (
        f"(CAST(epoch(timezone('{FEED_TZ}', strptime({date_col}, '%Y%m%d'))) AS BIGINT)"
        f" + {_dfm_seconds(dfm_col)})"
    )


def _iso(epoch_expr: str) -> str:
    return f"strftime(make_timestamp({epoch_expr} * 1000000), '%Y-%m-%dT%H:%M:%S.%g') || 'Z'"


def _local_yyyymmdd(epoch_expr: str) -> str:
    return f"strftime(timezone('{FEED_TZ}', to_timestamp({epoch_expr})), '%Y%m%d')"


CONNECTIONS_CTE = f"""
g_connections AS (
  SELECT
    ru.trip_id, ru.prev_stop_id AS dep_stop_id, ru.stop_id AS arr_stop_id,
    ru.prev_pickup_type AS pickup_type, ru.drop_off_type, ru.headsign,
    sd.date AS service_date,
    {_epoch("sd.date", "ru.prev_departure_time")} AS dep_epoch,
    {_epoch("sd.date", "ru.arrival_time")} AS arr_epoch,
    {_epoch("sd.date", "ru.trip_start_dfm")} AS start_epoch
  FROM g_rules ru
  JOIN g_service_days sd ON sd.service_id = ru.service_id
)
"""


def gtfs_prelude() -> str:
    return (
        "WITH "
        + gtfs_base_ctes()
        + ","
        + SERVICE_DAYS_CTE.strip().rstrip()
        + ","
        + RULES_CTE.strip()
        + ","
        + CONNECTIONS_CTE.strip()
    )


def sql_service_expansion() -> str:
    return (
        "WITH "
        + gtfs_base_ctes()
        + ","
        + SERVICE_DAYS_CTE.strip()
        + "\nSELECT service_id, date AS service_date FROM g_service_days"
    )


def sql_rules() -> str:
    return (
        "WITH "
        + gtfs_base_ctes()
        + ","
        + SERVICE_DAYS_CTE.strip()
        + ","
        + RULES_CTE.strip()
        + """
SELECT trip_id,
       prev_stop_id AS dep_stop_id,
       stop_id AS arr_stop_id,
       prev_departure_time AS departure_dfm,
       arrival_time AS arrival_dfm,
       trip_start_dfm,
       CAST(prev_stop_sequence AS VARCHAR) AS stop_sequence,
       COALESCE(prev_pickup_type, '') AS pickup_type,
       COALESCE(drop_off_type, '') AS drop_off_type,
       headsign
FROM g_rules"""
    )


_BOARDING_LIST = "['gtfs:Regular', 'gtfs:NotAvailable', 'gtfs:MustPhone', 'gtfs:MustCoordinateWithDriver']"


def sql_connections() -> str:
    start_date = _local_yyyymmdd("start_epoch")
    return (
        gtfs_prelude()
        + f"""
SELECT
  'http://example.org/connections/' || {start_date} || '/' || dep_stop_id || '/' || trip_id AS id,
  'http://example.org/stops/' || dep_stop_id AS departureStop,
  'http://example.org/stops/' || arr_stop_id AS arrivalStop,
  {_iso("dep_epoch")} AS departureTime,
  {_iso("arr_epoch")} AS arrivalTime,
  'http://example.org/trips/' || trip_id || '/' || {start_date} AS gtfs_trip,
  'http://example.org/routes/' || (SELECT t.route_id FROM g_trips t WHERE t.trip_id = g_connections.trip_id) AS gtfs_route,
  headsign AS direction,
  CASE WHEN COALESCE(pickup_type, '') <> ''
       THEN list_extract({_BOARDING_LIST}, CAST(pickup_type AS INT) + 1) END AS gtfs_pickupType,
  CASE WHEN COALESCE(drop_off_type, '') <> ''
       THEN list_extract({_BOARDING_LIST}, CAST(drop_off_type AS INT) + 1) END AS gtfs_dropOffType
FROM g_connections"""
    )


def sql_next_connection() -> str:
    """W3/J9 base case: lead() per trip over the reference sort order."""
    start_date = _local_yyyymmdd("start_epoch")
    return (
        gtfs_prelude()
        + f""",
g_ids AS (
  SELECT
    'http://example.org/connections/' || {start_date} || '/' || dep_stop_id || '/' || trip_id AS id,
    {_iso("dep_epoch")} AS departureTime,
    {_iso("arr_epoch")} AS arrivalTime,
    'http://example.org/trips/' || trip_id || '/' || {start_date} AS gtfs_trip,
    'http://example.org/routes/' || (SELECT t.route_id FROM g_trips t WHERE t.trip_id = g_connections.trip_id) AS gtfs_route,
    'http://example.org/stops/' || dep_stop_id AS departureStop,
    'http://example.org/stops/' || arr_stop_id AS arrivalStop
  FROM g_connections
)
SELECT id,
       lead(id) OVER (PARTITION BY gtfs_trip
                      ORDER BY departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop, id) AS next_id,
       gtfs_trip
FROM g_ids"""
    )


def sql_join_and_sort() -> str:
    """J8+J9 post-processor oracle (bin/linkedconnections-sort.js).

    The movement merge is sequential pairwise in the reference; this SQL
    reproduces it exactly for movement groups of size <= 2 — which holds
    for the sample feed (verified: every same-movement collision there
    is one joining or splitting pair). The descending scan pairs
    (prev=higher id, connection=lower id); mergeMovement's four branches
    pick the keeper and the absorbed trip.
    """
    start_date = _local_yyyymmdd("start_epoch")
    return (
        gtfs_prelude()
        + f""",
g_ids AS (
  SELECT
    'http://example.org/connections/' || {start_date} || '/' || dep_stop_id || '/' || trip_id AS id,
    {_iso("dep_epoch")} AS departureTime,
    {_iso("arr_epoch")} AS arrivalTime,
    'http://example.org/trips/' || trip_id || '/' || {start_date} AS gtfs_trip,
    'http://example.org/routes/' || (SELECT t.route_id FROM g_trips t WHERE t.trip_id = g_connections.trip_id) AS gtfs_route,
    'http://example.org/stops/' || dep_stop_id AS departureStop,
    'http://example.org/stops/' || arr_stop_id AS arrivalStop,
    CASE WHEN COALESCE(pickup_type, '') <> ''
         THEN list_extract({_BOARDING_LIST}, CAST(pickup_type AS INT) + 1) END AS pu,
    CASE WHEN COALESCE(drop_off_type, '') <> ''
         THEN list_extract({_BOARDING_LIST}, CAST(drop_off_type AS INT) + 1) END AS dof
  FROM g_connections
),
g_grp AS (
  SELECT *,
    count(*) OVER (PARTITION BY departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop) AS n,
    row_number() OVER (PARTITION BY departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop ORDER BY id DESC) AS rn
  FROM g_ids
),
g_pairs AS (
  SELECT hi.departureTime, hi.arrivalTime, hi.gtfs_route, hi.departureStop, hi.arrivalStop,
         hi.id AS hi_id, hi.gtfs_trip AS hi_trip, hi.pu AS hi_pu, hi.dof AS hi_do,
         lo.id AS lo_id, lo.gtfs_trip AS lo_trip, lo.pu AS lo_pu, lo.dof AS lo_do
  FROM (SELECT * FROM g_grp WHERE n = 2 AND rn = 1) hi
  JOIN (SELECT * FROM g_grp WHERE n = 2 AND rn = 2) lo
  USING (departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop)
),
g_merge_decision AS (
  SELECT *,
    CASE
      WHEN lo_pu = 'gtfs:NotAvailable' AND (hi_pu IS NULL OR hi_pu <> 'gtfs:NotAvailable') THEN 'hi_joined'
      WHEN hi_pu = 'gtfs:NotAvailable' AND (lo_pu IS NULL OR lo_pu <> 'gtfs:NotAvailable') THEN 'lo_joined'
      WHEN lo_do = 'gtfs:NotAvailable' AND (hi_do IS NULL OR hi_do <> 'gtfs:NotAvailable') THEN 'hi_split'
      WHEN hi_do = 'gtfs:NotAvailable' AND (lo_do IS NULL OR lo_do <> 'gtfs:NotAvailable') THEN 'lo_split'
      ELSE 'none' END AS decision
  FROM g_pairs
),
g_after_merge AS (
  -- singletons
  SELECT id, departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop, gtfs_trip,
         CAST(NULL AS VARCHAR) AS joined_trip, CAST(NULL AS VARCHAR) AS split_trip
  FROM g_grp WHERE n = 1
  UNION ALL
  -- unmerged pairs: both survive untouched
  SELECT g.id, g.departureTime, g.arrivalTime, g.gtfs_route, g.departureStop, g.arrivalStop, g.gtfs_trip, NULL, NULL
  FROM g_grp g JOIN g_merge_decision d
    USING (departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop)
  WHERE g.n = 2 AND d.decision = 'none'
  UNION ALL
  -- merged keepers
  SELECT CASE WHEN decision IN ('hi_joined','hi_split') THEN hi_id ELSE lo_id END,
         departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop,
         CASE WHEN decision IN ('hi_joined','hi_split') THEN hi_trip ELSE lo_trip END,
         CASE WHEN decision = 'hi_joined' THEN lo_trip WHEN decision = 'lo_joined' THEN hi_trip END,
         CASE WHEN decision = 'hi_split' THEN lo_trip WHEN decision = 'lo_split' THEN hi_trip END
  FROM g_merge_decision WHERE decision <> 'none'
),
g_linked AS (
  SELECT m.*,
    lead(id) OVER w AS next_id,
    lead(split_trip) OVER w AS next_split
  FROM g_after_merge m
  WINDOW w AS (PARTITION BY gtfs_trip
               ORDER BY departureTime, arrivalTime, gtfs_route, departureStop, arrivalStop, id)
)
SELECT id, departureTime, gtfs_trip,
  COALESCE(
    CASE WHEN next_id IS NOT NULL THEN
      next_id || COALESCE('|' || (
        SELECT min(s.id) FROM g_after_merge s
        WHERE g_linked.split_trip IS NOT NULL AND next_split IS NULL
          AND s.gtfs_trip = g_linked.split_trip
          AND (s.departureTime, s.arrivalTime, s.gtfs_route, s.departureStop, s.arrivalStop, s.id)
            > (g_linked.departureTime, g_linked.arrivalTime, g_linked.gtfs_route, g_linked.departureStop, g_linked.arrivalStop, g_linked.id)
      ), '')
    ELSE (
      -- joined-trip inheritance: earliest later absorber of my trip,
      -- then that trip's first connection after me
      SELECT min(t.id) FROM g_after_merge t
      WHERE t.gtfs_trip = (
        SELECT m.gtfs_trip FROM g_after_merge m
        WHERE m.joined_trip = g_linked.gtfs_trip
          AND (m.departureTime, m.arrivalTime, m.gtfs_route, m.departureStop, m.arrivalStop, m.id)
            > (g_linked.departureTime, g_linked.arrivalTime, g_linked.gtfs_route, g_linked.departureStop, g_linked.arrivalStop, g_linked.id)
        ORDER BY m.departureTime, m.arrivalTime, m.gtfs_route, m.departureStop, m.arrivalStop, m.id
        LIMIT 1
      )
      AND (t.departureTime, t.arrivalTime, t.gtfs_route, t.departureStop, t.arrivalStop, t.id)
        > (g_linked.departureTime, g_linked.arrivalTime, g_linked.gtfs_route, g_linked.departureStop, g_linked.arrivalStop, g_linked.id)
    )
    END
  , '') AS next_ids
FROM g_linked"""
    )


def sql_triples() -> str:
    """(subj, pred, obj) explosion of the full connection set —
    the P/R comparison surface (lib/Connections2Triples.js:31-99)."""
    start_date = _local_yyyymmdd("start_epoch")
    base = f"""
g_jsonld AS (
  SELECT
    'http://example.org/connections/' || {start_date} || '/' || dep_stop_id || '/' || trip_id AS id,
    'http://example.org/stops/' || dep_stop_id AS dep_uri,
    'http://example.org/stops/' || arr_stop_id AS arr_uri,
    {_iso("dep_epoch")} AS dep_iso,
    {_iso("arr_epoch")} AS arr_iso,
    'http://example.org/trips/' || trip_id || '/' || {start_date} AS trip_uri,
    'http://example.org/routes/' || (SELECT t.route_id FROM g_trips t WHERE t.trip_id = g_connections.trip_id) AS route_uri,
    headsign, pickup_type, drop_off_type
  FROM g_connections
)"""
    lc = "http://semweb.mmlab.be/ns/linkedconnections#"
    gt = "http://vocab.gtfs.org/terms#"
    full_boarding = (
        f"['{gt}Regular', '{gt}NotAvailable', '{gt}MustPhone', '{gt}MustCoordinateWithDriver']"
    )
    return (
        gtfs_prelude()
        + ","
        + base
        + f"""
SELECT id AS subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred, '{lc}Connection' AS obj FROM g_jsonld
UNION ALL SELECT id, '{lc}departureStop', dep_uri FROM g_jsonld
UNION ALL SELECT id, '{lc}arrivalStop', arr_uri FROM g_jsonld
UNION ALL SELECT id, '{lc}departureTime', dep_iso FROM g_jsonld
UNION ALL SELECT id, '{lc}arrivalTime', arr_iso FROM g_jsonld
UNION ALL SELECT id, '{gt}trip', trip_uri FROM g_jsonld
UNION ALL SELECT id, '{gt}route', route_uri FROM g_jsonld
UNION ALL SELECT id, '{gt}headsign', headsign FROM g_jsonld WHERE headsign IS NOT NULL AND headsign <> ''
UNION ALL SELECT id, '{gt}dropOffType', list_extract({full_boarding}, CAST(drop_off_type AS INT) + 1)
  FROM g_jsonld WHERE COALESCE(drop_off_type, '') <> ''
UNION ALL SELECT id, '{gt}pickupType', list_extract({full_boarding}, CAST(pickup_type AS INT) + 1)
  FROM g_jsonld WHERE COALESCE(pickup_type, '') <> ''"""
    )


def sql_star_join() -> str:
    """KG star-join: reassemble connection records from the triple
    table via conditional aggregation (one groupBy, no self-joins)."""
    lc = "http://semweb.mmlab.be/ns/linkedconnections#"
    gt = "http://vocab.gtfs.org/terms#"
    cols = {
        "departureStop": f"{lc}departureStop",
        "arrivalStop": f"{lc}arrivalStop",
        "departureTime": f"{lc}departureTime",
        "arrivalTime": f"{lc}arrivalTime",
        "gtfs_trip": f"{gt}trip",
        "gtfs_route": f"{gt}route",
        "headsign": f"{gt}headsign",
    }
    picks = ",\n       ".join(
        f"MAX(CASE WHEN pred = '{iri}' THEN obj END) AS {name}"
        for name, iri in cols.items()
    )
    return (
        f"SELECT subj,\n       {picks}\n"
        f"FROM ({sql_triples()}) t\nGROUP BY subj"
    )


def sql_bgp_match() -> str:
    """Basic-graph-pattern oracle: the same-trip transfer pattern
    (?c departs at the stop where ?c2 arrives, both on one trip) as
    naive per-pattern self-joins over the triple table — the shape a
    SPARQL engine would run, independent of kg.bgp_match's
    selectivity-ordered planner."""
    lc = "http://semweb.mmlab.be/ns/linkedconnections#"
    gt = "http://vocab.gtfs.org/terms#"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    return f"""WITH tri AS (SELECT * FROM ({sql_triples()}) x)
SELECT p0.subj AS c, p1.obj AS stop, p2.obj AS trip, p3.subj AS c2
FROM tri p0
JOIN tri p1 ON p1.subj = p0.subj AND p1.pred = '{lc}departureStop'
JOIN tri p2 ON p2.subj = p0.subj AND p2.pred = '{gt}trip'
JOIN tri p3 ON p3.obj = p1.obj AND p3.pred = '{lc}arrivalStop'
JOIN tri p4 ON p4.subj = p3.subj AND p4.pred = '{gt}trip' AND p4.obj = p2.obj
WHERE p0.pred = '{rdf}' AND p0.obj = '{lc}Connection'"""


def sql_predicate_stats() -> str:
    """KG profiling: per-predicate triple / distinct-object counts."""
    return (
        "SELECT pred, COUNT(*) AS n_triples,"
        " COUNT(DISTINCT obj) AS n_distinct_obj,"
        " COUNT(DISTINCT subj) AS n_distinct_subj"
        f" FROM ({sql_triples()}) t GROUP BY pred"
    )


def sql_earliest_arrival(source_stop: str, dep_after_utc: str) -> str:
    """Time-respecting earliest arrival from ``source_stop`` at/after
    ``dep_after_utc`` ('YYYY-MM-DD HH:MM:SS', a UTC instant) — the
    Connection Scan answer set, as a recursive CTE enumerating
    (stop, arrival) states (bounded by the connection count) then
    taking the per-stop minimum.  Validates the label-correcting
    Spark formulation in gtfs2lc_spark/kg.py against an
    order-free enumeration of every time-respecting chain."""
    t0 = f"CAST(epoch(TIMESTAMP '{dep_after_utc}') AS BIGINT)"
    prelude = gtfs_prelude()
    assert prelude.startswith("WITH ")
    return (
        "WITH RECURSIVE "
        + prelude[len("WITH "):]
        + f""",
ea_base AS (
  SELECT dep_stop_id, arr_stop_id, dep_epoch, arr_epoch
  FROM g_connections WHERE dep_epoch >= {t0}
),
ea_reach(stop, t) AS (
  SELECT '{source_stop}' AS stop, {t0} AS t
  UNION
  SELECT b.arr_stop_id, b.arr_epoch
  FROM ea_reach r JOIN ea_base b
    ON b.dep_stop_id = r.stop AND b.dep_epoch >= r.t
)
SELECT stop, {_iso('mt')} AS earliest
FROM (SELECT stop, MIN(t) AS mt FROM ea_reach GROUP BY stop) m"""
    )


def sql_triple_diff() -> str:
    """Triple-level snapshot delta: new = base minus headsigns plus a
    synthetic ex:verified triple per connection; diff via NOT EXISTS
    anti-joins in both directions (duplicate-safe, unlike EXCEPT)."""
    gt = "http://vocab.gtfs.org/terms#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    return f"""
WITH base AS (SELECT * FROM ({sql_triples()}) q),
new_t AS (
  SELECT subj, pred, obj FROM base WHERE pred <> '{gt}headsign'
  UNION ALL
  SELECT subj, 'http://example.org/ns#verified' AS pred, 'true' AS obj
  FROM base WHERE pred = '{rdf_type}'
)
SELECT n.subj, n.pred, n.obj, 'added' AS change FROM new_t n
WHERE NOT EXISTS (SELECT 1 FROM base o
                  WHERE o.subj = n.subj AND o.pred = n.pred AND o.obj = n.obj)
UNION ALL
SELECT o.subj, o.pred, o.obj, 'removed' AS change FROM base o
WHERE NOT EXISTS (SELECT 1 FROM new_t n
                  WHERE n.subj = o.subj AND n.pred = o.pred AND n.obj = o.obj)"""


def sql_entity_link() -> str:
    """Broadcast entity linking vs the canonical stop dictionary:
    mentions synthesized from doc_id (id / name / cased / punctuated /
    unlinkable variants over the 16 fixture stops), tier-1 exact-id
    probe, tier-2 normalized-name probe with min-id canonicalization —
    mirrors kg.link_entities / kg.normalize_entity_name exactly."""
    stops_cte = _values_cte("g_stops", "stops.txt")
    norm = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"
    return f"""
WITH {stops_cte},
sidx AS (
  SELECT stop_id, stop_name,
         row_number() OVER (ORDER BY stop_id) - 1 AS idx
  FROM g_stops
),
m AS (
  SELECT d.doc_id AS mention_id,
         CASE CAST(d.doc_id % 5 AS INT)
           WHEN 0 THEN s.stop_id
           WHEN 1 THEN s.stop_name
           WHEN 2 THEN upper(s.stop_name)
           WHEN 3 THEN s.stop_name || ' !!'
           ELSE 'unknown place ' || CAST(d.doc_id AS VARCHAR)
         END AS raw
  FROM documents d JOIN sidx s ON d.doc_id % 16 = s.idx
),
nidx AS (
  SELECT {norm.format(c='stop_name')} AS nname, min(stop_id) AS nid
  FROM g_stops GROUP BY 1
),
ids AS (SELECT DISTINCT stop_id FROM g_stops)
SELECT m.mention_id, m.raw,
       coalesce(i.stop_id, n.nid) AS linked_id,
       CASE WHEN i.stop_id IS NOT NULL THEN 'id'
            WHEN n.nid IS NOT NULL THEN 'name'
            ELSE 'none' END AS link_method
FROM m
LEFT JOIN ids i ON m.raw = i.stop_id
LEFT JOIN nidx n ON {norm.format(c='m.raw')} = n.nname"""
