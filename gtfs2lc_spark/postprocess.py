"""Post-processor: joined/split-trip movement merge + nextConnection
linking + final ordering (reference: bin/linkedconnections-sort.js).

The reference is a single sequential descending scan with three pieces
of state (previous connection, per-trip last connection, joined-trip
map). Decomposition into Spark ops, preserving exact semantics:

- J8 movement merge (sameMovement/mergeMovement, sort.js:97-135):
  same-movement connections are ADJACENT in the descending sort (the
  movement key is a prefix of the sort key), so the merge is local to a
  movement group. We groupBy the 5-key; singleton groups (the vast
  majority) bypass Python entirely; only multi-row groups run the exact
  sequential pairwise merge in applyInPandas.
- J9 linking (joinConnections, sort.js:137-190): "per-trip last seen
  connection in a descending scan" ≡ lead() over an ascending per-trip
  window; the split/join cross-trip links are as-of lookups ("first
  connection of trip X after sort position k"), implemented as joins
  against the (rare) rows that carry willSplitInto/joinedWithTrip.
- O2 ordering (compareConnections, sort.js:24-43): plain orderBy on the
  6 string keys, missing -> ''.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize

NA = "gtfs:NotAvailable"

SORT_KEYS = [
    "departureTime",
    "arrivalTime",
    "gtfs_route",
    "departureStop",
    "arrivalStop",
    "id",
]
MOVEMENT_KEYS = SORT_KEYS[:-1]


def _key_struct(prefix: str = "") -> F.Column:
    return F.struct(*[F.coalesce(F.col(prefix + k), F.lit("")).alias(k) for k in SORT_KEYS])


def _merge_group_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact sequential pairwise merge of one movement group, scanned in
    descending order (mergeMovement, sort.js:107-135)."""
    pdf = pdf.sort_values("id", ascending=False)
    rows = pdf.to_dict("records")
    for r in rows:
        r["joinedWithTrip"] = []
        r["willSplitInto"] = []
    out: list[dict] = []
    prev: dict | None = None
    for c in rows:
        if prev is None:
            prev = c
            continue
        merged = None
        c_pu, p_pu = c.get("gtfs_pickupType"), prev.get("gtfs_pickupType")
        c_do, p_do = c.get("gtfs_dropOffType"), prev.get("gtfs_dropOffType")
        if c_pu == NA and p_pu != NA:
            merged = prev
            merged["joinedWithTrip"].append(c["gtfs_trip"])
        elif p_pu == NA and c_pu != NA:
            merged = c
            merged["joinedWithTrip"].append(prev["gtfs_trip"])
        elif c_do == NA and p_do != NA:
            merged = prev
            merged["willSplitInto"].append(c["gtfs_trip"])
        elif p_do == NA and c_do != NA:
            merged = c
            merged["willSplitInto"].append(prev["gtfs_trip"])
        if merged is not None:
            prev = merged
            continue
        out.append(prev)
        prev = c
    if prev is not None:
        out.append(prev)
    return pd.DataFrame(out)


def merge_movements(
    jsonld: DataFrame, big_group_threshold: int | None = 10_000
) -> DataFrame:
    """J8: collapse same-movement join/split counterparts.

    The reference's sequential pairwise scan (mergeMovement,
    sort.js:107-135) is a FOLD over the group's rows in descending id
    order — expressed here as F.aggregate over the collected group
    array: pure JVM expressions, zero Python. (The first cut routed
    multi-row groups through applyInPandas; per-group pandas overhead on
    ~14k two-row groups made the post-processor ~10x slower than this
    fold — see PLANS.md.)

    Scale shape: ONE shuffle, FULLY LAZY. The movement key is
    hash-partitioned once (the group-count window); both routing
    branches read that same exchange (ReuseExchange), so the downstream
    groupBys (HashPartitioning on the same attributes) add no further
    exchange. Groups larger than ``big_group_threshold`` — a
    pathological identical-movement pile-up that would (a) build an
    unbounded collect_list buffer and (b) hit the fold's O(n^2)
    accumulator-array concat — route to the exact sequential pandas
    merge (``_merge_group_pdf``, O(n) per group, Arrow-batched); normal
    collision-sized groups (2-3 rows) never leave the JVM.

    The routing is part of the SAME lazy plan: oversized movement keys
    are detected by a SKINNY key-count aggregation (only the 5 movement
    key columns shuffle for it) kept > threshold — normally ZERO rows —
    and broadcast into a left_anti (JVM fold path) / left_semi
    (applyInPandas path) probe pair. With an empty oversized set the
    anti probe is a free codegen'd filter and the Python stage receives
    zero rows — Spark's pandas exec nodes short-circuit empty
    partitions without spawning a worker. No eager materialization, no
    driver probe, no extra job, no per-branch count window (the
    round-3 eager-guard shape cost ~1.7 s fixed per call at 208k
    connections; the count-window branch pair it briefly became cost
    ~0.4 s). ``big_group_threshold=None`` drops the guard entirely for
    callers that vouch groups are collision-sized.
    """
    cols = jsonld.columns
    kcols = [f"_k_{k}" for k in MOVEMENT_KEYS]
    keyed = jsonld.select(
        *cols,
        *[F.coalesce(F.col(k), F.lit("")).alias(kc) for k, kc in zip(MOVEMENT_KEYS, kcols)],
    )
    if big_group_threshold is not None:
        # probe on an 8-byte hash of the movement key, not the 5 long
        # URI/time strings (~300 bytes/row through the agg shuffle): a
        # hash COLLISION merely routes an extra group to the pandas
        # path, which is exact for any group — correctness never
        # depends on collision-freedom
        kh = F.xxhash64(*kcols).alias("_kh")
        keyed = keyed.select("*", kh)
        big_keys = (
            keyed.groupBy("_kh")
            .agg(F.count(F.lit(1)).alias("_gn"))
            .where(F.col("_gn") > big_group_threshold)
            .select("_kh")
        )
        bk = F.broadcast(big_keys)
        small = keyed.join(bk, ["_kh"], "left_anti").drop("_kh")
        big = keyed.join(bk, ["_kh"], "left_semi").drop("_kh")
    else:
        # guard disabled: single groupBy shuffle, no key-count agg
        small, big = keyed, None
    empty = F.array().cast("array<string>")
    out_ddl = (
        "struct<"
        + ",".join(f"`{c}`:string" for c in cols)
        + ",`joinedWithTrip`:array<string>,`willSplitInto`:array<string>>"
    )
    acc_ddl = f"struct<`out`:array<{out_ddl}>,`prev`:{out_ddl},`has_prev`:boolean>"

    def rebuild(r, joined, split):
        """outrow struct from a row/outrow struct + replacement arrays."""
        return F.struct(
            *[r[c].alias(c) for c in cols],
            joined.alias("joinedWithTrip"),
            split.alias("willSplitInto"),
        )

    def blank(x):
        return F.coalesce(x, F.lit(""))

    na = F.lit(NA)

    def step(acc, c):
        prev = acc["prev"]
        c_pu, p_pu = blank(c["gtfs_pickupType"]), blank(prev["gtfs_pickupType"])
        c_do, p_do = blank(c["gtfs_dropOffType"]), blank(prev["gtfs_dropOffType"])
        keep = lambda merged: F.struct(  # noqa: E731
            acc["out"].alias("out"), merged.alias("prev"), F.lit(True).alias("has_prev")
        )
        emit_prev = F.struct(
            F.concat(acc["out"], F.array(prev)).alias("out"),
            rebuild(c, empty, empty).alias("prev"),
            F.lit(True).alias("has_prev"),
        )
        return (
            F.when(~acc["has_prev"], keep(rebuild(c, empty, empty)))
            # exact rule order of mergeMovement: pickup both ways first,
            # then dropOff both ways, else no merge
            .when(
                (c_pu == na) & (p_pu != na),
                keep(rebuild(prev, F.concat(prev["joinedWithTrip"], F.array(c["gtfs_trip"])), prev["willSplitInto"])),
            )
            .when(
                # absorbed-prev's accumulated lists are DISCARDED, like
                # the reference's `merged = connection` (c starts fresh)
                (p_pu == na) & (c_pu != na),
                keep(rebuild(c, F.array(prev["gtfs_trip"]), empty)),
            )
            .when(
                (c_do == na) & (p_do != na),
                keep(rebuild(prev, prev["joinedWithTrip"], F.concat(prev["willSplitInto"], F.array(c["gtfs_trip"])))),
            )
            .when(
                (p_do == na) & (c_do != na),
                keep(rebuild(c, empty, F.array(prev["gtfs_trip"]))),
            )
            .otherwise(emit_prev)
        )

    # descending id scan order (sort.js:45-95 external desc sort): ids
    # are unique, so sorting the row structs (id is the first field)
    # ascending and reversing reproduces pandas sort_values(ascending=False)
    rows_desc = F.reverse(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("id").alias("id"), *[F.col(c).alias(c) for c in cols if c != "id"])
            )
        )
    )
    init = F.struct(
        F.array().cast(f"array<{out_ddl}>").alias("out"),
        F.lit(None).cast(out_ddl).alias("prev"),
        F.lit(False).alias("has_prev"),
    )
    folded = F.aggregate(
        rows_desc,
        init.cast(acc_ddl),
        step,
        lambda acc: F.when(
            acc["has_prev"], F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"]),
    )
    out_cols = cols + ["joinedWithTrip", "willSplitInto"]
    small_out = (
        small.groupBy(*kcols)
        .agg(folded.alias("_merged"))
        .select(F.explode("_merged").alias("_r"))
        .select(*[F.col("_r")[c].alias(c) for c in out_cols])
    )

    # Oversized-group escape hatch: exact sequential merge in pandas
    # (one Arrow batch stream per group — no unbounded JVM agg buffer).
    # The branch is always in the plan when the guard is on, but pandas
    # exec short-circuits empty partitions, so the common case (no
    # oversized group) never actually spawns a Python worker.
    if big is None:
        return small_out

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in jsonld.schema.fields]
        + ["`joinedWithTrip` array<string>", "`willSplitInto` array<string>"]
    )
    drop_cols = kcols

    def _merge_big(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _merge_group_pdf(pdf.drop(columns=drop_cols))
        return out[out_cols]

    big_out = big.groupBy(*kcols).applyInPandas(_merge_big, schema=out_schema)
    return small_out.unionByName(big_out)


def link_next_connections(merged: DataFrame) -> DataFrame:
    """J9: per-trip nextConnection chains + split/join branch links
    (joinConnections, sort.js:137-190).

    The keyed + lead-window frame is materialized once (r6): five plan
    branches read it (final projection, keys, split sources, last
    connections — plus the rare-side probes), and Catalyst shares no
    common sub-plans, so each branch re-ran the per-trip window
    (exchange + sort over the full connection set) — four window
    executions where one suffices."""
    df = merged.withColumn("_key", _key_struct())
    w_trip = Window.partitionBy("gtfs_trip").orderBy("_key")
    df = materialize(
        df.withColumn("_next_id", F.lead("id").over(w_trip))
        .withColumn("_next_wsi", F.lead("willSplitInto").over(w_trip)),
        "j9-keyed",
    )

    keys = df.select(
        F.col("gtfs_trip").alias("_ktrip"), F.col("_key").alias("_kkey"), F.col("id").alias("_kid")
    )

    # split links: c has willSplitInto, a next connection, and that next
    # connection is not itself a split point (sort.js:150-156).
    # r6 (guide §3.1): split points are STRUCTURALLY rare (a handful of
    # joined/split trips per feed; usually zero) but the planner cannot
    # estimate that through the size() filters, so without the hint
    # every one of these joins became a SortMergeJoin that shuffled and
    # sorted the FULL connection set even when the rare side was empty.
    # Broadcasting the rare side turns them into broadcast joins — the
    # big side never re-shuffles. (A hostile corpus where most
    # connections are split points would blow the broadcast; that input
    # shape fails loudly at the 8 GB broadcast cap, documented.)
    split_src = df.where(
        (F.size("willSplitInto") > 0)
        & F.col("_next_id").isNotNull()
        & (F.coalesce(F.size("_next_wsi"), F.lit(0)) == 0)
    ).select("id", "_key", F.posexplode("willSplitInto").alias("_pos", "_split_trip"))
    split_links = (
        keys.join(
            F.broadcast(split_src),
            (keys["_ktrip"] == split_src["_split_trip"]) & (keys["_kkey"] > split_src["_key"]),
            "inner",
        )
        .groupBy("id", "_pos")
        .agg(F.min_by("_kid", "_kkey").alias("_link"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_link"))).alias("_ps"))
        .select("id", F.transform("_ps", lambda s: s["_link"]).alias("_split_links"))
    )

    # joined-trip inheritance: c is its trip's LAST connection; find the
    # earliest later merged connection M that absorbed c's trip, then
    # link to M's trip's first connection after c (sort.js:157-163)
    # setters (rows that absorbed a trip) are as rare as split points —
    # broadcast them for the same guide §3.1 reason; the inherited
    # result is bounded by |setters| x |their absorbed trips|, so it
    # broadcasts too, and the keys probe stays shuffle-free.
    setters = merged.where(F.size("joinedWithTrip") > 0).select(
        F.col("gtfs_trip").alias("_abs_trip"),
        _key_struct().alias("_mk"),
        F.explode("joinedWithTrip").alias("_absorbed"),
    )
    last_conns = df.where(F.col("_next_id").isNull()).select("id", "gtfs_trip", "_key")
    inherited = (
        last_conns.join(
            F.broadcast(setters),
            (setters["_absorbed"] == last_conns["gtfs_trip"])
            & (setters["_mk"] > last_conns["_key"]),
            "inner",
        )
        .groupBy("id", "_key")
        .agg(F.min_by("_abs_trip", "_mk").alias("_target_trip"))
    )
    inherited = (
        keys.join(
            F.broadcast(inherited),
            on=[keys["_ktrip"] == F.col("_target_trip"), keys["_kkey"] > F.col("_key")],
            how="inner",
        )
        .groupBy("id")
        .agg(F.min_by("_kid", "_kkey").alias("_joined_link"))
    )

    out = (
        df.join(F.broadcast(split_links), "id", "left")
        .join(F.broadcast(inherited), "id", "left")
        .withColumn(
            "nextConnection",
            F.when(
                F.col("_next_id").isNotNull(),
                F.concat(
                    F.array("_next_id"),
                    F.coalesce("_split_links", F.array().cast("array<string>")),
                ),
            ).otherwise(
                F.when(F.col("_joined_link").isNotNull(), F.array("_joined_link"))
            ),
        )
        .drop("_key", "_next_id", "_next_wsi", "_split_links", "_joined_link",
              "joinedWithTrip", "willSplitInto")
    )
    return out


def join_and_sort(
    jsonld: DataFrame, big_group_threshold: int | None = 10_000
) -> DataFrame:
    """Full post-processor: merge movements, link nextConnection, order
    ascending by the reference comparator (sort.js:210-233).

    The merged set is materialized once (``materialize``, strategy set
    by spark.gtfs2lc.materialize): J9 references it from five plan
    branches (lead window, split-link keys, setters, last-connections,
    final projection), and without the cut each branch would re-run the
    movement-merge fold — measured ~11% slower and far less stable at
    208k connections."""
    merged = materialize(merge_movements(jsonld, big_group_threshold), "j8-merged")
    linked = link_next_connections(merged)
    return linked.orderBy(*[F.coalesce(F.col(k), F.lit("")) for k in SORT_KEYS])
