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


def merge_movements(jsonld: DataFrame) -> DataFrame:
    """J8: collapse same-movement join/split counterparts.

    Scale shape: one shuffle on the movement key; the Python path only
    sees groups with >1 row (same dep/arr time+stop+route collisions —
    a tiny fraction of any real feed).
    """
    cols = jsonld.columns
    w = Window.partitionBy(*[F.coalesce(F.col(k), F.lit("")) for k in MOVEMENT_KEYS])
    counted = jsonld.withColumn("_n", F.count(F.lit(1)).over(w))

    empty_arr = F.array().cast("array<string>")
    singles = counted.where(F.col("_n") == 1).drop("_n").select(
        *cols,
        empty_arr.alias("joinedWithTrip"),
        empty_arr.alias("willSplitInto"),
    )

    multi = counted.where(F.col("_n") > 1).drop("_n")
    out_schema = ", ".join(
        [f"`{c}` string" for c in cols]
        + ["joinedWithTrip array<string>", "willSplitInto array<string>"]
    )
    merged = multi.groupBy(
        *[F.coalesce(F.col(k), F.lit("")).alias(f"_k_{k}") for k in MOVEMENT_KEYS]
    ).applyInPandas(
        lambda _key, pdf: _merge_group_pdf(pdf[cols]), schema=out_schema
    )
    return singles.unionByName(merged.select(singles.columns))


def link_next_connections(merged: DataFrame) -> DataFrame:
    """J9: per-trip nextConnection chains + split/join branch links
    (joinConnections, sort.js:137-190)."""
    df = merged.withColumn("_key", _key_struct())
    w_trip = Window.partitionBy("gtfs_trip").orderBy("_key")
    df = (
        df.withColumn("_next_id", F.lead("id").over(w_trip))
        .withColumn("_next_wsi", F.lead("willSplitInto").over(w_trip))
    )

    keys = df.select(
        F.col("gtfs_trip").alias("_ktrip"), F.col("_key").alias("_kkey"), F.col("id").alias("_kid")
    )

    # split links: c has willSplitInto, a next connection, and that next
    # connection is not itself a split point (sort.js:150-156)
    split_src = df.where(
        (F.size("willSplitInto") > 0)
        & F.col("_next_id").isNotNull()
        & (F.coalesce(F.size("_next_wsi"), F.lit(0)) == 0)
    ).select("id", "_key", F.posexplode("willSplitInto").alias("_pos", "_split_trip"))
    split_links = (
        split_src.join(
            keys,
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
    setters = merged.where(F.size("joinedWithTrip") > 0).select(
        F.col("gtfs_trip").alias("_abs_trip"),
        _key_struct().alias("_mk"),
        F.explode("joinedWithTrip").alias("_absorbed"),
    )
    last_conns = df.where(F.col("_next_id").isNull()).select("id", "gtfs_trip", "_key")
    inherited = (
        last_conns.join(
            setters,
            (setters["_absorbed"] == last_conns["gtfs_trip"])
            & (setters["_mk"] > last_conns["_key"]),
            "inner",
        )
        .groupBy("id", "_key")
        .agg(F.min_by("_abs_trip", "_mk").alias("_target_trip"))
        .join(
            keys,
            on=[keys["_ktrip"] == F.col("_target_trip"), keys["_kkey"] > F.col("_key")],
            how="inner",
        )
        .groupBy("id")
        .agg(F.min_by("_kid", "_kkey").alias("_joined_link"))
    )

    out = (
        df.join(split_links, "id", "left")
        .join(inherited, "id", "left")
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


def join_and_sort(jsonld: DataFrame) -> DataFrame:
    """Full post-processor: merge movements, link nextConnection, order
    ascending by the reference comparator (sort.js:210-233)."""
    linked = link_next_connections(merge_movements(jsonld))
    return linked.orderBy(*[F.coalesce(F.col(k), F.lit("")) for k in SORT_KEYS])
