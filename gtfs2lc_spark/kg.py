"""Query operators over the materialized Linked Connections graph.

The reference stops at materializing the graph: its consumers — route
planners running the Connection Scan Algorithm (CSA) over Linked
Connections pages (the ecosystem around lib/Connections2Triples.js /
lib/Connections2JSONLD.js) — live in other repos.  These operators
close that loop Spark-side: reassemble entity records from the
(subj, pred, obj) table, profile the predicate distribution, and
answer the canonical LC consumer question (earliest arrival from a
stop) directly on the distributed connection set.

Scale posture (100 TB):

- ``star_join`` is ONE hash aggregation keyed by subject with
  map-side partial combine; a connection subject carries <= 10 triple
  rows, so no key is ever hot.
- ``predicate_stats`` shuffles one row per (pred, obj) for the
  distinct count — pred cardinality is ~10, but the two-phase
  count-distinct expansion keys on (pred, obj), so zipfian objects
  spread over the full cluster before the tiny final agg.
- ``earliest_arrivals`` keeps the fact-sized connection set where it
  was scanned: each relaxation round BROADCASTS the label frontier
  (bounded by |stops| — dimension-sized) against the connection scan;
  the connections themselves never shuffle.  Rounds are bounded by
  the longest optimal connection chain, and each round cuts lineage
  through :func:`gtfs2lc_spark.materialize.materialize`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize

__all__ = ["star_join", "predicate_stats", "earliest_arrivals", "triple_diff"]


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta between two triple sets: rows only in ``new``
    tagged ``added``, rows only in ``old`` tagged ``removed`` — the
    triple-level counterpart of the connection-level differential
    history (checkpoint.HistoryStore / reference lib/URIs history
    semantics): publish the delta, not the world.

    Two anti-joins on the full (subj, pred, obj) key.  Both sides
    shuffle-partition on the same key, so the joins co-locate; at
    100 TB this is the standard two-pass set-difference — no
    broadcast assumption, no skew (the key is the whole row, so
    duplicates are the only hot keys and triple sets are
    near-unique)."""
    key = ["subj", "pred", "obj"]
    added = new.select(key).join(old.select(key), key, "left_anti").withColumn(
        "change", F.lit("added")
    )
    removed = old.select(key).join(new.select(key), key, "left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)


def star_join(triples: DataFrame, predicates: dict[str, str]) -> DataFrame:
    """Reassemble one row per subject from a (subj, pred, obj) table.

    ``predicates`` maps output column name -> predicate IRI.  The
    classic RDF "star join" (one self-join per predicate in a naive
    triple store) collapses to a single groupBy with conditional
    aggregates: one shuffle, map-side combinable, no join at all.
    Missing predicates yield NULL (OPTIONAL semantics).
    """
    aggs = [
        F.max(F.when(F.col("pred") == iri, F.col("obj"))).alias(name)
        for name, iri in predicates.items()
    ]
    return triples.groupBy("subj").agg(*aggs)


def predicate_stats(triples: DataFrame) -> DataFrame:
    """Per-predicate triple count + distinct-object count — the KG
    profiling query run before choosing storage/partition layouts.

    ``countDistinct`` plans as expand + two-phase agg keyed on
    (pred, obj): the heavy dedup happens across the cluster, the final
    per-pred rollup is ~10 rows."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("obj").alias("n_distinct_obj"),
        F.countDistinct("subj").alias("n_distinct_subj"),
    )


def earliest_arrivals(
    conns: DataFrame,
    source_stop: str,
    dep_after,
    max_rounds: int = 25,
    dep_stop_col: str = "dep_stop_id",
    arr_stop_col: str = "arr_stop_id",
    dep_ts_col: str = "departure_ts",
    arr_ts_col: str = "arrival_ts",
) -> DataFrame:
    """Time-respecting earliest arrival from ``source_stop`` departing
    at/after ``dep_after`` — the Connection Scan Algorithm's answer
    set, computed by distributed label correction.

    CSA scans connections in departure order on one core; that order
    is exactly what a cluster cannot share, so this uses the standard
    label-correcting reformulation: a frontier of (stop, earliest)
    labels is joined against catchable connections
    (``dep_ts >= label``), arrivals relax the frontier, repeat to
    fixpoint.  Min-labels dominate (any connection catchable from a
    later arrival is catchable from an earlier one), so keeping only
    the per-stop minimum each round reaches the same fixpoint as
    enumerating every time-respecting chain.

    Each round: connections (pre-filtered to ``dep_ts >= dep_after``,
    a pushed-down scan predicate) BROADCAST-join the frontier — labels
    are bounded by |stops|, a dimension.  The fact side never
    shuffles; the per-round groupBy runs over frontier-sized data.
    Raises ``RuntimeError`` if ``max_rounds`` is exhausted while
    labels are still improving (matches connected_components' strict
    non-convergence contract).
    """
    spark = conns.sparkSession
    cset = materialize(
        conns.where(F.col(dep_ts_col) >= F.lit(dep_after))
        .select(
            F.col(dep_stop_col).alias("_dep"),
            F.col(arr_stop_col).alias("_arr"),
            F.col(dep_ts_col).alias("_dep_ts"),
            F.col(arr_ts_col).alias("_arr_ts"),
        ),
        label="ea_conns",
    )
    labels = spark.createDataFrame(
        [(source_stop,)], "stop string"
    ).select("stop", F.lit(dep_after).cast("timestamp").alias("earliest"))

    for _ in range(max_rounds):
        relaxed = (
            cset.join(
                F.broadcast(labels),
                (cset["_dep"] == labels["stop"])
                & (cset["_dep_ts"] >= labels["earliest"]),
            )
            .select(F.col("_arr").alias("stop"), F.col("_arr_ts").alias("earliest"))
        )
        new_labels = materialize(
            labels.unionByName(relaxed)
            .groupBy("stop")
            .agg(F.min("earliest").alias("earliest")),
            label="ea_labels",
        )
        improved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "stop", "left")
            .where(
                F.col("o.earliest").isNull()
                | (F.col("n.earliest") < F.col("o.earliest"))
            )
            .limit(1)
            .count()
        )
        labels = new_labels
        if improved == 0:
            return labels
    raise RuntimeError(
        f"earliest_arrivals did not converge within {max_rounds} rounds; "
        "raise max_rounds (bound = longest optimal connection chain)"
    )
