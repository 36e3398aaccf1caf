"""J7 — differential/incremental conversion with resumable checkpoints.

The reference keeps a LevelDB ``history.db`` mapping
uniqueId -> {serviceDate: ...} and emits only (uniqueId, serviceDate)
pairs not seen in prior runs (lib/stoptimes/st2c.js:134-181); ``--fresh``
resets it (lib/stoptimes/StopTimes2Cxs.js:17-27).

Spark-native design (an Iceberg-shaped snapshot log on parquet — the
sandbox has no Iceberg runtime jar, but the layout mirrors Iceberg's
append-only snapshot model and the code is storage-agnostic):

- ``history/snapshot=N/*.parquet`` — ONLY the pairs first emitted by
  run N (append-only log; loading = union of all snapshots). At 100 TB
  this is the cheap side: each incremental run appends just its delta,
  and the anti-join build side is the full history read once.
- ``history/snapshot=N/_metrics.json`` — per-partition lineage +
  metrics (partition id, row count, key min/max) written beside the
  snapshot, so any partition's provenance is auditable and a resumed
  run can verify what landed without recomputation.

``differential()`` is a left_anti join on (feed_id, unique_id,
service_date). The history side is keyed the same way the exploded
connections are salted, and AQE handles residual skew.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materialize import materialize

PAIR_COLS = ("feed_id", "unique_id", "service_date")


@dataclass
class SnapshotInfo:
    snapshot_id: int
    path: str
    metrics: dict


class HistoryStore:
    """Parquet-backed append-only history of emitted
    (feed_id, unique_id, service_date) pairs."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- snapshot bookkeeping -------------------------------------------------

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            if d.startswith("snapshot="):
                # only committed snapshots count (metrics file = commit marker)
                if os.path.exists(os.path.join(self.path, d, "_metrics.json")):
                    out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def fresh(self) -> None:
        """--fresh semantics: drop all history (StopTimes2Cxs.js:18-21)."""
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)

    def load(self, before_snapshot: int | None = None) -> DataFrame | None:
        """Union of committed snapshots (optionally only those with id <
        ``before_snapshot`` — the streaming replay-determinism bound);
        None when empty."""
        snaps = self.snapshots()
        if before_snapshot is not None:
            snaps = [s for s in snaps if s < before_snapshot]
        if not snaps:
            return None
        paths = [os.path.join(self.path, f"snapshot={s}") for s in snaps]
        return self.spark.read.parquet(*paths).select(*PAIR_COLS)

    # -- the J7 operators ------------------------------------------------------

    def differential(
        self, connections: DataFrame, before_snapshot: int | None = None
    ) -> DataFrame:
        """Emit only connections whose (feed_id, unique_id, service_date)
        is not in history — the reference's per-rule date filter
        (st2c.js:149-164) as one left_anti join.

        ``before_snapshot`` restricts the history side to snapshots
        committed for EARLIER batches: a replayed streaming batch then
        recomputes exactly its original delta even if its own commit
        already landed (exactly-once output, streaming.py)."""
        hist = self.load(before_snapshot)
        if hist is None:
            return connections
        return connections.join(hist, list(PAIR_COLS), "left_anti")

    def commit(
        self,
        new_pairs: DataFrame,
        run_info: dict | None = None,
        snapshot_id: int | None = None,
    ) -> SnapshotInfo:
        """Append this run's newly-emitted pairs as the next snapshot,
        with per-partition lineage metrics beside the data. The metrics
        file doubles as the commit marker: a killed run leaves an
        uncommitted (ignored) directory, so resume never double-counts.

        An explicit ``snapshot_id`` (streaming: the micro-batch id) makes
        the commit IDEMPOTENT — a replayed batch overwrites its own
        snapshot with identical content instead of appending a new one."""
        if snapshot_id is None:
            snaps = self.snapshots()
            sid = (snaps[-1] + 1) if snaps else 0
        else:
            sid = snapshot_id
        snap_dir = os.path.join(self.path, f"snapshot={sid}")
        pairs = new_pairs.select(*PAIR_COLS).distinct()
        pairs.write.mode("overwrite").parquet(snap_dir)

        part_stats = (
            self.spark.read.parquet(snap_dir)
            .withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("unique_id").alias("min_key"),
                F.max("unique_id").alias("max_key"),
                F.countDistinct("feed_id").alias("n_feeds"),
            )
            .collect()
        )
        metrics = {
            "snapshot_id": sid,
            "committed_at_unix": time.time(),
            "total_rows": int(sum(r["rows"] for r in part_stats)),
            "partitions": [
                {
                    "partition_id": int(r["_pid"]),
                    "rows": int(r["rows"]),
                    "min_key": r["min_key"],
                    "max_key": r["max_key"],
                    "n_feeds": int(r["n_feeds"]),
                }
                for r in sorted(part_stats, key=lambda r: r["_pid"])
            ],
            "run_info": run_info or {},
        }
        with open(os.path.join(snap_dir, "_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        return SnapshotInfo(sid, snap_dir, metrics)


def convert_incremental(
    connections: DataFrame,
    store: HistoryStore,
    fresh: bool = False,
    run_info: dict | None = None,
) -> tuple[DataFrame, SnapshotInfo]:
    """Full incremental conversion step: anti-join against history, emit
    the delta, commit it as a new snapshot. Returns (delta, snapshot).

    The delta is materialized ONCE (``materialize``, strategy set by
    spark.gtfs2lc.materialize — local checkpoint in the sandbox,
    reliable checkpoint / parquet staging on a cluster) before the
    commit: it has two consumers — the snapshot write here and the
    caller's output write — and without the cut each would re-execute
    the whole extraction+conversion+anti-join DAG (the streaming path
    applies the same fix in process_pages_batch).
    """
    if fresh:
        store.fresh()
    delta = materialize(store.differential(connections), "j7-delta")
    snap = store.commit(delta, run_info)
    return delta, snap
