"""SparkSession factory tuned for the Linked Connections engine.

Scale posture (local[32] here; the same settings are what we'd submit on
a 1000-executor cluster, with shuffle partitions sized to the data):

- AQE on (runtime coalescing + skew-join splitting — mega-trip skew after
  the service-day explode is the known hot spot, SURVEY.md §4).
- Session timezone pinned to UTC: all GTFS local-time interpretation is
  done explicitly via ``to_utc_timestamp(feed_tz)``, so rendering with
  ``date_format`` is always the reference's ``Date.toISOString()`` form.
- Arrow enabled for the pandas-UDF extraction layer (input_hint mandates
  vectorized Arrow/pandas UDFs, never per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "gtfs2lc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r6 negative result (guide §1.2 — config only with
        # measurement): lowering skewJoin.skewedPartitionThresholdInBytes
        # / advisoryPartitionSizeInBytes to make AQE split the explosive
        # rule x service-date join was measured SLOWER (1m/1m: 10.2 s vs
        # 8.1 s default on the 60k-rule skew join) — input-byte
        # detection cannot price a 180x output fan-out, and sub-MB
        # advisory sizes fragment every other exchange. Defaults kept;
        # explicit salting (skew.salted_join / pipeline salt_n) remains
        # the fix for that shape, as PLANS.md documents.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # python workers cost ~1.5s CPU each to import pandas; reuse them
        .config("spark.python.worker.reuse", "true")
        # dimension tables (stops/routes/trips/services) are always small
        # relative to stop_times/pages; raise the broadcast ceiling a bit.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # wide codegen'd plans overflow the default 240m code cache and
        # stall JIT compilation (measured: first big run 66s -> 8s with
        # these); throughput GC suits the string-heavy batch workload
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:CICompilerCount=12 -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
