"""Layer A — GTFS content detection/extraction from web pages.

Input: Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``
(BASELINE.json input_hint). A page carries one embedded GTFS file when
its first line is ``#gtfs-file: <name> feed=<feed_id>`` followed by raw
CSV (FIXTURES.md §1).

Design for 100 TB:

1. A cheap JVM-side prefilter (``startswith`` on ``text``) prunes the
   overwhelming non-GTFS majority before any Python runs; with parquet/
   Iceberg sources only the ``url``/``text`` columns are read at all
   (column pruning), and the filter is codegen'd.
2. Detection itself is a **vectorized pandas UDF** (input_hint mandates
   Arrow/pandas, never per-row Python): pure string function of
   ``text`` — byte-identical output per url, run-to-run (the per-row
   invariant; tested in tests/test_extraction.py).
3. CSV parsing is back on the JVM: split body into lines, explode,
   ``from_csv`` with the pinned all-string schema — whole-stage
   codegen, proper quote handling, zero Python in the per-row hot path.

Pages whose header deviates from the canonical GTFS header are counted
and dropped (no silent reorder); the reference likewise assumes
fast-csv's header row (lib/stores/StoreManager.js:38-41).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .fixtures import GTFS_MARKER
from .schemas import GTFS_FILE_COLS

_DETECT_SCHEMA = T.StructType(
    [
        T.StructField("gtfs_file", T.StringType(), True),
        T.StructField("feed_id", T.StringType(), True),
        T.StructField("header", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
    ]
)

_MARKER_RE = r"^#gtfs-file:\s+(\S+)\s+feed=(\S+)$"


@pandas_udf(_DETECT_SCHEMA)
def detect_gtfs(text: pd.Series) -> pd.DataFrame:
    """Vectorized detector: marker line -> (gtfs_file, feed_id, header, body).

    Pure function of ``text``; non-matching pages yield all-null.
    """
    text = text.fillna("")
    head = text.str.partition("\n")
    marker, rest = head[0], head[2]
    m = marker.str.extract(_MARKER_RE)
    hit = m[0].notna()
    body_split = rest.str.partition("\n")
    header = body_split[0].where(hit)
    body = body_split[2].where(hit)
    return pd.DataFrame(
        {
            "gtfs_file": m[0],
            "feed_id": m[1],
            "header": header,
            "body": body,
        }
    )


def detect_pages(pages: DataFrame, detect_partitions: int | None = None) -> DataFrame:
    """pages -> (url, gtfs_file, feed_id, header, body) for GTFS pages only.

    ``detect_partitions`` bounds the pandas-UDF stage's task count
    (default: the session's defaultParallelism). Every Python task costs
    a worker spin-up (pandas import ≈ 1.5 s CPU), so the UDF stage
    should run exactly one task per core — the cheap JVM prefilter can
    stay as parallel as the scan likes.
    """
    prefiltered = pages.where(F.col("text").startswith(GTFS_MARKER)).select(
        "url", "text"
    )
    n = detect_partitions or pages.sparkSession.sparkContext.defaultParallelism
    prefiltered = prefiltered.repartition(n)
    return (
        prefiltered.withColumn("g", detect_gtfs("text"))
        .where(F.col("g.gtfs_file").isNotNull())
        .select("url", "g.gtfs_file", "g.feed_id", "g.header", "g.body")
    )


def extract_entities(
    pages: DataFrame, persist: bool = True, detect_partitions: int | None = None
) -> dict[str, DataFrame]:
    """pages -> {entity name: all-string DataFrame + feed_id/url lineage}.

    Missing optional files (calendar/calendar_dates) simply produce
    empty DataFrames, matching the reference's empty-stream substitution
    (lib/stores/StoreManager.js:56,72-75).

    ``persist`` (default) materializes the detected-pages intermediate
    ONCE via an eager localCheckpoint. Two reasons, both load-bearing:

    1. Catalyst does not share common sub-plans: the six entity
       lineages (and every downstream job) would each re-run the pages
       scan + detection.
    2. A plain .persist() still keeps the ArrowEvalPython stage in
       every downstream plan; each job then pays Python-worker
       round-trips per task even on cache hits. Checkpointing CUTS the
       lineage — downstream plans scan plain cached blocks, fully
       JVM-side (measured ~15x faster end-to-end at bench scale).

    The detected set is ~10^3-10^6x smaller than the pages table; on a
    real cluster the equivalent is writing it to a parquet/Iceberg
    staging table — the reference's own "rule shard" checkpoint
    (SURVEY.md §3.1 step 3).
    """
    detected = detect_pages(pages, detect_partitions)
    if persist:
        detected = detected.localCheckpoint(eager=True)
    return entities_from_detected(detected)


def entities_from_detected(detected: DataFrame) -> dict[str, DataFrame]:
    """Detected pages (url, gtfs_file, feed_id, header, body) -> entity
    DataFrames. Pure JVM stage (split/explode/from_csv) — reusable over
    a staged detected-pages table (streaming) as well as fresh
    detection output."""
    out: dict[str, DataFrame] = {}
    for fname, cols in GTFS_FILE_COLS.items():
        canonical_header = ",".join(cols)
        sub = detected.where(
            (F.col("gtfs_file") == fname) & (F.col("header") == canonical_header)
        )
        schema_ddl = ", ".join(f"`{c}` STRING" for c in cols)
        lines = sub.select(
            "feed_id",
            "url",
            F.explode(F.split("body", "\n")).alias("line"),
        ).where(F.length(F.trim("line")) > 0)
        # GTFS quoting: '"' both as quote and as the "" escape
        # (reference: fast-csv with quote '"', StopTimes2Cxs.js:31-33)
        parsed = lines.withColumn(
            "r", F.from_csv("line", schema_ddl, {"quote": '"', "escape": '"'})
        )
        out[fname.removesuffix(".txt")] = parsed.select(
            *[F.coalesce(F.col(f"r.{c}"), F.lit("")).alias(c) for c in cols],
            "feed_id",
            "url",
        )
    return out
