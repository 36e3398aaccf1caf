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


def detect_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, gtfs_file, feed_id, header, body) for GTFS pages only."""
    prefiltered = pages.where(F.col("text").startswith(GTFS_MARKER)).select(
        "url", "text"
    )
    return (
        prefiltered.withColumn("g", detect_gtfs("text"))
        .where(F.col("g.gtfs_file").isNotNull())
        .select("url", "g.gtfs_file", "g.feed_id", "g.header", "g.body")
    )


def extract_entities(pages: DataFrame) -> dict[str, DataFrame]:
    """pages -> {entity name: all-string DataFrame + feed_id/url lineage}.

    Missing optional files (calendar/calendar_dates) simply produce
    empty DataFrames, matching the reference's empty-stream substitution
    (lib/stores/StoreManager.js:56,72-75).
    """
    detected = detect_pages(pages)
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
        parsed = lines.withColumn("r", F.from_csv("line", schema_ddl))
        out[fname.removesuffix(".txt")] = parsed.select(
            *[F.coalesce(F.col(f"r.{c}"), F.lit("")).alias(c) for c in cols],
            "feed_id",
            "url",
        )
    return out
