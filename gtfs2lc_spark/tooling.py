"""Build-tooling operators (P13/P14 — reference's dataset-config and
SNCB build helpers), as column expressions so they also work in bulk."""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def slugify(name: str, max_len: int = 80) -> str:
    """P13: NFKD fold, non-alphanumerics -> '-', collapse, cap length
    (reference lib/DatasetConfiguration.js:3-11)."""
    folded = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode()
    slug = re.sub(r"-{2,}", "-", re.sub(r"[^A-Za-z0-9]+", "-", folded)).strip("-")
    return slug[:max_len].lower()


def slugify_col(c: Column, max_len: int = 80) -> Column:
    """Column form of P13 (ASCII inputs; full NFKD fold needs the
    driver-side slugify())."""
    slug = F.regexp_replace(c, r"[^A-Za-z0-9]+", "-")
    slug = F.regexp_replace(slug, r"-{2,}", "-")
    slug = F.regexp_replace(slug, r"^-|-$", "")
    return F.lower(F.substring(slug, 1, max_len))


def validate_namespace(ns: str) -> None:
    """P13: HTTP(S)-only namespace check
    (reference lib/DatasetConfiguration.js:53-76)."""
    if not re.match(r"^https?://\S+$", ns):
        raise ValueError(f"Invalid namespace (must be http(s) URI): {ns}")


def constrain_calendar(
    calendar: DataFrame,
    calendar_dates: DataFrame,
    start: str,
    end: str,
) -> tuple[DataFrame, DataFrame]:
    """P14: clamp calendars to [start, end] (yyyyMMdd) and drop
    out-of-window rows/exceptions (reference scripts/build-sncb.js:120-136):
    calendars entirely outside the window are dropped; surviving ones get
    start/end clamped; calendar_dates filtered to the window."""
    cal = (
        calendar.where(
            (F.col("end_date") >= start) & (F.col("start_date") <= end)
        )
        .withColumn("start_date", F.greatest("start_date", F.lit(start)))
        .withColumn("end_date", F.least("end_date", F.lit(end)))
    )
    cd = calendar_dates.where((F.col("date") >= start) & (F.col("date") <= end))
    return cal, cd
