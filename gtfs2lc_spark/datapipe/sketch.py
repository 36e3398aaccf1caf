"""Probabilistic membership sketches as pure DataFrame algebra: a
distributed Bloom-style bitmap filter and the lossless semi-join
prefilter built on it.

Why this exists at 100 TB: a selective semi-join (``fact ⋉ keys``)
normally shuffles the ENTIRE fact side on the join key before any row
can be dropped. A Bloom bitmap built over the key side is tiny (at most
``m_bits/64`` rows of ``(word_idx, bits)`` regardless of key count), so
it broadcasts to every fact partition and drops non-members BEFORE the
exchange — the same runtime-filter idea Spark's optimizer applies with
``spark.sql.optimizer.runtime.bloomFilter.enabled``, made explicit so
it (a) is deterministic and plan-testable, (b) survives stages the
optimizer will not push through (Python UDF boundaries, custom sources),
and (c) composes with the exact confirm join into a LOSSLESS operator:
the bitmap may pass false positives, never false negatives, and the
confirm semi-join removes the false positives on the (already pruned)
survivor set.

The bitmap is an ordinary DataFrame — no driver-side sketch object, no
collect: build is one skinny shuffle of ``n_keys * k`` (word, bit)
pairs combined map-side by ``bit_or``; probe is ``k`` broadcast hash
joins on ``word_idx`` plus a codegen'd bit test, zero exchanges on the
probed side.

False-positive rate ≈ (1 - e^(-k*n/m))^k; with the default
``m_bits=2^22, k=2`` and n=100k keys it is ~3e-3 — the confirm join
sees 0.3% of the non-matching fact rows instead of 100%.

gtfs2lc parity note: the reference is single-process and joins via
in-memory Maps (SURVEY.md §1.2); membership prefilters are purely a
distributed-scale concern of this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions in [0, m_bits) via seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(int(m_bits))) for i in range(int(k))
    ]


def _bit_mask(pos_col: str) -> Column:
    # single-bit long mask from a staged position column; PySpark's
    # shiftleft() binding only accepts a literal shift, so SQL expr
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} & 63 AS INT))"
    )


def _check_params(m_bits: int, k: int) -> None:
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8], got {k}")


def bitmap_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 22,
    k: int = 2,
) -> DataFrame:
    """Bloom bitmap over ``keys[key_col]`` as ``(word_idx: long,
    bits: long)`` rows — only words with at least one set bit are
    present, so the result has at most ``min(n_keys*k, m_bits/64)``
    rows (32 KiB of longs per 2^21 bits) and broadcasts trivially.

    One narrow shuffle: keys explode to ``k`` (word_idx, mask) pairs,
    ``bit_or`` combines map-side, the reduce side sees at most
    ``m_bits/64`` groups. NULL keys are skipped (a NULL never equi-joins,
    so membership is irrelevant for the semi-join use)."""
    _check_params(m_bits, k)
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("_pos")
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("_pos"), 6).alias("word_idx"),
            _bit_mask("_pos").alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = 1 << 22,
    k: int = 2,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` is POSSIBLY in the key
    set the bitmap was built from (same ``m_bits``/``k`` required).
    May pass false positives; never drops a true member. NULL keys are
    dropped (they cannot equi-join).

    Plan shape: ``k`` broadcast hash joins on ``word_idx`` + a bit test
    each — the probed side never shuffles."""
    _check_params(m_bits, k)
    key = F.col(key_col).cast("string")
    out = df.where(F.col(key_col).isNotNull())
    for i, pos in enumerate(_positions(key, m_bits, k)):
        w, p, m, b = f"_bw{i}", f"_bp{i}", f"_bm{i}", f"_bb{i}"
        bm = F.broadcast(
            bitmap.select(F.col("word_idx").alias(w), F.col("bits").alias(b))
        )
        out = (
            out.withColumn(p, pos)
            .withColumn(w, F.shiftright(F.col(p), 6))
            .withColumn(m, _bit_mask(p))
            .join(bm, w, "left")
            .where(F.col(b).isNotNull() & (F.col(b).bitwiseAND(F.col(m)) != 0))
            .drop(w, p, m, b)
        )
    return out


def bloom_semi_join(
    df: DataFrame,
    df_key: str,
    keys: DataFrame,
    keys_key: str,
    m_bits: int = 1 << 22,
    k: int = 2,
) -> DataFrame:
    """LOSSLESS semi-join ``df ⋉ keys`` with a Bloom-bitmap prefilter:
    exactly the rows a plain ``left_semi`` join would keep, but the
    fact side is pruned by ``k`` broadcast bit-test joins before any
    key-hash exchange, so the confirm join (which removes the bitmap's
    false positives) shuffles only survivors.

    Columns of ``df`` pass through unchanged.

    Raises ``ValueError`` when the two key columns have different
    data types: the bitmap hashes the string rendering of the key, so
    a DOUBLE 5.0 probing a bitmap built from BIGINT 5 would miss
    ('5.0' vs '5') and silently DROP a row the plain semi-join's
    numeric coercion would keep — align the types explicitly first."""
    df_t = dict(df.dtypes)[df_key]
    keys_t = dict(keys.dtypes)[keys_key]
    if df_t != keys_t:
        raise ValueError(
            f"bloom_semi_join key types differ: {df_key}:{df_t} vs "
            f"{keys_key}:{keys_t}; cast one side first (string-hash "
            "membership would silently drop coercible matches)"
        )
    bitmap = bitmap_build(keys.select(keys_key), keys_key, m_bits=m_bits, k=k)
    survivors = bloom_probe(df, df_key, bitmap, m_bits=m_bits, k=k)
    rhs = keys.select(F.col(keys_key).alias(df_key)).where(
        F.col(df_key).isNotNull()
    )
    return survivors.join(rhs, df_key, "left_semi")
