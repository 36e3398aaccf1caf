"""Context-length chunking and sequence packing — the bookkeeping a
training-data pipeline runs between a cleaned corpus and a tokenized
training stream.

Two operators:

* :func:`doc_chunks` — split each document into fixed token-budget
  windows (context-length chunking). Narrow per-row work: tokenize,
  enumerate chunk indices, slice. No shuffle at all — the chunk
  explosion factor is bounded by document length, so a 100-TB corpus
  chunks in one embarrassingly parallel scan.

* :func:`seq_pack` — concatenate documents into fixed token-budget
  training sequences and emit the (doc, sequence) span map. Packing is
  a prefix sum, which is inherently ordered — a single global
  ``Window.orderBy`` would funnel the corpus through ONE reducer. Real
  data-parallel training does not pack globally: each worker packs its
  own shard. We mirror that — documents are routed to ``n_shards``
  deterministic hash shards and packed independently per shard, so the
  window is ``partitionBy(shard)`` and every shard packs in parallel.
  At cluster scale ``n_shards`` is the data-parallel world size (or any
  multiple); the output sequence identity is (shard, seq_in_shard).

Determinism: document order within a shard is (hash, doc_id) — a
reproducible shuffle, the same property :func:`text.hash_split` pins
for split routing. Hashes are the engine-portable md5-derived family
(``dedup.portable_hash60``) when ``hash_fn='md5'`` so the DuckDB gate
oracle can re-derive identical shards/order/spans; production defaults
to xxhash64 (JVM-native).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash60
from .text import token_count


def _order_hash(c, hash_fn: str):
    if hash_fn == "md5":
        return portable_hash60(c)
    return F.xxhash64(c)


def doc_chunks(
    df: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into consecutive ``chunk_tokens``-sized
    windows of whitespace tokens (the final chunk is short). Emits
    ``(id_col, chunk_id, n_chunk_tokens, chunk_text)``; documents with
    zero tokens emit no rows.

    Whole plan is narrow (tokenize → sequence → explode → slice): zero
    shuffles, bounded per-row fan-out — the shape survives any scale.
    ``sequence`` is guarded by the ``n_tok > 0`` filter (Spark's
    ``sequence(1, 0)`` counts DOWN, it is not empty).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    c = F.lit(chunk_tokens)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.select(
            F.col(id_col),
            token_count(F.col(text_col)).alias("_n_tok"),
            toks.alias("_toks"),
        )
        .where(F.col("_n_tok") > 0)
    )
    n_chunks = F.ceil(F.col("_n_tok") / c).cast("long")
    return (
        base.select(
            id_col,
            "_n_tok",
            "_toks",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.least(c.cast("long"), F.col("_n_tok") - F.col("chunk_id") * c)
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(
                    F.col("_toks"),
                    (F.col("chunk_id") * c + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def seq_pack(
    df: DataFrame,
    seq_tokens: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pack documents into fixed ``seq_tokens``-budget training
    sequences, independently per hash shard, and emit the span map:
    one row per (document, sequence it occupies) with

      shard            deterministic hash shard (0..n_shards-1)
      seq_id           sequence index within the shard
      doc_id           the document
      doc_tok_start    first token of the document landing in this seq
      seq_tok_start    offset of those tokens within the sequence
      n_span_tokens    how many of the document's tokens land here

    Documents are concatenated in (order_hash, id) order within their
    shard; a document longer than the remaining budget spills into the
    next sequence(s) — GPT-style stream packing, no padding, no
    truncation. Zero-token documents are dropped (they occupy no
    tokens).

    Scale shape: one hash-partitioned shuffle to ``n_shards`` window
    partitions, a per-shard prefix sum, then a narrow per-row explode
    over the (first_seq..last_seq) range. No global ordering, no
    single-reducer stage; shards pack in parallel exactly like
    data-parallel loader workers.
    """
    if seq_tokens < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    b = F.lit(seq_tokens).cast("long")
    h = _order_hash(F.col(id_col).cast("string"), hash_fn)
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("_n_tok"),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
        h.alias("_h"),
    ).where(F.col("_n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("_n_tok").over(w), F.lit(0).cast("long"))
    spanned = base.select(
        "shard",
        id_col,
        "_n_tok",
        start.alias("_start"),
        (start + F.col("_n_tok")).alias("_end"),
    )
    first_seq = (F.col("_start") / b).cast("long")
    last_seq = ((F.col("_end") - 1) / b).cast("long")
    seq_lo = F.col("seq_id") * b
    seq_hi = seq_lo + b
    return (
        spanned.select(
            "shard",
            id_col,
            "_n_tok",
            "_start",
            "_end",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            "shard",
            "seq_id",
            id_col,
            (F.greatest(F.col("_start"), seq_lo) - F.col("_start")).alias(
                "doc_tok_start"
            ),
            (F.greatest(F.col("_start"), seq_lo) - seq_lo).alias(
                "seq_tok_start"
            ),
            (
                F.least(F.col("_end"), seq_hi)
                - F.greatest(F.col("_start"), seq_lo)
            ).alias("n_span_tokens"),
        )
    )
