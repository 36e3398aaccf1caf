"""Context-length chunking and sequence packing (datapipe.packing)."""

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark.datapipe import packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunks_sizes_and_reassembly(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e"),          # 5 tokens -> [2, 2, 1]
            (2, "x y"),                # exact single chunk
            (3, ""),                   # no tokens -> no rows
            (4, "   "),                # whitespace only -> no rows
            (5, "only"),               # 1 token
        ],
    )
    out = packing.doc_chunks(df, chunk_tokens=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 5}
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in c1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in c1] == [2, 2, 1]
    # chunks reassemble to the original token stream
    assert " ".join(r.chunk_text for r in c1) == "a b c d e"
    assert by_doc[2][0].chunk_text == "x y"
    assert by_doc[5][0].n_chunk_tokens == 1


def test_doc_chunks_token_conservation(spark):
    df = _docs(
        spark, [(i, " ".join(f"t{j}" for j in range(i * 3 + 1))) for i in range(20)]
    )
    out = packing.doc_chunks(df, chunk_tokens=7)
    got = {
        r.doc_id: r.s
        for r in out.groupBy("doc_id").agg(F.sum("n_chunk_tokens").alias("s")).collect()
    }
    assert got == {i: i * 3 + 1 for i in range(20)}


def test_doc_chunks_validates(spark):
    with pytest.raises(ValueError, match="chunk_tokens"):
        packing.doc_chunks(_docs(spark, [(1, "a")]), chunk_tokens=0)


def test_seq_pack_spans(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 23))) for i in range(60)]
    rows.append((100, ""))  # zero-token doc occupies no span
    df = _docs(spark, rows)
    b = 16
    out = packing.seq_pack(df, seq_tokens=b, n_shards=3, hash_fn="md5").collect()
    assert all(r.doc_id != 100 for r in out)
    # per-document token conservation across spans
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, 0)
        per_doc[r.doc_id] += r.n_span_tokens
    expect = {i: 5 + (i * 7) % 23 for i in range(60)}
    assert per_doc == expect
    # every sequence except the last of each shard is exactly full, and
    # spans tile each sequence contiguously from offset 0
    seqs = {}
    for r in out:
        seqs.setdefault((r.shard, r.seq_id), []).append(r)
    last = {s: max(q for (sh, q) in seqs if sh == s) for s in {sh for sh, _ in seqs}}
    for (shard, seq_id), spans in seqs.items():
        spans.sort(key=lambda r: r.seq_tok_start)
        total = sum(r.n_span_tokens for r in spans)
        if seq_id < last[shard]:
            assert total == b, (shard, seq_id, total)
        else:
            assert 0 < total <= b
        pos = 0
        for r in spans:
            assert r.seq_tok_start == pos
            assert r.n_span_tokens >= 1
            pos += r.n_span_tokens
    # a doc's spans are contiguous in doc-token space starting at 0
    starts = {}
    for r in out:
        starts.setdefault(r.doc_id, []).append((r.seq_id, r.doc_tok_start, r.n_span_tokens))
    for doc_id, sp in starts.items():
        sp.sort()
        pos = 0
        for _, doc_start, n in sp:
            assert doc_start == pos
            pos += n
        assert pos == expect[doc_id]


def test_seq_pack_single_shard_matches_manual_pack(spark):
    """n_shards=1 is plain stream packing: verify against a driver-side
    re-pack in the same deterministic order."""
    import hashlib

    rows = [(i, " ".join("x" * 1 for _ in range(3 + i % 5))) for i in range(25)]
    df = _docs(spark, rows)
    out = packing.seq_pack(df, seq_tokens=10, n_shards=1, hash_fn="md5").collect()

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    order = sorted(range(25), key=lambda i: (h60(str(i)), i))
    manual = []
    pos = 0
    for i in order:
        n = 3 + i % 5
        start = pos
        end = pos + n
        for seq in range(start // 10, (end - 1) // 10 + 1):
            lo, hi = max(start, seq * 10), min(end, seq * 10 + 10)
            manual.append((0, seq, i, lo - start, lo - seq * 10, hi - lo))
        pos = end
    got = sorted((r.shard, r.seq_id, r.doc_id, r.doc_tok_start, r.seq_tok_start, r.n_span_tokens) for r in out)
    assert got == sorted(manual)


def test_seq_pack_validates(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="seq_tokens"):
        packing.seq_pack(df, seq_tokens=0, n_shards=1)
    with pytest.raises(ValueError, match="n_shards"):
        packing.seq_pack(df, seq_tokens=8, n_shards=0)
