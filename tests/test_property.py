"""Property-based tests (hypothesis): the operators with the richest
edge-case structure — duplicated-span detection, interval joins,
stratified sampling — checked against brute-force reference models on
randomized inputs. Few examples (Spark jobs are ~1 s each), but each
example exercises merging/boundary structure no hand fixture would."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gtfs2lc_spark.datapipe import dedup, events, text

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _brute_spans(texts: dict, L: int):
    """Reference model: all duplicated L-gram positions (corpus-wide,
    overlap-counted within a doc too), merged into maximal intervals."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            counts[t[i : i + L]] += 1
    want = set()
    for did, t in texts.items():
        dup_pos = [
            i + 1
            for i in range(len(t) - L + 1)
            if counts[t[i : i + L]] > 1
        ]
        spans = []
        for p in dup_pos:
            if spans and p - spans[-1][1] <= L:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        for a, b in spans:
            want.add((did, a, b + L - 1, b + L - a))
    return want


@_SET
@given(
    texts=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=24), min_size=1, max_size=5
    ),
    L=st.integers(min_value=3, max_value=6),
)
def test_duplicated_spans_matches_brute_force(spark, texts, L):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in dedup.duplicated_spans(df, min_len=L).collect()
    }
    assert got == _brute_spans(dict(rows), L)


@_SET
@given(
    ls=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)),
        min_size=1,
        max_size=8,
    ),
    rs=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)),
        min_size=1,
        max_size=8,
    ),
    bucket=st.integers(min_value=7, max_value=300),
)
def test_interval_overlap_join_matches_brute_force(spark, ls, rs, bucket):
    left = spark.createDataFrame(
        [(i, a, a + w) for i, (a, w) in enumerate(ls)],
        ["lid", "l_start", "l_end"],
    )
    right = spark.createDataFrame(
        [(i, a, a + w) for i, (a, w) in enumerate(rs)],
        ["rid", "r_start", "r_end"],
    )
    got = {
        (r["lid"], r["rid"])
        for r in events.interval_overlap_join(
            left, right, bucket_seconds=bucket
        ).collect()
    }
    want = {
        (i, j)
        for i, (a, w) in enumerate(ls)
        for j, (b, v) in enumerate(rs)
        if a <= b + v and b <= a + w
    }
    assert got == want


@_SET
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
    frac=st.floats(min_value=0.05, max_value=0.95),
)
def test_stratified_sample_exact_ceil_everywhere(spark, sizes, frac):
    rows = []
    i = 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i, f"s{s}"))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    by = {
        r["lang"]: r["n"]
        for r in text.stratified_sample(df, strata_col="lang", fraction=frac)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by == {f"s{s}": math.ceil(n * frac) for s, n in enumerate(sizes)}


@_SET
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta eta".split()),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_setsim_join_matches_brute_force(spark, docs, threshold):
    """Prefix-filter losslessness: the AllPairs/PPJoin self-join must
    return exactly the brute-force token-Jaccard pairs at the
    threshold — across random small-vocab corpora where prefixes,
    length filters, and df-ordering all get exercised."""
    from gtfs2lc_spark.datapipe import dedup as dd

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.setsim_join(df, threshold=threshold).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = set(a.split()) - {""}, set(b.split()) - {""}
            if not sa or not sb:
                continue
            jac = round(len(sa & sb) / len(sa | sb), 6)
            if jac >= threshold:
                want[(i, j)] = jac
    assert got == want


@_SET
@given(
    fact_keys=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=40),
    key_set=st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=15),
    m_bits=st.sampled_from([64, 256, 1 << 12]),
    k=st.integers(min_value=1, max_value=3),
)
def test_bloom_semi_join_equals_semi_join_property(spark, fact_keys, key_set, m_bits, k):
    """bloom_semi_join is LOSSLESS for every (m_bits, k), including a
    64-bit saturated bitmap where correctness rides on the confirm."""
    from gtfs2lc_spark.datapipe import sketch

    big = spark.createDataFrame(
        [(kk, i) for i, kk in enumerate(fact_keys)], "key long, v long"
    )
    keys = spark.createDataFrame([(kk,) for kk in key_set] or [(None,)], "k long")
    got = sorted(
        (r["key"], r["v"])
        for r in sketch.bloom_semi_join(big, "key", keys, "k",
                                        m_bits=m_bits, k=k).collect()
    )
    want = sorted(
        (kk, i) for i, kk in enumerate(fact_keys) if kk in set(key_set)
    )
    assert got == want


@_SET
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # group
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=40,
    ),
    ps=st.tuples(st.integers(1, 49), st.integers(51, 100)),
)
def test_winsorize_bounds_property(spark, rows, ps):
    """Clipped values always lie inside the group's exact disc
    [p_lo, p_hi]; unclipped rows pass through identical; row count
    preserved."""
    from gtfs2lc_spark.datapipe import text as t

    lo_p, hi_p = ps
    df = spark.createDataFrame(
        [(i, f"g{g}", v) for i, (g, v) in enumerate(rows)],
        "doc_id long, lang string, n_chars long",
    )
    out = t.winsorize(df, lower_p=lo_p, upper_p=hi_p).collect()
    assert len(out) == len(rows)
    # brute-force disc quantile model
    import math
    from collections import defaultdict

    vals = defaultdict(list)
    for g, v in rows:
        vals[f"g{g}"].append(v)
    for r in out:
        sv = sorted(vals[r["group"]])
        n = len(sv)
        qlo = sv[math.ceil(lo_p * n / 100) - 1]
        qhi = sv[math.ceil(hi_p * n / 100) - 1]
        assert r["clipped"] == min(max(r["value"], qlo), qhi)
        assert r["was_clipped"] == (r["clipped"] != r["value"])
