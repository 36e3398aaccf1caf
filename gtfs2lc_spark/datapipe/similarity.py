"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exactness baseline. The query side is
  small and broadcast; the corpus never shuffles; top-k per query via
  window over the (queries x corpus) product restricted to the
  broadcast join.
- LSH-bucketed ANN (random hyperplanes): deterministic signed
  projections -> bucket id -> candidates only within bucket (+ optional
  multi-probe via allowing b-1 matching bands). The scale path: the
  corpus is hashed once (narrow), bucketed (one shuffle), and probes
  touch single buckets.

All vector math is F.zip_with/F.aggregate on double arrays —
JVM-side, no UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query (excluding self).

    Output: (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # rank on the ROUNDED value: sub-ulp float differences between
            # engines must not flip the ordering (oracle parity)
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as a long bucket id (bit p = sign of
    <vec, plane_p>). Planes are literal arrays -> constant-folded."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        bit = (dot(vec, lit_plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket(s). Recall grows with smaller n_planes (bigger buckets) and
    with multi-probe: ``n_probes`` > 1 additionally searches the buckets
    whose signature differs in one bit (nearest Hamming neighbors) — the
    standard multi-probe LSH recall/cost dial. The corpus is hashed and
    bucketed ONCE regardless of probe count; only the small broadcast
    query side fans out."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("bucket0", lsh_bucket(F.col("qvec"), planes))
    probe_offsets = [0] + [1 << b for b in range(min(max(n_probes - 1, 0), n_planes))]
    q = q.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(*[F.col("bucket0").bitwiseXOR(F.lit(o)) for o in probe_offsets])
            )
        ),
    ).drop("bucket0")
    scored = (
        F.broadcast(q)
        .join(c, on=["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means for IVF coarse quantization.

    Init = the ``n_centroids`` lowest-id vectors (reproducible, no RNG);
    each iteration is one narrow codegen'd assignment pass (cosine to
    centroid literals) + one groupBy-k aggregation of per-dimension
    means (map-side partial agg: only k x dim partials ever shuffle).
    The driver holds k x dim floats — never corpus rows. Empty clusters
    keep their previous centroid.

    Driver-traffic bound: the seeding ``take(n_centroids)`` is a
    TakeOrderedAndProject whose driver merge receives each scan
    partition's local bottom-k — O(P x n_centroids) rows. A coarse
    quantizer keeps n_centroids small by construction (16-1024, ~sqrt
    of the list count you want), so even at P~1e5 the merge stays in
    the tens of MB; it does NOT grow with corpus rows.
    """
    first = corpus.select(vec_col).orderBy(id_col).take(n_centroids)
    cents = [[float(x) for x in r[0]] for r in first]
    dim = len(cents[0])
    v = corpus.select(as_double(F.col(vec_col)).alias("v"))
    for _ in range(iters):
        scores = F.array(
            *[
                F.struct(
                    cosine(F.col("v"), F.array(*[F.lit(x) for x in c])).alias("s"),
                    F.lit(ci).alias("c"),
                )
                for ci, c in enumerate(cents)
            ]
        )
        assigned = v.withColumn("cluster", F.array_max(scores)["c"])
        means = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(F.element_at("v", i + 1)).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        new_cents = list(cents)
        for r in means:
            new_cents[r["cluster"]] = [float(r[f"m{i}"]) for i in range(dim)]
        cents = new_cents
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_init: str = "first",
    kmeans_iters: int = 3,
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus partitioned into inverted
    lists by nearest centroid; queries probe only their ``n_probe``
    closest lists, then score exactly within them.

    ``centroid_init='first'`` (the gate config) takes the
    ``n_centroids`` lowest-id vectors — deterministic AND
    engine-reproducible, so the DuckDB oracle recomputes the identical
    assignment. ``centroid_init='kmeans'`` (production default quality)
    runs ``kmeans_iters`` deterministic Lloyd rounds on top of that init
    — still fully reproducible (no RNG), verified by recall bounds in
    tests/test_datapipe.py rather than a SQL oracle (mirroring Lloyd
    float means in SQL would be rounding-fragile). Scale shape:
    centroids broadcast as literals; corpus assignment is one narrow
    codegen'd pass; only list-local candidates are ever scored.
    """
    if centroid_init == "kmeans":
        cvecs = kmeans_centroids(corpus, n_centroids, kmeans_iters, id_col, vec_col)
        cents = list(enumerate(cvecs))
    else:
        cents = [
            (r[0], [float(x) for x in r[1]])
            for r in corpus.select(id_col, vec_col).orderBy(id_col).take(n_centroids)
        ]

    def scores(vec: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.round(cosine(vec, F.array(*[F.lit(x) for x in cvec])), 6).alias("s"),
                    F.lit(ci).alias("c"),
                )
                for ci, (_cid, cvec) in enumerate(cents)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("cluster", F.array_max(scores(F.col("cvec")))["c"])

    probe_arr = F.slice(
        F.reverse(F.array_sort(scores(F.col("qvec")))), 1, n_probe
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
        )
        .withColumn("cluster", F.explode(F.transform(probe_arr, lambda s: s["c"])))
    )
    scored = (
        F.broadcast(q)
        .join(c, on=["cluster"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 7,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs with cosine >= threshold (id_a < id_b).

    Default (scale) path: multi-table hyperplane-LSH blocking — each
    vector is hashed into ``n_tables`` independent sign-signature
    buckets (one narrow codegen'd pass, explode x n_tables), candidate
    pairs come from EQUI-joins within (table, bucket) only, then exact
    cosine verifies. Recall for pairs at angle θ is
    1-(1-(1-θ/π)^n_planes)^n_tables (≈0.997 at cosine 0.98 with 6
    planes x 4 tables); the planes are deterministic, so the gate
    oracle replicates the candidate set exactly. NO all-pairs join
    exists in this plan (asserted by tests/test_plans.py).

    ``exact=True`` keeps the O(n²) all-pairs form — only for small
    corpora or recall measurement.
    """
    v = df.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    if exact:
        a, b = v.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tables = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    buckets = v.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket(F.col("v"), planes).alias("b"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "tb.t", "tb.b")
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        cands.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k of an approximate neighbor list against the exact one —
    the evaluation harness that justifies an ANN index's bucket/probe
    settings with a NUMBER instead of a guess (pair with
    :func:`brute_force_topk` as ground truth on a sampled query set;
    at 100 TB the exact side runs on the sample only, so the eval is
    cheap while the index serves the full corpus).

    Both inputs are (query_id, neighbor_id, ...) frames with <= k rows
    per query (the contract of the topk operators here). Per query:
    ``n_hits`` = |approx ∩ exact| via a (query, neighbor)-keyed
    left-semi join, ``recall`` = n_hits / k rounded to 6 dp. Queries
    whose approximate list missed everything still emit a row (recall
    0) — the exact side is the driving set.

    Scale shape: both sides are k rows per query; the semi join and
    both aggregations are keyed on query_id (map-side combinable,
    no skew — per-key cardinality is exactly k).
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        e.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension) — the
    class-profile primitive behind centroid classifiers, cluster
    drift monitoring, and IVF coarse quantizer refresh over a labeled
    corpus.

    Scale shape: ``posexplode`` widens the fact table by dim inside
    the scan, then ONE map-side-combinable (label, pos) average — the
    shuffle carries n_labels x dim partial sums per task, never the
    vectors. No collect step: emitting (label, pos, value) rows keeps
    the compare engine-exact (array->string rendering of doubles is
    NOT portable; rows of rounded doubles are).
    """
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "_v"),
    )
    return (
        e.groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(F.avg("_v"), 6).alias("centroid"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_init: str = "first",
    kmeans_iters: int = 3,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-space
    dedup by k-means clustering + intra-cluster cosine pruning.

    The paper's insight is that semantic duplicates land in the same
    k-means cluster, so the quadratic pair search only ever runs
    WITHIN a cluster — k is chosen so n/k-sized clusters make the
    intra-cluster product tractable (the paper uses k=11k for 5B
    docs). Spark shape: centroids are driver literals (k x dim — see
    kmeans_centroids for the bound), assignment is one narrow
    codegen'd pass, the pair search is an equi-join on the cluster id
    (never a global cross product), and the keep policy is one
    left-anti join.

    Keep policy (deterministic variant): within a qualifying pair the
    LOWER id is kept — a vector is dropped iff it is the higher id of
    ANY intra-cluster pair with cosine >= threshold. (The paper drops
    the member farthest from the centroid; low-id-wins is the same
    cardinality and engine-reproducible, matching every other dedup
    operator's min-id canonical policy here.)

    ``centroid_init='first'``: lowest-id vectors, engine-reproducible
    (the gate oracle recomputes assignments exactly);
    ``'kmeans'``: Lloyd rounds for production quality (recall-bound
    tested, not SQL-mirrored).

    Output: (id_col, cluster, is_kept) for every corpus vector.
    """
    if centroid_init == "kmeans":
        cvecs = kmeans_centroids(corpus, n_centroids, kmeans_iters, id_col, vec_col)
        cents = list(enumerate(cvecs))
    else:
        cents = [
            (ci, [float(x) for x in r[1]])
            for ci, r in enumerate(
                corpus.select(id_col, vec_col).orderBy(id_col).take(n_centroids)
            )
        ]

    scores = F.array(
        *[
            F.struct(
                F.round(cosine(F.col("_v"), F.array(*[F.lit(x) for x in cvec])), 6).alias("s"),
                F.lit(ci).alias("c"),
            )
            for ci, cvec in cents
        ]
    )
    assigned = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("cluster", F.array_max(scores)["c"].cast("long"))
    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col("_v").alias("_va"), "cluster"
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col("_v").alias("_vb"), "cluster"
    )
    losers = (
        a.join(b, "cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .where(F.round(cosine(F.col("_va"), F.col("_vb")), 6) >= F.lit(float(threshold)))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(losers.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("is_kept"),
        )
    )


def knn_graph(
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-corpus approximate kNN GRAPH — the neighbor structure that
    graph clustering (kNN graph -> connected components / communities)
    and SemDeDup-scale analyses consume. Same semantics as
    ``lsh_topk(corpus, corpus)`` but re-planned for a corpus-sized
    query side: NOTHING is broadcast — the corpus is hashed once
    (narrow), then self-equi-joins on the bucket key (both sides
    shuffle once on ``bucket``), exact cosine scores only within-bucket
    pairs, and the per-node top-k window partitions on the node id.

    Bucket-size economics are the LSH dial: expected bucket size is
    ``n / 2^n_planes``, and per-bucket cost is quadratic in it — at
    10^10 vectors, ~26 planes keep buckets in the hundreds. Recall
    rises with fewer planes (bigger buckets); measure with ann_recall
    before committing a (planes, k) config to a full run.

    Output: (node_id, neighbor_id, cosine, rank), rank 1..k per node
    (nodes sharing a bucket with < 1 other vector emit nothing —
    disconnected under this hash; multi-probe or a second seed pass
    fills coverage).
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a = c.select("bucket", F.col("id").alias("node_id"), F.col("v").alias("nvec"))
    b = c.select("bucket", F.col("id").alias("neighbor_id"), F.col("v").alias("cvec"))
    scored = (
        a.join(b, "bucket")
        .where(F.col("node_id") != F.col("neighbor_id"))
        .select(
            "node_id",
            "neighbor_id",
            F.round(cosine(F.col("nvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("node_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("node_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def quantize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Scalar (int8-style) embedding quantization — the storage/IO
    lever that makes 10^10-vector ANN affordable: per-DIMENSION
    min/max over the corpus define a linear grid of ``levels`` codes;
    each component maps to ``floor((v-min)/(max-min)*(levels-1)+0.5)``
    (explicit floor(+0.5) so both engines round identically).

    Plan shape: one posexplode pass + a (pos)-keyed min/max
    aggregation (dim rows out — map-side combinable), the dim-row
    grid BROADCAST back onto the exploded components (the fact side
    never shuffles for the quantize), and ONE vec-keyed groupBy
    reassembles code arrays in position order while folding the
    reconstruction error in the same pass. A constant dimension gets
    code 0 and reconstructs exactly (max == min guard).

    Output: (id_col, qvec array<long> of codes, max_abs_err — the
    per-vector worst-case dequantization error, rounded 6 dp).
    """
    if levels < 2:
        raise ValueError(f"levels must be >= 2, got {levels}")
    lv = float(levels - 1)
    e = corpus.select(
        F.col(id_col),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "val"),
    )
    grid = e.groupBy("pos").agg(
        F.min("val").alias("_lo"), F.max("val").alias("_hi")
    )
    q = (
        e.join(F.broadcast(grid), "pos")
        .withColumn(
            "code",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.floor(
                    (F.col("val") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(lv)
                    + F.lit(0.5)
                )
            ).cast("long"),
        )
        .withColumn(
            "_deq",
            F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
                F.col("_lo")
                + F.col("code") / F.lit(lv) * (F.col("_hi") - F.col("_lo"))
            ),
        )
    )
    return (
        q.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("code")))
            ).alias("_pc"),
            F.max(F.abs(F.col("_deq") - F.col("val"))).alias("_err"),
        )
        .select(
            id_col,
            F.transform("_pc", lambda s: s["code"]).alias("qvec"),
            F.round("_err", 6).alias("max_abs_err"),
        )
    )
