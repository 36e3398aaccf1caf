"""End-to-end corpus curation: the composed cleaning pipeline a
training-data team actually ships — URL hygiene, then language /
quality / repetition gating, then exact dedup, then source-balanced
downsampling.  Every stage is individually value-hash-verified by its
own gate query; :func:`curate_corpus` is the verified COMPOSITION
(gate ``curate_corpus``), so the stages are proven to agree not just
row-by-row but through their data dependencies (the balance
thresholds, for instance, are computed over the post-dedup survivor
set, not the raw corpus).

Stage order is cheap-to-expensive on purpose: the two zero-shuffle
codegen gates (URL, text quality) run first so the only shuffled
stages — the fingerprint dedup and the dimension-sized balance agg —
see survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as text_ops
from . import web as web_ops

__all__ = ["curate_corpus", "contrastive_pairs"]


def curate_corpus(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    blocked_domains: list[str] | None = None,
    blocked_path_pattern: str | None = None,
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.75,
    cap_share: float = 0.10,
    seed: str = "balance-v1",
) -> DataFrame:
    """Run the full curation chain and return the surviving rows with
    the input schema:

    1. :func:`web.url_filter` — registrable-domain blocklist + blocked
       path pattern (zero shuffle);
    2. :func:`text.corpus_filter` — lang -> quality -> repetition
       first-failure gate (zero shuffle);
    3. exact dedup — one row per normalized-text
       :func:`text.fingerprint`, keeping the MINIMUM ``id_col``
       (deterministic, the same keep policy as dedup_fingerprint /
       connected-components clustering): one map-side-combinable
       groupBy on the fingerprint + a semi join back on the id;
    4. :func:`text.balanced_sample` — per-source cap_share
       downsampling with engine-portable hash membership, thresholds
       computed over the POST-dedup survivor set.

    Scale posture: stages 1-2 are pure codegen filters; stage 3 is the
    first shuffle (fingerprint agg + id semi join, both on near-unique
    keys); stage 4 aggregates a dimension-sized (source) table and
    broadcasts thresholds — the corpus never shuffles again.
    """
    out = web_ops.url_filter(
        pages,
        blocked_domains=blocked_domains,
        blocked_path_pattern=blocked_path_pattern,
        url_col=url_col,
    )
    out = text_ops.corpus_filter(
        out,
        text_col=text_col,
        allowed_langs=allowed_langs,
        min_quality=min_quality,
    )
    out = out.where(F.col("keep")).select(*pages.columns)
    keep_ids = (
        out.select(
            text_ops.fingerprint(F.col(text_col)).alias("_fp"),
            F.col(id_col),
        )
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    out = out.join(keep_ids, id_col, "left_semi")
    return text_ops.balanced_sample(
        out,
        cap_share=cap_share,
        text_col=text_col,
        source_col=source_col,
        id_col=id_col,
        seed=seed,
    )


def contrastive_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k_neg: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    neg_seed: str = "negs",
) -> DataFrame:
    """Training-pair assembly for contrastive embedding training:
    positives = MinHash-LSH near-duplicate pairs (documents that
    genuinely share content), negatives = deterministic hash-sampled
    pairs (negative_samples), normalized to (min, max) id order,
    deduplicated, and anti-joined against the positive set (a sampled
    'negative' that happens to be a true near-dup pair must not be
    mislabeled). Output (id_a, id_b, label) with label 1/0.

    Everything composes already-verified operators: the LSH banding
    keeps positives off the O(n^2) path, the negative fan-out is a
    bounded in-scan explode, and the anti-join is (id_a, id_b)-keyed.
    """
    from .dedup import minhash_near_duplicates
    from .text import negative_samples

    pos = minhash_near_duplicates(
        df, id_col=id_col, text_col=text_col,
        threshold=threshold, hash_fn=hash_fn,
    ).select("id_a", "id_b", F.lit(1).cast("long").alias("label"))
    neg = (
        negative_samples(df, k=k_neg, id_col=id_col, seed=neg_seed)
        .select(
            F.least(F.col(id_col), F.col("neg_id")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("neg_id")).alias("id_b"),
        )
        .distinct()
        .join(pos.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .select("id_a", "id_b", F.lit(0).cast("long").alias("label"))
    )
    return pos.unionByName(neg)


def hard_negatives(
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive hard-negative mining: pairs that are CLOSE in
    embedding space (kNN-graph neighbors) but NOT textual
    near-duplicates — the negatives that actually teach a contrastive
    model a boundary, versus random negatives that are trivially far.

    Composition of two existing verified operators: the
    no-broadcast LSH kNN graph over the embeddings (semantic
    closeness) anti-joined against the MinHash near-duplicate pairs
    over the documents (textual duplication — those belong in the
    positive set, and mislabeling a true near-dup as a negative
    poisons the loss). Directed kNN edges collapse to unordered
    pairs (least, greatest) keeping the max cosine.

    ID-SPACE PRECONDITION: the anti-join is only meaningful when the
    embedding ids ARE the document ids — row e of ``embeddings``
    (keyed ``vec_id_col``) must be the embedding OF document e (keyed
    ``doc_id_col``), as in the testdata tables where both are dense
    row numbers over the same corpus. If your embeddings carry their
    own id space, join them through a doc->vec mapping FIRST and pass
    the doc-keyed frame here; with disjoint id spaces the anti-join
    removes nothing and every kNN pair silently survives as a
    "negative".

    Output: (id_a, id_b, cosine), id_a < id_b.
    """
    from . import dedup as dedup_ops
    from . import similarity as sim_ops

    knn = sim_ops.knn_graph(
        embeddings, dim=dim, k=k, n_planes=n_planes, id_col=vec_id_col
    )
    pairs = (
        knn.select(
            F.least("node_id", "neighbor_id").alias("id_a"),
            F.greatest("node_id", "neighbor_id").alias("id_b"),
            "cosine",
        )
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )
    dups = dedup_ops.minhash_near_duplicates(
        docs, id_col=doc_id_col, threshold=threshold, hash_fn=hash_fn
    ).select("id_a", "id_b")
    return pairs.join(dups, ["id_a", "id_b"], "left_anti")
