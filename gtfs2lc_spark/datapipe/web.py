"""Web-corpus URL operators: canonicalization + domain extraction.

The north star's entity-canonicalization story (URI-template
canonicalization of stops/trips/routes, gtfs2lc's lib/URIs
machinery) has a crawl-side twin: the page URL itself is the entity
key of the web corpus, and Common-Crawl-style inputs carry the same
page under syntactic URL variants.  These operators normalize URLs to
a canonical form so re-crawl dedup / entity linking can key on it.

Everything here is pure Column algebra over `regexp_extract` /
`regexp_replace` in the Java-regex ∩ RE2 subset (no lookaround, no
possessive quantifiers) so the DuckDB oracle can replicate each step
verbatim: zero shuffles, whole-stage codegen, scales as a mapper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "url_host",
    "registered_domain",
    "anchor_text_topk",
    "url_filter",
]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AFTER_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"


def url_host(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL ('' if unparsable)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE + "([^/?]*)", 2))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - drop the fragment;
    - lowercase scheme and host (path/query case is preserved —
      they are case-sensitive);
    - strip the scheme's default port (:80 http, :443 https);
    - strip a leading ``www.`` host label;
    - drop ``utm_*`` tracking query parameters;
    - empty path -> ``/``; non-root trailing slash dropped.

    Each step is one regexp over an anchored pattern, mirrored
    literally in the oracle SQL (oracle side uses ``\\1`` backrefs
    and the 'g' flag where Spark replaces globally by default).
    """
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _SCHEME_RE + "([^/?]*)", 2))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(hostport, "^www\\.", "")
    rest = F.regexp_replace(u, _AFTER_AUTHORITY_RE, "")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    query = F.regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    query = F.regexp_replace(
        F.regexp_replace(query, "(^|&)utm_[^&]*", ""), "^&", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "(.)/$", "$1")
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def anchor_text_topk(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` anchor texts per link target, by link count — the
    classic web-graph description signal: what the REST of the web
    calls a page is the strongest entity-naming evidence a KG
    extractor has (the crawl-side twin of the stop_name dictionary
    that kg.link_entities resolves against; anchor consensus is what
    populates such dictionaries at web scale).

    One row per (dst, anchor) that ranks in the target's top ``k``
    with its count and 1-based rank.  Ties break toward the
    lexicographically smaller anchor, so the output is a
    deterministic function of the multiset of links.

    Scale posture: the (dst, anchor) count is a map-side-combinable
    hash aggregation — the 1e11-edge link graph collapses to distinct
    observed (target, phrase) pairs before the only other wide op,
    the per-dst ``row_number`` window.  Hot targets (everyone links
    to the homepage of a big host) are bounded by their DISTINCT
    anchor vocabulary, not their in-degree, after the pre-agg; a
    single window partition is therefore vocabulary-sized, which is
    the same per-key bound every banded-dedup op here accepts.
    Callers normalize anchors first (``kg.normalize_entity_name``)
    so casing variants collapse in the pre-agg.
    """
    counted = links.groupBy(
        F.col(dst_col).alias("dst"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).alias("n_links"))
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return counted.select(
        "*", F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= int(k))


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host — the registrable domain under
    single-label public suffixes (a full public-suffix list is a
    broadcast dimension join at production scale; this is the
    no-external-data stand-in used for domain-level weighting)."""
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def url_filter(
    pages: DataFrame,
    blocked_domains: list[str] | None = None,
    blocked_path_pattern: str | None = None,
    url_col: str = "url",
    keep_signals: bool = False,
) -> DataFrame:
    """C4-style URL hygiene gate: drop pages whose REGISTRABLE DOMAIN
    is on a blocklist or whose path matches a blocked pattern (adult /
    spam / boilerplate path markers) — the crawl-side filter that runs
    BEFORE any text is parsed, so it must be pure scan-time Column
    algebra.

    The domain probe is an ``isin`` over a literal list (a real
    deployment swaps in a broadcast join against a public-suffix-aware
    blocklist dimension — same plan shape, see link_entities) over the
    PORT-STRIPPED host, so ``adsite.biz:8080`` cannot dodge a
    ``adsite.biz`` block; the path probe is one RE2-subset regexp over
    the parsed path only (query string and fragment excluded).
    Domain block outranks path block in the reported reason.  Rows
    keep ``url_keep`` and ``url_reject_reason`` ('domain' / 'path' /
    'pass') when ``keep_signals`` — by default blocked rows are
    dropped and the schema is unchanged.

    Only absolute ``scheme://`` URLs are judged: a non-absolute URL
    parses to an empty host and empty path, so NEITHER probe fires and
    it passes through — crawl inputs are absolute by construction;
    route anything else to quarantine upstream, don't rely on this
    gate to catch malformed rows.

    Zero shuffles, whole-stage codegen, composes with corpus_filter
    downstream (URL gate first: it is by far the cheapest).
    """
    url = F.col(url_col)
    reason = F.lit("pass")
    if blocked_path_pattern:
        path = F.regexp_extract(
            url, _AFTER_AUTHORITY_RE + "([^?#]*)", 1
        )
        reason = F.when(
            path.rlike(blocked_path_pattern), F.lit("path")
        ).otherwise(reason)
    if blocked_domains:
        host = F.regexp_replace(url_host(url), ":[0-9]+$", "")
        dom = registered_domain(host)
        reason = F.when(
            dom.isin(list(blocked_domains)), F.lit("domain")
        ).otherwise(reason)
    out = pages.withColumn("url_reject_reason", reason).withColumn(
        "url_keep", F.col("url_reject_reason") == "pass"
    )
    if keep_signals:
        return out
    return out.where(F.col("url_keep")).select(*pages.columns)
