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

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_host", "registered_domain"]

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


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host — the registrable domain under
    single-label public suffixes (a full public-suffix list is a
    broadcast dimension join at production scale; this is the
    no-external-data stand-in used for domain-level weighting)."""
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
