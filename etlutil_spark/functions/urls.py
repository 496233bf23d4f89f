"""URL canonicalization — the web-corpus curation primitive.

Crawl pipelines dedup and group documents by URL, but raw URLs are
noisy: scheme/host case, default ports, fragments, tracking parameters
(utm_*, click ids) and trailing slashes all vary without changing the
resource. ``with_url_features`` normalizes those away and derives the
grouping keys (host, registered domain, path depth) — all as pure
column expressions (regex + array ops), zero shuffles, no UDF, so the
normalization runs inside codegen at full scan speed on any corpus
size. Spark's parse_url is deliberately avoided: the same regex
decomposition is expressible in any engine, which is what makes the
DuckDB oracle an independent re-implementation rather than a port.

Normalization contract (order matters):
1. scheme and host lowercase; path/query case preserved
2. fragment stripped
3. port stripped from the host (crawl frontiers treat host as the
   grouping key; port-carrying URLs are rare enough to canonicalize)
4. leading ``www.`` stripped from the host
5. tracking params dropped: ``utm_*``, ``ref``, ``fbclid``, ``gclid``
   (remaining params keep their original order — re-sorting would merge
   semantically different URLs on servers with order-sensitive routing)
6. trailing slash stripped from a non-root path

``registered_domain`` is the last two dot-labels of the host — a
deliberate simplification (no public-suffix list in a pure-expression
pipeline; co.uk-style suffixes need a lookup table joined in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host without port or user info."""
    authority = F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    no_user = F.regexp_replace(authority, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))


def url_path(col: Column | str) -> Column:
    return F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_query(col: Column | str) -> Column:
    return F.regexp_extract(_c(col), r"\?([^#]*)", 1)


def with_url_features(
    df: DataFrame,
    url_col: str,
    *,
    out_col: str = "url_norm",
) -> DataFrame:
    """Add url_norm, host, registered_domain, path_depth, n_params."""
    u = _c(url_col)
    scheme = url_scheme(u)
    host = F.regexp_replace(url_host(u), r"^www\.", "")
    path = F.regexp_replace(url_path(u), r"^(.+?)/+$", r"$1")
    params = F.filter(
        F.split(url_query(u), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    query = F.array_join(params, "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        df.withColumn(out_col, norm)
        .withColumn("host", host)
        .withColumn("registered_domain", domain)
        .withColumn("path_depth", depth)
        .withColumn("n_params", F.size(params))
    )
