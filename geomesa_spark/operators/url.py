"""URL canonicalization and host-level operators for web-corpus
pipelines.

A crawl-derived training corpus dedups and filters at three grains:
the exact URL (after canonicalization — tracking params, fragments,
default ports and case differences otherwise explode one page into
dozens of "distinct" URLs), the registered domain (quota/blocklist
filtering), and the document text (operators/dedup.py). This module
supplies the first two as PURE column expressions — regex extraction
+ array ops, zero Python, zero shuffle until the caller aggregates —
so canonicalization runs at parquet-scan speed over 10^11 URLs and
the normalized string becomes the groupBy/bucket key.

Normalization spec (deterministic, engine-portable — every regex is
RE2-safe, no lookaround/backrefs, so Spark's Java regex and DuckDB
agree byte-for-byte):

1. strip the fragment (`#...`)
2. lowercase the scheme and host; strip one leading `www.`
3. drop the port when it is the scheme default (http:80 / https:443)
4. drop tracking query params (`utm_*`, `fbclid`, `gclid`,
   `msclkid`, `ref`), sort the survivors bytewise, rejoin with `&`
5. collapse the path's trailing slashes; empty path becomes `/`

The registered-domain extractor uses an embedded subset of the
public-suffix list (the high-traffic two-label suffixes) — the seam
to swap in the full PSL is the `extra_suffixes` argument; a full
list is ~9k entries and still fits comfortably in one `isin`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# high-traffic two-label public suffixes; extend via extra_suffixes
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "com.mx", "com.cn", "com.tw",
    "co.za", "com.ar", "com.tr", "co.nz", "com.sg",
)

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
# same prefix without a capture group, for patterns whose group 1 is
# the part AFTER the scheme
_SCHEME_SKIP = "^[A-Za-z][A-Za-z0-9+.-]*://"
# optional RFC 3986 userinfo ("user:pass@") before the host — cannot
# cross the end of the authority (no /, ?, #)
_USERINFO_SKIP = "(?:[^/?#@]*@)?"
# host: an IPv6 bracket literal or a regular reg-name
_HOST_INNER = r"\[[^\]]*\]|[^/?:@]*"


def url_parts(url) -> dict[str, F.Column]:
    """Decompose a URL column into scheme/host/port/path/query
    columns (fragment already stripped). Pure regexp_extract — one
    projection, no UDF. Handles userinfo and IPv6 bracket hosts;
    scheme-less input yields scheme '' (normalize_url_col then
    passes the URL through unchanged)."""
    u = F.regexp_replace(url, "#.*$", "")
    auth = _SCHEME_SKIP + _USERINFO_SKIP
    return {
        "scheme": F.lower(F.regexp_extract(u, _SCHEME_RE, 1)),
        "host": F.lower(
            F.regexp_extract(u, auth + "(" + _HOST_INNER + ")", 1)
        ),
        "port": F.regexp_extract(
            u, auth + "(?:" + _HOST_INNER + "):([0-9]+)", 1
        ),
        "path": F.regexp_extract(u, _SCHEME_SKIP + "[^/?]*([^?]*)", 1),
        "query": F.regexp_extract(u, r"\?(.*)$", 1),
    }


def normalize_url_col(url) -> F.Column:
    """The canonical URL as one column expression (spec above).

    Scheme-less / non-hierarchical inputs (no '://') canonicalize to
    THEMSELVES: without an authority the spec's parts are undefined,
    and mapping such rows onto a shared degenerate key would silently
    merge unrelated documents in url_dedup (distinct crawl rows must
    never collapse on a parse failure — fail open, keep identity)."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], "^www\\.", "")
    default_port = (
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == "")
    )
    port = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"])
    )
    path = F.regexp_replace(p["path"], "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    query = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    canon = F.concat(p["scheme"], F.lit("://"), host, port, path, query)
    return F.when(p["scheme"] == "", url).otherwise(canon)


def registered_domain_col(host, extra_suffixes: tuple[str, ...] = ()) -> F.Column:
    """eTLD+1 over the embedded two-label suffix subset: when the
    host's last two labels form a known public suffix the domain is
    the last THREE labels, else the last two (bare/single-label
    hosts pass through unchanged)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    # slice-from-max(1, ...) instead of negative element_at: a one- or
    # two-label host must not trip an ANSI out-of-bounds inside a
    # condition branch that is only LOGICALLY unreachable
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    suffixes = list(TWO_LABEL_SUFFIXES) + list(extra_suffixes)
    return (
        F.when((n >= 3) & last2.isin(suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_profile(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """(id, url, nurl, host, domain) — the canonicalized URL plus
    its host and registered domain, one narrow projection.
    `extra_suffixes` extends the embedded PSL subset (pass the full
    public-suffix list's two-label entries for exact eTLD+1)."""
    p = url_parts(F.col(url_col))
    host = F.regexp_replace(p["host"], "^www\\.", "")
    return df.select(
        F.col(id_col),
        F.col(url_col),
        normalize_url_col(F.col(url_col)).alias("nurl"),
        host.alias("host"),
        registered_domain_col(host, extra_suffixes).alias("domain"),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep ONE row per canonical URL — the minimum id wins
    (deterministic under any partitioning/retry, never the
    partition-order-dependent dropDuplicates). One partial-aggregated
    groupBy on the normalized string: the map-side combine collapses
    same-page URL variants before the shuffle, so exchange volume is
    bounded by distinct pages, not raw crawl rows."""
    nurl = normalize_url_col(F.col(url_col))
    return (
        df.withColumn("_nurl", nurl)
        .groupBy("_nurl")
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(F.col(id_col), F.col("_nurl").alias("nurl"))
    )


def domain_counts(
    df: DataFrame,
    url_col: str = "url",
    blocklist: tuple[str, ...] = (),
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Pages per registered domain after canonical-URL dedup, with a
    domain blocklist applied — the quota/filter summary a crawl
    pipeline runs before sampling. Two partial-aggregated groupBys
    (URL grain then domain grain); the blocklist is an isin filter
    pushed below both."""
    p = url_parts(F.col(url_col))
    host = F.regexp_replace(p["host"], "^www\\.", "")
    base = df.select(
        normalize_url_col(F.col(url_col)).alias("nurl"),
        registered_domain_col(host, extra_suffixes).alias("domain"),
    )
    if blocklist:
        base = base.filter(~F.col("domain").isin(list(blocklist)))
    return (
        base.groupBy("domain")
        .agg(F.countDistinct("nurl").alias("n_pages"))
    )


def domain_quota_sample(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_salts: int = 16,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """At most `max_per_domain` canonical URLs per registered domain,
    chosen deterministically (lowest id per URL, then lowest-id URLs
    within the domain).

    Skew-safe two-stage top-N: a mega-domain (crawls routinely have
    one domain with 10^9 pages) would force the whole domain through
    ONE window partition, so the first rank runs over (domain, salt)
    — `n_salts` bounded partitions per domain, each keeping its local
    top max_per_domain — and only the surviving
    n_salts * max_per_domain rows per domain reach the exact final
    window. The union of per-salt top-Ns contains the global top-N
    under the same ordering, so the result is identical to the
    single-window form."""
    p = url_parts(F.col(url_col))
    host = F.regexp_replace(p["host"], "^www\\.", "")
    deduped = (
        df.select(
            F.col(id_col),
            normalize_url_col(F.col(url_col)).alias("nurl"),
            registered_domain_col(host, extra_suffixes).alias("domain"),
        )
        .groupBy("nurl", "domain")
        .agg(F.min(F.col(id_col)).alias(id_col))
    )
    order = [F.col(id_col).asc(), F.col("nurl").asc()]
    pre = Window.partitionBy(
        "domain", F.pmod(F.xxhash64("nurl"), F.lit(n_salts))
    ).orderBy(*order)
    w = Window.partitionBy("domain").orderBy(*order)
    return (
        deduped.withColumn("_prk", F.row_number().over(pre))
        .filter(F.col("_prk") <= max_per_domain)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_domain)
        .select(id_col, "nurl", "domain")
    )
