"""URL operators for Common-Crawl-style web corpora: canonicalization,
registrable-domain extraction, and keep-latest URL dedup.

All pure JVM expressions (regexp + array functions inside whole-stage
codegen — no Python, no shuffle except the dedup window). Rules follow
RFC 3986 syntax-based normalization plus the tracking-parameter strip
common in public web-corpus pipelines (C4/CCNet-style revisit dedup keys
on the canonical URL; the reference has no URL handling — these cover the
BASELINE input_hint's ``url`` column end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Query parameters dropped during canonicalization: advertising/analytics
# click identifiers that never change page content (public convention;
# any key starting with "utm_" is dropped too). Deliberately NOT in the
# list: bare "ref" — on common sites (?ref=<branch>, ?ref=<variant>) it
# is content-selecting, and dropping it would make url_dedup merge
# genuinely distinct documents; only the Twitter-style "ref_src"
# attribution key is safe to strip.
TRACKING_PARAMS = [
    "gclid", "fbclid", "msclkid", "dclid", "mc_cid", "mc_eid", "igshid",
    "ref_src", "spm",
]

# Pinned two-level public suffixes for the registrable-domain heuristic.
# The full Public Suffix List is a data file, not an algorithm; this
# subset covers the common ccTLD second-level registries and the rule is
# documented as an approximation.
TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "ac.jp", "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.nz", "com.ar",
]

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def _authority(rest: Column) -> Column:
    """authority = everything before the first '/', '?' or '#'."""
    return F.regexp_extract(rest, r"^([^/?#]*)", 1)


def canonical_url(url: Column | str) -> Column:
    """RFC 3986 syntax-based normalization + tracking-param strip:

    - scheme and host lowercased; default port stripped (``:80`` for
      http, ``:443`` for https)
    - fragment dropped
    - query parameters: tracking params (``utm_*`` + TRACKING_PARAMS, by
      key, case-insensitive) dropped; the rest sorted bytewise and
      re-joined with '&' (param ORDER never changes content on sane
      sites; sorting makes the revisit-dedup key order-insensitive)
    - a bare-root trailing slash is dropped (``http://x.com/`` ==
      ``http://x.com``); other paths are byte-preserved (case-significant
      per RFC 3986)
    - strings without a ``scheme://`` prefix are returned trimmed but
      otherwise untouched (not URLs we can parse safely)

    Single pure-JVM expression; every helper subtree is referenced at
    most once per output (no HOF lambda touches a computed array other
    than its own element), so cost is O(len) per row.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.lower(_authority(rest))
    host = F.when((scheme == "http") & auth.endswith(":80"),
                  F.regexp_replace(auth, ":80$", "")) \
        .when((scheme == "https") & auth.endswith(":443"),
              F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    # path?query#fragment -> drop fragment, split path/query
    tail = F.regexp_replace(
        F.regexp_replace(rest, r"^[^/?#]*", ""), r"#.*$", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    rawq = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~F.lower(F.substring_index(p, "=", 1))
        .startswith("utm_")
        & ~F.lower(F.substring_index(p, "=", 1)).isin(TRACKING_PARAMS)))
    q = F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.concat_ws("&", params))) \
        .otherwise(F.lit(""))
    norm_path = F.when(path == "/", F.lit("")).otherwise(path)
    return F.when(u.rlike(_SCHEME_RE),
                  F.concat(scheme, F.lit("://"), host, norm_path, q)) \
        .otherwise(u)


def registrable_domain(url: Column | str) -> Column:
    """Registrable domain of a URL or bare host: the last two host labels,
    or three when the last two form a pinned two-level public suffix
    (TWO_LEVEL_SUFFIXES — documented approximation of the PSL). Ports
    are stripped; a host with fewer than two labels is returned as-is.
    Scheme-less inputs get the same authority cut (everything before the
    first '/', '?' or '#'), so 'sub.example.com/page' is host-parsed."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    host0 = _authority(F.regexp_replace(u, _SCHEME_RE, ""))
    host = F.lower(F.regexp_replace(host0, r":[0-9]+$", ""))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    return F.when(n <= 2, host) \
        .when(last2.isin(TWO_LEVEL_SUFFIXES), last3) \
        .otherwise(last2)


def url_dedup(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", id_col: str | None = None,
              keep_canon_col: str = "canon_url") -> DataFrame:
    """Common-Crawl revisit dedup: canonicalize ``url_col`` and keep, per
    canonical URL, the latest row by ``ts_col`` (ties broken by the
    largest ``id_col`` when given, else by raw URL descending — pass
    ``id_col`` for full determinism: without it, rows that tie on BOTH
    ts and raw url keep an arbitrary member of the tie group). Returns
    the surviving rows plus the canonical-URL column.

    Rows whose url is NULL or has no ``scheme://`` prefix are NOT
    revisit candidates — they pass through untouched (canon_url NULL).
    Without this, every null/unparseable url would collapse into one
    partition-skewing group and all but one such document would be
    silently dropped.

    Scale: one window shuffle keyed by the canonical URL over the
    parseable rows only — an md5-uniform key space (revisit counts per
    URL are small), so no skew handling is needed; the filter is
    rank==1, never a collect."""
    tie = F.col(id_col).desc() if id_col else F.col(url_col).desc()
    parseable = F.col(url_col).isNotNull() & \
        F.trim(F.col(url_col)).rlike(_SCHEME_RE)
    with_canon = pages.withColumn(
        keep_canon_col,
        F.when(parseable, canonical_url(url_col)))
    w = Window.partitionBy(keep_canon_col).orderBy(F.col(ts_col).desc(), tie)
    deduped = (with_canon.where(parseable)
               .withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    return deduped.unionByName(with_canon.where(~parseable))
