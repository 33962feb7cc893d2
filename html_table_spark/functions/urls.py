"""URL canonicalization — the URL-level dedup key every crawl pipeline
computes before content dedup (two crawls of ``HTTP://Example.com:80/a//b?
utm_source=x&b=2&a=1#frag`` and ``http://example.com/a/b?a=1&b=2`` are the
same resource).

Pure ``pyspark.sql.functions`` Column expressions — JVM-side, inside
whole-stage codegen, zero Python — decomposing with the RFC 3986 reference
regex (appendix B style, character-class only, so Java regex and RE2 agree)
and normalizing:

* scheme and host lowercased; userinfo preserved; default ports dropped
  (``http:80``, ``https:443``);
* path: runs of ``/`` collapsed, trailing slashes stripped (except the
  root), empty path → ``/``;
* query: split on ``&``, empty params and the standard tracking params
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``) dropped, remainder
  sorted bytewise and rejoined — parameter ORDER never distinguishes
  resources, tracking params never identify them;
* fragment dropped (never sent to the server).

Deliberately out of scope (documented, not silently wrong): dot-segment
resolution (crawlers emit resolved URLs) and percent-encoding
normalization (needs a byte-level decoder; a candidate ``mapInPandas``
tier if a corpus needs it).  Sorting is bytewise in BOTH engines (Spark
UTF8 binary order, DuckDB default varchar order) — identical for the
ASCII query strings real URLs contain.

The DuckDB twin in ``__spark_entry__`` replays every step with the same
regexes (RE2 ``\\1`` backrefs where Spark uses ``$1``).

Reference parity note: the reference library has no URL handling; this is
part of the corpus-pipeline surface the build plan adds beyond the
reference (SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_canonical", "TRACKING_PARAMS_RE"]

# anchored, char-class-only decomposition (RFC 3986 appendix B shape)
_SCHEME_RE = r"^([^:/?#]+):"
_AUTH_RE = r"^[^:/?#]*://([^/?#]*)"
_PATH_RE = r"^(?:[^:/?#]+:)?(?://[^/?#]*)?([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

TRACKING_PARAMS_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, _AUTH_RE, 1)


def _norm_authority(url: Column) -> Column:
    auth = _authority(url)
    userinfo = F.regexp_extract(auth, r"^([^@]*@)", 1)  # '' when absent
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    scheme = _scheme(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    keep_port = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    return F.concat(userinfo, host, keep_port)


def _norm_path(url: Column) -> Column:
    p = F.regexp_extract(url, _PATH_RE, 1)
    p = F.regexp_replace(p, r"/{2,}", "/")
    p = F.regexp_replace(p, r"(.)/+$", "$1")
    return F.when(p == "", F.lit("/")).otherwise(p)


def _norm_query(url: Column) -> Column:
    # strip the fragment FIRST: a '?' inside '#...' is fragment text, not
    # a query ('http://h/p#a/b?c=d' has no query)
    q = F.regexp_extract(F.regexp_replace(url, r"#.*$", ""), _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAMS_RE),
        )
    )
    joined = F.array_join(params, "&")
    return F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))


def url_canonical(url) -> Column:
    """The canonical form of an absolute http(s)-style URL (see module
    docstring for the exact normalization set). Null-safe: null → null;
    a string with no scheme/authority still normalizes path+query."""
    u = F.col(url) if isinstance(url, str) else url
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when(_scheme(u) == "", F.lit("")).otherwise(
                F.concat(_scheme(u), F.lit("://"))
            ),
            _norm_authority(u),
            _norm_path(u),
            _norm_query(u),
        )
    )
