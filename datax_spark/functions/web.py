"""URL canonicalization for web-scale corpus pipelines — pure Column
expressions (no Python row path, no shuffle: a narrow per-row map).

Web-crawl dedup keys on the CANONICAL url: the same resource appears as
`HTTP://WWW.Site.com:80/page/?utm_source=x&b=2&a=1#frag` and
`http://site.com/page?a=1&b=2`, and a byte-equality dedup treats them as
distinct documents.  The rules here are the common-denominator subset of
RFC 3986 §6 normalization plus the crawl-dedup conventions (Common Crawl
/ web-corpus pipelines):

1. trim surrounding whitespace;
2. lowercase the scheme and the authority (host[:port]) — path/query
   stay case-sensitive per RFC 3986;
3. drop the fragment (`#…` never reaches the server);
4. drop the default port (`:80` for http, `:443` for https);
5. drop one leading `www.` host label;
6. drop a single trailing `/` from the path (`/page/` == `/page`; a
   bare `/` collapses to the empty path);
7. sort query parameters bytewise and drop empty ones — param order is
   almost never semantic, and sorting makes the key stable;
8. drop known tracking parameters (`utm_*`, `fbclid`, `gclid`).

Every regex is in the Java∩RE2 subset (no lookaround, no backrefs) so a
SQL engine reproduces the canonical string byte-for-byte — the suite's
DuckDB oracle does exactly that.

Reference contrast: DataX has no URL handling at all; this belongs to
the training-data layer (SURVEY.md §2 LLM-pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-3986-shaped splitter (one group index per component; anchored so a
# non-matching string yields empty groups, never a partial match):
#   g1 scheme, g2 authority, g3 path, g5 query (g4 = "?query"), g7 frag
_URL_RE = r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(\?([^#]*))?(#(.*))?$"
# tracking params dropped from the canonical query string
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)(=.*)?$"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_url(col) -> Column:
    """The canonical form of a URL string (rules in the module docstring).

    NULL in → NULL out; a string with no scheme keeps its text shape
    (authority parsing needs `://`), still getting trim/fragment/query
    normalization.  Pure Column expressions — scales as a narrow map."""
    u = F.trim(_c(col))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 5)

    # default ports + www label
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    auth = F.regexp_replace(auth, r"^www\.", "")

    # single trailing slash off the path ("/" -> "")
    path = F.regexp_replace(path, "/$", "")

    # query: split, drop empties + tracking params, sort, rejoin
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")

    head = F.when(scheme != "", F.concat(scheme, F.lit("://"), auth)) \
        .otherwise(auth)
    return F.when(
        _c(col).isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(head, path,
                 F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))
    )


def url_host(col) -> Column:
    """The canonical host of a URL (lowercased, default port and one
    leading `www.` label stripped) — the grouping key for per-site
    corpus statistics and host-level filtering."""
    u = F.trim(_c(col))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    auth = F.regexp_replace(auth, ":[0-9]+$", "")  # host only: any port
    return F.regexp_replace(auth, r"^www\.", "")
