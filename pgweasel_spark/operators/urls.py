"""URL canonicalization + dedup for web corpora.

Crawls see the same page under many spellings — mixed-case scheme/host,
default ports, tracking parameters, fragments, trailing slashes. The
canonical form collapses those variants so URL-level dedup (the cheapest
dedup a web pipeline runs, before any content hashing) catches them.

Everything is a chain of codegen'd regex/string expressions — map-only,
no UDF, restatable verbatim in a SQL oracle (backref syntax aside:
Java ``$1`` vs RE2 ``\\1``). The rule set is deliberately minimal and
deterministic; parameter REORDERING is out of scope (sorting query
params cross-engine costs more than it catches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking parameters stripped during canonicalization
TRACKING_PARAM_RE = r"utm_[A-Za-z0-9_]*|fbclid|gclid"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL, applied as 6 sequential rules:

    1. drop the fragment (``#...``)
    2. lowercase the scheme+authority prefix (path/query untouched)
    3. strip default ports (``http://h:80`` → ``http://h``,
       ``https://h:443`` → ``https://h``)
    4. drop tracking params (utm_*, fbclid, gclid), keeping the
       separator of the first surviving param
    5. collapse separator runs left by rule 4 (``?&&x`` → ``?x``),
       unify ``/?`` → ``?`` (``path/?q`` and ``path?q`` collapse), and
       drop a dangling trailing ``?``/``&``
    6. strip one trailing slash at end-of-string (root included —
       ``http://h/`` and ``http://h`` unify)
    """
    u = F.regexp_replace(url, "#.*$", "")
    prefix = F.regexp_extract(u, "^[^/?#]*//[^/?#]*", 0)
    u = F.concat(
        F.lower(prefix),
        F.substring(u, F.length(prefix) + 1, F.lit(1 << 30)),
    )
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80(/|\?|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443(/|\?|$)", "$1$2")
    u = F.regexp_replace(
        u, rf"([?&])(?:{TRACKING_PARAM_RE})=[^&#]*", "$1"
    )
    u = F.regexp_replace(u, r"([?&])&+", "$1")
    u = F.regexp_replace(u, r"/\?", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_dedup(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with the member
    count and the min-key keeper — the same group shape as
    ``dedup.exact_dedup``, one uniform-key shuffle."""
    return (
        df.groupBy(canonical_url(F.col(url_col)).alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min(key_col).alias("keeper"),
        )
        .orderBy("canonical_url")
    )
