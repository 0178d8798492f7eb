"""URL canonicalization — the web-corpus dedup key every large-scale
training pipeline computes before anything touches document text
(CCNet / RefinedWeb-style: the same page crawled as
``HTTPS://WWW.Example.COM/a/?utm_source=feed#top`` and
``https://example.com/a`` must collapse to one canonical key).

All pure Catalyst expressions — codegen-side, no Python in the hot
path (the tokenizer policy, `functions/tokenize.py`).  The DuckDB
mirror of each step lives in queries/dedup.py's `dedup_url` oracle;
the two are kept in lockstep by the hash check.

Canonicalization contract (documented order — every step is a cheap
string op over the scheme://host[:port]/path[?query][#fragment]
shape):

1. strip the fragment (``#...``);
2. lowercase scheme and host (NOT path/query — paths are
   case-sensitive on most origins);
3. drop a leading ``www.`` on the host;
4. drop an explicit default port (``:80``/``:443``);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), sort the survivors bytewise, rejoin — param order never
   distinguishes pages, tracking params never survive a recrawl;
6. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING = ("utm_", "fbclid=", "gclid=", "ref=")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL per the module
    contract.  Scale: one codegen projection — no shuffle, no UDF; at
    100 TB this runs map-side in the same stage as the scan."""
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    scheme_host = F.regexp_extract(u, r"^[^:]+://[^/?]*", 0)
    rest = F.substring(u, F.length(scheme_host) + 1, 1_000_000)
    sh = F.lower(scheme_host)  # 2. scheme+host case
    sh = F.regexp_replace(sh, r"^([a-z]+)://www\.", r"$1://")  # 3. www
    # 4. default ports are SCHEME-RELATIVE: :80 is only default for
    # http and :443 only for https — http://x:443 is a distinct origin
    # and must NOT collapse.
    sh = F.regexp_replace(sh, r"^http://([^:]*):80$", r"http://$1")
    sh = F.regexp_replace(sh, r"^https://([^:]*):443$", r"https://$1")
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    path = F.regexp_replace(path, r"/+$", "")  # 6. trailing slash
    # Query = everything after the FIRST '?' (RFC 3986 — later '?'s
    # are legal query characters and belong to it).
    query = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?") + 1, 1_000_000),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~F.startswith(x, F.lit(_TRACKING[0]))
        & ~F.startswith(x, F.lit(_TRACKING[1]))
        & ~F.startswith(x, F.lit(_TRACKING[2]))
        & ~F.startswith(x, F.lit(_TRACKING[3])),
    )
    canon_q = F.array_join(F.array_sort(params), "&")  # 5. params
    return F.concat(
        sh,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
