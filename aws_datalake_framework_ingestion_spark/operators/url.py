"""URL canonicalization — the first dedup stage of a web-crawl
pipeline (strip tracking params, lowercase host, drop default port,
drop fragment, sort surviving params).

The reference lands crawl-style objects under a path convention and
dedups nothing (ingestion/utils/dataIngestionUtils.py:196-232 copies
objects verbatim); URL-level dedup is the north-star extension that
sits in front of content dedup: two fetches of the same page under
different tracking decorations must collapse BEFORE the corpus pays
for fetching/storing both.  Built on the fn_url_ops surface
(plans/function_queries.py): parse_url for the typed components, all
codegen'd scalar functions plus one tiny higher-order filter over the
split param array (≤ a handful of elements per URL — the interpreted-
lambda cost ceiling documented in operators/text.py does not apply at
this arity).

Scale shape: pure projection — no shuffle, no UDF; the downstream
dedup is a hash-groupBy on the canonical string (ns_dedup_exact
shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped by every major canonicalizer (Google
# Analytics utm_*, Google Ads gclid, Facebook fbclid, Microsoft
# msclkid, Mailchimp mc_eid, generic ref).
TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "mc_eid", "ref")
TRACKING_PREFIXES = ("utm_",)


def _is_kept_param(p: Column) -> Column:
    """True for query params that survive canonicalization."""
    key = F.lower(F.substring_index(p, "=", 1))
    tracking = key.isin(*TRACKING_KEYS)
    for pref in TRACKING_PREFIXES:
        tracking = tracking | key.startswith(pref)
    return ~tracking


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column:

    * protocol and host lowercased,
    * default port dropped (``:443`` for https, ``:80`` for http),
      non-default ports preserved,
    * fragment dropped (parse_url QUERY/PATH never include it),
    * tracking params removed (TRACKING_KEYS / TRACKING_PREFIXES),
    * surviving params sorted lexicographically and re-joined,
    * trailing slashes stripped from non-root paths.

    Everything is parse_url + string functions in one projection —
    no shuffle; the only higher-order function is the param filter
    over a per-URL array of a few elements.
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    auth = F.coalesce(F.parse_url(url, F.lit("AUTHORITY")), F.lit(""))
    port = F.regexp_extract(auth, ":(\\d+)$", 1)
    port_part = F.when(
        (port == "")
        | ((proto == "https") & (port == "443"))
        | ((proto == "http") & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", path).otherwise(
        F.regexp_replace(path, "/+$", "")
    )
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), _is_kept_param)), "&"
    )
    q_part = F.when(kept == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), kept)
    )
    return F.concat(proto, F.lit("://"), host, port_part, path, q_part)
