"""URL canonicalization: the dedup-key factory for crawl urls.

The same page is typically captured under many url spellings —
`HTTP://Host.Example:80/a/../b#frag?utm_source=x` and
`http://host.example/b` are one resource — and exact/near dedup keyed on
the raw url misses all of them.  ``canonical_url`` applies the
deterministic, loss-bounded normalizations crawlers and web archives
agree on (RFC 3986 §6 syntax-based normalization plus the
tracking-param strip every training pipeline wants):

  * scheme and host lowercased; trailing root-dot dropped from the host
  * default port dropped (``:80`` http / ``:443`` https)
  * percent-escapes uppercased (``%3c`` → ``%3C``) and unreserved
    characters decoded (``%41`` → ``A``) — RFC 3986 §6.2.2
  * dot-segments resolved (``/a/./b/../c`` → ``/a/c``) — §5.2.4
  * empty path → ``/``; fragment dropped
  * known tracking params removed (``utm_*`` and the click-id set);
    remaining params keep page-author order (or ``sort_query=True``
    for the aggressive profile)

Semantics are a PURE function (no network, no IDNA/punycode — a
non-ASCII host passes through lowercased) so the same url string always
maps to the same key on every executor and every engine.  Idempotence
(`canon(canon(u)) == canon(u)`) is property-tested — the load-bearing
contract for a dedup key.

Scale shape: ``with_canonical_url`` is one Arrow-batched pandas UDF
projection — map-only, no shuffle; the downstream dedup
(`functions/dedup.exact_duplicates` keyed on the new column, or a plain
groupBy) shuffles on the canonical key, which this normalization makes
MORE uniform (spelling variants collapse before the exchange, not
after).  (Reference tie-in: none — pipeline curation surface, like
robots.py.)

Two canonicalization profiles live in this package, by design:

  * ``quality_filters.canonical_url_col`` — the CONSERVATIVE codegen
    profile (case, default ports, fragment, query sort; deliberately no
    dot segments or escape rewriting), whole-stage-codegen and
    expressible in the DuckDB oracle — use it inside driver-oracled
    relational plans;
  * this module — the FULL crawler profile (adds percent-escape
    normalization, dot segments, tracking strip, WHATWG whitespace),
    a pure idempotent Python function for the dedup key itself.

Both collapse the conservative profile's equivalence classes; this one
collapses strictly more.
"""

from __future__ import annotations

import re
from typing import List
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# the widely-agreed tracking/click-id params (utm_* handled by prefix)
TRACKING_PARAMS = frozenset(
    {
        "gclid", "fbclid", "msclkid", "dclid", "twclid", "igshid",
        "mc_cid", "mc_eid", "_ga", "_gl", "yclid", "wbraid", "gbraid",
    }
)

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _norm_pct(s: str) -> str:
    """Uppercase percent-escape hex; decode escapes of unreserved chars
    (RFC 3986 §6.2.2.1-2).  Malformed escapes (``%zz``, lone ``%``)
    pass through untouched — normalization must never invent bytes."""

    def one(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(one, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 over an absolute path."""
    out: List[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing slash produced by /. or /.. endings
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def _encode_ws(s: str) -> str:
    """Tabs/newlines removed (the WHATWG URL parser strips them
    anywhere), residual spaces %20-encoded — a canonical key must carry
    no raw whitespace or the outer strip breaks idempotence."""
    return (
        s.replace("\t", "").replace("\n", "").replace("\r", "")
        .replace(" ", "%20")
    )


def _is_tracking(key: str) -> bool:
    return key.lower().startswith("utm_") or key.lower() in TRACKING_PARAMS


def canonical_url(
    url: str,
    strip_tracking: bool = True,
    sort_query: bool = False,
) -> str:
    """One url → its canonical spelling (module docstring).  Anything
    unsplittable passes through stripped-but-otherwise-verbatim — a
    canonicalizer must never lose a row."""
    url = (url or "").strip()
    try:
        s = urlsplit(url)
    except ValueError:
        return url
    if not s.scheme or not s.netloc:
        return url  # relative / opaque: not a fetchable capture key
    scheme = s.scheme.lower()
    host = (s.hostname or "").lower().rstrip(".")
    if ":" in host:  # IPv6 literal: urlsplit strips the brackets
        host = f"[{host}]"
    default = {"http": 80, "https": 443}.get(scheme)
    try:
        port = s.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and port != default:
        netloc = f"{host}:{port}"
    if s.username:
        cred = s.username + (f":{s.password}" if s.password else "")
        netloc = f"{cred}@{netloc}"

    path = _remove_dot_segments(_encode_ws(_norm_pct(s.path))) or "/"

    query = ""
    if s.query:
        pairs = [
            p.split("=", 1) if "=" in p else [p]
            for p in s.query.split("&")
            if p != ""
        ]
        if strip_tracking:
            pairs = [p for p in pairs if not _is_tracking(p[0])]
        if sort_query:
            pairs.sort()
        query = "&".join(
            "=".join(_encode_ws(_norm_pct(x)) for x in p) for p in pairs
        )

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out  # fragment dropped


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    strip_tracking: bool = True,
    sort_query: bool = False,
) -> DataFrame:
    """df + ``out_col``: the canonical spelling of ``url_col``, one
    Arrow-batched map-only projection."""

    @pandas_udf("string")
    def canon(urls: pd.Series) -> pd.Series:
        return pd.Series(
            [
                canonical_url(u, strip_tracking, sort_query)
                for u in urls.fillna("")
            ]
        )

    return df.withColumn(out_col, canon(F.col(url_col)))


def url_spelling_dups(
    pages: DataFrame, url_col: str = "url", **canon_kw
) -> DataFrame:
    """(canonical_url, n_spellings, urls) for every canonical key with
    more than one raw spelling — the url-level dedup report.  One
    projection + one groupBy on the canonical key (uniform by
    construction: variants collapsed BEFORE the exchange)."""
    return (
        with_canonical_url(pages, url_col, **canon_kw)
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_spellings"),
            F.sort_array(F.collect_list(url_col)).alias("urls"),
        )
        .where(F.col("n_spellings") > 1)
    )
