"""robots.txt compliance tier: parse crawl-captured robots files and
filter a pages table down to fetch-allowed urls.

A responsible training-data pipeline excludes pages whose host forbade
crawling; Common Crawl itself ships the robots.txt captures alongside
the page captures, so the natural loop is

    read_warc(robots shards) → robots_rules(agent) ──┐ per-host rules
    read_warc(page shards)   → pages ────────────────┴→ robots_filter

Semantics are EXACTLY Python stdlib ``urllib.robotparser`` (first
matching rule in file order wins, prefix match on the %-quoted path,
entry selected by case-insensitive substring user-agent match, default
allow) — not RFC 9309's longest-match-with-wildcards.  The stdlib is
both the implementation (``parse_robots`` drives ``RobotFileParser``
itself, so parsing can never drift from the documented contract) and
the test oracle (differential + hypothesis fuzz in test_robots.py).

Scale shape: robots files are tiny and one-per-host, so ``robots_rules``
is a map-only Arrow pass producing ONE row per host (rules as an
``array<struct<path,allow>>`` column — a few hundred bytes/host).
``robots_filter`` joins pages to rules on host (sort-merge at crawl
scale where both sides are huge; pass ``broadcast=True`` when the rule
table is a curated subset) and evaluates the first-match scan in a
vectorized Arrow-batched pandas UDF — per-row cost is a handful of
``startswith`` calls over an already-joined array, no shuffle beyond
the one host join, hosts without robots default-allow via the left
join.  (Reference tie-in: none — dhtmlparser3 is a parser; this is the
pipeline curation surface around it, like quality_filters.py.)
"""

from __future__ import annotations

from typing import List, Optional, Tuple
from urllib.parse import quote, unquote, urlparse, urlunparse
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# host key: same expression url_features uses, so robots rules and page
# curation group on the identical key
_HOST_RE = r"^https?://([^/]+)"

_RULES_T = "array<struct<path:string,allow:boolean>>"
RULES_SCHEMA = f"host string, rules {_RULES_T}"


def parse_robots(text: str, agent: str = "*") -> List[Tuple[str, bool]]:
    """robots.txt body → the (path, allow) rule list the stdlib would
    consult for ``agent``, in file order.  Drives ``RobotFileParser``
    itself — entry selection (first entry whose user-agent matches,
    else the ``*`` default entry) and rule normalization (%-quote,
    empty-Disallow-is-allow-all) are the stdlib's own, by construction.
    An unmatched agent yields ``[]`` — default allow."""
    rp = RobotFileParser()
    rp.parse(text.splitlines())
    entry = None
    for e in rp.entries:
        if e.applies_to(agent):
            entry = e
            break
    if entry is None:
        entry = rp.default_entry
    if entry is None:
        return []
    return [(rl.path, bool(rl.allowance)) for rl in entry.rulelines]


def request_path(url: str) -> str:
    """The path string ``RobotFileParser.can_fetch`` matches rules
    against: unquote the url, keep path+params+query+fragment, re-quote,
    '/' when empty.  Must be byte-identical to the stdlib or prefix
    matches diverge on %-encoded urls."""
    parsed = urlparse(unquote(url))
    path = urlunparse(
        ("", "", parsed.path, parsed.params, parsed.query, parsed.fragment)
    )
    return quote(path) or "/"


def allowance(rules, path: str) -> bool:
    """First-match-in-file-order scan (the stdlib Entry.allowance):
    a rule applies when its path is ``*`` or a prefix of ``path``;
    no rule applies → allow.  ``rules`` may be a list, a numpy array
    (Arrow hands those to pandas UDFs), or None (left-join miss)."""
    if rules is None:
        return True
    try:
        if len(rules) == 0:
            return True
    except TypeError:  # NaN from a left-join miss in a pandas batch
        return True
    for r in rules:
        rpath = r["path"] if isinstance(r, dict) else r[0]
        allow = r["allow"] if isinstance(r, dict) else r[1]
        if rpath == "*" or path.startswith(rpath):
            return bool(allow)
    return True


def can_fetch(text: str, url: str, agent: str = "*") -> bool:
    """Pure-python composition (parse → normalize → scan) — the single
    semantic tested differentially against RobotFileParser.can_fetch."""
    return allowance(parse_robots(text, agent), request_path(url))


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(url, body) robots captures → ``RULES_SCHEMA``: one row per host
    with the agent-resolved rule list.  ``body`` may be string or binary
    (read_warc hands UTF-8 bytes); undecodable bytes decode with
    replacement, matching what the stdlib does to a fetched file.
    Map-only; duplicate captures of a host keep the lexically-first url
    (deterministic) via a min-by aggregation."""

    @pandas_udf(_RULES_T)
    def rules_of(bodies: pd.Series) -> pd.Series:
        out = []
        for b in bodies:
            if b is None:
                out.append([])
                continue
            if isinstance(b, (bytes, bytearray)):
                b = bytes(b).decode("utf-8", errors="replace")
            out.append(
                [
                    {"path": p, "allow": a}
                    for p, a in parse_robots(b, agent)
                ]
            )
        return pd.Series(out)

    one_per_host = (
        robots.select(
            F.regexp_extract("url", _HOST_RE, 1).alias("host"),
            F.col("url"),
            F.col("body"),
        )
        .where(F.col("host") != "")
        .groupBy("host")
        .agg(F.min_by("body", F.col("url")).alias("body"))
    )
    return one_per_host.select(
        "host", rules_of(F.col("body")).alias("rules")
    )


def robots_allowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast: bool = False,
) -> DataFrame:
    """pages + ``allowed`` boolean column: left-join rules on host (no
    robots → NULL rules → allow), then one vectorized first-match scan.
    ``broadcast=True`` hints the rules side (use when the rule table is
    a curated subset that fits an executor; at full crawl scale leave
    it to the sort-merge/AQE planner)."""

    @pandas_udf("boolean")
    def allowed_of(paths: pd.Series, rule_lists: pd.Series) -> pd.Series:
        return pd.Series(
            [allowance(rl, p) for p, rl in zip(paths, rule_lists)]
        )

    @pandas_udf("string")
    def req_path_of(urls: pd.Series) -> pd.Series:
        return pd.Series([request_path(u or "") for u in urls])

    r = F.broadcast(rules) if broadcast else rules
    joined = pages.withColumn(
        "__host", F.regexp_extract(url_col, _HOST_RE, 1)
    ).join(r.withColumnRenamed("host", "__host"), "__host", "left")
    return (
        joined.withColumn(
            "allowed", allowed_of(req_path_of(F.col(url_col)), F.col("rules"))
        )
        .drop("__host", "rules")
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast: bool = False,
) -> DataFrame:
    """Keep only fetch-allowed pages (schema unchanged) — the curation
    pass a compliant training pipeline runs before anything else."""
    return (
        robots_allowed(pages, rules, url_col, broadcast)
        .where(F.col("allowed"))
        .drop("allowed")
    )


def crawl_delay_of(text: str, agent: str = "*") -> Optional[float]:
    """The politeness interval robots.txt asks of ``agent``, in seconds:
    stdlib ``RobotFileParser.crawl_delay`` first (the ``Crawl-delay``
    directive of the matching entry), else ``request_rate`` converted to
    an interval (``Request-rate: 1/5`` → 5.0 s), else None (no directive
    — the CALLER picks the polite default; robots silence is not
    permission to hammer).  Non-numeric directives parse to None the way
    the stdlib discards them."""
    rp = RobotFileParser()
    rp.parse(text.splitlines())
    d = rp.crawl_delay(agent)
    if d is not None:
        try:
            return float(d)
        except (TypeError, ValueError):
            return None
    rr = rp.request_rate(agent)
    if rr is not None and rr.requests:
        return float(rr.seconds) / float(rr.requests)
    return None


def robots_delays(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(url, body) robots captures → ``(host, crawl_delay)`` — one row
    per host with the agent-resolved politeness interval (seconds;
    NULL when robots.txt states none).  Same map-only shape and same
    deterministic min-by-url host dedup as ``robots_rules``; feed it to
    ``pipeline.frontier.fetch_schedule``."""

    @pandas_udf("double")
    def delay_of(bodies: pd.Series) -> pd.Series:
        out = []
        for b in bodies:
            if b is None:
                out.append(None)
                continue
            if isinstance(b, (bytes, bytearray)):
                b = bytes(b).decode("utf-8", errors="replace")
            out.append(crawl_delay_of(b, agent))
        return pd.Series(out, dtype="float64")

    one_per_host = (
        robots.select(
            F.regexp_extract("url", _HOST_RE, 1).alias("host"),
            F.col("url"),
            F.col("body"),
        )
        .where(F.col("host") != "")
        .groupBy("host")
        .agg(F.min_by("body", F.col("url")).alias("body"))
    )
    return one_per_host.select(
        "host", delay_of(F.col("body")).alias("crawl_delay")
    )
