"""DOM heuristics beyond the script/style strip (north-rule: "HTML
boilerplate strip, PDF/layout parse, DOM heuristics"): text-density main
content-block selection.

``density_main_block`` picks the content-bearing block of a page the way
readability-style extractors do at their core: score every candidate
container by the amount of raw text in its subtree (script/style subtrees
excluded — they are code, not content), take the best, first-in-document
on ties.  Real extractors refine the score (link density, tag penalties);
the *shape* is what matters here — one bottom-up pass over the arena, one
Arrow UDF per batch, zero shuffles — and the scoring is deliberately
simple enough that the DuckDB oracle can recompute the winner closed-form
per template.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.engine.dom import Arena, parse_arena
from dhtmlparser3_spark.engine.lexer import TAG, TEXT
from dhtmlparser3_spark.functions.extract import decode_html

CANDIDATE_NAMES = frozenset({"p", "div", "article", "section", "main", "td"})
_EXCLUDE = frozenset({"script", "style"})


def subtree_text_lengths(a: Arena) -> list:
    """text_len[nid] = total characters of TEXT nodes in nid's subtree,
    with script/style subtrees contributing 0 — one iterative post-order
    pass (no recursion: junk HTML nests arbitrarily deep)."""
    n = len(a.kind)
    kind_l, name_l, text_l, ch_l = a.kind, a.name, a.text, a.children
    total = [0] * n
    stack: list = [(a.result_root, False)]
    while stack:
        nid, done = stack.pop()
        k = kind_l[nid]
        if k == TEXT:
            total[nid] = len(text_l[nid])
            continue
        if k != TAG:
            continue
        if done:
            s = 0
            for ch in ch_l[nid]:
                s += total[ch]
            total[nid] = s
            continue
        if name_l[nid].lower() in _EXCLUDE:
            continue  # stays 0
        stack.append((nid, True))
        for ch in ch_l[nid]:
            stack.append((ch, False))
    return total


def density_main_block(html: str) -> Optional[Tuple[str, int]]:
    """(winning candidate tag name, its subtree text length) for one
    document; None when the page has no candidate containers.  Ties go to
    the earliest candidate in document (pre-order) order."""
    a = parse_arena(html)
    total = subtree_text_lengths(a)
    best: Optional[Tuple[str, int]] = None
    best_score = -1
    stack = [a.result_root]
    order: list = []
    while stack:
        nid = stack.pop()
        if a.kind[nid] != TAG:
            continue
        order.append(nid)
        for ch in reversed(a.children[nid]):
            stack.append(ch)
    for nid in order:  # pre-order → first wins on strict greater
        if a.name[nid].lower() in CANDIDATE_NAMES and total[nid] > best_score:
            best = (a.name[nid], total[nid])
            best_score = total[nid]
    return best


def main_block(pages: DataFrame) -> DataFrame:
    """(url, block_name, block_text_len) per page via one Arrow UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<block_name:string,block_text_len:int>")
    def _mb(html):
        import pandas as pd

        def one(h):
            # poison-page contract (same as every parse UDF in
            # functions/extract.py): a raising document yields a NULL
            # row, never a task failure — parse_arena propagates the
            # reference's ValueError on out-of-range numeric entities
            try:
                r = density_main_block(decode_html(h))
            except Exception:  # noqa: BLE001 — error-row at scale
                r = None
            if r is None:
                return {"block_name": None, "block_text_len": None}
            return {"block_name": r[0], "block_text_len": r[1]}

        return pd.DataFrame(list(html.map(one)), index=html.index)

    return pages.select("url", _mb(F.col("html")).alias("b")).select(
        "url",
        F.col("b.block_name").alias("block_name"),
        F.col("b.block_text_len").alias("block_text_len"),
    )
