"""PDF / layout parse plumbing (north-rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

No PDF codec ships in this container, so the codec step is a DETERMINISTIC
FAKE behind the same seam pattern as functions/multimodal.py (try-import
pypdf below): a document's "layout" is derived purely from its token
stream — pages of PAGE_TOKENS tokens, blocks of BLOCK_TOKENS tokens, the
first block of each page classified ``heading``, the rest ``para``, plus a
synthetic ``footer`` block per page carrying the page number.  Everything
downstream of the codec is the real pipeline shape:

* ``parse_layout``: mapInPandas FAN-OUT — one output row per block with a
  typed bbox struct (the row-multiplication shape a pdfminer/pypdf-backed
  parser needs);
* ``layout_main_text``: reading-order reconstruction that DROPS the
  footer boilerplate (the PDF analogue of the HTML script/style strip) —
  one row per document.

Every block boundary, bbox value, and reconstructed string is a pure
function of the token array, so the DuckDB oracle verifies the full
fan-out + reassembly end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import token_list

try:  # the real-codec seam — not available in this container
    import pypdf  # type: ignore # noqa: F401

    _HAVE_PYPDF = True
except Exception:  # noqa: BLE001
    _HAVE_PYPDF = False

PAGE_TOKENS = 50
BLOCK_TOKENS = 10

BLOCKS_SCHEMA = (
    "doc_id bigint, page_no int, block_no int, kind string, text string, "
    "x0 int, y0 int, x1 int, y1 int"
)
LAYOUT_TEXT_SCHEMA = "doc_id bigint, main_text string, n_pages int"

# byte-exact against Spark's tokens_col and the oracle's _toks() — see the
# tokenization note in functions/textops.py
_tokens = token_list


def _doc_blocks(doc_id: int, toks: list):
    """The fake layout model: deterministic pages/blocks/bboxes."""
    n = len(toks)
    for page_no in range((n - 1) // PAGE_TOKENS + 1):
        ptoks = toks[page_no * PAGE_TOKENS : (page_no + 1) * PAGE_TOKENS]
        n_blocks = (len(ptoks) - 1) // BLOCK_TOKENS + 1
        for block_no in range(n_blocks):
            btoks = ptoks[
                block_no * BLOCK_TOKENS : (block_no + 1) * BLOCK_TOKENS
            ]
            kind = "heading" if block_no == 0 else "para"
            y0 = block_no * 60
            yield (
                doc_id, page_no, block_no, kind, " ".join(btoks),
                72, y0, 540, y0 + 48,
            )
        yield (
            doc_id, page_no, n_blocks, "footer", f"p{page_no + 1}",
            72, 700, 540, 712,
        )


def parse_layout(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) → one row per layout block (fan-out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "page_no", "block_no", "kind", "text",
            "x0", "y0", "x1", "y1",
        ]
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _tokens(text)
                if toks:
                    rows.extend(_doc_blocks(doc_id, toks))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "text").mapInPandas(
        run, schema=BLOCKS_SCHEMA
    )


def layout_main_text(docs: DataFrame) -> DataFrame:
    """Reading-order reconstruction, footer boilerplate dropped — the PDF
    analogue of the HTML main_text strip.  One row per non-empty doc."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _tokens(text)
                if not toks:
                    continue
                n_pages = (len(toks) - 1) // PAGE_TOKENS + 1
                parts = [
                    b[4]
                    for b in _doc_blocks(doc_id, toks)
                    if b[3] != "footer"
                ]
                rows.append((doc_id, " ".join(parts), n_pages))
            yield pd.DataFrame(
                rows, columns=["doc_id", "main_text", "n_pages"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema=LAYOUT_TEXT_SCHEMA
    )
