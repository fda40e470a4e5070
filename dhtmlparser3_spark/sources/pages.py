"""Deterministic Common-Crawl-style ``pages`` table (FIXTURES.md §1/§3).

Shape per BASELINE.json ``input_hint``:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Five HTML templates cycle by ``doc_id % 5`` over ``documents.parquet``.  The
templates, the *expected* ``content_str`` serialization, and the expected
boilerplate-stripped ``main_text`` are all generated from ONE shared
piece-list spec, compiled three ways:

* a Spark ``Column`` (pure built-in functions → whole-stage codegen, no UDF
  in table construction),
* a DuckDB SQL expression (the driver-side oracle),
* the per-template expected-output strings (verified byte-identical against
  the vendored reference parser in tests/test_spark_extract.py).

Pieces: ``("lit", s)`` literal • ``("id",)`` doc_id as decimal string •
``("etext",)`` html.escape(text) (quote=True — &, <, >, ", ').
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Piece = Tuple[str, ...]

# html.escape replacement order (stdlib html.__init__): & < > " '
_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#x27;")]

# --- the 5 input templates --------------------------------------------------

TEMPLATES: List[List[Piece]] = [
    # 0 clean
    [
        ("lit", "<html><head><title>"),
        ("id",),
        ("lit", "</title></head><body><p>"),
        ("etext",),
        ("lit", "</p></body></html>"),
    ],
    # 1 boilerplate: style + comment + script around the payload
    [
        ("lit", "<html><head><title>"),
        ("id",),
        ("lit", "</title><style>p { }</style></head><body><!-- nav -->"),
        ("lit", "<script>var x = 1;</script><p>"),
        ("etext",),
        ("lit", '</p><div class="footer">(c) example.com</div></body></html>'),
    ],
    # 2 malformed: unclosed <br><img> run + stray </span> (reshape B2 +
    # unmatched-end-tag drop, parser.py:60-77)
    [
        ("lit", '<html><body><div><br><img src="x.png">'),
        ("etext",),
        ("lit", "</span><hr></div><p>tail</p></body></html>"),
    ],
    # 3 entities: named/dec/hex/nbsp/unknown (tokens.py:120-150 paths)
    [
        ("lit", "<html><body><p>"),
        ("etext",),
        ("lit", " &amp; &lt;tag&gt; &#65;&#x41; &nbsp; &copy; &unknown;</p></body></html>"),
    ],
    # 4 attrs: mixed-case keys, bare + unquoted + multiline values
    [
        ("lit", '<html><body><div id="d'),
        ("id",),
        ("lit", '" class="content main" data-x=bare><div CLASS="inner" title="line1\nline2">'),
        ("etext",),
        ("lit", "</div></div></body></html>"),
    ],
]

# --- expected extraction outputs per template (reference semantics) ----------
# content_str of the (unwrapped) <html> root: children serialized via
# to_string, text re-escaped — the escape round-trips so `etext` reappears.

EXPECTED_CONTENT_STR: List[List[Piece]] = [
    [
        ("lit", "<head><title>"),
        ("id",),
        ("lit", "</title></head><body><p>"),
        ("etext",),
        ("lit", "</p></body>"),
    ],
    [
        ("lit", "<head><title>"),
        ("id",),
        ("lit", "</title><style>p { }</style></head><body><!-- nav -->"),
        ("lit", "<script>var x = 1;</script><p>"),
        ("etext",),
        ("lit", '</p><div class="footer">(c) example.com</div></body>'),
    ],
    # reshape: div.content becomes [br, img, text, hr]; </span> dropped
    [
        ("lit", '<body><div><br /><img src="x.png" />'),
        ("etext",),
        ("lit", "<hr /></div><p>tail</p></body>"),
    ],
    # decoded then re-escaped: &→&amp; <→&lt; >→&gt;; A A stay; \xa0 and ©
    # are NOT re-escaped by html.escape; &unknown; came back lowercased and
    # re-escapes its ampersand
    [
        ("lit", "<body><p>"),
        ("etext",),
        ("lit", " &amp; &lt;tag&gt; AA \xa0 \xa9 &amp;unknown;</p></body>"),
    ],
    # unquoted value gets quoted on output; key case preserved
    [
        ("lit", '<body><div id="d'),
        ("id",),
        ("lit", '" class="content main" data-x="bare"><div CLASS="inner" title="line1\nline2">'),
        ("etext",),
        ("lit", "</div></div></body>"),
    ],
]

# prettify of the parsed root (tag.py:422-478), derived from the reference
# and pinned against it in tests/test_spark_extract.py.  One spec covers
# empty AND non-empty payloads: the corpus text is newline-free with no
# leading/trailing whitespace, so the payload never flips a multiline /
# indent heuristic — dropping the text node (empty payload) produces
# exactly the same bytes as substituting '' for etext.
EXPECTED_PRETTIFY: List[List[Piece]] = [
    [
        ("lit", "<html>\n  <head>\n    <title>"),
        ("id",),
        ("lit", "</title>\n  </head>\n  <body>\n    <p>"),
        ("etext",),
        ("lit", "</p>\n  </body>\n</html>\n"),
    ],
    [
        ("lit", "<html>\n  <head>\n    <title>"),
        ("id",),
        (
            "lit",
            "</title>\n<style>p { }</style>\n  </head>\n  <body>\n"
            "    <!-- nav --><script>var x = 1;</script>\n    <p>",
        ),
        ("etext",),
        (
            "lit",
            '</p>\n    <div class="footer">(c) example.com</div>\n'
            "  </body>\n</html>\n",
        ),
    ],
    [
        (
            "lit",
            "<html>\n  <body>\n    <div>\n      <br />\n"
            '      <img src="x.png" />\n',
        ),
        ("etext",),
        (
            "lit",
            "      <hr />\n    </div>\n    <p>tail</p>\n  </body>\n</html>\n",
        ),
    ],
    [
        ("lit", "<html>\n  <body>\n    <p>"),
        ("etext",),
        (
            "lit",
            " &amp; &lt;tag&gt; AA \xa0 \xa9 &amp;unknown;</p>\n"
            "  </body>\n</html>\n",
        ),
    ],
    [
        ("lit", '<html>\n  <body>\n    <div id="d'),
        ("id",),
        (
            "lit",
            '" class="content main" data-x="bare">\n'
            '      <div CLASS="inner" title="line1\nline2">',
        ),
        ("etext",),
        ("lit", "</div>\n    </div>\n  </body>\n</html>\n"),
    ],
]

# main_text = content_without_tags after removing script/style subtrees
# (comments are already dropped by content_without_tags, tag.py:75-88)
EXPECTED_MAIN_TEXT: List[List[Piece]] = [
    [("id",), ("text",)],
    [("id",), ("text",), ("lit", "(c) example.com")],
    [("text",), ("lit", "tail")],
    [("text",), ("lit", " & <tag> AA \xa0 \xa9 &unknown;")],
    [("text",)],
]

# content_without_tags WITHOUT boilerplate strip: script/style text stays,
# in document order (title, style, script, payload, footer for template 1)
EXPECTED_CWT: List[List[Piece]] = [
    [("id",), ("text",)],
    [
        ("id",),
        ("lit", "p { }"),
        ("lit", "var x = 1;"),
        ("text",),
        ("lit", "(c) example.com"),
    ],
    [("text",), ("lit", "tail")],
    [("text",), ("lit", " & <tag> AA \xa0 \xa9 &unknown;")],
    [("text",)],
]


# --- compilers ---------------------------------------------------------------


def _esc_col(col: Column) -> Column:
    for a, b in _ESC:
        col = F.replace(col, F.lit(a), F.lit(b))
    return col


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _esc_sql(expr: str) -> str:
    for a, b in _ESC:
        expr = f"replace({expr}, {_sql_quote(a)}, {_sql_quote(b)})"
    return expr


def compile_col(pieces: List[Piece], doc_id: str = "doc_id", text: str = "text") -> Column:
    cols = []
    for p in pieces:
        if p[0] == "lit":
            cols.append(F.lit(p[1]))
        elif p[0] == "id":
            cols.append(F.col(doc_id).cast("string"))
        elif p[0] == "etext":
            cols.append(_esc_col(F.col(text)))
        elif p[0] == "text":
            cols.append(F.col(text))
        else:  # pragma: no cover
            raise ValueError(p)
    return F.concat(*cols)


def compile_sql(pieces: List[Piece], doc_id: str = "doc_id", text: str = "text") -> str:
    parts = []
    for p in pieces:
        if p[0] == "lit":
            parts.append(_sql_quote(p[1]))
        elif p[0] == "id":
            parts.append(f"CAST({doc_id} AS VARCHAR)")
        elif p[0] == "etext":
            parts.append(_esc_sql(text))
        elif p[0] == "text":
            parts.append(text)
        else:  # pragma: no cover
            raise ValueError(p)
    return "(" + " || ".join(parts) + ")"


def compile_py(pieces: List[Piece], doc_id: int, text: str) -> str:
    import html as _html

    parts = []
    for p in pieces:
        if p[0] == "lit":
            parts.append(p[1])
        elif p[0] == "id":
            parts.append(str(doc_id))
        elif p[0] == "etext":
            parts.append(_html.escape(text))
        elif p[0] == "text":
            parts.append(text)
    return "".join(parts)


def case_over_templates(specs: List[List[Piece]], doc_id: str = "doc_id") -> Column:
    expr = None
    for t, pieces in enumerate(specs):
        cond = (F.col(doc_id) % 5) == t
        val = compile_col(pieces, doc_id=doc_id)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr


def case_over_templates_sql(specs: List[List[Piece]], doc_id: str = "doc_id") -> str:
    whens = "".join(
        f" WHEN {doc_id} % 5 = {t} THEN {compile_sql(p, doc_id=doc_id)}"
        for t, p in enumerate(specs)
    )
    return f"(CASE{whens} END)"


# --- the pages table ---------------------------------------------------------

URL_FMT = "https://host%02d.example/%s/%d.html"


def build_pages(
    spark: SparkSession,
    sf_dir: str,
    multiplier: int = 1,
    repartition: int | None = None,
) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    ``multiplier`` deterministically replicates the corpus (doc_id-space is
    re-keyed so urls stay unique) — used by the benchmark to reach a
    meaningful document count; correctness paths use multiplier=1.

    Pure built-in expressions end-to-end: the html column is constructed
    inside whole-stage codegen; no Python is involved until extraction.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # The docs parquet is one file → one scan partition; spread the CHEAP
    # rows (doc_id/text/source/lang, ~350B) across the cluster BEFORE the
    # html construction so the build is parallel and the broadcast
    # multiplier fans out locally.  Without this, one task would synthesize
    # the whole corpus — Amdahl's law then caps any scaling measurement.
    if repartition is None:
        repartition = spark.sparkContext.defaultParallelism * 2
    if repartition:
        docs = docs.repartition(repartition)
    if multiplier > 1:
        reps = spark.range(multiplier).withColumnRenamed("id", "rep")
        docs = docs.crossJoin(F.broadcast(reps)).withColumn(
            "doc_id", F.col("doc_id") * multiplier + F.col("rep")
        ).drop("rep")
    out = docs.select(
        F.format_string(
            URL_FMT, (F.col("doc_id") % 97).cast("int"), F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, doc_id)"
        ).alias("warc_ts"),
        F.encode(case_over_templates(TEMPLATES), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
    return out


def pages_oracle_sql(sf_dir: str, what: str) -> str:
    """DuckDB SQL producing the EXPECTED extraction output straight from the
    ``documents`` view — the independent oracle for the Spark pipeline."""
    if what == "content_str":
        val = case_over_templates_sql(EXPECTED_CONTENT_STR)
    elif what == "main_text":
        val = case_over_templates_sql(EXPECTED_MAIN_TEXT)
    elif what == "content_without_tags":
        val = case_over_templates_sql(EXPECTED_CWT)
    elif what == "prettify":
        val = case_over_templates_sql(EXPECTED_PRETTIFY)
    elif what == "html":
        val = case_over_templates_sql(TEMPLATES)
    else:  # pragma: no cover
        raise ValueError(what)
    url = "printf('https://host%02d.example/%s/%d.html', (doc_id % 97)::INT, source, doc_id)"
    return f"SELECT {url} AS url, {val} AS value FROM documents"
