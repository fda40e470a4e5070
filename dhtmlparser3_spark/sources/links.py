"""Deterministic link-bearing pages table for the web-graph operators.

Same construction philosophy as sources/pages.py: the html column is built
by pure whole-stage-codegen expressions from ``documents.parquet``, and the
EXPECTED outlink set is computable in closed form — so the DuckDB oracle
derives the links from the formula while the Spark side must recover them
by actually parsing the html (relational find('a') over the node table).

Per doc ``d``: ``1 + d % 3`` anchors; anchor ``j`` targets host
``(d*7 + 13*j) % 97`` — a deterministic cross-host graph over the same 97
hosts as sources/pages.URL_FMT.  Anchor 0 of every ``d % 4 == 0`` doc is
NESTED (``<a><b>l0</b></a>``) — real pages wrap anchor text in markup, and
the nested rows split the two anchor semantics: direct-children gathering
yields '' there, subtree gathering yields 'l0'
(functions/links.outlinks ``anchor_mode``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhtmlparser3_spark.sources.pages import URL_FMT

N_HOSTS = 97
HREF_FMT = "https://host%02d.example/l/%d-%d.html"


def build_link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (url, html) with deterministic <a> anchors."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    from dhtmlparser3_spark.plans.layout import spread

    docs = spread(docs)
    j = F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
    nested = lambda i: (i == 0) & (F.col("doc_id") % 4 == 0)  # noqa: E731
    anchors = F.array_join(
        F.transform(
            j,
            lambda i: F.concat(
                F.format_string(
                    '<a href="' + HREF_FMT + '" rel="x">',
                    ((F.col("doc_id") * 7 + i * 13) % N_HOSTS).cast("int"),
                    F.col("doc_id"),
                    i,
                ),
                F.when(
                    nested(i), F.format_string("<b>l%d</b>", i)
                ).otherwise(F.format_string("l%d", i)),
                F.lit("</a>"),
            ),
        ),
        "",
    )
    html = F.concat(
        F.lit('<html><body><div id="nav">'),
        anchors,
        F.lit("</div><p>t"),
        F.col("doc_id").cast("string"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.format_string(
            URL_FMT,
            (F.col("doc_id") % N_HOSTS).cast("int"),
            F.col("source"),
            F.col("doc_id"),
        ).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )


def links_oracle_sql(mode: str = "direct") -> str:
    """DuckDB closed form of the outlink set: (url, href, anchor).

    ``mode="direct"``: nested anchors (j=0 of d%4==0 docs) gather '' —
    the <b> child owns the text.  ``mode="subtree"``: every anchor
    gathers its full subtree text ('l%d' always)."""
    assert mode in ("direct", "subtree"), mode
    url = (
        f"printf('{URL_FMT}', (doc_id % {N_HOSTS})::INT, source, doc_id)"
    )
    href = (
        f"printf('{HREF_FMT}', ((doc_id * 7 + 13 * j) % {N_HOSTS})::INT, "
        "doc_id, j)"
    )
    anchor = "printf('l%d', j)"
    if mode == "direct":
        anchor = (
            "CASE WHEN j = 0 AND doc_id % 4 = 0 THEN '' "
            f"ELSE {anchor} END"
        )
    return f"""(
      SELECT {url} AS url, {href} AS href, {anchor} AS anchor
      FROM (
        SELECT doc_id, source,
               unnest(generate_series(0, CAST(doc_id % 3 AS BIGINT))) AS j
        FROM documents
      )
    )"""
