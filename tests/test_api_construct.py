"""Constructed-DOM parity: Tag()/Comment() built by hand, not parsed
(script/style no-escape serialization, test_tag.py:749-752)."""

from __future__ import annotations

from dhtmlparser3_spark.engine import api


def test_script_style_no_escape(ref):
    import dhtmlparser3

    for name in ["script", "style"]:
        rt = dhtmlparser3.Tag(name, content=["< > & \" '"])
        ot = api.Tag(name, content=["< > & \" '"])
        assert ot.to_string() == rt.to_string()
    rt = dhtmlparser3.Tag("div", content=["< > & \" '"])
    ot = api.Tag("div", content=["< > & \" '"])
    assert ot.to_string() == rt.to_string()


def test_tag_with_params_and_nesting(ref):
    import dhtmlparser3

    ri = dhtmlparser3.Tag("i", content=["x"])
    rt = dhtmlparser3.Tag("b", parameters={"a": "1"}, content=["t", ri])
    oi = api.Tag("i", content=["x"])
    ot = api.Tag("b", parameters={"a": "1"}, content=["t", oi])
    assert ot.to_string() == rt.to_string()
    assert ot.content_str() == rt.content_str()


def test_comment_construct(ref):
    import dhtmlparser3

    assert api.Comment("hi").to_string() == dhtmlparser3.Comment("hi").to_string()
    assert api.Comment("  ").to_string() == dhtmlparser3.Comment("  ").to_string()


def test_file_parser_roundtrip(ref, tmp_path):
    import dhtmlparser3

    src = tmp_path / "page.html"
    src.write_text("<html><body><p a=1>x &amp; y</p><br></body></html>")
    rfp = dhtmlparser3.parse_file(str(src))
    ofp = api.parse_file(str(src))
    assert str(ofp.dom) == str(rfp.dom)
    rout, oout = tmp_path / "r.html", tmp_path / "o.html"
    rfp.write(str(rout))
    ofp.write(str(oout))
    assert oout.read_text() == rout.read_text()


def test_nonpair_render(ref):
    import dhtmlparser3

    rt = dhtmlparser3.Tag("br", is_non_pair=True)
    ot = api.Tag("br", is_non_pair=True)
    assert ot.to_string() == rt.to_string()
    assert ot.prettify() == rt.prettify()


def test_tables_reader_fallback(spark, tmp_path):
    """read_pages/write_pages fall back to parquet when no Iceberg runtime
    is registered (this sandbox ships none)."""
    from dhtmlparser3_spark.sources.pages import build_pages
    from dhtmlparser3_spark.sources.tables import (
        have_iceberg,
        read_pages,
        write_pages,
    )

    assert have_iceberg(spark) is False  # sandbox has no iceberg jars
    src = build_pages(spark, "/root/testdata/sf0.001").limit(20)
    target = str(tmp_path / "pages.parquet")
    write_pages(src, target)
    back = read_pages(spark, target)
    assert back.count() == 20
    assert set(back.columns) >= {"url", "warc_ts", "html", "text", "lang"}


def test_bucketed_join_no_exchange(spark):
    """write_bucketed: equi-join on the bucket key plans ZERO exchanges
    (co-located join); the same join on plain parquet shuffles both sides."""
    import pyspark.sql.functions as F

    SF = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from dhtmlparser3_spark.sources.tables import write_bucketed

        write_bucketed(orders, "t_orders_b", "o_custkey", 8)
        write_bucketed(cust, "t_customer_b", "c_custkey", 8)
        j = spark.table("t_orders_b").join(
            spark.table("t_customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        plain = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") >= 2
        assert j.count() == plain.count()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_layout_spread(spark):
    """spread() widens single-split inputs to cluster parallelism and
    leaves well-split inputs untouched."""
    from dhtmlparser3_spark.plans.layout import spread

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = spread(docs)
    assert (
        wide.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    assert wide.count() == docs.count()
    # idempotent: an already-wide frame passes through untouched
    assert spread(wide) is wide


def test_layout_probe_edge_cases(spark):
    """has_parallelism decides from the GOVERNING (topmost) layout node of
    the analyzed plan tree: exact ordering for repartition/coalesce
    combinations in either order, narrow governing repartitions override
    wide file splits, and bracket-printing partition expressions don't
    break the fallback text probe."""
    from pyspark.sql import functions as F

    from dhtmlparser3_spark.plans.layout import (
        _plan_layout,
        has_parallelism,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = docs.repartition(64, F.col("doc_id"))
    assert has_parallelism(wide, 64)
    assert not has_parallelism(wide.coalesce(1), 2)
    # repartition THEN coalesce: the coalesce governs -> narrow (judging
    # it wide would Amdahl-cap the map stage on 1 partition, ADVICE r3)
    assert not has_parallelism(wide.coalesce(1), 64)
    # coalesce THEN repartition: the repartition governs -> wide (the
    # tree walk resolves the ordering the text probe cannot)
    assert has_parallelism(docs.coalesce(1).repartition(64, "doc_id"), 64)
    # a NARROW governing repartition overrides however-wide file splits
    assert not has_parallelism(docs.repartition(2), 4)
    # repartition(col) WITHOUT a count must not be credited with
    # shuffle.partitions width: AQE coalesces column-only repartition
    # shuffles (runtime width can land on 1 over this small input), so
    # the data-size-driven scan estimate decides — narrow here
    assert not has_parallelism(docs.repartition("doc_id"), 8)
    assert docs.repartition("doc_id").rdd.getNumPartitions() <= 8
    # a coalesce that still clears the threshold is width-TRANSPARENT:
    # the subtree decides (256 -> capped at 64, wide at 16)...
    assert has_parallelism(docs.repartition(256).coalesce(64), 16)
    # ...but a transparent coalesce over a bare narrow scan stays narrow
    assert not has_parallelism(docs.coalesce(64), 16)
    # a union with one bare-scan branch is NOT judged wide by the other
    # branch's repartition: the ungoverned path folds in the scan estimate
    assert not has_parallelism(docs.union(wide), 64)
    # bracket-printing partition expression: split(text)[0] renders as
    # "...[0]" inside the RepartitionByExpression arg list — the width
    # anchor of the FALLBACK text probe must still reach the trailing
    # ", 64" (the primary tree walk never parses text)
    bracketed = docs.repartition(64, F.split(F.col("text"), " ")[0])
    assert has_parallelism(bracketed, 64)
    assert _plan_layout(bracketed)[0] == 64  # fallback regex direct
    # count-less repartition(col) must route to the TREE WALK, not the
    # layout-free scan-estimate fast path: even over an arbitrarily wide
    # scan the AQE-collapsible column shuffle governs (round-4 review —
    # the small-data assert above passes for the wrong reason otherwise)
    from dhtmlparser3_spark.plans import layout as _lay

    countless = docs.repartition("doc_id")
    assert _plan_layout(countless)[2] is True  # flagged by the text probe
    orig = _lay._scan_split_estimate
    _lay._scan_split_estimate = lambda df: 10_000  # pretend 100 TB scan
    try:
        assert not has_parallelism(countless, 8)
        # and the fast path still credits a genuinely layout-free plan
        assert has_parallelism(docs, 8)
    finally:
        _lay._scan_split_estimate = orig
    # a coalesced BROADCAST dimension must not veto the wide fact side:
    # the replicated side's partitioning never reaches the probe/join
    # stage (round-4 review — spurious full re-shuffle otherwise)
    dim = docs.select("doc_id").limit(3).coalesce(1)
    joined = wide.join(F.broadcast(dim), "doc_id")
    assert has_parallelism(joined, 64)
    # non-hinted joins still take the conservative min over branches
    assert not has_parallelism(wide.join(dim, "doc_id"), 64)


def test_mutation_surface_reference_quirks(ref):
    """Round-4 review parity pins: the reference's mutation surface has
    value-vs-identity quirks our views must reproduce exactly."""
    from dhtmlparser3_spark.engine import api

    # remove(str) delegates to list.remove → FIRST VALUE-equal sibling
    # goes, even when the identity match was the second one
    rd = ref.parse("<div>xy<b></b>xy</div>")
    rd.remove(rd.find("div")[0].content[2])
    od = api.parse("<div>xy<b></b>xy</div>")
    od.remove(od.find("div")[0].content[2])
    assert str(od) == str(rd) == "<div><b></b>xy</div>"

    # __setitem__ locates the slot via content.index == (structural Tag
    # equality): dom[1] = Tag('b') replaces the FIRST equal <a>
    rd = ref.parse("<div><a>x</a><a>y</a></div>").find("div")[0]
    rd[1] = ref.Tag("b")
    od = api.parse("<div><a>x</a><a>y</a></div>").find("div")[0]
    od[1] = api.Tag("b")
    assert str(od) == str(rd) == "<div><b></b><a>y</a></div>"
    rd = ref.parse("<div><a>x</a><a>y</a></div>").find("div")[0]
    rd[1:] = ref.Tag("b")
    od = api.parse("<div><a>x</a><a>y</a></div>").find("div")[0]
    od[1:] = api.Tag("b")
    assert str(od) == str(rd)

    # wfind returns a full blank Tag: non-wfind methods chain off it
    html = '<p><a href="x">t</a></p><p><b><a href="y">u</a></b></p>'
    assert [str(t) for t in api.parse(html).wfind("p").find("a")] == [
        str(t) for t in ref.parse(html).wfind("p").find("a")
    ]
    assert (
        api.parse(html).wfind("p").content_str()
        == ref.parse(html).wfind("p").content_str()
    )

    # Tag(dict) folds case-duplicate keys via SpecialDict (last wins)
    assert str(api.Tag("x", {"A": "1", "a": "2"})) == str(
        ref.Tag("x", {"A": "1", "a": "2"})
    )

    # replace_with(str) on a parentless node: reference evaluates
    # self.parent.name before the None check → AttributeError, mirrored
    import pytest as _pytest

    with _pytest.raises(AttributeError):
        ref.Tag("x").replace_with("hello")
    with _pytest.raises(AttributeError):
        api.Tag("x").replace_with("hello")

    # reference Comment is UNHASHABLE (__eq__ without __hash__): hash()
    # of a comment-bearing node raises TypeError, mirrored
    with _pytest.raises(TypeError):
        hash(ref.parse("<div><!--c--></div>"))
    with _pytest.raises(TypeError):
        hash(api.parse("<div><!--c--></div>"))
