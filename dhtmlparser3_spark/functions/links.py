"""Web-graph operators: link extraction, host graph, PageRank.

``outlinks`` recovers <a href> edges RELATIONALLY — one pandas-UDF parse
produces the node table (operators/nodes.py), then anchors and their text
children are pure Catalyst: a filter for ``a`` tags, an attrs lookup for
``href``, and a parent/child join for the anchor text.  No second Python
pass, no per-link UDF.

``pagerank`` is the iterative-algorithm representative: fixed-iteration,
damping 85/100, computed in INTEGER arithmetic (rank scaled by 10^12 with
explicit integer division at every step) so Spark and the DuckDB oracle —
which unrolls the same K iterations as chained CTEs — agree bit-for-bit;
float PageRank would differ in the last ulp from summation order and break
value-hash comparison.  Per-iteration shape: edges ⋈ ranks (broadcast —
the HOST graph is small even at CC scale, ~10^8 hosts vs 10^12 pages) →
map-side partial agg on dst.  For rank-over-PAGES instead of hosts, swap
the broadcast join for a shuffle join on a bucketed rank table and
checkpoint every few rounds (functions/graph.py shows the loop hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.operators.nodes import (
    KIND_TAG,
    KIND_TEXT,
    match_predicate,
    node_table,
)

HOST_RE = r"https://([^/]+)/"
PR_SCALE = 10**12
# pagerank collects the node set to a driver-local relation only below this
# bound (~a few MB of host strings); larger graphs stay distributed
_LOCAL_NODES_MAX = 100_000


def outlinks(pages: DataFrame, anchor_mode: str = "direct") -> DataFrame:
    """(url, href, anchor) per <a href=…> tag, document order per page.

    ``anchor_mode``:
      * ``"direct"`` (default, the historical behavior): anchor text from
        DIRECT text children of the <a> node only — nested markup
        (``<a><b>text</b></a>``) yields an empty anchor.
      * ``"subtree"``: anchor text from EVERY text node inside the <a>
        subtree, document order — the real-pages semantics.  Relationally
        this is the pre-order interval-containment join (same machinery
        as operators/nodes.descendant_join / the descendant selectors):
        ``a.node_id < t.node_id < a.subtree_end``, executed as a
        per-document hash join with a codegen'd range filter — no second
        parse, no traversal.
      * ``"both"``: union of the two with a ``mode`` column, over ONE
        parsed node table (the driver row pins both semantics at the
        cost of a single parse).

    The node table is projected to the two node kinds the query touches
    and PERSISTED before the a-tag/text self-join: Spark re-evaluates an
    unpersisted subplan once per plan reference, and this plan references
    the UDF output at least twice (PLANS.md §6b).  The cache lives until
    the session's ContextCleaner reclaims it — callers own cleanup (the
    returned plan references it lazily, so this function cannot
    unpersist); at production scale, materialize the node table to
    storage once and run every DOM query against it instead.
    """
    assert anchor_mode in ("direct", "subtree", "both"), anchor_mode
    fields = ["node_id", "parent_id", "kind", "name", "attrs", "text"]
    if anchor_mode != "direct":
        fields.append("subtree_end")
    nt = (
        node_table(pages, fields=fields)
        .where(F.col("kind").isin(KIND_TAG, KIND_TEXT))
        .persist()
    )
    # F.get, not [0]: ANSI mode raises on index-into-empty-array, and
    # Catalyst may evaluate this projection on rows the a-tag predicate
    # will reject (filter/project fusion does not short-circuit)
    href = F.get(
        F.filter(F.col("attrs"), lambda a: F.lower(a["key"]) == "href"), 0
    )["value"]
    a_cols = ["url", F.col("node_id").alias("a_id"), href.alias("href")]
    if anchor_mode != "direct":
        a_cols.append(F.col("subtree_end").alias("a_subtree_end"))
    a_tags = nt.where(match_predicate("a")).select(*a_cols).where(
        F.col("href").isNotNull()
    )
    anchor = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("node_id", "text"))),
            lambda s: s["text"],
        ),
        "",
    )

    def gather(mode):
        if mode == "direct":
            texts = nt.where(F.col("kind") == KIND_TEXT).select(
                "url",
                F.col("parent_id").alias("a_id"),
                F.col("node_id"),
                "text",
            )
            joined = a_tags.drop("a_subtree_end").join(
                texts, ["url", "a_id"], "left"
            )
        else:
            texts = nt.where(F.col("kind") == KIND_TEXT).select(
                F.col("url").alias("t_url"),
                F.col("node_id").alias("t_id"),
                "text",
            )
            # the range predicate must sit IN the left-join condition — as
            # a post-join filter it would drop anchors whose document has
            # text nodes but none inside the <a> subtree
            joined = a_tags.join(
                texts,
                (F.col("url") == F.col("t_url"))
                & (F.col("t_id") > F.col("a_id"))
                & (F.col("t_id") < F.col("a_subtree_end")),
                "left",
            ).select(
                "url", "a_id", "href", F.col("t_id").alias("node_id"), "text"
            )
        return (
            joined.groupBy("url", "a_id", "href")
            .agg(F.coalesce(anchor, F.lit("")).alias("anchor"))
            .drop("a_id")
        )

    if anchor_mode == "both":
        return gather("direct").withColumn(
            "mode", F.lit("direct")
        ).unionByName(
            gather("subtree").withColumn("mode", F.lit("subtree"))
        )
    return gather(anchor_mode)


def host_edges(links: DataFrame) -> DataFrame:
    """(src, dst, n_links) host-level graph from (url, href) pairs."""
    return (
        links.select(
            F.regexp_extract("url", HOST_RE, 1).alias("src"),
            F.regexp_extract("href", HOST_RE, 1).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank(edges: DataFrame, iters: int = 5, damp_pct: int = 85) -> DataFrame:
    """(host, rank) after ``iters`` synchronized iterations; ``rank`` sums
    to ≈ PR_SCALE.  Dangling mass is dropped (hosts with no outlinks
    contribute nothing), matching the oracle's unrolled CTEs exactly.

    Integer recurrence (exact in both engines):
      base        = PR_SCALE div n_hosts
      per_link(u) = rank(u) div outdeg_links(u)
      rank'(v)    = ((100-damp) * base + damp * Σ per_link(u)·n_e) div 100
    """
    # node-set materialization, bounded-probe first (ONE driver action on
    # the common path — limit(N+1).collect() returns the FULL set iff it
    # has ≤ N members, and N+1 rows iff it overflows):
    #   * small host set (≤ _LOCAL_NODES_MAX) → collect to a LOCAL relation,
    #     which broadcasts into every per-iteration join without pinning
    #     session-lifetime cache blocks (the round-2 persist() here leaked
    #     one cached copy per calling query);
    #   * large host set (real-web graphs run 10^8+ hosts at the 10^12-doc
    #     design point — far beyond driver memory) → keep the DISTRIBUTED
    #     DataFrame, localCheckpoint(eager) so the distinct is computed
    #     once and the per-iteration lineage stays flat, and pay the
    #     count() only on this path.  Checkpoint blocks are reclaimed by
    #     the ContextCleaner when the RDD is GC'd — the same
    #     caller-owned-lifetime caveat as functions/graph.py.
    nodes_dist = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    probe = nodes_dist.limit(_LOCAL_NODES_MAX + 1).collect()
    if not probe:
        # empty edge set (a corpus with no <a href> links): empty ranks,
        # not a ZeroDivisionError at base = PR_SCALE // n_hosts
        return edges.sparkSession.createDataFrame(
            [], "host string, rank long"
        )
    if len(probe) <= _LOCAL_NODES_MAX:
        spark = edges.sparkSession
        hosts = sorted(r[0] for r in probe)
        n_hosts = len(hosts)
        nodes = spark.createDataFrame([(h,) for h in hosts], "host string")
    else:
        nodes = nodes_dist.localCheckpoint(eager=True)
        n_hosts = nodes.count()
    base = PR_SCALE // n_hosts
    deg = edges.groupBy("src").agg(F.sum("n_links").alias("outdeg"))
    ranks = nodes.select("host", F.lit(base).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("host", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("host"),
                (
                    F.expr("rank div outdeg") * F.col("n_links")
                ).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        # `div`, not `/`: float division + cast can truncate one ulp off
        # the exact integer quotient and break bit-parity with the oracle
        ranks = nodes.join(contrib, "host", "left").select(
            "host",
            F.expr(
                f"(CAST({(100 - damp_pct) * base} AS BIGINT)"
                f" + {damp_pct} * coalesce(inflow, CAST(0 AS BIGINT))) div 100"
            ).alias("rank"),
        )
    return ranks


def pagerank_oracle_sql(
    links_sql: str, iters: int = 5, damp_pct: int = 85
) -> str:
    """The same integer recurrence unrolled as chained CTEs over the
    closed-form link set."""
    host = lambda c: f"regexp_extract({c}, 'https://([^/]+)/', 1)"
    ctes = [
        f"links AS (SELECT * FROM {links_sql})",
        f"""edges AS (
          SELECT {host('url')} AS src, {host('href')} AS dst,
                 CAST(count(*) AS BIGINT) AS n_links
          FROM links GROUP BY 1, 2
        )""",
        """nodes AS (
          SELECT src AS host FROM edges UNION SELECT dst FROM edges
        )""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"base AS (SELECT CAST({PR_SCALE} // n AS BIGINT) AS b FROM nn)",
        "deg AS (SELECT src, SUM(n_links) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT host, (SELECT b FROM base) AS rank FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(f"""r{i + 1} AS (
          SELECT n.host,
                 CAST(({100 - damp_pct} * (SELECT b FROM base)
                   + {damp_pct} * COALESCE(SUM((r.rank // d.outdeg) * e.n_links), 0)
                  ) // 100 AS BIGINT) AS rank
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.host
          LEFT JOIN r{i} r ON r.host = e.src
          LEFT JOIN deg d ON d.src = e.src
          GROUP BY n.host
        )""")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT host, rank FROM r{iters}"


def inlink_texts(links: DataFrame, k: int = 3) -> DataFrame:
    """(dst, anchor, n, rk) — top-k anchor texts pointing AT each host.

    The classic web-corpus enrichment: what the web calls a page often
    beats what the page calls itself, so per-target anchor aggregates feed
    both retrieval corpora and host-quality priors.  Word-count shape on
    (dst_host, anchor) with WindowGroupLimit top-k; deterministic
    (n desc, anchor asc) ties.
    """
    from pyspark.sql import Window

    agg = (
        links.select(
            F.regexp_extract("href", HOST_RE, 1).alias("dst"),
            F.col("anchor"),
        )
        .where(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("anchor").asc())
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("dst", "anchor", "n", F.col("rk").cast("int").alias("rk"))
    )


def redirect_edges(captures: DataFrame) -> DataFrame:
    """``read_warc``-shaped captures → (src, dst) redirect edges: each
    clean 3xx capture points at its resolved ``Location`` target
    (``redirect_to``, absolutized at ingest — sources/warc.py).  Map-only
    column select; self-loops (a url 3xx-ing to its own spelling) drop
    here so the chain resolver never manufactures a 1-cycle out of a
    server that redirects to itself.  A src captured more than once (re-
    crawls, A/B targets) keeps the lexically smallest dst — deterministic
    across runs and partitionings, where ``dropDuplicates`` would not be —
    and makes the edge list a FUNCTION, which the chain resolver's
    pointer-jumping joins rely on to never multiply rows."""
    return (
        captures.where(
            F.col("error").isNull()
            & F.col("redirect_to").isNotNull()
            & F.col("http_status").between(300, 399)
            & (F.col("redirect_to") != F.col("url"))
        )
        .groupBy(F.col("url").alias("src"))
        .agg(F.min("redirect_to").alias("dst"))
    )


def resolve_redirect_chains(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """(src, dst) redirect edges → (src, final_url, hops, cycle): every
    redirect SOURCE mapped to the end of its chain — the url a crawler
    actually lands on — with the hop count, and ``cycle=true`` (final_url
    NULL) for chains that never terminate within ``max_hops`` (redirect
    loops: a→b→a, or chains longer than any real browser follows — RFC
    9110 suggests clients cap around 5-20).

    Pointer jumping, not per-hop walking: each round joins the current
    pointer table with itself (``next(x) := next(next(x))`` where defined,
    hops adding), so a chain of length L resolves in ceil(log2 L) rounds —
    ceil(log2(max_hops)) self-joins total, NOT max_hops.  At CC scale the
    edge list is ~10^9 rows (a tenth of captures) but only two urls + two
    ints wide; each round is one shuffle join on the jump key, the same
    log-round discipline as functions/graph.py's connected components.
    ``dropDuplicates(src)`` in ``redirect_edges`` makes the pointer table
    a function, so rounds cannot multiply rows.

    A src whose chain exceeds ``max_hops`` hops without reaching a
    non-source url is marked ``cycle`` — conservative: real loops and
    absurdly long chains get the same "do not follow" verdict, which is
    what a polite crawler does with both."""
    import math

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    # pointer table: src → (cur, hops) — where the chain stands and how
    # many real edges were followed to get there
    ptr = edges.select(
        "src", F.col("dst").alias("cur"), F.lit(1).alias("hops")
    )
    # jump function: src → (dst, jh) with jh = real edges the jump covers;
    # doubled every round (jump2(x) = jump(jump(x)), jh adding) so the
    # pointer advance stays exact
    jump = edges.select("src", "dst", F.lit(1).alias("jh"))
    for _ in range(rounds):
        ptr = (
            ptr.join(
                jump.select(
                    F.col("src").alias("cur"),
                    F.col("dst").alias("cur2"),
                    F.col("jh").alias("jh"),
                ),
                "cur",
                "left",
            )
            .select(
                "src",
                F.coalesce(F.col("cur2"), F.col("cur")).alias("cur"),
                (
                    F.col("hops")
                    + F.when(F.col("cur2").isNotNull(), F.col("jh"))
                    .otherwise(F.lit(0))
                ).alias("hops"),
            )
        )
        jump = (
            jump.alias("a")
            .join(
                jump.select(
                    F.col("src").alias("dst"),
                    F.col("dst").alias("dst2"),
                    F.col("jh").alias("jh2"),
                ).alias("b"),
                "dst",
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("dst2"), F.col("dst")).alias("dst"),
                (
                    F.col("a.jh")
                    + F.coalesce(F.col("jh2"), F.lit(0))
                ).alias("jh"),
            )
        )
    # after ceil(log2(max_hops)) doublings any terminating chain of ≤
    # max_hops hops has its pointer on a non-source url; a pointer still
    # sitting on a redirect source is a loop or an over-long chain
    srcs = edges.select(F.col("src").alias("cur")).distinct()
    return (
        ptr.join(srcs.withColumn("_is_src", F.lit(True)), "cur", "left")
        .select(
            "src",
            F.when(F.col("_is_src").isNull(), F.col("cur")).alias(
                "final_url"
            ),
            F.least(F.col("hops"), F.lit(max_hops)).alias("hops"),
            F.col("_is_src").isNotNull().alias("cycle"),
        )
    )
