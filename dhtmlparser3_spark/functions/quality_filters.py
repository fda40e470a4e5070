"""Corpus-curation quality filters a web-scale training-data pipeline needs
beyond basic quality scoring (textops.with_quality): repetition metrics in
the style of the Gopher rules (Rae et al. 2021, "Scaling Language Models",
§A1.1), PII-ish pattern counts, and URL feature extraction.

Scale shapes:

* repetition — duplicate-token fraction is pure whole-stage codegen
  (array_distinct on the token array); top-n-gram fraction needs a per-doc
  frequency table, which Catalyst higher-order functions would run
  interpreted per gram (PLANS.md §6), so it is ONE Arrow-vectorized pandas
  UDF per document — map-side, zero shuffles, same placement as
  dedup.shingle_arrays;
* PII counts — pure built-in regexp_extract_all, portable patterns
  (evaluated identically by Java regex and DuckDB's RE2);
* URL features — built-in string functions over the url column; the
  DuckDB oracle recomputes every output CLOSED-FORM from doc_id/source
  (never by parsing the url), so the two derivations are independent.

All outputs are integers or strings (floats hash differently across
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhtmlparser3_spark.functions.textops import token_list, tokens_col

# portable regexes: same semantics under java.util.regex (Spark) and RE2
# (DuckDB) — character classes, no lookaround, no \d shorthand ambiguity
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# [^\s], not [^ ]: a space-only class lets one match run across
# tabs/newlines and merge adjacent URLs (undercounting n_urls) — and the
# DuckDB oracle consumes this SAME constant, so the two engines always
# agree on the pattern
URL_RE = r"https?://[^\s]+"
DIGIT_RUN_RE = r"[0-9]{8,}"

PII_MOD = 7  # doc_id % PII_MOD == 0 rows get the injected PII suffix


def top_ngram_pct(text: str, n: int) -> int:
    """floor(100 * count(most frequent n-gram) / total n-grams); 0 when the
    doc has fewer than n tokens.  A high value means the document is
    dominated by one repeated phrase — the Gopher duplicate-n-gram rule."""
    toks = token_list(text)
    if len(toks) < n:
        return 0
    counts: dict = {}
    best = 0
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        c = counts.get(g, 0) + 1
        counts[g] = c
        if c > best:
            best = c
    return 100 * best // (len(toks) - n + 1)


def with_repetition(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds integer repetition metrics:

    * ``pct_dup_tokens`` — floor(100 * (1 - distinct/total)) over
      whitespace tokens (pure columnar),
    * ``pct_top_2gram`` / ``pct_top_3gram`` — share of the most frequent
      2-/3-gram (one Arrow UDF computing both).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    toks = tokens_col(col)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    dup_pct = (
        F.when(n_tok <= 0, F.lit(0))
        .otherwise(F.floor(100 * (n_tok - n_distinct) / n_tok))
        .cast("int")
    )

    @pandas_udf("struct<p2:int,p3:int>")
    def _top_grams(texts):
        return pd.DataFrame(
            {
                "p2": texts.map(lambda t: top_ngram_pct(t, 2)),
                "p3": texts.map(lambda t: top_ngram_pct(t, 3)),
            },
            index=texts.index,
        )

    tg = _top_grams(F.col(col))
    return (
        df.withColumn("pct_dup_tokens", dup_pct)
        .withColumn("_tg", tg)
        .withColumn("pct_top_2gram", F.col("_tg.p2"))
        .withColumn("pct_top_3gram", F.col("_tg.p3"))
        .drop("_tg")
    )


def pii_suffix(doc_id: Column) -> Column:
    """Deterministic PII-looking suffix injected into doc_id % 7 == 0 rows
    (the synthetic corpus contains no natural PII, so the counters would
    trivially be zero; the same construction is SQL in the oracle)."""
    return F.concat(
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@mail.example now or visit https://pii.example/u/"),
        doc_id.cast("string"),
        F.lit(" or call 12345678901 twice"),
    )


def pii_corpus(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    injected = F.when(
        F.col(id_col) % PII_MOD == 0,
        F.concat(F.col(col), pii_suffix(F.col(id_col))),
    ).otherwise(F.col(col))
    return df.withColumn(col, injected)


def with_pii_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Integer counts of PII-shaped patterns — the redaction/filtering
    pre-pass of a training-data pipeline (counting only here; redaction is
    a regexp_replace with the same patterns)."""
    t = F.col(col)

    def count(pat):
        # idx=0 — whole-match extraction (the patterns have no groups)
        return F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("int")

    return (
        df.withColumn("n_emails", count(EMAIL_RE))
        .withColumn("n_urls", count(URL_RE))
        .withColumn("n_digit_runs", count(DIGIT_RUN_RE))
    )


def blocklist_anti_join(pages: DataFrame, blocklist: DataFrame) -> DataFrame:
    """Drop pages whose host is on a blocklist — the robots/domain-policy
    filtering stage.  Scale shape: the blocklist is BROADCAST (policy
    lists are small against a 10^12-row corpus) and the anti-join runs
    map-side with zero shuffle of the pages; a truly huge blocklist would
    instead be bucketed on host alongside the pages table
    (sources/tables.write_bucketed).  ``blocklist`` must have a ``host``
    column."""
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host")
    return pages.withColumn("host", host).join(
        F.broadcast(blocklist.select("host")), "host", "left_anti"
    )


def url_features(pages: DataFrame) -> DataFrame:
    """Parse the url column into curation features: host, top-level domain,
    path depth, document name.  At 100 TB this is the partitioning /
    grouping key factory (per-host quotas, domain blocklists), all
    whole-stage codegen."""
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https?://[^/]+(/.*)$", 1)
    return pages.select(
        "url",
        host.alias("host"),
        F.element_at(F.split(host, r"\."), -1).alias("tld"),
        (F.size(F.split(path, "/")) - 1).cast("int").alias("path_depth"),
        F.element_at(F.split(path, "/"), -1).alias("doc_name"),
    )


def mixture_sample(
    docs: DataFrame,
    base_pct: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source mixture sampling — the training-mixture
    builder's downsampling pass (e.g. keep 20% of crawl, 90% of curated
    sources), reproducible across runs/engines/incremental ingests.

    The keep decision is a pure function of (id, salt): md5-derived 60-bit
    hash mod 100 < rate — no RNG, no sampleBy approximation drift, and a
    re-run or a late-arriving partition samples IDENTICALLY (the property
    rng-based df.sample cannot give).  Per-source rate here derives from
    the source's numeric suffix (base + 7*suffix mod 60) so the oracle is
    closed-form; a production run would broadcast-join a real rate table.
    Whole-stage codegen, zero shuffles, zero Python.
    """
    rate, bucket = _mixture_rate_bucket(base_pct, group_col, id_col)
    return docs.select(
        id_col, group_col, rate.cast("int").alias("rate_pct")
    ).where(bucket < rate)


def _mixture_rate_bucket(base_pct: int, group_col: str, id_col: str):
    from dhtmlparser3_spark.functions.textops import hash60_col

    # a source with no trailing digits contributes suffix 0 (keep rate =
    # base_pct) in BOTH engines: regexp_extract yields '' on no-match and
    # ''::INT is NULL in Spark but an error in DuckDB — coalesce makes the
    # miss behave identically instead of silently dropping the source
    suffix = F.coalesce(
        F.regexp_extract(F.col(group_col), r"(\d+)$", 1).cast("int"),
        F.lit(0),
    )
    rate = F.lit(base_pct) + (suffix * 7) % 60
    bucket = F.pmod(
        hash60_col(F.concat(F.lit("mix-"), F.col(id_col).cast("string"))),
        F.lit(100),
    )
    return rate, bucket


def mixture_keep_col(
    base_pct: int = 20, group_col: str = "source", id_col: str = "doc_id"
) -> "F.Column":
    """The :func:`mixture_sample` keep decision as a bare boolean COLUMN —
    for callers that carry (id, group) themselves and want the sample to
    fuse into their plan as a ``where()`` instead of paying a semi-join
    back against mixture_sample's projection."""
    rate, bucket = _mixture_rate_bucket(base_pct, group_col, id_col)
    return bucket < rate


def canonical_url_col(col: str = "url") -> "F.Column":
    """Canonical form of a URL, pure whole-stage codegen — the
    normalization crawls apply BEFORE url-keyed dedup/joins (mixed-case
    hosts, default ports, fragments and query-param order otherwise make
    the same page look like distinct keys and silently defeat url dedup):

      1. scheme and host lowercased (userinfo is out of scope — CC URLs),
      2. default ports stripped (``:80`` for http, ``:443`` for https),
      3. fragment dropped,
      4. query parameters sorted bytewise (duplicates kept),
      5. a bare trailing ``?`` dropped.

    Path dot-segment resolution is deliberately NOT done (it changes which
    resource is addressed when symlinked dirs differ; crawlers record the
    path as fetched).  The sort in (4) is plain string sort — identical in
    Spark's array_sort and DuckDB's list_sort for ASCII keys.
    """
    c = F.col(col)
    # scheme requires the FULL "://" — a bare ":" would classify
    # non-hierarchical URLs (mailto:, tel:, javascript:, data:) as
    # canonicalizable and collapse them all to "scheme://" (the host/rest
    # regexes extract nothing), merging distinct keys in url-keyed dedup;
    # they take the schemeless passthrough below instead
    scheme = F.lower(
        F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    # schemeless/relative junk AND non-hierarchical URLs (mailto:, tel:,
    # javascript:, data: — crawl tables contain all of them) pass through
    # unchanged rather than collapsing to "scheme://"
    return F.when(scheme == "", c).otherwise(canon)
