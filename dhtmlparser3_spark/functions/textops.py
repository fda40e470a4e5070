"""Text-analysis operators for a training-data pipeline, JVM-side first.

Everything here is pure built-in ``pyspark.sql.functions`` — whole-stage
codegen, no Python in the hot path.  Each operator has an exact DuckDB-SQL
twin in ``__spark_entry__.py`` (integer outputs by design: float formulae
hash-differently across engines, counts don't).

Operators: token counting (whitespace regex), quality scoring (length /
punctuation / stopword / alpha ratios as integer counts), language ID
(stopword-profile voting with deterministic tie-break), document
fingerprinting (k-gram hash winnowing, computed map-side per document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"

# Tokenization is byte-identical across THREE engines (pinned in
# tests/test_dedup_textops.py::test_token_twins_on_whitespace_edges):
#   * Spark:  trim(col) strips ' ' only; Java-regex \s = [ \t\n\x0b\f\r]
#   * Python: str.strip(' '); re.ASCII \s = [ \t\n\r\f\x0b]  (same set)
#   * DuckDB: trim() strips ' ' only; RE2 \s EXCLUDES \x0b, so the oracle
#     pattern must be [\s\x0b]+ (see __spark_entry__._toks)
_WS_RE = None  # compiled lazily inside the worker


def token_list(text) -> list:
    """Python twin of :func:`tokens_col` — same trim set, same split set."""
    global _WS_RE
    if _WS_RE is None:
        import re

        _WS_RE = re.compile(r"\s+", re.ASCII)
    if text is None:
        return []
    s = text.strip(" ")
    if not s:
        return []
    return _WS_RE.split(s)

STOPWORDS_EN = [
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]
STOPWORDS_DE = [
    "der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von",
    "mit", "auf", "für", "im", "nicht", "sich", "dem", "des", "als", "auch",
]
STOPWORDS_FR = [
    "le", "la", "les", "et", "est", "un", "une", "de", "des", "du",
    "dans", "pour", "que", "qui", "sur", "pas", "au", "plus", "par", "avec",
]

PUNCT_CLASS = r"[.,;:!?()\"']"


def tokens_col(col: str = "text") -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS)
    )


def token_count_col(col: str = "text") -> Column:
    return F.size(tokens_col(col))


def stopword_count_col(words, col: str = "text") -> Column:
    toks = F.split(F.lower(F.trim(F.col(col))), WS)
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count_col(col))


def with_quality(df: DataFrame, col: str = "text") -> DataFrame:
    """Integer quality counters + a deterministic integer score 0-100.

    score = min(40, int(40*n_alpha/n_chars))                 # alpha ratio
          + min(30, int(30*n_stopwords*5/n_tokens))          # stopword freq
          + max(0, 30 - int(100*n_punct/n_chars))            # punct penalty
    and 0 when n_tokens == 0 — integer arithmetic only, so the DuckDB
    oracle reproduces it bit-for-bit (the oracle SQL is this formula
    verbatim; keep both in sync).
    """
    t = F.col(col)
    n_chars = F.length(t)
    n_tokens = token_count_col(col)
    n_stop = stopword_count_col(STOPWORDS_EN, col)
    n_punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    n_alpha = F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
    score = (
        F.when(n_tokens == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(40),
                (F.lit(40) * n_alpha / F.greatest(n_chars, F.lit(1))).cast("int"),
            )
            + F.least(
                F.lit(30),
                (F.lit(30) * n_stop * 5 / F.greatest(n_tokens, F.lit(1))).cast("int"),
            )
            + F.greatest(
                F.lit(0),
                F.lit(30)
                - (F.lit(100) * n_punct / F.greatest(n_chars, F.lit(1))).cast("int"),
            )
        )
        .cast("int")
    )
    return (
        df.withColumn("n_chars", n_chars.cast("int"))
        .withColumn("n_tokens", n_tokens.cast("int"))
        .withColumn("n_stopwords", n_stop.cast("int"))
        .withColumn("n_punct", n_punct.cast("int"))
        .withColumn("n_alpha", n_alpha.cast("int"))
        .withColumn("quality", score)
    )


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """N-gram-free heuristic language ID: stopword-profile voting.

    Deterministic tie-break: en > de > fr (strict-greater chain).  This is a
    heuristic by design — the point is the *shape* (pure columnar voting,
    no UDF); swap profiles for real ones at scale.
    """
    en = stopword_count_col(STOPWORDS_EN, col)
    de = stopword_count_col(STOPWORDS_DE, col)
    fr = stopword_count_col(STOPWORDS_FR, col)
    pred = (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        df.withColumn("hits_en", en.cast("int"))
        .withColumn("hits_de", de.cast("int"))
        .withColumn("hits_fr", fr.cast("int"))
        .withColumn("lang_pred", pred)
    )


def chunk_tokens(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Context-window packing: split each document into fixed-size token
    windows with overlap (window - stride) — the sharding step that feeds
    sequence-length-bounded training.  Chunks start at 0, stride,
    2·stride, …; the final window is emitted as soon as it covers the
    tail (possibly short); empty docs produce no chunks.

    Scale shape: per-doc computation in ONE Arrow UDF (same placement as
    shingling/winnowing), exploded map-side — zero shuffles; the chunk
    table inherits the input partitioning so a downstream
    repartition(chunk-hash) is only needed when chunk sizes skew.
    """
    from pyspark.sql.functions import pandas_udf

    assert 0 < stride <= window

    @pandas_udf(
        "array<struct<chunk_id:int,chunk_text:string,n_tokens:int>>"
    )
    def _chunks(texts):
        def one(t):
            toks = token_list(t)
            if not toks:
                return []
            out = []
            i = 0
            cid = 0
            while True:
                w = toks[i : i + window]
                out.append(
                    {"chunk_id": cid, "chunk_text": " ".join(w), "n_tokens": len(w)}
                )
                if i + window >= len(toks):
                    return out
                i += stride
                cid += 1

        return texts.map(one)

    return (
        df.select(F.col(id_col), _chunks(F.col(col)).alias("cs"))
        .select(id_col, F.explode_outer("cs").alias("c"))
        .where(F.col("c").isNotNull())
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def split_assignment_col(col: str = "text", train_pct: int = 90) -> Column:
    """Deterministic content-hash train/val assignment: stable across runs,
    machines, and engines (md5-derived 60-bit hash mod 100 — identical in
    the DuckDB oracle), so re-runs and incremental ingests never leak a
    validation document into train."""
    return F.when(
        hash60_col(F.col(col)) % 100 < train_pct, F.lit("train")
    ).otherwise(F.lit("val"))


def nfc_normalize_col(col: str = "text") -> Column:
    """Unicode NFC normalization — a standard training-data canonicalization
    pass (dedup/fingerprint keys must not split on composed vs decomposed
    accents).  Spark SQL has no built-in unicode normalizer, so this is an
    Arrow-vectorized UDF over ``unicodedata`` (C-implemented, ~0.2µs/char);
    the DuckDB oracle twin is ``nfc_normalize``.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(texts):
        from unicodedata import normalize

        return texts.map(lambda t: None if t is None else normalize("NFC", t))

    return _nfc(F.col(col))


def hash60_col(c: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 → bigint.

    Identical in DuckDB as ``('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT``
    — the cross-engine workhorse for fingerprints/simhash oracles.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def winnow_list(text, k: int = 5, window: int = 4) -> list:
    """Winnowing fingerprints of ONE document (Schleimer et al., SIGMOD'03):
    tokens → k-gram strings → 60-bit md5 hash → sliding-window min →
    per-doc distinct.  The hash is ``int(md5(gram)[:15 hex], 16)`` —
    identical to :func:`hash60_col` and the DuckDB oracle expression."""
    from hashlib import md5

    toks = token_list(text)
    if len(toks) < k:
        return []
    hs = [
        int(md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()[:15], 16)
        for i in range(len(toks) - k + 1)
    ]
    if len(hs) < window:
        return []
    out = {min(hs[i : i + window]) for i in range(len(hs) - window + 1)}
    return sorted(out)


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints, computed MAP-SIDE per document by an
    Arrow-vectorized pandas UDF, then exploded to (doc_id, fingerprint).

    The pure-relational formulation (posexplode → lead() window → min()
    window) shuffles one row PER TOKEN through two ``(doc, pos)`` window
    exchanges — ~5x10^14 shuffled rows at the design point, the exact shape
    PLANS.md §6 measured and rejected for shingling.  Winnowing is a
    per-document computation, so it belongs in the same place as shingles
    (dedup.shingle_arrays): inside the worker, zero exchanges.  The DuckDB
    oracle (__spark_entry__._sql_fingerprints) is the unchanged relational
    form — the two derivations cross-check each other.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _fps(texts):
        return texts.map(lambda t: winnow_list(t, k, window))

    # explode_outer + post-filter, NOT plain explode: for a non-outer
    # Generate the optimizer infers a `size(udf(..)) > 0` filter below the
    # Generate and DUPLICATES the Python UDF call (verified in the plan —
    # two ArrowEvalPython nodes, 2x the parse cost); outer explode keeps a
    # single UDF evaluation and the null rows are dropped for free after
    return (
        df.select(F.col(id_col), _fps(F.col(col)).alias("fps"))
        .select(id_col, F.explode_outer("fps").alias("fingerprint"))
        .where(F.col("fingerprint").isNotNull())
    )


def top_terms(
    docs: DataFrame,
    k: int = 10,
    stop_df_pct: int = 50,
    group_col: str = "source",
    col: str = "text",
) -> DataFrame:
    """Per-``group_col`` top-``k`` vocabulary terms by occurrence count,
    after dropping corpus-wide stopwords (terms appearing in more than
    ``stop_df_pct``% of documents) — the data-driven vocab/stopword pass a
    corpus report runs before tokenizer training.

    Scale shape: classic word-count — the token explode is map-side
    (Generate, no shuffle); both aggregates shuffle POST-partial-agg rows
    bounded by per-partition vocabulary, not token count.  The stopword
    list (vocab above 50% doc frequency is tiny by Zipf) and the 1-row
    corpus count are broadcast; final ranking is a per-group top-k window
    with rank pushdown (WindowGroupLimit).  Ties break on term asc for
    cross-engine determinism.
    """
    # explode_outer + post-filter: a non-outer Generate gets a size()>0
    # filter inferred below it and the regex tokenization runs twice per
    # row (cheap JVM work, but 2x the tokenize cost for nothing)
    toks = docs.select(
        F.col(group_col), F.explode_outer(tokens_col(col)).alias("term")
    ).where(F.col("term").isNotNull())
    per_doc = docs.select(
        F.explode_outer(F.array_distinct(tokens_col(col))).alias("term")
    ).where(F.col("term").isNotNull())
    n_docs = docs.select(F.count("*").alias("n_docs"))
    stop = (
        per_doc.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 100 > F.col("n_docs") * F.lit(stop_df_pct))
        .select("term")
    )
    counts = (
        toks.join(F.broadcast(stop), "term", "left_anti")
        .groupBy(group_col, "term")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(group_col, "term", "cnt", "rk")
    )
