"""Text-analysis operators for a training-data pipeline, JVM-side first.

Everything here is pure built-in ``pyspark.sql.functions`` — whole-stage
codegen, no Python in the hot path.  Each operator has an exact DuckDB-SQL
twin in ``__spark_entry__.py`` (integer outputs by design: float formulae
hash-differently across engines, counts don't).

Operators: token counting (whitespace regex), quality scoring (length /
punctuation / stopword / alpha ratios as integer counts), language ID
(stopword-profile voting with deterministic tie-break), document
fingerprinting (k-gram rolling-hash winnowing, fully relational).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"

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

    score = 40*cap(mean_token_len in [3,8]) + 30*(1 - punct_ratio)
          + 30*stopword_presence, computed with integer arithmetic only so
    the DuckDB oracle reproduces it bit-for-bit.
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


def hash60_col(c: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 → bigint.

    Identical in DuckDB as ``('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT``
    — the cross-engine workhorse for fingerprints/simhash oracles.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03) —
    fully relational: posexplode tokens → k-gram via lead() window → 60-bit
    hash → sliding-window min → distinct.

    Scale: one shuffle per window step over (doc, pos) — at 100 TB you
    bound it by fingerprinting the extracted main_text (short) and
    pre-partitioning by doc hash so both windows are partition-local.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.posexplode(tokens_col(col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(" ", *[F.lead("tok", i).over(w) for i in range(k)])
    n_tok = F.count("*").over(Window.partitionBy(id_col))
    grams = (
        toks.withColumn("gram", gram)
        .withColumn("n_tok", n_tok)
        .where(F.col("pos") <= F.col("n_tok") - k)
        .select(id_col, "pos", hash60_col(F.col("gram")).alias("h"))
    )
    wmin = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    n_gram = F.count("*").over(Window.partitionBy(id_col))
    fps = (
        grams.withColumn("wmin", F.min("h").over(wmin))
        .withColumn("n_gram", n_gram)
        .where(F.col("pos") <= F.col("n_gram") - window)
        .select(id_col, F.col("wmin").alias("fingerprint"))
        .distinct()
    )
    return fps
