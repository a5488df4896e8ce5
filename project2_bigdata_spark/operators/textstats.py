"""Text-analysis operators over the documents table (large-scale
training-data pipeline surface; BASELINE.json north-star extras).

All hot-path expressions are JVM-side built-ins (split / size / filter /
regexp) — no Python in the scan path. The documents are single-space
tokenized, which both engines' splitters treat identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

#: Fixed stopword list (kept tiny + explicit so the oracle can replicate).
STOPWORDS = ("the", "a", "data", "row", "value")

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("words", F.split(F.col(text_col), " "))


def quality_columns(df: DataFrame) -> DataFrame:
    """n_words, avg_word_len, stopword_ratio, quality_score — pure exprs."""
    n_words = F.size("words")
    n_chars = F.length("text")
    # single-space join ⇒ total word chars = n_chars - (n_words - 1)
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    n_stop = F.size(F.expr(f"filter(words, w -> w IN ({_SW}))"))
    stop_ratio = n_stop / n_words
    return (
        df.withColumn("n_words", n_words.cast("bigint"))
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("stopword_ratio", stop_ratio)
        # toy quality score: long-enough docs with moderate stopword share
        .withColumn(
            "quality_score",
            (F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
             * (F.lit(1.0) - F.col("stopword_ratio"))),
        )
    )


def token_count_bpeish(text: Column) -> Column:
    """BPE-ish token proxy: alpha runs, digit runs, and single punctuation
    marks each count as one token (regex shared verbatim with the oracle)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of lowercase text (md5 is
    available and identical in Spark and DuckDB → oracle-checkable)."""
    return F.md5(F.lower(text))


def documents_with_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_columns(with_words(table(spark, sf_dir, "documents")))
