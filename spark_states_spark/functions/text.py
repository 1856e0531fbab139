"""Text-analysis functions for training-data pipelines.

All pure built-in expressions (JVM codegen, no Python on the hot path):
tokenization, quality scoring, language ID, fingerprinting. The `documents`
fixture (doc_id, text, lang, source, n_chars) is the target table.

Portability notes for the DuckDB oracles:
- tokenizer = lower + regexp_replace(non-alnum → space) + split on space,
  expressed identically in both dialects;
- fingerprints use md5 (bit-identical in both engines);
- empty documents tokenize to an empty array in both (guarded size()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

# Tokenizer: lowercase, strip everything but [a-z0-9] to spaces, split.
# Keep the regex char-class ASCII-only so Java and RE2 behave identically.
_NON_ALNUM = "[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """Whitespace-robust ASCII tokenizer as a Column expression."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), _NON_ALNUM, " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


# The same tokenizer in DuckDB SQL (list_filter guards empty strings).
TOKENS_SQL = (
    "CASE WHEN trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')) = '' "
    "THEN [] "
    "ELSE string_split(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')), ' ') END"
)


@register(
    "text_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT)  AS n_chars_raw,
           CAST(len(toks) AS BIGINT)     AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS ttr
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token ratio (lexical diversity) per document."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    d = d.withColumn("toks", toks)
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique_tokens"),
        F.when(
            F.size("toks") > 0,
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks"),
        )
        .otherwise(0.0)
        .alias("ttr"),
    )
