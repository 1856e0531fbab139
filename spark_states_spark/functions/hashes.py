"""Portable deterministic hash families for fuzzy-dedup / LSH operators.

Spark's native ``hash``/``xxhash64`` have no DuckDB equivalent, so every
hash used in an oracle-verified operator is built from **md5**, which is
bit-identical in both engines; a seeded 32-bit family is the first 8 hex
chars of ``md5(seed:value)`` parsed as an integer (verified identical:
Spark ``conv(...,16,10)`` == DuckDB ``('0x'||...)::BIGINT``).

Scale note: at 100 TB you would swap these for ``xxhash64(col, seed)``
(single JVM intrinsic, ~20× cheaper than md5) — the operator shapes do not
change, only these leaf expressions. md5 is used here because correctness
is verified against DuckDB.
"""

from __future__ import annotations


def spark_h32(expr: str) -> str:
    """Seedable 32-bit hash (Spark SQL dialect). ``expr`` is a string expr."""
    return f"cast(conv(substr(md5({expr}),1,8),16,10) as bigint)"


def duck_h32(expr: str) -> str:
    """Same hash in DuckDB SQL."""
    return f"('0x'||substr(md5({expr}),1,8))::BIGINT"


def spark_h60(expr: str) -> str:
    """60-bit fingerprint (15 hex chars — fits signed int64 in both)."""
    return f"cast(conv(substr(md5({expr}),1,15),16,10) as bigint)"


def duck_h60(expr: str) -> str:
    return f"('0x'||substr(md5({expr}),1,15))::BIGINT"


# Tokenizer fragments shared by text/dedup operators (must stay identical
# to functions.text.tokens_col / TOKENS_SQL).
SPARK_TOKS = (
    "CASE WHEN trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ')) = '' "
    "THEN array() "
    "ELSE split(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ')), ' ') END"
)
DUCK_TOKS = (
    "CASE WHEN trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')) = '' "
    "THEN [] "
    "ELSE string_split(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g')), ' ') END"
)


def spark_shingles(toks: str, k: int) -> str:
    """Distinct word k-gram shingles from a token array (Spark SQL)."""
    return (
        f"array_distinct(CASE WHEN size({toks}) >= {k} "
        f"THEN transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {k}))) "
        f"ELSE array() END)"
    )


def duck_shingles(toks: str, k: int) -> str:
    """Same shingling in DuckDB (list slice upper bound is inclusive)."""
    return (
        f"list_distinct([array_to_string({toks}[i + 1 : i + {k}], ' ') "
        f"for i in range(greatest(len({toks}) - {k - 1}, 0))])"
    )
