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


# --- MinHash permutation family -------------------------------------------
# One md5 per shingle, then 16 arithmetic permutations h_j(x) = (a_j*x+b_j)
# mod p — the classic universal-hash minhash family. Constants are
# generated here (hashlib md5 = the same function both engines use) so the
# tables embed as plain literals in both dialects; a_j < 2^20 keeps
# a_j * h < 2^52, safely inside signed 64-bit in both engines.
import hashlib as _hashlib

MINHASH_P = 4294967311  # smallest prime > 2^32


def _const(tag: str, i: int, lo: int, hi: int) -> int:
    h = int(_hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16)
    return lo + h % (hi - lo)


PERM_A = [_const("a", i, 1, 1 << 20) | 1 for i in range(64)]  # odd
PERM_B = [_const("b", i, 0, 1 << 20) for i in range(64)]


def spark_minhash_sig(shingle_hashes: str, n_perm: int) -> str:
    a = "array(" + ",".join(f"{v}L" for v in PERM_A[:n_perm]) + ")"
    b = "array(" + ",".join(f"{v}L" for v in PERM_B[:n_perm]) + ")"
    return (
        f"transform(sequence(0, {n_perm - 1}), j -> "
        f"array_min(transform({shingle_hashes}, h -> "
        f"(element_at({a}, j + 1) * h + element_at({b}, j + 1)) % {MINHASH_P})))"
    )


def spark_minhash_fold(shingle_hashes: str, n_perm: int) -> str:
    """MinHash signature as a single ``aggregate`` fold (Spark SQL) — the
    aggregation-free twin of the explode+min shape in functions/dedup.py,
    for contexts (append-mode streaming before ``dropDuplicates``) where a
    groupBy is not allowed before the stateful operator.

    Why a fold and not ``spark_minhash_sig``'s transform-of-transforms:
    Catalyst's CollapseProject inlines the shingle-hash expression into
    every permutation lambda, re-evaluating the md5 pass ``n_perm`` times.
    Here ``shingle_hashes`` appears exactly once as ``aggregate``'s input,
    so each shingle's md5 runs once; the fold lambda does n_perm
    multiply-adds per shingle against UNROLLED literal constants (an
    ``element_at(array(...), j)`` form would rebuild the array per
    evaluation). Empty input folds to the ``MINHASH_P`` sentinel row —
    callers filter empties upstream.
    """
    perms = "array(" + ",".join(
        f"(({PERM_A[j]}L * h + {PERM_B[j]}L) % {MINHASH_P}L)" for j in range(n_perm)
    ) + ")"
    init = "array(" + ",".join(f"{MINHASH_P}L" for _ in range(n_perm)) + ")"
    return (
        f"aggregate({shingle_hashes}, {init}, "
        f"(acc, h) -> zip_with(acc, {perms}, (x, y) -> least(x, y)))"
    )


def duck_minhash_sig(shingle_hashes: str, n_perm: int) -> str:
    a = "[" + ",".join(str(v) for v in PERM_A[:n_perm]) + "]"
    b = "[" + ",".join(str(v) for v in PERM_B[:n_perm]) + "]"
    return (
        f"[list_min([({a}[j + 1] * h + {b}[j + 1]) % {MINHASH_P} "
        f"for h in {shingle_hashes}]) for j in range({n_perm})]"
    )


def duck_minhash_cte(
    n_perm: int, n_bands: int, rows_per_band: int, shingle_k: int
) -> str:
    """Shared DuckDB CTE chain ``tok → sh → hs → sig → bands`` over the
    ``documents`` view — the oracle twin of the explode-then-min Spark
    shape (functions/dedup.py::_minhash_sig_df).

    Deliberately row-oriented, NOT per-row list comprehensions: DuckDB 1.0
    inlines non-recursive CTEs at every reference, so an oracle that
    references ``sig``/``bands`` several times re-runs the whole chain —
    the comprehension form cost ~17 s per reference at sf0.1 (135 s for
    the pairs oracle, ~400 s under each connected-components closure);
    this vectorized form costs ~0.7 s per reference with bit-identical
    output (VERDICT r06 #1). Empty-token docs drop at the unnest (an
    empty list yields no rows), matching the old ``len(sh) > 0`` filter;
    duplicate shingles need no dedup — ``min`` is duplicate-insensitive.
    """
    toks = DUCK_TOKS.format(col="text")
    mins = ", ".join(
        f"min(({PERM_A[j]} * h + {PERM_B[j]}) % {MINHASH_P}) AS m{j}"
        for j in range(n_perm)
    )
    sig_arr = "[" + ", ".join(f"m{j}" for j in range(n_perm)) + "]"
    return f"""
    tok AS (SELECT doc_id, {toks} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest([array_to_string(toks[i + 1 : i + {shingle_k}], ' ')
                             for i in range(greatest(len(toks) - {shingle_k - 1}, 0))]) AS s
      FROM tok
    ),
    hs AS (SELECT doc_id, {duck_h32('s')} AS h FROM sh),
    sig AS (
      SELECT doc_id, {sig_arr} AS sig
      FROM (SELECT doc_id, {mins} FROM hs GROUP BY doc_id)
    ),
    bands AS (
      SELECT doc_id, unnest(
        [md5(b || '|' || array_to_string(
             sig[b * {rows_per_band} + 1 : b * {rows_per_band} + {rows_per_band}],
             ',')) for b in range({n_bands})]) AS bh
      FROM sig
    )"""


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1], from the same
    md5 family — precomputed so query plans carry plain double literals
    instead of per-row md5 evaluations."""
    return [
        [
            (int(_hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


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
