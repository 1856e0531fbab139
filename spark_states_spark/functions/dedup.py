"""Deduplication operators for training-data pipelines.

Four families over the ``documents`` table, all pure built-in expressions
(no Python UDFs — every hash is an md5-derived expression, portable to the
DuckDB oracle; see ``hashes.py`` for the 100 TB swap-to-xxhash64 note):

- **exact**: md5 content fingerprint, hash-groupBy. One shuffle on the
  digest; at scale this is the cheapest possible dedup (shuffle keys are
  16-byte digests, not documents).
- **MinHash + LSH**: shingle → 16-perm minhash signature → 4 bands → bucket
  join. Candidate generation never compares all pairs: the band join only
  shuffles (band_hash, doc_id) tuples, and bucket sizes bound the quadratic
  term. The reference's streaming-dedup use case (SURVEY.md §2.3) is the
  streaming twin of this.
- **SimHash**: 32-bit sign-aggregated token-hash fingerprint; identical
  fingerprints → near-dup cluster. Linear, no pair join at all.
- **n-gram Jaccard**: exact Jaccard over distinct word trigrams via an
  inverted-index self-join (rare-shingle candidate pruning is the scale
  lever; trigram document frequency is tiny here so the full join is
  exact AND cheap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table
from .hashes import (
    DUCK_TOKS,
    SPARK_TOKS,
    duck_h32,
    duck_shingles,
    spark_h32,
    spark_shingles,
)

_N_PERM = 16
_BANDS = 4
_ROWS_PER_BAND = _N_PERM // _BANDS
_SHINGLE_K = 3


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS fingerprint,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content digest (shuffle on 16-byte key)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fingerprint"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "dedup_exact_keep_first",
    oracle="""
    SELECT doc_id, lang, source
    FROM (SELECT doc_id, lang, source,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents)
    WHERE rn = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated corpus: keep the lowest doc_id per content digest."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


def _minhash_sig_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, sig array<bigint>[16], bands array<string>[4])."""
    d = load_table(spark, sf_dir, "documents")
    toks = SPARK_TOKS.format(col="text")
    sh = spark_shingles(toks, _SHINGLE_K)
    sig = (
        f"transform(sequence(0, {_N_PERM - 1}), j -> "
        f"array_min(transform(sh, s -> "
        + spark_h32("concat(cast(j as string), ':', s)")
        + ")))"
    )
    bands = (
        f"transform(sequence(0, {_BANDS - 1}), b -> "
        f"md5(concat(cast(b as string), '|', "
        f"concat_ws(',', transform(slice(sig, b * {_ROWS_PER_BAND} + 1, "
        f"{_ROWS_PER_BAND}), x -> cast(x as string))))))"
    )
    return (
        d.selectExpr("doc_id", f"{sh} AS sh")
        .filter(F.expr("size(sh) > 0"))
        .selectExpr("doc_id", f"{sig} AS sig")
        .selectExpr("doc_id", "sig", f"{bands} AS bands")
    )


def _duck_minhash_cte() -> str:
    toks = DUCK_TOKS.format(col="text")
    sh = duck_shingles("toks", _SHINGLE_K)
    h = duck_h32("j || ':' || s")
    return f"""
    tok AS (SELECT doc_id, {toks} AS toks FROM documents),
    shingled AS (SELECT doc_id, {sh} AS sh FROM tok),
    sig AS (
      SELECT doc_id,
             [list_min([{h} for s in sh]) for j in range({_N_PERM})] AS sig
      FROM shingled WHERE len(sh) > 0
    ),
    bands AS (
      SELECT doc_id, unnest(
        [md5(b || '|' || array_to_string(
             sig[b * {_ROWS_PER_BAND} + 1 : b * {_ROWS_PER_BAND} + {_ROWS_PER_BAND}],
             ',')) for b in range({_BANDS})]) AS bh
      FROM sig
    )"""


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_duck_minhash_cte()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(len([i for i in range({_N_PERM})
                     if sa.sig[i + 1] = sb.sig[i + 1]]) AS DOUBLE) / {_N_PERM}
             AS est_jaccard
    FROM pairs p JOIN sig sa ON p.doc_a = sa.doc_id
                 JOIN sig sb ON p.doc_b = sb.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs + signature-estimated Jaccard.

    Scale shape: the only shuffles are (band_hash → doc_id) for candidate
    buckets and doc_id for the signature re-join. No all-pairs stage exists
    anywhere.
    """
    sig = _minhash_sig_df(spark, sf_dir).cache()
    cand = sig.select("doc_id", F.explode("bands").alias("bh"))
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(b, (F.col("a.bh") == F.col("b.bh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), "
            f"z -> z)) as double) / {_N_PERM} AS est_jaccard",
        )
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {DUCK_TOKS.format(col='text')} AS toks FROM documents),
    hashed AS (
      SELECT doc_id, [{duck_h32('t')} for t in toks] AS th
      FROM tok WHERE len(toks) > 0
    ),
    fp AS (
      SELECT doc_id,
             list_sum([CASE WHEN list_sum([
                 CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in th]) >= 0
               THEN (1::BIGINT << b) ELSE 0 END for b in range(32)]) AS simhash
      FROM hashed
    )
    SELECT doc_id, simhash,
           CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS cluster_size
    FROM fp
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprint per doc + cluster size (identical = near-dup).

    Linear cost: one pass, no pair join — the scale-path complement of
    MinHash-LSH for high-similarity detection.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = SPARK_TOKS.format(col="text")
    th = f"transform(toks, t -> {spark_h32('t')})"
    sim = (
        "aggregate(sequence(0, 31), 0L, (acc, b) -> acc + "
        "CASE WHEN aggregate(th, 0L, (a2, h) -> a2 + "
        "CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1L ELSE -1L END) >= 0 "
        "THEN shiftleft(1L, b) ELSE 0L END)"
    )
    return (
        d.selectExpr("doc_id", f"{toks} AS toks")
        .filter(F.expr("size(toks) > 0"))
        .selectExpr("doc_id", f"{th} AS th")
        .selectExpr("doc_id", f"{sim} AS simhash")
        .withColumn("cluster_size", F.count("*").over(W.partitionBy("simhash")))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {DUCK_TOKS.format(col='text')} AS toks FROM documents),
    sh AS (SELECT doc_id, {duck_shingles('toks', _SHINGLE_K)} AS shingles FROM tok),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh WHERE len(shingles) > 0),
    inv AS (SELECT doc_id, n, unnest(shingles) AS s FROM sized),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, count(*) AS n_inter
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
    FROM inter
    WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard pairs ≥ 0.3 via inverted-index self-join.

    Scale lever (documented, not needed at this df distribution): drop
    shingles with document frequency above a cap before the self-join —
    candidate recall only loses pairs whose entire overlap is stop-shingles.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = SPARK_TOKS.format(col="text")
    inv = (
        d.selectExpr("doc_id", f"{spark_shingles(toks, _SHINGLE_K)} AS shingles")
        .filter(F.expr("size(shingles) > 0"))
        .select(
            "doc_id",
            F.size("shingles").alias("n"),
            F.explode("shingles").alias("s"),
        )
    )
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return inter.select(
        "doc_a", "doc_b", "n_inter", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= 0.3)
