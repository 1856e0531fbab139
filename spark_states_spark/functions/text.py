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
from ..sources import load_table, load_table_fanned
from .hashes import DUCK_TOKS, SPARK_TOKS, duck_h32, duck_h60, spark_h32, spark_h60

# Tokenizer: lowercase, strip everything but [a-z0-9] to spaces, split.
# Keep the regex char-class ASCII-only so Java and RE2 behave identically.
_NON_ALNUM = "[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """Whitespace-robust ASCII tokenizer as a Column expression."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), _NON_ALNUM, " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.split(cleaned, " ")
    )


# The same tokenizer in DuckDB SQL — the canonical spelling lives in
# hashes.py (DUCK_TOKS, with SPARK_TOKS as its Spark twin); re-exported
# here under the module's historical name instead of re-declared, so the
# tokenizer cannot drift between the text and dedup families.
# tests/test_llm_ops.py pins tokens_col == SPARK_TOKS on real data.
TOKENS_SQL = DUCK_TOKS


# BPE-ish pre-tokenization regex (GPT-2 style, simplified): letter runs,
# single digits (BPE vocabularies split digit strings), and lone
# punctuation/symbol characters. Counting its matches approximates an LLM
# tokenizer's token count far better than whitespace words do on code,
# numbers, and punctuation-heavy text.
_BPE_ISH = "[a-z]+|[0-9]|[^a-z0-9\\s]"


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
           CAST(len(regexp_extract_all(lower(text), '{_BPE_ISH}')) AS BIGINT)
             AS n_subword_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS ttr
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace words + BPE-ish subword pieces) and
    type-token ratio (lexical diversity) per document."""
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    toks = tokens_col(F.col("text"))
    d = d.withColumn("toks", toks)
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_unique_tokens"),
        # Spark SQL string literals consume one level of backslash escaping
        # (DuckDB's do not), so the regex needs its backslash doubled here.
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_BPE_ISH.replace(chr(92), chr(92) * 2)}', 0)"))
        .cast("bigint")
        .alias("n_subword_tokens"),
        F.when(
            F.size("toks") > 0,
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks"),
        )
        .otherwise(0.0)
        .alias("ttr"),
    )


# --- quality scoring -------------------------------------------------------

def _guard_decimal_sum(agg: Column, msg: str) -> Column:
    """Fail-loud wrapper for an exact decimal aggregate whose operands are
    provably non-null over non-empty groups: under those preconditions a
    NULL result can only mean the decimal(38) sum overflowed, which Spark's
    non-ANSI mode signals silently while the DuckDB oracle's HUGEINT twin
    raises. assert_true returns NULL on pass, so the coalesce passes the
    sum through untouched (the 1e9 pack-guard pattern, ADVICE r12)."""
    return F.coalesce(
        F.assert_true(agg.isNotNull(), F.lit(msg)).cast("decimal(38,0)"), agg
    )


# Character-class ratios via strip-and-measure; classes are explicit ASCII
# sets so Java regex and RE2 agree.
def _ratio(col: Column, keep_class: str) -> Column:
    kept = F.length(F.regexp_replace(col, f"[^{keep_class}]", ""))
    return F.when(
        F.length(col) > 0, kept.cast("double") / F.length(col)
    ).otherwise(0.0)


def _duck_ratio(col: str, keep_class: str) -> str:
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"CAST(length(regexp_replace({col}, '[^{keep_class}]', '', 'g')) AS DOUBLE)"
        f" / length({col}) ELSE 0.0 END"
    )


_STOPWORDS_EN = (
    "the", "a", "an", "and", "of", "to", "in", "is", "that", "it", "for", "was",
)


@register(
    "text_quality_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    )
    SELECT doc_id,
           {_duck_ratio('text', 'a-zA-Z')} AS alpha_ratio,
           {_duck_ratio('text', '0-9')} AS digit_ratio,
           {_duck_ratio('text', ' ')} AS space_ratio,
           CASE WHEN len(toks) > 0
                THEN CAST(list_sum([length(t) for t in toks]) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS avg_token_len,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks,
                     t -> list_contains({list(_STOPWORDS_EN)}, t))) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS stopword_ratio
    FROM tok
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: character-class ratios, token length,
    stopword density — the standard cheap filters of a pretraining pipeline."""
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id").withColumn(
        "toks", tokens_col(F.col("text"))
    )
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS_EN])
    tok_lens = F.aggregate(
        F.transform("toks", lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t)))
    return d.select(
        "doc_id",
        _ratio(F.col("text"), "a-zA-Z").alias("alpha_ratio"),
        _ratio(F.col("text"), "0-9").alias("digit_ratio"),
        _ratio(F.col("text"), " ").alias("space_ratio"),
        F.when(
            F.size("toks") > 0, tok_lens.cast("double") / F.size("toks")
        )
        .otherwise(0.0)
        .alias("avg_token_len"),
        F.when(
            F.size("toks") > 0, n_stop.cast("double") / F.size("toks")
        )
        .otherwise(0.0)
        .alias("stopword_ratio"),
    )


# --- language identification ----------------------------------------------

# Deterministic stopword-profile heuristic. CJK is detected by a low
# ASCII-letter ratio (no Unicode script classes — Java and RE2 disagree on
# their spelling and semantics). Ties break in fixed order en>fr>es>de.
_STOPLISTS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"),
    "es": ("el", "los", "las", "de", "y", "un", "una", "es", "en", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von"),
}


@register(
    "text_lang_id",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    ),
    scored AS (
      SELECT doc_id,
             {_duck_ratio('text', 'a-zA-Z')} AS alpha,
             len(list_filter(toks, t -> list_contains({list(_STOPLISTS['en'])}, t))) AS s_en,
             len(list_filter(toks, t -> list_contains({list(_STOPLISTS['fr'])}, t))) AS s_fr,
             len(list_filter(toks, t -> list_contains({list(_STOPLISTS['es'])}, t))) AS s_es,
             len(list_filter(toks, t -> list_contains({list(_STOPLISTS['de'])}, t))) AS s_de
      FROM tok
    )
    SELECT doc_id,
           CASE WHEN alpha < 0.2 THEN 'zh'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS lang_pred
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-free language ID: stopword-profile argmax + CJK by alpha ratio."""
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id").withColumn(
        "toks", tokens_col(F.col("text"))
    )

    def hits(lang: str) -> Column:
        arr = F.array(*[F.lit(s) for s in _STOPLISTS[lang]])
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    scored = d.select(
        "doc_id",
        _ratio(F.col("text"), "a-zA-Z").alias("alpha"),
        hits("en").alias("s_en"),
        hits("fr").alias("s_fr"),
        hits("es").alias("s_es"),
        hits("de").alias("s_de"),
    )
    return scored.select(
        "doc_id",
        F.when(F.col("alpha") < 0.2, "zh")
        .when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when((F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_de")), "fr")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("lang_pred"),
    )


# --- fingerprinting --------------------------------------------------------

@register(
    "text_fingerprint",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS n
      FROM documents
    )
    SELECT doc_id,
           md5(n) AS content_md5,
           {duck_h60('n')} AS fp60,
           CASE WHEN length(n) >= 8 THEN
             list_min([{duck_h32("substr(n, i + 1, 8)")}
                       for i in range(length(n) - 7)])
           ELSE {duck_h32('n')} END AS winnow_fp
    FROM norm
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: digest, 60-bit key, and a winnowing-style
    min-hash over sliding char 8-grams of the normalized text.

    Scale note: the per-char md5 would be xxhash64 in production
    (hashes.py) — the operator shape (normalize → k-gram → min) is the
    same.
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))"
    gram_hash = spark_h32("substring(n, i + 1, 8)")
    return d.selectExpr("doc_id", f"{norm} AS n").selectExpr(
        "doc_id",
        "md5(n) AS content_md5",
        f"{spark_h60('n')} AS fp60",
        f"""CASE WHEN length(n) >= 8 THEN
              array_min(transform(sequence(0, length(n) - 8), i -> {gram_hash}))
            ELSE {spark_h32('n')} END AS winnow_fp""",
    )


# --- PII redaction ------------------------------------------------------

# Conservative ASCII patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no \d/\w shorthands, and NO
# backslash escapes — these patterns are embedded in SQL string literals,
# where Spark's lexer eats a single backslash ('\.' becomes '.'); [.]
# spells a literal dot safely in both dialects.
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PII_PHONE = "[+][0-9][0-9-]{6,}[0-9]"
_PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

# The fixture corpus is synthetic word soup with no PII, so the operator is
# exercised on deterministically injected PII: every doc gets an email, a
# phone and an IP derived from doc_id. Both engines build the identical
# augmented text, so the oracle verifies real redaction, not a no-op.
_PII_AUG_SPARK = (
    "concat(substring(text, 1, 80), ' contact user', doc_id, '@mail',"
    " doc_id % 7, '.com or +1-555-', lpad(cast(doc_id % 10000 as string),"
    " 4, '0'), ' at 10.', doc_id % 256, '.0.', (doc_id * 7) % 256, ' end')"
)
_PII_AUG_DUCK = (
    "concat(substr(text, 1, 80), ' contact user', doc_id, '@mail',"
    " doc_id % 7, '.com or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR),"
    " 4, '0'), ' at 10.', doc_id % 256, '.0.', (doc_id * 7) % 256, ' end')"
)


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_DUCK} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IPV4}', '[IP]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ips
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: mask emails, phone numbers and
    IPv4 addresses, and count what was masked (the usual audit metric).

    All JVM regex expressions — one projection, no shuffle, no Python:
    at 100 TB this runs at scan speed with full codegen. Redaction order
    (email → phone → IP) is fixed and mirrored by the oracle; patterns are
    restricted to the Java∩RE2 common dialect so both engines match the
    same spans.
    """
    d = load_table(spark, sf_dir, "documents")
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(t,"
        f" '{_PII_EMAIL}', '[EMAIL]'),"
        f" '{_PII_PHONE}', '[PHONE]'),"
        f" '{_PII_IPV4}', '[IP]')"
    )
    return d.selectExpr("doc_id", f"{_PII_AUG_SPARK} AS t").selectExpr(
        "doc_id",
        f"{scrub} AS scrubbed",
        f"size(regexp_extract_all(t, '{_PII_EMAIL}', 0)) AS n_emails",
        f"size(regexp_extract_all(t, '{_PII_PHONE}', 0)) AS n_phones",
        f"size(regexp_extract_all(t, '{_PII_IPV4}', 0)) AS n_ips",
    )


# --- TF-IDF keyword extraction ------------------------------------------

_TFIDF_TOPK = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks
                 FROM documents),
    terms AS (SELECT doc_id, unnest(toks) AS term FROM tok WHERE len(toks) > 0),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM terms GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM terms GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) / (1 + df.df) AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf AS DOUBLE) / (1 + df.df)
                                         DESC, tf.term) AS rank
      FROM tf JOIN df USING (term))
    SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= {_TFIDF_TOPK}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive terms by tf-idf.

    idf here is the raw inverse-frequency variant ``1 / (1 + df)`` rather
    than the log form: with tf and df both small integers, ``tf / (1+df)``
    is a single IEEE-correctly-rounded division, so score and ranking are
    bit-identical across engines — ``ln`` implementations are not
    guaranteed to agree in the last ulp, which would make an oracle
    hash-compare flaky. Ranking ties break lexicographically.

    Scale shape: explode → two hash aggs (doc-term tf, term df) + one
    term-keyed join (term cardinality = vocabulary, small vs corpus; at
    100 TB the df side is broadcastable) + one per-doc window. No Python,
    no driver loop.
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    tok = d.select("doc_id", tokens_col(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    terms = tok.select("doc_id", F.explode("toks").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    score = F.col("tf").cast("double") / (F.lit(1) + F.col("df"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df, "term")
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


# --- training-data curation ops ------------------------------------------

_CHUNK_TOKENS = 64  # chunk length in tokens
_CHUNK_STRIDE = 48  # stride (overlap = CHUNK - STRIDE = 16 tokens)


@register(
    "text_chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    ),
    st AS (
      SELECT doc_id, toks,
             unnest([s for s in range(0, len(toks), {_CHUNK_STRIDE})]) AS s
      FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(s // {_CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(toks[s + 1 : s + {_CHUNK_TOKENS}], ' ') AS chunk_text,
           CAST(len(toks[s + 1 : s + {_CHUNK_TOKENS}]) AS INT) AS n_tokens
    FROM st
    WHERE s = 0 OR s + {_CHUNK_TOKENS - _CHUNK_STRIDE} < len(toks)
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 64-token chunks, 48-token stride
    (16-token overlap) — the standard context-window preparation step for
    LLM training/embedding pipelines.

    Shape: tokenize once per doc (the Generate from the start-offset
    explode is a CollapseProject barrier, same pattern as the shingle
    pipeline in functions/dedup.py), then each chunk is a cheap
    slice+join. Linear in corpus size, no shuffle at all — chunks stay in
    their document's partition. A trailing window that would add no new
    tokens beyond the previous chunk's coverage is suppressed
    (``s + overlap < n_tokens``), the standard de-duplication rule for
    strided chunkers.
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    return (
        d.select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "toks",
            F.expr(
                f"explode(sequence(0, size(toks) - 1, {_CHUNK_STRIDE}))"
            ).alias("s"),
        )
        .filter(
            (F.col("s") == 0)
            | (F.col("s") + (_CHUNK_TOKENS - _CHUNK_STRIDE) < F.size("toks"))
        )
        .selectExpr(
            "doc_id",
            f"cast(s div {_CHUNK_STRIDE} as int) AS chunk_idx",
            f"concat_ws(' ', slice(toks, s + 1, {_CHUNK_TOKENS})) AS chunk_text",
            f"cast(size(slice(toks, s + 1, {_CHUNK_TOKENS})) as int) AS n_tokens",
        )
    )


@register(
    "sample_balanced_by_lang",
    # Deterministic hash-ranked balanced downsampling: every language keeps
    # exactly min-stratum-size docs, chosen by the smallest seeded md5 hash
    # (portable across engines), so the "random" sample is reproducible and
    # oracle-exact.
    oracle=f"""
    WITH tgt AS (
      SELECT min(n) AS t FROM (SELECT count(*) AS n FROM documents GROUP BY lang)
    ),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {duck_h32("'bal:' || CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= (SELECT t FROM tgt)
    """,
)
def sample_balanced_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus downsampling: every language stratum keeps exactly
    ``min(stratum size)`` documents — the curation step that stops a
    dominant language (en is ~3x fr in the fixture) from swamping a
    training mix.

    Selection is by smallest seeded hash, not ``rand()``: deterministic,
    reproducible across runs/engines, and stable under re-partitioning.
    Scale shape: one count aggregate (rows = n_langs, broadcast as a
    1-row min) + one window rank per stratum — the rank's shuffle is the
    only data movement, and at 100 TB the hash-order rank swaps for an
    approximate per-stratum quantile threshold on the same hash column
    (same semantics, no global sort per stratum).
    """
    from pyspark.sql.window import Window as W

    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    target = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("t"))
    )
    h = spark_h32("concat('bal:', cast(doc_id as string))")
    w = W.partitionBy("lang").orderBy(F.expr(h), "doc_id")
    ranked = d.select("doc_id", "lang").withColumn("rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("t"))
        .select("doc_id", "lang")
    )


# --- rule-based quality filtering (Gopher/C4-style) -----------------------

# Bounds tuned to the fixture's 10-99-word synthetic docs so the filter
# actually partitions the corpus; a production run swaps the constants for
# the published Gopher values (50 ≤ words ≤ 100k etc.) — the shape is
# identical: one linear projection pass, no shuffle.
_QF_MIN_WORDS = 20
_QF_MAX_WORDS = 100_000
_QF_MIN_MEAN_LEN = 3.0
_QF_MAX_MEAN_LEN = 10.0
_QF_MIN_ALPHA_FRAC = 0.8
_QF_MIN_STOPWORDS = 1

_STOP_SQL_DUCK = "[" + ",".join(f"'{s}'" for s in _STOPWORDS_EN) + "]"
_STOP_SQL_SPARK = "array(" + ",".join(f"'{s}'" for s in _STOPWORDS_EN) + ")"


@register(
    "text_gopher_quality_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN CAST(list_sum([length(t) for t in toks]) AS DOUBLE)
                       / len(toks)
                  ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_filter(toks,
                           t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                       / len(toks)
                  ELSE 0.0 END AS alpha_word_frac,
             CAST(len(list_intersect(list_distinct(toks), {_STOP_SQL_DUCK}))
                  AS BIGINT) AS n_stopwords
      FROM tok
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, n_stopwords,
           (n_words >= {_QF_MIN_WORDS} AND n_words <= {_QF_MAX_WORDS}
            AND mean_word_len >= {_QF_MIN_MEAN_LEN}
            AND mean_word_len <= {_QF_MAX_MEAN_LEN}
            AND alpha_word_frac >= {_QF_MIN_ALPHA_FRAC}
            AND n_stopwords >= {_QF_MIN_STOPWORDS}) AS passes
    FROM m
    """,
)
def text_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter: word-count bounds, mean word
    length, alphabetic-word fraction, stopword presence → pass/fail per
    doc, with every metric reported for threshold tuning.

    All four signals are single-pass JVM expressions over the token array
    — the filter is a projection, costs one corpus scan, and composes
    with any downstream op without a shuffle (the standard first stage of
    a training-data curation pipeline, before the expensive dedup).
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    toks = tokens_col(F.col("text"))
    m = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_words"),
        F.when(
            F.size("toks") > 0,
            F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))").cast("double")
            / F.size("toks"),
        )
        .otherwise(0.0)
        .alias("mean_word_len"),
        F.when(
            F.size("toks") > 0,
            F.expr("size(filter(toks, t -> t rlike '[a-z]'))").cast("double")
            / F.size("toks"),
        )
        .otherwise(0.0)
        .alias("alpha_word_frac"),
        F.expr(
            f"size(array_intersect(array_distinct(toks), {_STOP_SQL_SPARK}))"
        )
        .cast("bigint")
        .alias("n_stopwords"),
    )
    return m.withColumn(
        "passes",
        (F.col("n_words") >= _QF_MIN_WORDS)
        & (F.col("n_words") <= _QF_MAX_WORDS)
        & (F.col("mean_word_len") >= _QF_MIN_MEAN_LEN)
        & (F.col("mean_word_len") <= _QF_MAX_MEAN_LEN)
        & (F.col("alpha_word_frac") >= _QF_MIN_ALPHA_FRAC)
        & (F.col("n_stopwords") >= _QF_MIN_STOPWORDS),
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {TOKENS_SQL.format(col='text')} AS toks
      FROM documents
    ),
    lines AS (
      SELECT doc_id, toks,
             list_filter([trim(l) for l in string_split(text, chr(10))],
                         l -> l <> '') AS ls
      FROM tok
    ),
    grams AS (
      SELECT doc_id,
             unnest([array_to_string(toks[i + 1 : i + 2], ' ')
                     for i in range(greatest(len(toks) - 1, 0))]) AS g
      FROM tok
    ),
    gcnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    gtop AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_frac
      FROM gcnt GROUP BY doc_id
    )
    SELECT l.doc_id,
           CAST(len(l.ls) AS BIGINT) AS n_lines,
           CASE WHEN len(l.ls) > 0
                THEN 1.0 - CAST(len(list_distinct(l.ls)) AS DOUBLE) / len(l.ls)
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN len(l.toks) > 0
                THEN 1.0 - CAST(len(list_distinct(l.toks)) AS DOUBLE)
                           / len(l.toks)
                ELSE 0.0 END AS dup_word_frac,
           coalesce(g.top_frac, 0.0) AS top_2gram_frac
    FROM lines l LEFT JOIN gtop g ON l.doc_id = g.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (C4/Gopher signals): duplicate-line fraction,
    duplicate-word fraction, and the most-frequent-bigram share per doc —
    the signals that catch boilerplate, SEO spam, and template text.

    Scale shape: line and word dup fractions are pure array expressions
    (no shuffle). The top-bigram share uses the explode→count→max shape
    rather than an O(n²) per-row array lambda: the groupBy keys are
    (doc_id, gram) then doc_id, so the data shuffles once on doc_id — and
    AQE coalesces the tiny post-agg partitions.
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    base = d.select("doc_id", "text", tokens_col(F.col("text")).alias("toks"))
    lines = base.withColumn(
        "ls",
        F.expr("filter(transform(split(text, '\\n'), l -> trim(l)), l -> l != '')"),
    )
    grams = (
        base.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.expr("explode(sequence(0, size(toks) - 2))").alias("i"),
            F.col("toks"),
        )
        .select("doc_id", F.expr("concat_ws(' ', slice(toks, i + 1, 2))").alias("g"))
    )
    gtop = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_frac"))
    )
    return (
        lines.join(gtop, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ls").cast("bigint").alias("n_lines"),
            F.when(
                F.size("ls") > 0,
                F.lit(1.0)
                - F.size(F.array_distinct("ls")).cast("double") / F.size("ls"),
            )
            .otherwise(0.0)
            .alias("dup_line_frac"),
            F.when(
                F.size("toks") > 0,
                F.lit(1.0)
                - F.size(F.array_distinct("toks")).cast("double")
                / F.size("toks"),
            )
            .otherwise(0.0)
            .alias("dup_word_frac"),
            F.coalesce("top_frac", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )


_VOCAB_TOPK = 20


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT {TOKENS_SQL.format(col='text')} AS toks FROM documents
    ),
    words AS (SELECT unnest(toks) AS token FROM tok),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM words GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cnt),
    top AS (
      SELECT token, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
               AS rank
      FROM cnt QUALIFY rank <= {_VOCAB_TOPK}
    )
    SELECT rank, token, cnt,
           CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / (SELECT total FROM tot) AS coverage_cum
    FROM top
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by frequency with cumulative
    corpus-coverage fraction — the Zipf diagnostic behind tokenizer-vocab
    sizing ("how much of the corpus do the k most common words cover?").

    Scale shape: the frequency count is a map-side-combinable groupBy on
    the token; the top-k is ``orderBy().limit(k)`` — Spark's distributed
    TakeOrdered, NOT a global sort — and only then does the k-row result
    use a single-partition cumulative window (k = {_VOCAB_TOPK} rows,
    driver-scale by construction). The corpus-total scalar joins in as a
    broadcast 1-row aggregate.
    """
    from pyspark.sql.window import Window as W

    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    cnt = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    tot = cnt.agg(F.sum("cnt").cast("double").alias("total"))
    top = cnt.orderBy(F.desc("cnt"), F.asc("token")).limit(_VOCAB_TOPK)
    w = W.orderBy(F.desc("cnt"), F.asc("token"))
    wsum = w.rowsBetween(W.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "coverage_cum", F.sum("cnt").over(wsum).cast("double") / F.col("total")
        )
        .select("rank", "token", "cnt", "coverage_cum")
    )


@register(
    "text_repetition_ngrams",
    # Gopher-style within-document repetition (Rae et al. 2021, "Scaling
    # Language Models", table A1): the fraction of a document's word
    # bigrams that belong to a bigram occurring more than once in that
    # document. Both engines: tokenize (shared DUCK_TOKS/tokens_col
    # spelling), build the k-1 bigrams, SORT them, and count singleton
    # instances by sorted adjacency (a bigram instance is a singleton iff
    # it differs from both sorted neighbors); duplicated instances are
    # then n_bigrams - singletons. Integer counts; the fraction is one
    # BIGINT->DOUBLE division — identical IEEE both engines, so the 0.2
    # flag boundary cannot diverge.
    oracle=f"""
    WITH g AS (
      SELECT doc_id, t,
             list_sort(list_transform(generate_series(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i + 1])) AS s
      FROM (SELECT doc_id, {TOKENS_SQL.format(col='text')} AS t
            FROM documents)
      WHERE len(t) >= 2
    ),
    c AS (
      SELECT doc_id,
             CAST(len(s) AS BIGINT) AS n_bigrams,
             CAST(len(s) - list_sum(list_transform(
               generate_series(1, len(s)),
               i -> CASE WHEN (i = 1 OR s[i] <> s[greatest(i - 1, 1)])
                          AND (i = len(s) OR s[i] <> s[least(i + 1, len(s))])
                         THEN 1 ELSE 0 END)) AS BIGINT) AS n_dup_bigrams
      FROM g
    )
    SELECT doc_id, n_bigrams, n_dup_bigrams,
           CAST(n_dup_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_frac,
           CAST(n_dup_bigrams AS DOUBLE) / n_bigrams > 0.2 AS is_repetitive
    FROM c
    """,
)
def text_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring: the share of word-bigram
    INSTANCES that belong to a bigram occurring more than once in the
    same document — the Gopher duplicate-n-gram rule (distinct from its
    sibling ``text_repetition_stats``, whose three columns are the
    dup-LINE fraction, the dup-UNIGRAM fraction (extra copies only), and
    the top-bigram mode share; this entry counts ALL instances of
    duplicated bigrams, the statistic the Gopher filter actually
    thresholds). ``is_repetitive`` is the 0.2-threshold filter flag.

    Scale shape — ZERO shuffles, deliberately contrasting the sibling's
    explode→groupBy spelling: tokenize, bigram, in-row ``array_sort``,
    and a sorted-adjacency singleton count are all per-row expressions,
    so the whole operator is a pure projection over the documents scan —
    embarrassingly parallel at 100 TB. The sibling needs the (doc, gram)
    shuffle because a MAX-count (mode) has no sorted-adjacency spelling
    without an in-row reduce; a dup-instance COUNT does, which is why
    this rule gets the cheaper plan. In-row cost is O(k log k) per
    document in the bigram count k; no per-gram state leaves the row, so
    document length never creates cross-task skew.
    """
    d = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    g = (
        d.select("doc_id", tokens_col(F.col("text")).alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.array_sort(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                )
            ).alias("s"),
        )
    )
    # Index clamps keep element_at in-range on BOTH boundary rows (Spark
    # rejects index 0 outright); the i=1 / i=size(s) disjuncts make the
    # clamped self-comparisons irrelevant to the verdict.
    singles = F.expr(
        "size(filter(sequence(1, size(s)), "
        "i -> (i = 1 OR element_at(s, i) != element_at(s, greatest(i - 1, 1))) "
        "AND (i = size(s) OR element_at(s, i) != element_at(s, least(i + 1, size(s))))))"
    )
    c = g.select(
        "doc_id",
        F.size("s").cast("bigint").alias("n_bigrams"),
        (F.size("s") - singles).cast("bigint").alias("n_dup_bigrams"),
    )
    frac = F.col("n_dup_bigrams").cast("double") / F.col("n_bigrams")
    return c.select(
        "doc_id", "n_bigrams", "n_dup_bigrams",
        frac.alias("dup_bigram_frac"),
        (frac > 0.2).alias("is_repetitive"),
    )


@register(
    "text_rarity_score",
    # Corpus-frequency rarity scoring: per-document mean corpus frequency
    # of its token instances plus the hapax share — the doc-level
    # "is this document made of unusual vocabulary?" quality/novelty
    # filter (rare-token-heavy docs are disproportionately OCR noise,
    # boilerplate hashes, or genuinely novel content worth upsampling;
    # either way the pipeline needs the score). All-integer arithmetic:
    # corpus frequencies and tf-weighted sums are exact BIGINT/HUGEINT
    # sums, cast to double only for the two final divisions — identical
    # IEEE ops both engines (the text_tfidf_top_terms discipline: never
    # cross-engine-compare ln()).
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    cf AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           -- widen BEFORE the multiply: tf*cf on two BIGINTs can exceed
           -- int64 at corpus scale (DuckDB would raise; the HUGEINT
           -- product cannot)
           CAST(sum(CAST(tf AS HUGEINT) * cf) AS DOUBLE)
             / CAST(sum(tf) AS DOUBLE) AS mean_token_corpus_freq,
           CAST(sum(CASE WHEN cf = 1 THEN tf ELSE 0 END) AS DOUBLE)
             / CAST(sum(tf) AS DOUBLE) AS hapax_frac
    FROM tf JOIN cf USING (term)
    GROUP BY doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vocabulary-rarity score: the mean CORPUS frequency of
    the document's token instances and its hapax share (fraction of
    instances whose token occurs exactly once corpus-wide). The only
    corpus-vs-document cross statistic in the text family — deliberately
    distinct from ``text_token_stats`` (per-doc counts with no corpus
    context), ``text_vocab_coverage`` (corpus-level head, no per-doc
    output), and ``text_tfidf_top_terms`` (ranks TERMS within a doc by
    document-frequency; this scores DOCS by corpus token-instance
    frequency — the unigram-LM quality-filter proxy, with the log
    dropped so the arithmetic stays exact integers until two final
    divisions).

    Scale shape: explode → (doc, term) tf agg (map-side combinable), the
    vocabulary frame derived from tf by a second combinable agg (never a
    second scan of the raw instances), then ONE term-keyed join — the
    same join family as tf-idf: the cf side is vocabulary-sized, so at
    100 TB it broadcasts (or AQE skew-splits the "the"-type hot terms),
    and the per-doc re-agg is combinable again. Empty documents drop at
    the explode in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    j = tf.join(cf, "term")
    n_tok = F.sum("tf")
    return j.groupBy("doc_id").agg(
        n_tok.cast("bigint").alias("n_tokens"),
        (
            # widen BEFORE the multiply (the oracle's HUGEINT twin): a
            # bigint*bigint product overflows int64 at corpus scale;
            # decimal(19,0) operands give an exact decimal(38,0) product
            # (each factor < 2^63 ≈ 9.2e18, so the product < 8.5e37).
            # The SUM over those products is still capped at decimal(38)
            # and in non-ANSI mode an overflowed decimal sum returns NULL
            # silently, while the oracle's HUGEINT (128-bit) raises — so
            # guard the sum fail-loud (ADVICE r12, the 1e9-pack
            # discipline): groups are non-empty (inner join, tf >= 1)
            # with non-null operands, hence NULL ⇔ sum overflow.
            _guard_decimal_sum(
                F.sum(
                    F.col("tf").cast("decimal(19,0)")
                    * F.col("cf").cast("decimal(19,0)")
                ),
                "text_rarity_score: decimal(38,0) tf*cf sum overflowed — "
                "widen the weighted sum (split-sum or higher-precision "
                "two-column carry) before trusting mean_token_corpus_freq",
            )
            .cast("double")
            / n_tok.cast("double")
        ).alias("mean_token_corpus_freq"),
        (
            F.sum(F.when(F.col("cf") == 1, F.col("tf")).otherwise(F.lit(0)))
            .cast("double")
            / n_tok.cast("double")
        ).alias("hapax_frac"),
    )
