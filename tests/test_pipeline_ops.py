"""Engineering checks for the round-5 training-data pipeline operators
beyond oracle equality: algorithmic invariants the DuckDB differential
can't see (convergence on adversarial graph shapes, packing conservation,
permutation density, benchmark exclusion)."""

from pyspark.sql import functions as F

from spark_states_spark.functions.dedup import (
    connected_components,
    dedup_cluster_connected_components,
)
from spark_states_spark.functions.pipeline import (
    _PACK_BUCKETS,
    _PACK_BUDGET,
    _SHUFFLE_SHARDS,
    contamination_ngram_overlap,
    pack_token_budget_bins,
    shuffle_shard_order,
)
from spark_states_spark.functions.text import text_gopher_quality_filter
from spark_states_spark.sources import load_table


def test_connected_components_on_path_graph(spark):
    """A 64-node path is the worst case for plain min-label propagation
    (diameter 63 > the 20-round cap); pointer jumping must still converge
    and label every node with the path's minimum id."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = {r.doc_id: r.label for r in connected_components(pairs).collect()}
    assert len(labels) == n
    assert set(labels.values()) == {0}


def test_connected_components_releases_superseded_checkpoints(spark):
    """ADVICE r07: each pointer-jumping round localCheckpoints a new label
    frame; superseded rounds' blocks must be released eagerly (not left to
    the JVM weak-ref cleaner), and the RETURNED frame's blocks — tagged on
    the frame — must be released by the cc_labels memo cleanup path."""
    from spark_states_spark.functions.dedup import (
        _persistent_rdd_ids,
        _unpersist_rdd_ids,
    )

    before = _persistent_rdd_ids(spark)
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs)
    labels.count()
    live = _persistent_rdd_ids(spark) - before
    tagged = set(labels._local_ckpt_rdd_ids)
    assert tagged, "returned frame must carry its checkpoint block ids"
    # Only the FINAL frame's blocks may remain pinned: a 64-node path takes
    # several pointer-jumping rounds, each of which checkpointed a frame.
    assert live <= tagged, f"superseded checkpoint blocks leaked: {live - tagged}"
    _unpersist_rdd_ids(spark, tagged)
    assert not (_persistent_rdd_ids(spark) - before)
    # NOTE: the frame is NOT readable after this (localCheckpoint truncates
    # lineage) — which is exactly why cleanup only runs when a memo is
    # being discarded.


def test_connected_components_disjoint_cliques(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    labels = {r.doc_id: r.label for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cluster_sizes_cover_pair_graph(spark, sf_dir):
    """Every clustered doc gets a component of size >= 2 (singletons never
    enter the pair graph), and component_id is the component's min id."""
    comp = dedup_cluster_connected_components(spark, sf_dir)
    rows = comp.collect()
    assert rows, "fixture contains near-dup pairs; clustering returned none"
    assert all(r.component_size >= 2 for r in rows)
    by_comp: dict[int, list[int]] = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r.doc_id)
    assert all(cid == min(ids) for cid, ids in by_comp.items())


def test_pack_bins_conserve_tokens_and_are_contiguous(spark, sf_dir):
    """Packing must neither drop nor double-count tokens, and bin ids in a
    bucket must be dense from 0 (a gap would mean a bin the loader skips)."""
    bins = pack_token_budget_bins(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    from spark_states_spark.functions.hashes import SPARK_TOKS

    total = d.selectExpr(
        f"sum(size({SPARK_TOKS.format(col='text')})) AS t"
    ).collect()[0].t
    assert sum(r.bin_tokens for r in bins) == total
    by_bucket: dict[int, list[int]] = {}
    for r in bins:
        by_bucket.setdefault(r.bucket, []).append(r.bin_id)
    assert set(by_bucket) == set(range(_PACK_BUCKETS))
    for ids in by_bucket.values():
        assert sorted(ids) == list(range(len(ids)))
    # Every bin except possibly a bucket's last must have crossed the
    # budget once its straddling doc landed (greedy fill never leaves a
    # bin short unless input ran out).
    for bucket, ids in by_bucket.items():
        last = max(ids)
        for r in bins:
            if r.bucket == bucket and r.bin_id != last:
                assert r.bin_tokens > 0


def test_shuffle_order_is_dense_permutation(spark, sf_dir):
    rows = shuffle_shard_order(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < _SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for pos in by_shard.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))


def test_contamination_excludes_benchmark_docs(spark, sf_dir):
    rows = contamination_ngram_overlap(spark, sf_dir).collect()
    assert rows, "fixture duplicates guarantee some contamination"
    for r in rows:
        assert r.doc_id % 97 != 0, "benchmark docs must not appear as training"
        assert 0 < r.n_contaminated <= r.n_grams
        assert 0.0 < r.contamination_frac <= 1.0


def test_gopher_filter_pass_flag_matches_metrics(spark, sf_dir):
    """The boolean must be derivable from the reported metric columns, so
    threshold tuning downstream can recompute it."""
    rows = text_gopher_quality_filter(spark, sf_dir).collect()
    n_pass = 0
    for r in rows:
        expect = (
            20 <= r.n_words <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.alpha_word_frac >= 0.8
            and r.n_stopwords >= 1
        )
        assert r.passes == expect
        n_pass += int(expect)
    # Thresholds are tuned to actually partition the fixture corpus.
    assert 0 < n_pass < len(rows)


def test_connected_components_random_graphs_match_union_find(spark):
    """Property check: on random graphs, the distributed min-label
    propagation must produce exactly the components a sequential
    union-find does — same partition of nodes, same min-id labels.
    Random topologies catch shapes the fixed path/clique tests miss
    (stars joined by bridges, odd cycles, self-loops, duplicate edges).
    Seeded PRNG: deterministic across runs, no flaky CI."""
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # Sequential reference: union-find with path compression.
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({x for e in edges for x in e})
        expected = {}
        roots = {}
        for x in touched:
            r = find(x)
            roots.setdefault(r, min(y for y in touched if find(y) == r))
            expected[x] = roots[r]

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.label for r in connected_components(pairs).collect()
        }
        assert got == expected, f"trial {trial} (n={n}, m={m}): {got} != {expected}"


def test_connected_components_round_spelling_equivalence(spark):
    """r14 optimization guard: the loop's neighbor-min step is spelled as
    ONE aggregation (edge-join output unioned with the node's own label,
    then groupBy.min) instead of the reference left-join + coalesce +
    least shape. The two spellings must produce the SAME per-round
    iterate — otherwise round counts (and the convergence probe) drift.
    Checked on seeded random graphs including isolated-in-round nodes
    (nodes whose neighbors all carry higher labels)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    for trial in range(3):
        n = rng.randint(3, 30)
        m = rng.randint(1, 40)
        raw = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
        edges = pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")),
                    F.struct(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        labels = (
            edges.select(F.col("u").alias("doc_id"))
            .distinct()
            .withColumn("label", F.col("doc_id"))
        )
        # Production spelling (one aggregation, own-label union branch).
        agg_spelling = (
            edges.join(labels, edges.v == labels.doc_id)
            .select(F.col("u").alias("doc_id"), "label")
            .unionByName(labels)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        # Reference spelling (left join + coalesce + least).
        nbr_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        join_spelling = labels.join(
            nbr_min, labels.doc_id == nbr_min.u, "left"
        ).select(
            "doc_id",
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
        )
        got = sorted(map(tuple, agg_spelling.collect()))
        want = sorted(map(tuple, join_spelling.collect()))
        assert got == want, f"trial {trial}: {got} != {want}"


def test_mixture_weights_no_upsample_and_floor_exact(spark, sf_dir):
    """The mixture resampler must (a) never keep more docs than a stratum
    has, (b) keep exactly floor(r_l * N / R) per stratum for the feasible
    N = min_l floor(n_l * R / r_l), and (c) be deterministic."""
    from spark_states_spark.functions.pipeline import (
        _MIX_R,
        _MIX_RATIOS,
        sample_mixture_weights,
    )

    orig = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = sample_mixture_weights(spark, sf_dir)
    kept = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_total = min(orig[l] * _MIX_R // w for l, w in _MIX_RATIOS.items())
    for lang, w in _MIX_RATIOS.items():
        assert kept.get(lang, 0) == w * n_total // _MIX_R
        assert kept.get(lang, 0) <= orig[lang]
    ids_a = {r["doc_id"] for r in out.collect()}
    ids_b = {r["doc_id"] for r in sample_mixture_weights(spark, sf_dir).collect()}
    assert ids_a == ids_b


def test_cluster_keep_best_winner_invariants(spark, sf_dir):
    """The keeper must be a member of its cluster with the cluster-max
    quality (ties to min doc_id), exactly one keeper per component."""
    from spark_states_spark.functions.dedup import (
        dedup_cluster_connected_components,
        dedup_cluster_keep_best,
    )
    from spark_states_spark.functions.text import text_quality_scores

    members = dedup_cluster_connected_components(spark, sf_dir).join(
        text_quality_scores(spark, sf_dir).select("doc_id", "alpha_ratio"),
        "doc_id",
    )
    by_comp = {}
    for r in members.collect():
        by_comp.setdefault(r["component_id"], []).append(
            (r["alpha_ratio"], r["doc_id"])
        )
    keepers = dedup_cluster_keep_best(spark, sf_dir).collect()
    assert len(keepers) == len(by_comp)
    assert len({k["component_id"] for k in keepers}) == len(keepers)
    for k in keepers:
        best = max(by_comp[k["component_id"]], key=lambda t: (t[0], -t[1]))
        assert (k["keeper_alpha_ratio"], k["keeper_doc_id"]) == best


def test_padding_waste_bucket_invariants(spark, sf_dir):
    """Buckets must partition the corpus (doc counts sum to corpus size),
    every bucket max must sit inside the bucket's token range, and waste
    must be non-negative and bounded by (width-1) * n_docs."""
    from spark_states_spark.functions.pipeline import (
        _BATCH_BUCKET_WIDTH as width,
        batching_padding_waste,
    )

    out = batching_padding_waste(spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_corpus
    for r in out:
        lo, hi = r["bucket"] * width, (r["bucket"] + 1) * width
        assert lo <= r["max_tokens"] < hi
        assert 0 <= r["total_pad_waste"] <= (width - 1) * r["n_docs"]


def test_source_concentration_shares_sum_and_monotone(spark, sf_dir):
    """Token shares must sum to 1, the cumulative share must be monotone
    in the largest-first rank order and end at 1, and every source's
    share must match its exact token fraction."""
    from spark_states_spark.functions.pipeline import (
        source_token_concentration,
    )

    rows = source_token_concentration(spark, sf_dir).collect()
    total = sum(r["n_tokens"] for r in rows)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-9
    ordered = sorted(rows, key=lambda r: (-r["n_tokens"], r["source"]))
    prev = 0.0
    for r in ordered:
        assert r["token_share"] == r["n_tokens"] / total
        assert r["cum_share"] > prev
        prev = r["cum_share"]
    assert abs(prev - 1.0) < 1e-9


def test_source_overlap_pair_expansion_matches_self_join(spark, sf_dir):
    """The single-shuffle in-row pair expansion (r10 pattern) must produce
    exactly the pairs a naive fingerprint self-join produces."""
    from pyspark.sql import functions as F

    from spark_states_spark.functions.pipeline import (
        _OVERLAP_PREFIX_TOKS,
        source_overlap_matrix,
    )
    from spark_states_spark.functions.hashes import SPARK_TOKS
    from spark_states_spark.sources import load_table

    got = {
        (r.source_a, r.source_b): r.n_shared_contents
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(SPARK_TOKS.format(col="text"))
    h = d.select(
        F.md5(F.concat_ws(" ", F.slice(toks, 1, _OVERLAP_PREFIX_TOKS)))
        .alias("fp"),
        "source",
    ).distinct()
    a, b = h.alias("a"), h.alias("b")
    ref = {
        ((r.source_a, r.source_b)): r.n
        for r in (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    assert got == ref and got  # non-empty at the fixture scale


def test_source_cap_python_recompute(spark, sf_dir):
    """The capped report must equal a pure-python recompute over the
    collected corpus (n_chars DESC, doc_id tiebreak, top-CAP per source)."""
    from spark_states_spark.functions.pipeline import (
        _SOURCE_CAP,
        curation_source_cap,
    )
    from spark_states_spark.sources import load_table

    got = {
        r.source: (r.n_kept, r.kept_chars, r.cap_boundary_chars, r.n_langs_kept)
        for r in curation_source_cap(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r)
    ref = {}
    for src, rows in by_src.items():
        kept = sorted(rows, key=lambda r: (-r.n_chars, r.doc_id))[:_SOURCE_CAP]
        ref[src] = (
            len(kept),
            sum(r.n_chars for r in kept),
            min(r.n_chars for r in kept),
            len({r.lang for r in kept}),
        )
    assert got == ref
    assert all(v[0] <= _SOURCE_CAP for v in got.values())


def test_importance_weighted_python_recompute(spark, sf_dir):
    """The hash-threshold acceptance must equal a python md5 recompute —
    the determinism that makes the sample reproducible on any cluster."""
    import hashlib

    from spark_states_spark.functions.pipeline import (
        sample_importance_weighted,
    )
    from spark_states_spark.sources import load_table

    got = {
        r.lang: (r.n_kept, r.n_total, r.kept_chars)
        for r in sample_importance_weighted(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).collect()
    ref = {}
    for r in docs:
        h = int(hashlib.md5(f"imp:{r.doc_id}".encode()).hexdigest()[:8], 16)
        kept = (h % 1000) < min(1000, r.n_chars * 2)
        n_kept, n_total, chars = ref.get(r.lang, (0, 0, 0))
        ref[r.lang] = (
            n_kept + kept,
            n_total + 1,
            chars + (r.n_chars if kept else 0),
        )
    # python sums build ints; Spark's conditional sum is nullable bigint
    ref = {k: (int(a), int(b), int(c)) for k, (a, b, c) in ref.items()}
    assert got == ref
    # long docs (n_chars >= 500) are always kept: acceptance saturates
    for r in docs:
        if r.n_chars >= 500:
            h = int(hashlib.md5(f"imp:{r.doc_id}".encode()).hexdigest()[:8], 16)
            assert (h % 1000) < 1000
