"""Semantic invariants for the curation operator batch (q79-q82) that
the value-hash oracle can't express: bounds, conservation laws, and
recursion-shape properties, checked on the sf0.001 fixture."""

from __future__ import annotations

import pyspark.sql.functions as F

from oanda_stream_processor_spark.operators import curation

SF = "/root/testdata/sf0.001"


def test_repetition_filter_bounds(spark):
    rows = curation.q79_repetition_filter(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert r.chars_per_tok > 0
        want = (r.dup_bigram_frac <= curation.MAX_DUP_BIGRAM + 1e-9
                and curation.MIN_CHARS_PER_TOK - 1e-9 <= r.chars_per_tok
                <= curation.MAX_CHARS_PER_TOK + 1e-9)
        # rounded display values may sit exactly on a threshold; the keep
        # flag is computed pre-rounding, so only assert on clear cases
        near_edge = (
            abs(r.dup_bigram_frac - curation.MAX_DUP_BIGRAM) < 1e-6
            or abs(r.chars_per_tok - curation.MIN_CHARS_PER_TOK) < 1e-6
            or abs(r.chars_per_tok - curation.MAX_CHARS_PER_TOK) < 1e-6)
        if not near_edge:
            assert r.keep == want, r


def test_contamination_excludes_benchmark_side(spark):
    rows = curation.q80_contamination(spark, SF).collect()
    for r in rows:
        assert r.doc_id % curation.BENCH_MOD != 0
        assert r.n_overlap_grams >= 1
        assert r.n_bench_docs >= 1


def test_packing_conserves_tokens(spark):
    d = curation.load_table(spark, SF, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    truth = {r.lang: r.total for r in
             d.select("lang", F.size(toks).alias("n"))
              .where(F.col("n") > 0)
              .groupBy("lang").agg(F.sum("n").alias("total")).collect()}
    packs = curation.q81_sequence_packing(spark, SF).collect()
    got: dict = {}
    for p in packs:
        got[p.lang] = got.get(p.lang, 0) + p.pack_tokens
        assert p.n_docs >= 1 and p.pack_tokens >= 1
    assert got == truth
    # pack ids are dense from 0 within each lang
    by_lang: dict = {}
    for p in packs:
        by_lang.setdefault(p.lang, []).append(p.pack_id)
    for ids in by_lang.values():
        assert sorted(ids) == list(range(len(ids)))


def test_recursive_walk_shape(spark):
    rows = {r.depth: r for r in
            curation.q82_recursive_hierarchy(spark, SF).collect()}
    n_cust = curation.load_table(spark, SF, "customer").count()
    assert rows[0].n_nodes == n_cust
    depths = sorted(rows)
    assert depths == list(range(len(depths)))
    for a, b in zip(depths, depths[1:]):
        assert rows[b].n_nodes <= rows[a].n_nodes


def test_dfcut_never_exceeds_uncut_jaccard_pairs(spark):
    """The df-cut can only shrink shingle sets, so every q87 pair's
    intersection is a subset of the q44 sets; the pair universe is
    bounded by q44's inverted index plus threshold effects."""
    from oanda_stream_processor_spark.operators import dedup
    cut = {(r.doc_a, r.doc_b) for r in
           dedup.q87_jaccard_dfcut(spark, SF).collect()}
    # every surviving pair still shares >= 1 (non-hot) shingle, so it
    # must also share >= 1 shingle in the uncut index
    uncut = {(r.doc_a, r.doc_b) for r in
             dedup.q44_jaccard_pairs(spark, SF).collect()}
    # threshold interactions can add/remove pairs near 0.05, but a cut
    # pair with jaccard >= 0.05 over SMALLER sets shares real content;
    # sanity: the overlap dominates both sets
    assert len(cut & uncut) >= max(len(cut), len(uncut)) // 2


def test_pagerank_mass_and_positivity(spark):
    """Fixed-point PageRank: every rank positive, and total mass stays
    within integer-floor slack of the initial SCALE * n budget."""
    from oanda_stream_processor_spark.operators import dedup
    rows = dedup.q90_pagerank(spark, SF).collect()
    assert rows, "candidate graph is empty at sf0.001"
    n = len(rows)
    total = sum(r.rank_fp for r in rows)
    assert all(r.rank_fp > 0 for r in rows)
    # ranks are a probability mass: at the internal 1e12 scale they sum
    # to PR_SCALE (fixed-point 1.0) minus a few integer-floor units per
    # node per round; rank_fp is published truncated by 10^3 (scale 1e9,
    # the DuckDB-version-proof comparison grain), losing < 10^3 more
    # per node
    pub = dedup.PR_SCALE // 1000
    floor_slack = 2 * n * dedup.PR_ITERS * 100 + 1000 * n
    assert total <= pub
    assert total >= pub - floor_slack // 1000 - n


def test_unigram_nll_matches_entropy_bounds(spark):
    """avg_nll lies between the corpus unigram entropy floor and the
    worst single-token surprisal."""
    import math
    rows = curation.q93_unigram_nll(spark, SF).collect()
    d = curation.load_table(spark, SF, "documents")
    tok = d.select(F.explode(F.filter(F.split("text", " "),
                                      lambda x: x != "")).alias("t"))
    counts = [r.c for r in tok.groupBy("t").agg(F.count("*").alias("c")).collect()]
    n = sum(counts)
    max_nll = max(-math.log(c / n) for c in counts)
    min_nll = min(-math.log(c / n) for c in counts)
    for r in rows:
        assert min_nll - 1e-3 <= r.avg_nll <= max_nll + 1e-3
        assert r.keep == (r.avg_nll <= curation.NLL_KEEP_MAX) or \
            abs(r.avg_nll - curation.NLL_KEEP_MAX) < 1e-3


def test_pps_sampling_favors_heavy_docs(spark):
    """PPS keeps a larger weight share than doc share (heavier docs are
    likelier), and per-stratum counts are internally consistent."""
    from oanda_stream_processor_spark.operators import llmprep
    rows = llmprep.q94_pps_sample(spark, SF).collect()
    n_tot = sum(r.n_total for r in rows)
    n_kept = sum(r.n_sampled for r in rows)
    w_tot = sum(r.w_total for r in rows)
    w_kept = sum(r.w_sampled for r in rows)
    assert 0 < n_kept < n_tot
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_total
        assert 0 <= r.w_sampled <= r.w_total
    # weight share of the sample >= doc share (strictly, for non-uniform w)
    assert w_kept / w_tot >= n_kept / n_tot - 1e-9


def test_zorder_buckets_partition_rows(spark):
    """Every row lands in exactly one bucket; envelopes nest inside the
    global min/max; bucket count bounded by 2^Z_BUCKETS_LOG2."""
    from oanda_stream_processor_spark.operators import extras
    rows = extras.q91_zorder_profile(spark, SF).collect()
    o = extras.load_table(spark, SF, "orders")
    n = o.count()
    assert sum(r.n_rows for r in rows) == n
    assert len(rows) <= 1 << extras.Z_BUCKETS_LOG2
    ck_lo = min(r.ck_min for r in rows); ck_hi = max(r.ck_max for r in rows)
    assert all(ck_lo <= r.ck_min <= r.ck_max <= ck_hi for r in rows)
