"""Property-based soundness tests (hypothesis) for the r14 pruning
machinery: on RANDOM corpora — mixed common/mid/rare vocabulary,
random term repeats, random doc lengths — the block-max candidate
set and the store-derived θ bound must preserve EXACT top-k results,
and θ_lb must never exceed the true achieved POOL-th score.  The
fixed-corpus tests pin the interesting regimes (flat, Zipfian,
block-skewed); these sweep the space between them so a soundness hole
that only opens on an odd df/tf/dl mix fails loudly."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

import oanda_stream_processor_spark.operators.retrieval as R

POOL = R.POOL


def _random_corpus(spark, seed: int, n_docs: int):
    """Mixed-df corpus: 5 common terms (every doc), 6 mid terms
    (~40%), 10 rare terms (~8%), repeats 1-4, plus occasional filler
    so dl varies.  Query docs (0..N_QUERIES-1) carry at least one
    rare term so pruning has something to seed on in most draws."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        toks = []
        for c in range(5):
            toks += [f"c{c}"] * rng.randint(1, 4)
        for m in range(6):
            if rng.random() < 0.4:
                toks += [f"m{m}"] * rng.randint(1, 3)
        for r in range(10):
            if rng.random() < 0.08 or (i < R.N_QUERIES and r == i % 10):
                toks.append(f"r{r}")
        if rng.random() < 0.3:
            toks += ["pad"] * rng.randint(1, 6)
        rng.shuffle(toks)
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full_pool(tf, dfq, dl, stats, qterms):
    return sorted(tuple(r) for r in
                  R.bm25_pool_from(tf, dfq, dl, stats, qterms)
                  .select("query_id", "cand_id", "fp_sum", "rank")
                  .collect())


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=40, max_value=90))
def test_blockmax_and_maxscore_exact_on_random_corpora(spark, seed,
                                                      n_docs):
    """For ANY corpus draw: pools ranked from the block-max candidate
    set AND the term-level MaxScore candidate set equal the full
    unpruned pool row-for-row — the exactness theorem swept across
    random df/tf/dl mixes, not just the constructed regimes."""
    d = _random_corpus(spark, seed, n_docs)
    tf, dfq, dl, stats = R.corpus_term_frames(d)
    tf = tf.localCheckpoint(eager=True)
    qterms = R.query_terms_from(tf)
    want = _full_pool(tf, dfq, dl, stats, qterms)

    c_blk, fs = R.blockmax_candidates(tf, dfq, dl, stats, qterms)
    got_blk = sorted(tuple(r) for r in
                     R._pool_rank(fs(c_blk),
                                  [F.desc("fp_sum"), F.asc("cand_id")],
                                  POOL)
                     .select("query_id", "cand_id", "fp_sum", "rank")
                     .collect())
    assert got_blk == want, f"block-max diverged (seed={seed})"

    c_term, fs2 = R.maxscore_candidates(tf, dfq, dl, stats, qterms)
    got_term = sorted(tuple(r) for r in
                      R._pool_rank(fs2(c_term),
                                   [F.desc("fp_sum"),
                                    F.asc("cand_id")], POOL)
                      .select("query_id", "cand_id", "fp_sum", "rank")
                      .collect())
    assert got_term == want, f"term MaxScore diverged (seed={seed})"


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=40, max_value=90))
def test_theta_bound_sound_on_random_corpora(spark, seed, n_docs):
    """For ANY corpus draw: the histogram-derived θ lower bound never
    exceeds the true achieved POOL-th score, and the essential split
    driven by it preserves the exact top-POOL pool."""
    from oanda_stream_processor_spark.streaming.thetagate import (
        batch_impact_partial,
        theta_lower_bound,
    )

    d = _random_corpus(spark, seed, n_docs)
    tf, dfq, dl, stats = R.corpus_term_frames(d)
    tf = tf.localCheckpoint(eager=True)
    qterms = R.query_terms_from(tf)
    pool = R.bm25_pool_from(tf, dfq, dl, stats, qterms)
    true_theta = {r.query_id: r.fp_sum for r in
                  pool.where(F.col("rank") == POOL).collect()}

    theta = theta_lower_bound(batch_impact_partial(d), dfq, stats,
                              qterms)
    for r in theta.collect():
        assert r.query_id in true_theta, \
            f"θ emitted for a query with < POOL candidates (seed={seed})"
        assert r.theta <= true_theta[r.query_id], \
            (seed, r.query_id, r.theta, true_theta[r.query_id])

    ess = R._essential_terms(
        R.term_upper_bounds(dfq, stats, qterms), theta)
    cands = (tf.join(ess, "term")
             .where(F.col("cand_id") != F.col("query_id"))
             .select("query_id", "cand_id").distinct())
    scores = R.bm25_full_scores(cands, tf, dfq, dl, stats, qterms)
    got = sorted(tuple(r) for r in
                 R._pool_rank(scores,
                              [F.desc("fp_sum"), F.asc("cand_id")],
                              POOL)
                 .select("query_id", "cand_id", "fp_sum", "rank")
                 .collect())
    want = sorted(tuple(r) for r in
                  pool.select("query_id", "cand_id", "fp_sum", "rank")
                  .collect())
    assert got == want, f"θ-driven essential split diverged (seed={seed})"


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=40, max_value=90))
def test_bm25f_blockmax_exact_on_random_corpora(spark, seed, n_docs):
    """r15 (q194): for ANY corpus draw, the TOP_K pool ranked from
    the per-field block-max candidate set equals the full unpruned
    BM25F pool row-for-row — the field-blocked exactness theorem
    (per-field tfw bounds summed THEN saturated) swept across random
    df/tf/dl/field mixes.  The random shuffle inside _random_corpus
    moves terms across the title/body boundary draw to draw, so the
    per-field min_dlf/max_tf cells vary independently of the plain
    layout's."""
    d = _random_corpus(spark, seed, n_docs)
    tff, dlf, dfd, ndocs, avgf = R.corpus_field_frames(d)
    tff = tff.localCheckpoint(eager=True)
    wtf = R.bm25f_weighted_tf(tff, dlf, avgf).localCheckpoint(eager=True)
    qterms = (tff.where(F.col("cand_id") < R.N_QUERIES)
              .select(F.col("cand_id").alias("query_id"), "term")
              .distinct())

    def fs(cands):
        return R.bm25f_full_scores(cands, wtf, dfd, ndocs, qterms)

    full_set = (wtf.select("cand_id", "term").join(qterms, "term")
                .where(F.col("cand_id") != F.col("query_id"))
                .select("query_id", "cand_id").distinct())
    want = sorted(tuple(r) for r in
                  R._pool_rank(fs(full_set),
                               [F.desc("fp_sum"), F.asc("cand_id")],
                               R.TOP_K)
                  .select("query_id", "cand_id", "fp_sum", "rank")
                  .collect())
    c_blk, full_scores = R.bm25f_blockmax_candidates(
        tff, dlf, dfd, ndocs, avgf, qterms, wtf)
    got = sorted(tuple(r) for r in
                 R._pool_rank(full_scores(c_blk),
                              [F.desc("fp_sum"), F.asc("cand_id")],
                              R.TOP_K)
                 .select("query_id", "cand_id", "fp_sum", "rank")
                 .collect())
    assert got == want, f"field block-max diverged (seed={seed})"
