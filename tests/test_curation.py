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
