"""Served hybrid RRF (streaming/rrfserve.py): the fusion read
composed from the persisted BM25 store + the static-embeddings cosine
ranker must equal the one-shot hybrid after EVERY prefix of a
doc-appending batch sequence, and equal q176 verbatim once the full
corpus is ingested (the r11 verdict's Next-round #3 contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.retrieval import (
    N_QUERIES,
    bm25_pool_from,
    corpus_term_frames,
    q176_rrf_fusion,
    rrf_fuse,
)
from oanda_stream_processor_spark.streaming.bm25gate import (
    start_bm25_stream,
    write_batch_partials,
)
from oanda_stream_processor_spark.streaming.rrfserve import (
    ann_cosine_pool,
    exact_cosine_pool,
    serve_rrf_fusion,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot_bm25_pool(d):
    tf, dfq, dl, stats = corpus_term_frames(d)
    qterms = (tf.where(F.col("cand_id") < N_QUERIES)
              .select(F.col("cand_id").alias("query_id"), "term"))
    return bm25_pool_from(tf, dfq, dl, stats, qterms)


def _rank_c(pool):
    return pool.select("query_id", "cand_id",
                       F.col("rank").alias("rank_c"))


def _rank_b(pool):
    return pool.select("query_id", "cand_id",
                       F.col("rank").alias("rank_b"))


def test_served_rrf_tracks_appends_and_equals_q176(spark, tmp_path):
    """After every prefix of a 3-batch doc append, the served fusion
    equals the one-shot hybrid on the corpus so far (embeddings
    static); after the last batch it equals q176 verbatim."""
    d = load_table(spark, SF_DIR, "documents")
    cos = exact_cosine_pool(spark, SF_DIR)
    state = str(tmp_path / "state")
    seen = None
    for i in range(3):
        part = d.where(F.col("doc_id") % 3 == i)
        write_batch_partials(part, state, i)
        seen = part if seen is None else seen.unionByName(part)
        want = rrf_fuse(_rank_b(_one_shot_bm25_pool(seen)), _rank_c(cos))
        got = serve_rrf_fusion(spark, state, cos)
        assert _table(got) == _table(want), f"diverged after batch {i}"
    assert _table(serve_rrf_fusion(spark, state, cos)) == \
        _table(q176_rrf_fusion(spark, SF_DIR))


def test_served_rrf_availablenow_e2e(spark, tmp_path):
    """availableNow e2e: stream the documents in, then serve q176's
    exact answer from state + static embeddings alone."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs"
    src.mkdir()
    d.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    d.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))
    state = str(tmp_path / "state")
    q = start_bm25_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    cos = exact_cosine_pool(spark, SF_DIR)
    assert _table(serve_rrf_fusion(spark, state, cos)) == \
        _table(q176_rrf_fusion(spark, SF_DIR))


def test_served_rrf_with_ann_pool_matches_its_one_shot_twin(spark,
                                                            tmp_path):
    """The scale variant: fusing the served BM25 store with the IVF
    ANN pool equals rrf_fuse of the one-shot BM25 pool with the SAME
    ANN pool — the composition contract (the ANN pool itself is
    approximate by design, so q176 equality is NOT claimed here)."""
    from oanda_stream_processor_spark.streaming.annsearch import (
        build_ann_index,
    )

    d = load_table(spark, SF_DIR, "documents")
    e = load_table(spark, SF_DIR, "embeddings")
    index_cells, cent_one, split_planes = build_ann_index(e)
    ann = ann_cosine_pool(e, index_cells, cent_one, nprobe=2,
                          split_planes=split_planes)
    state = str(tmp_path / "state")
    for i in range(2):
        write_batch_partials(d.where(F.col("doc_id") % 2 == i), state, i)
    want = rrf_fuse(_rank_b(_one_shot_bm25_pool(d)), _rank_c(ann))
    got = serve_rrf_fusion(spark, state, ann)
    rows = _table(got)
    assert rows == _table(want) and len(rows) > 0


def test_served_phrase_filtered_bm25_tracks_appends(spark, tmp_path):
    """The composed two-store read (r12): phrase candidates from the
    postings store + BM25 scoring from the incremental store must
    equal one-shot q181 after every prefix of a 2-batch doc append
    (query docs land in batch 0 so the phrase frame exists from the
    first prefix), and equal q181 verbatim at full corpus."""
    from pyspark.sql import Window as W

    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.operators.retrieval import (
        FP,
        TOP_K,
        _pool_rank,
        bm25_full_scores,
        q181_phrase_filtered_bm25,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        build_phrase_frame,
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_phrase_filtered_bm25,
    )

    def one_shot_on(d):
        psh = _spark_shingle_hashes(d.select("doc_id", "text"),
                                    with_pos=True)
        qp = (psh.where((F.col("pos") == 1)
                        & (F.col("doc_id") < N_QUERIES))
              .select(F.col("doc_id").alias("query_id"),
                      F.col("sh").alias("qsh")))
        cands = (psh.join(qp, psh.sh == qp.qsh)
                 .where(F.col("doc_id") != F.col("query_id"))
                 .select("query_id", F.col("doc_id").alias("cand_id"))
                 .distinct())
        tf, dfq, dl, stats = corpus_term_frames(d)
        qterms = (tf.where(F.col("cand_id") < N_QUERIES)
                  .select(F.col("cand_id").alias("query_id"), "term"))
        scores = bm25_full_scores(cands, tf, dfq, dl, stats, qterms)
        pool = _pool_rank(scores, [F.desc("fp_sum"), F.asc("cand_id")],
                          TOP_K)
        return pool.select("query_id", "cand_id",
                           (F.col("fp_sum") / F.lit(FP)).alias("score"),
                           "rank")

    d = load_table(spark, SF_DIR, "documents")
    phrases = build_phrase_frame(d)
    bm25_state = str(tmp_path / "bm25")
    phrase_state = str(tmp_path / "phrase")
    batches = [F.col("doc_id") < 250, F.col("doc_id") >= 250]
    seen = None
    for i, cond in enumerate(batches):
        part = d.where(cond)
        write_batch_partials(part, bm25_state, i)
        write_batch_postings(part, phrase_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_phrase_filtered_bm25(spark, bm25_state,
                                         phrase_state, phrases)
        assert _table(got) == _table(one_shot_on(seen)), \
            f"diverged after batch {i}"
    assert _table(serve_phrase_filtered_bm25(spark, bm25_state,
                                             phrase_state, phrases)) == \
        _table(q181_phrase_filtered_bm25(spark, SF_DIR))


def test_served_proximity_boosted_bm25_tracks_appends(spark, tmp_path):
    """The r12 post-record streaming addition: q184 served from the
    BM25 store + the token-positional postings store must equal the
    one-shot boosted rerank after every prefix of a 2-batch append and
    q184 verbatim at full corpus (the registry untouched — parity is
    pinned here, not by code sharing)."""
    from pyspark.sql import Window as W

    from oanda_stream_processor_spark.operators.helpers import exact_tdiv
    from oanda_stream_processor_spark.operators.retrieval import (
        FP,
        PROX_W,
        TOP_K,
        proximity_from,
        q184_proximity_boosted_bm25,
        token_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        build_query_term_frame,
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_proximity_boosted_bm25,
    )

    def one_shot_on(d, qtermf):
        pool = _one_shot_bm25_pool(d)
        prox = (proximity_from(token_postings(d), qtermf)
                .select("query_id", "cand_id", "min_dist"))
        bonus = F.coalesce(
            exact_tdiv(F.lit(PROX_W), F.col("min_dist")), F.lit(0))
        boosted = (pool.join(prox, ["query_id", "cand_id"], "left")
                   .select("query_id", "cand_id", "min_dist",
                           (F.col("fp_sum") + bonus).alias("bfp")))
        w = W.partitionBy("query_id").orderBy(F.desc("bfp"),
                                              F.asc("cand_id"))
        return (boosted.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= TOP_K)
                .select("query_id", "cand_id", "min_dist",
                        (F.col("bfp") / F.lit(FP)).alias("score"),
                        "rank"))

    d = load_table(spark, SF_DIR, "documents")
    qtermf = build_query_term_frame(d)
    bm25_state = str(tmp_path / "bm25")
    prox_state = str(tmp_path / "prox")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, bm25_state, i)
        write_batch_token_postings(part, prox_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_proximity_boosted_bm25(spark, bm25_state,
                                           prox_state, qtermf)
        assert _table(got) == _table(one_shot_on(seen, qtermf)), \
            f"diverged after batch {i}"
    assert _table(serve_proximity_boosted_bm25(spark, bm25_state,
                                               prox_state, qtermf)) == \
        _table(q184_proximity_boosted_bm25(spark, SF_DIR))


def test_served_proximity_fused_rrf_tracks_appends(spark, tmp_path):
    """r14 (the q190 serving twin): the fused read composed from the
    BM25 store + the token-positional postings store + the static
    cosine pool equals the one-shot proximity-boosted fusion after
    every prefix of a 2-batch append, and q190 verbatim at full
    corpus."""
    from oanda_stream_processor_spark.operators.retrieval import (
        POOL,
        proximity_boosted_pool,
        proximity_from,
        q190_proximity_fused_rrf,
        token_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        build_query_term_frame,
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_proximity_fused_rrf,
    )

    def one_shot_on(d, qtermf, cos):
        pool = _one_shot_bm25_pool(d)
        prox = (proximity_from(token_postings(d), qtermf)
                .select("query_id", "cand_id", "min_dist"))
        b = (proximity_boosted_pool(pool, prox, POOL)
             .select("query_id", "cand_id",
                     F.col("rank").alias("rank_b")))
        return rrf_fuse(b, _rank_c(cos))

    d = load_table(spark, SF_DIR, "documents")
    qtermf = build_query_term_frame(d)
    cos = exact_cosine_pool(spark, SF_DIR)
    bm25_state = str(tmp_path / "bm25")
    prox_state = str(tmp_path / "prox")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, bm25_state, i)
        write_batch_token_postings(part, prox_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_proximity_fused_rrf(spark, bm25_state, prox_state,
                                        qtermf, cos)
        assert _table(got) == _table(one_shot_on(seen, qtermf, cos)), \
            f"diverged after batch {i}"
    assert _table(serve_proximity_fused_rrf(spark, bm25_state,
                                            prox_state, qtermf, cos)) \
        == _table(q190_proximity_fused_rrf(spark, SF_DIR))


def test_served_quality_equals_q185(spark, tmp_path):
    """r13: the served ranking-quality read composed from the three
    stores (BM25 system ranking + token-positional truth tiers +
    trigram phrase tier) equals one-shot q185 — per append prefix via
    the shared cores, verbatim at full corpus."""
    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.operators.retrieval import (
        TOP_K,
        q185_retrieval_quality,
        quality_metrics_from,
        relevance_truth_from,
        token_postings,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_retrieval_quality,
    )

    def one_shot_on(seen):
        tf, dfq, dl, stats = corpus_term_frames(seen)
        qterms = (tf.where(F.col("cand_id") < N_QUERIES)
                  .select(F.col("cand_id").alias("query_id"), "term"))
        pool = (bm25_pool_from(tf, dfq, dl, stats, qterms)
                .where(F.col("rank") <= TOP_K)
                .select("query_id", "cand_id", "rank"))
        psh = _spark_shingle_hashes(seen, with_pos=True)
        qp = (psh.where((F.col("pos") == 1)
                        & (F.col("doc_id") < N_QUERIES))
              .select(F.col("doc_id").alias("query_id"),
                      F.col("sh").alias("qsh")))
        phr = (psh.join(qp, psh.sh == qp.qsh)
               .where(F.col("doc_id") != F.col("query_id"))
               .select("query_id", F.col("doc_id").alias("cand_id"))
               .distinct())
        truth = relevance_truth_from(token_postings(seen), phr)
        base = (tf.where(F.col("cand_id") < N_QUERIES)
                .select(F.col("cand_id").alias("query_id")).distinct())
        return quality_metrics_from(pool, truth, base=base)

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b_state = str(tmp_path / "bm25")
    p_state = str(tmp_path / "prox")
    h_state = str(tmp_path / "phrase")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, b_state, i)
        write_batch_token_postings(part, p_state, i)
        write_batch_postings(part, h_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_retrieval_quality(spark, b_state, p_state, h_state)
        assert _table(got) == _table(one_shot_on(seen)), \
            f"diverged after batch {i}"
    assert _table(serve_retrieval_quality(spark, b_state, p_state,
                                          h_state)) == \
        _table(q185_retrieval_quality(spark, SF_DIR))


def test_served_quality_grades_arbitrary_rankers(spark, tmp_path):
    """r13: one stored truth grades every ranker — the served quality
    read over the served PRF pool equals the one-shot metric computed
    from one-shot q187 + one-shot truth, and the same for the
    proximity-boosted rerank (both pools reach TOP_K depth)."""
    from oanda_stream_processor_spark.operators.retrieval import (
        q184_proximity_boosted_bm25,
        q187_prf_expanded_bm25,
        quality_metrics_from,
        relevance_truth,
    )
    from oanda_stream_processor_spark.streaming.bm25gate import (
        serve_prf_expanded_bm25,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        build_query_term_frame,
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_proximity_boosted_bm25,
        serve_retrieval_quality,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b_state = str(tmp_path / "bm25")
    p_state = str(tmp_path / "prox")
    h_state = str(tmp_path / "phrase")
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, b_state, i)
        write_batch_token_postings(part, p_state, i)
        write_batch_postings(part, h_state, i)

    from oanda_stream_processor_spark.operators.retrieval import (
        query_doc_base,
    )
    truth = relevance_truth(spark, SF_DIR)
    qbase = query_doc_base(spark, SF_DIR)
    # served PRF pool graded by the served quality read
    prf_pool = serve_prf_expanded_bm25(spark, b_state)
    got = serve_retrieval_quality(spark, b_state, p_state, h_state,
                                  pool=prf_pool)
    want = quality_metrics_from(
        q187_prf_expanded_bm25(spark, SF_DIR)
        .select("query_id", "cand_id", "rank"), truth, base=qbase)
    assert _table(got) == _table(want)
    # proximity-boosted rerank graded the same way
    boosted = serve_proximity_boosted_bm25(
        spark, b_state, p_state, build_query_term_frame(d))
    got2 = serve_retrieval_quality(spark, b_state, p_state, h_state,
                                   pool=boosted)
    want2 = quality_metrics_from(
        q184_proximity_boosted_bm25(spark, SF_DIR)
        .select("query_id", "cand_id", "rank"), truth, base=qbase)
    assert _table(got2) == _table(want2)


def test_served_fusion_quality_compare_equals_q191(spark, tmp_path):
    """r14: the served three-system fusion-quality comparison (the
    fusion DECISION read) composed from the three stores + the static
    cosine pool equals one-shot q191 — per append prefix via the
    shared cores, verbatim at full corpus."""
    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.operators.retrieval import (
        POOL,
        TOP_K,
        _macro_summary,
        proximity_boosted_pool,
        proximity_from,
        q191_fusion_quality_compare,
        quality_metrics_from,
        relevance_truth_from,
        token_postings,
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_fusion_quality_compare,
    )

    cos = exact_cosine_pool(spark, SF_DIR)

    def one_shot_on(seen):
        tf, dfq, dl, stats = corpus_term_frames(seen)
        qterms = (tf.where(F.col("cand_id") < N_QUERIES)
                  .select(F.col("cand_id").alias("query_id"), "term"))
        pool = bm25_pool_from(tf, dfq, dl, stats, qterms)
        p = token_postings(seen)
        qtermf = (p.where(F.col("doc_id") < N_QUERIES)
                  .select(F.col("doc_id").alias("query_id"), "term")
                  .distinct())
        px = proximity_from(p, qtermf)
        psh = _spark_shingle_hashes(seen, with_pos=True)
        qp = (psh.where((F.col("pos") == 1)
                        & (F.col("doc_id") < N_QUERIES))
              .select(F.col("doc_id").alias("query_id"),
                      F.col("sh").alias("qsh")))
        phr = (psh.join(qp, psh.sh == qp.qsh)
               .where(F.col("doc_id") != F.col("query_id"))
               .select("query_id", F.col("doc_id").alias("cand_id"))
               .distinct())
        truth = relevance_truth_from(p, phr, prox=px)
        base = (tf.where(F.col("cand_id") < N_QUERIES)
                .select(F.col("cand_id").alias("query_id")).distinct())
        nrel, idcg = truth_side_frames(truth)
        bm25_tk = (pool.where(F.col("rank") <= TOP_K)
                   .select("query_id", "cand_id", "rank"))
        boosted = proximity_boosted_pool(
            pool.select("query_id", "cand_id", "fp_sum"),
            px.select("query_id", "cand_id", "min_dist"), POOL)
        boost_tk = (boosted.where(F.col("rank") <= TOP_K)
                    .select("query_id", "cand_id", "rank"))
        fused_tk = (rrf_fuse(
            boosted.select("query_id", "cand_id",
                           F.col("rank").alias("rank_b")),
            _rank_c(cos))
            .select("query_id", "cand_id",
                    F.col("fused_rank").alias("rank")))
        out = None
        for name, tk in (("bm25", bm25_tk), ("boosted", boost_tk),
                         ("fused", fused_tk)):
            row = (_macro_summary(quality_metrics_from(
                tk, truth, base=base, nrel=nrel, idcg=idcg))
                .select(F.lit(name).alias("system"), "n_queries",
                        "macro_ndcg_ppm", "macro_mrr_ppm",
                        "macro_recall_ppm"))
            out = row if out is None else out.unionByName(row)
        return out

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b_state = str(tmp_path / "bm25")
    p_state = str(tmp_path / "prox")
    h_state = str(tmp_path / "phrase")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, b_state, i)
        write_batch_token_postings(part, p_state, i)
        write_batch_postings(part, h_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_fusion_quality_compare(spark, b_state, p_state,
                                           h_state, cos)
        assert _table(got) == _table(one_shot_on(seen)), \
            f"diverged after batch {i}"
    assert _table(serve_fusion_quality_compare(
        spark, b_state, p_state, h_state, cos)) == \
        _table(q191_fusion_quality_compare(spark, SF_DIR))


def test_served_prf_quality_compare_equals_q192(spark, tmp_path):
    """r14: the served PRF-decision read (two macro rows from the
    three stores) equals one-shot q192 — per append prefix via the
    shared cores, verbatim at full corpus."""
    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.operators.retrieval import (
        TOP_K,
        _macro_summary,
        prf_expanded_pool,
        proximity_from,
        q192_prf_quality_compare,
        quality_metrics_from,
        relevance_truth_from,
        token_postings,
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_prf_quality_compare,
    )

    def one_shot_on(seen):
        tf, dfq, dl, stats = corpus_term_frames(seen)
        tf = tf.localCheckpoint(eager=True)
        qterms = (tf.where(F.col("cand_id") < N_QUERIES)
                  .select(F.col("cand_id").alias("query_id"), "term"))
        bm25_tk = (bm25_pool_from(tf, dfq, dl, stats, qterms)
                   .where(F.col("rank") <= TOP_K)
                   .select("query_id", "cand_id", "rank"))
        prf_tk = (prf_expanded_pool(tf, dfq, dl, stats, qterms)
                  .where(F.col("rank") <= TOP_K)
                  .select("query_id", "cand_id", "rank"))
        p = token_postings(seen)
        qtermf = (p.where(F.col("doc_id") < N_QUERIES)
                  .select(F.col("doc_id").alias("query_id"), "term")
                  .distinct())
        px = proximity_from(p, qtermf)
        psh = _spark_shingle_hashes(seen, with_pos=True)
        qp = (psh.where((F.col("pos") == 1)
                        & (F.col("doc_id") < N_QUERIES))
              .select(F.col("doc_id").alias("query_id"),
                      F.col("sh").alias("qsh")))
        phr = (psh.join(qp, psh.sh == qp.qsh)
               .where(F.col("doc_id") != F.col("query_id"))
               .select("query_id", F.col("doc_id").alias("cand_id"))
               .distinct())
        truth = relevance_truth_from(p, phr, prox=px)
        base = (tf.where(F.col("cand_id") < N_QUERIES)
                .select(F.col("cand_id").alias("query_id")).distinct())
        nrel, idcg = truth_side_frames(truth)
        out = None
        for name, tk in (("bm25", bm25_tk), ("prf", prf_tk)):
            row = (_macro_summary(quality_metrics_from(
                tk, truth, base=base, nrel=nrel, idcg=idcg))
                .select(F.lit(name).alias("system"), "n_queries",
                        "macro_ndcg_ppm", "macro_mrr_ppm",
                        "macro_recall_ppm"))
            out = row if out is None else out.unionByName(row)
        return out

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b_state = str(tmp_path / "bm25")
    p_state = str(tmp_path / "prox")
    h_state = str(tmp_path / "phrase")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, b_state, i)
        write_batch_token_postings(part, p_state, i)
        write_batch_postings(part, h_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_prf_quality_compare(spark, b_state, p_state,
                                        h_state)
        assert _table(got) == _table(one_shot_on(seen)), \
            f"diverged after batch {i}"
    assert _table(serve_prf_quality_compare(spark, b_state, p_state,
                                            h_state)) == \
        _table(q192_prf_quality_compare(spark, SF_DIR))


def test_served_quality_gated_fusion_equals_q193(spark, tmp_path):
    """r15 (r14 verdict ask #2 — the LAST registry query to get a
    served twin): the served champion/challenger gate composed from
    the three stores + the static cosine pool equals one-shot q193 —
    per append prefix via the shared cores (the one-shot side here is
    the same graded-frame construction over the seen corpus, gated by
    the SAME retrieval.gate_winner), verbatim at full corpus."""
    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.operators.retrieval import (
        POOL,
        TOP_K,
        _macro_summary,
        gate_winner,
        proximity_boosted_pool,
        proximity_from,
        q193_quality_gated_fusion,
        quality_metrics_from,
        relevance_truth_from,
        token_postings,
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        serve_quality_gated_fusion,
    )

    cos = exact_cosine_pool(spark, SF_DIR)

    def one_shot_gate_on(seen):
        tf, dfq, dl, stats = corpus_term_frames(seen)
        qterms = (tf.where(F.col("cand_id") < N_QUERIES)
                  .select(F.col("cand_id").alias("query_id"), "term"))
        pool = bm25_pool_from(tf, dfq, dl, stats, qterms)
        p = token_postings(seen)
        qtermf = (p.where(F.col("doc_id") < N_QUERIES)
                  .select(F.col("doc_id").alias("query_id"), "term")
                  .distinct())
        px = proximity_from(p, qtermf)
        psh = _spark_shingle_hashes(seen, with_pos=True)
        qp = (psh.where((F.col("pos") == 1)
                        & (F.col("doc_id") < N_QUERIES))
              .select(F.col("doc_id").alias("query_id"),
                      F.col("sh").alias("qsh")))
        phr = (psh.join(qp, psh.sh == qp.qsh)
               .where(F.col("doc_id") != F.col("query_id"))
               .select("query_id", F.col("doc_id").alias("cand_id"))
               .distinct())
        truth = relevance_truth_from(p, phr, prox=px)
        base = (tf.where(F.col("cand_id") < N_QUERIES)
                .select(F.col("cand_id").alias("query_id")).distinct())
        nrel, idcg = truth_side_frames(truth)
        bm25_tk = (pool.where(F.col("rank") <= TOP_K)
                   .select("query_id", "cand_id", "rank"))
        boosted = proximity_boosted_pool(
            pool.select("query_id", "cand_id", "fp_sum"),
            px.select("query_id", "cand_id", "min_dist"), POOL)
        boost_tk = (boosted.where(F.col("rank") <= TOP_K)
                    .select("query_id", "cand_id", "rank"))
        fused_tk = (rrf_fuse(
            boosted.select("query_id", "cand_id",
                           F.col("rank").alias("rank_b")),
            _rank_c(cos))
            .select("query_id", "cand_id",
                    F.col("fused_rank").alias("rank")))
        macros = None
        cand = None
        for pri, (name, tk) in enumerate(
                (("bm25", bm25_tk), ("boosted", boost_tk),
                 ("fused", fused_tk)), start=1):
            mrow = (_macro_summary(quality_metrics_from(
                tk, truth, base=base, nrel=nrel, idcg=idcg))
                .select(F.lit(name).alias("system"),
                        F.lit(pri).alias("priority"),
                        "macro_ndcg_ppm"))
            crow = tk.select(F.lit(name).alias("system"), "query_id",
                             "cand_id", "rank")
            macros = mrow if macros is None else macros.unionByName(mrow)
            cand = crow if cand is None else cand.unionByName(crow)
        return (cand.join(F.broadcast(gate_winner(macros)), "system")
                .select("system", "query_id", "cand_id", "rank"))

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b_state = str(tmp_path / "bm25")
    p_state = str(tmp_path / "prox")
    h_state = str(tmp_path / "phrase")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_partials(part, b_state, i)
        write_batch_token_postings(part, p_state, i)
        write_batch_postings(part, h_state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_quality_gated_fusion(spark, b_state, p_state,
                                         h_state, cos)
        assert _table(got) == _table(one_shot_gate_on(seen)), \
            f"diverged after batch {i}"
    assert _table(serve_quality_gated_fusion(
        spark, b_state, p_state, h_state, cos)) == \
        _table(q193_quality_gated_fusion(spark, SF_DIR))
