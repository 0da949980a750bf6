"""Incremental truth store (streaming/truthgate.py): per-batch
candidate-disjoint tier partials must reproduce the one-shot graded
truth exactly after every contract-respecting append prefix, the
query-docs-first contract must be ENFORCED (not just documented), and
grading a served ranking against the stored truth must equal the
one-shot q185 metric rows at full corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.dedup import (
    _spark_shingle_hashes,
)
from oanda_stream_processor_spark.operators.retrieval import (
    N_QUERIES,
    relevance_truth_from,
    token_postings,
)
from oanda_stream_processor_spark.streaming.truthgate import (
    read_truth,
    serve_quality_from_truth_store,
    start_truth_stream,
    write_batch_truth_partials,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot_truth(seen):
    p = token_postings(seen)
    psh = _spark_shingle_hashes(seen, with_pos=True)
    qp = (psh.where((F.col("pos") == 1)
                    & (F.col("doc_id") < N_QUERIES))
          .select(F.col("doc_id").alias("query_id"),
                  F.col("sh").alias("qsh")))
    phr = (psh.join(qp, psh.sh == qp.qsh)
           .where(F.col("doc_id") != F.col("query_id"))
           .select("query_id", F.col("doc_id").alias("cand_id"))
           .distinct())
    return relevance_truth_from(p, phr)


def test_truth_store_tracks_appends_and_grades(spark, tmp_path):
    """Per contract-respecting prefix: stored truth == one-shot truth
    on docs-so-far; at full corpus the quality read from the stored
    truth equals one-shot q185's metric rows."""
    from oanda_stream_processor_spark.operators.retrieval import (
        q185_retrieval_quality,
    )
    from oanda_stream_processor_spark.streaming.bm25gate import (
        write_batch_partials,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    t_state = str(tmp_path / "truth")
    b_state = str(tmp_path / "bm25")
    # batch 0 carries ALL query docs (the contract) plus half the
    # candidates; batch 1 the rest
    batches = [
        d.where((F.col("doc_id") < N_QUERIES)
                | (F.col("doc_id") % 2 == 0)),
        d.where((F.col("doc_id") >= N_QUERIES)
                & (F.col("doc_id") % 2 == 1)),
    ]
    seen = None
    for i, part in enumerate(batches):
        write_batch_truth_partials(part, t_state, i)
        write_batch_partials(part, b_state, i)
        seen = part if seen is None else seen.unionByName(part)
        assert _table(read_truth(spark, t_state)) == \
            _table(_one_shot_truth(seen)), f"diverged after batch {i}"
    got = _table(serve_quality_from_truth_store(spark, t_state,
                                                b_state))
    want = _table(q185_retrieval_quality(spark, SF_DIR))
    assert got == want and len(want) == N_QUERIES


def test_truth_store_contract_enforced_and_replay(spark, tmp_path):
    """A query doc arriving AFTER candidate partials exist must raise
    (the store must never silently hold a truth built against a
    partial query side); replaying an already-written batch is
    idempotent, including the query batch itself."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "truth")
    q_batch = d.where(F.col("doc_id") < N_QUERIES + 50)
    c_batch = d.where(F.col("doc_id") >= N_QUERIES + 50)
    write_batch_truth_partials(q_batch, state, 0)
    write_batch_truth_partials(c_batch, state, 1)
    want = _table(read_truth(spark, state))
    with pytest.raises(ValueError, match="contract"):
        write_batch_truth_partials(q_batch, state, 2)
    # replay: overwriting either batch's partials is a no-op
    write_batch_truth_partials(q_batch, state, 0)
    write_batch_truth_partials(c_batch, state, 1)
    assert _table(read_truth(spark, state)) == want
    assert want == _table(_one_shot_truth(d))


def test_truth_stream_e2e(spark, tmp_path):
    """availableNow e2e: queries-first file order through a real
    stream reproduces the one-shot truth."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs"
    src.mkdir()
    (d.where(F.col("doc_id") < N_QUERIES + 100).coalesce(1)
     .write.json(str(src / "f1")))
    (d.where(F.col("doc_id") >= N_QUERIES + 100).coalesce(1)
     .write.json(str(src / "f2")))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))
    state = str(tmp_path / "tstate")
    q = start_truth_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert _table(read_truth(spark, state)) == \
        _table(_one_shot_truth(d))
    # r16: the metric-side partials ride the same stream — the served
    # (n_rel, idcg) equal the full-truth derivation after the e2e run
    from oanda_stream_processor_spark.operators.retrieval import (
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.truthgate import (
        read_truth_side,
    )
    nrel, idcg = read_truth_side(spark, state)
    wn, wi = truth_side_frames(read_truth(spark, state))
    assert _table(nrel) == _table(wn)
    assert _table(idcg) == _table(wi)


def test_truth_side_partials_track_appends(spark, tmp_path):
    """r16 (VERDICT r15 ask #3): the metric-side partials — SUM-merged
    n_rel and the ideal DCG re-ranked over the bounded union of
    per-batch top-K lists — equal the full-truth derivation
    (truth_side_frames over read_truth) after every contract prefix;
    a pre-r16 store (nrel/itop removed) falls back to the full-truth
    derivation instead of throwing; and the one-shot q196 registry
    output (DuckDB-oracled) equals the store's frame at full corpus."""
    import shutil

    from oanda_stream_processor_spark.operators.retrieval import (
        q196_truth_side,
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.truthgate import (
        read_truth_side,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "truth")
    batches = [
        d.where((F.col("doc_id") < N_QUERIES)
                | (F.col("doc_id") % 2 == 0)),
        d.where((F.col("doc_id") >= N_QUERIES)
                & (F.col("doc_id") % 2 == 1)),
    ]
    for i, part in enumerate(batches):
        write_batch_truth_partials(part, state, i)
        nrel, idcg = read_truth_side(spark, state)
        wn, wi = truth_side_frames(read_truth(spark, state))
        assert _table(nrel) == _table(wn), f"n_rel, batch {i}"
        assert _table(idcg) == _table(wi), f"idcg, batch {i}"
    got = _table(nrel.join(idcg, "query_id"))
    assert got == _table(q196_truth_side(spark, SF_DIR))
    # pre-r16 store shape: no nrel/itop layout -> full-truth fallback
    shutil.rmtree(f"{state}/nrel")
    shutil.rmtree(f"{state}/itop")
    nrel2, idcg2 = read_truth_side(spark, state)
    assert _table(nrel2.join(idcg2, "query_id")) == got


def test_truth_side_partial_coverage_falls_back(spark, tmp_path):
    """r17 ADVICE (medium): a store whose nrel/itop partials cover
    only SOME of prox/'s batches — a pre-r16 store resumed under r16
    code, or a crash between the phr and nrel/itop writes — must NOT
    serve undercounted n_rel / wrong IDCG from the surviving
    partials; the coverage guard (batch-id set comparison against
    prox/) degrades to the always-sound full-truth derivation."""
    import shutil

    from oanda_stream_processor_spark.operators.retrieval import (
        truth_side_frames,
    )
    from oanda_stream_processor_spark.streaming.truthgate import (
        read_truth_side,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "truth")
    batches = [
        d.where((F.col("doc_id") < N_QUERIES)
                | (F.col("doc_id") % 2 == 0)),
        d.where((F.col("doc_id") >= N_QUERIES)
                & (F.col("doc_id") % 2 == 1)),
    ]
    for i, part in enumerate(batches):
        write_batch_truth_partials(part, state, i)
    want_n, want_i = (_table(f) for f in
                      truth_side_frames(read_truth(spark, state)))
    # simulate the resumed-store / crash window: nrel covers only
    # batch 0 while prox covers both -> the guard must fall back
    shutil.rmtree(f"{state}/nrel/batch_id=1")
    nrel, idcg = read_truth_side(spark, state)
    assert _table(nrel) == want_n, "partial nrel served undercounted"
    assert _table(idcg) == want_i
    # same for a torn itop layout (nrel whole again via fresh write)
    write_batch_truth_partials(batches[1], state, 1)
    shutil.rmtree(f"{state}/itop/batch_id=0")
    nrel, idcg = read_truth_side(spark, state)
    assert _table(nrel) == want_n
    assert _table(idcg) == want_i, "partial itop mispriced the IDCG"
    # healed store (replay rewrote batch 1) uses the partials again
    write_batch_truth_partials(batches[0], state, 0)
    nrel, idcg = read_truth_side(spark, state)
    assert _table(nrel) == want_n and _table(idcg) == want_i


def test_decision_reads_prefer_truth_store(spark, tmp_path):
    """r16 (VERDICT r15 ask #1): every served decision read grades
    identically from the incremental truth store (truth_state=...)
    and from the postings-derived truth — per contract-respecting
    append prefix for the quality read, and at full corpus for the
    fusion-compare and gated-fusion reads against their one-shot
    registry queries."""
    from oanda_stream_processor_spark.operators.retrieval import (
        q185_retrieval_quality,
        q191_fusion_quality_compare,
        q193_quality_gated_fusion,
    )
    from oanda_stream_processor_spark.streaming.bm25gate import (
        write_batch_partials,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        exact_cosine_pool,
        serve_fusion_quality_compare,
        serve_quality_gated_fusion,
        serve_retrieval_quality,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    t = str(tmp_path / "truth")
    b = str(tmp_path / "bm25")
    h = str(tmp_path / "phrase")
    x = str(tmp_path / "prox")
    batches = [
        d.where((F.col("doc_id") < N_QUERIES)
                | (F.col("doc_id") % 2 == 0)),
        d.where((F.col("doc_id") >= N_QUERIES)
                & (F.col("doc_id") % 2 == 1)),
    ]
    for i, part in enumerate(batches):
        write_batch_truth_partials(part, t, i)
        write_batch_partials(part, b, i)
        write_batch_postings(part, h, i)
        write_batch_token_postings(part, x, i)
        got = serve_retrieval_quality(spark, b, x, h, truth_state=t)
        want = serve_retrieval_quality(spark, b, x, h)
        assert _table(got) == _table(want), f"quality, prefix {i}"
    assert _table(got) == _table(q185_retrieval_quality(spark, SF_DIR))
    cos = exact_cosine_pool(spark, SF_DIR)
    assert _table(serve_fusion_quality_compare(
        spark, b, x, h, cos, truth_state=t)) == \
        _table(q191_fusion_quality_compare(spark, SF_DIR))
    assert _table(serve_quality_gated_fusion(
        spark, b, x, h, cos, truth_state=t)) == \
        _table(q193_quality_gated_fusion(spark, SF_DIR))


def test_truth_state_auto_detected(spark, tmp_path):
    """r17 (VERDICT r16 Next-round #3): truth_state defaults to
    'auto' — a truth store co-located at <bm25_state>/truth is
    DETECTED and preferred by all four decision reads, with
    auto ≡ explicit kwarg ≡ postings fallback row-for-row; a bm25
    store without the co-located layout auto-routes to the postings
    fallback (no kwarg threading either way)."""
    from oanda_stream_processor_spark.streaming.bm25gate import (
        write_batch_partials,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        write_batch_postings,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        write_batch_token_postings,
    )
    from oanda_stream_processor_spark.streaming.rrfserve import (
        exact_cosine_pool,
        serve_fusion_quality_compare,
        serve_prf_quality_compare,
        serve_quality_gated_fusion,
        serve_retrieval_quality,
    )
    from oanda_stream_processor_spark.streaming.truthgate import (
        maybe_truth_state,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b = str(tmp_path / "bm25")
    h = str(tmp_path / "phrase")
    x = str(tmp_path / "prox")
    t = f"{b}/truth"  # the canonical co-located layout
    batches = [
        d.where((F.col("doc_id") < N_QUERIES)
                | (F.col("doc_id") % 2 == 0)),
        d.where((F.col("doc_id") >= N_QUERIES)
                & (F.col("doc_id") % 2 == 1)),
    ]
    for i, part in enumerate(batches):
        write_batch_partials(part, b, i)
        write_batch_postings(part, h, i)
        write_batch_token_postings(part, x, i)
        write_batch_truth_partials(part, t, i)
    assert maybe_truth_state(spark, b) == t
    want = _table(serve_retrieval_quality(spark, b, x, h,
                                          truth_state=t))
    assert _table(serve_retrieval_quality(spark, b, x, h)) == want
    assert _table(serve_retrieval_quality(spark, b, x, h,
                                          truth_state=None)) == want
    cos = exact_cosine_pool(spark, SF_DIR)
    for fn in (serve_fusion_quality_compare,
               serve_quality_gated_fusion):
        explicit = _table(fn(spark, b, x, h, cos, truth_state=t))
        assert _table(fn(spark, b, x, h, cos)) == explicit
        assert _table(fn(spark, b, x, h, cos,
                         truth_state=None)) == explicit
    assert _table(serve_prf_quality_compare(spark, b, x, h)) == \
        _table(serve_prf_quality_compare(spark, b, x, h,
                                         truth_state=t))
    # a bm25 store WITHOUT the co-located layout: auto -> fallback
    b2 = str(tmp_path / "bm25_bare")
    for i, part in enumerate(batches):
        write_batch_partials(part, b2, i)
    assert maybe_truth_state(spark, b2) is None
    assert _table(serve_retrieval_quality(spark, b2, x, h)) == \
        _table(serve_retrieval_quality(spark, b2, x, h,
                                       truth_state=None))


def test_q195_truth_query_served_by_store(spark, tmp_path):
    """q195 (the truth set as a registry output) equals the truth the
    incremental store serves at full corpus — the one-shot side is
    DuckDB-oracled (registry), so this pins the store against the
    oracled frame transitively."""
    from oanda_stream_processor_spark.operators.retrieval import (
        q195_relevance_truth,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "truth")
    write_batch_truth_partials(
        d.where(F.col("doc_id") < N_QUERIES + 200), state, 0)
    write_batch_truth_partials(
        d.where(F.col("doc_id") >= N_QUERIES + 200), state, 1)
    assert _table(read_truth(spark, state)) == \
        _table(q195_relevance_truth(spark, SF_DIR))
