"""Constructed-corpus invariants for the round-6 additions q139-q143
(semantic dedup, compaction planner, kNN label propagation, minhash
calibration, mix reweighting) — edge cases the fixture-driven oracle
gate can't force: exact-duplicate vectors, oversize fragments, vote
ties, identical-text pairs, and single-source degeneracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.operators.dedup import (
    q142_minhash_calibration,
)
from oanda_stream_processor_spark.operators.extras import (
    COMPACT_TARGET,
    q140_compaction_plan,
)
from oanda_stream_processor_spark.operators.increment import q143_mix_reweight
from oanda_stream_processor_spark.operators.similarity import (
    DIM,
    q139_semantic_dedup,
    q141_knn_label_prop,
)


def _vec(axis: int) -> list[float]:
    """Unit vector along `axis` — cosine across axes is 0."""
    v = [0.0] * DIM
    v[axis] = 1.0
    return v


@pytest.fixture(scope="module")
def emb_sf(spark, tmp_path_factory) -> str:
    """8 vectors: two groups of byte-identical vectors plus orthogonal
    singletons. With fewer vectors than IVF_K every vector seeds its
    own cell, so only EXACT ties (d2 = 0 to both seeds, argmin falls to
    the lower cell id) share a cell — which is precisely the duplicate
    structure this test pins down."""
    rows = [
        (0, _vec(0), 0),
        (1, _vec(0), 0),               # identical to vec 0
        (2, _vec(0), 1),               # identical; label disagrees
        (3, _vec(7), 1),
        (4, _vec(7), 1),               # identical to vec 3
        (5, _vec(20), 2),
        (6, _vec(30), 2),
        (7, _vec(40), 3),
    ]
    d = tmp_path_factory.mktemp("emb_sf")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_q139_exact_dup_groups(spark, emb_sf):
    out = {r.vec_id: r for r in q139_semantic_dedup(spark, emb_sf).collect()}
    assert set(out) == set(range(8))
    # group leaders are kept, followers marked dup of the leader
    assert not out[0].is_dup
    assert out[1].is_dup and out[1].dup_of == 0
    assert out[2].is_dup and out[2].dup_of == 0
    assert not out[3].is_dup
    assert out[4].is_dup and out[4].dup_of == 3
    # orthogonal singletons are never dups (cosine ~ 0 < SEM_TH)
    assert not any(out[v].is_dup for v in (5, 6, 7))


def test_q141_majority_vote_and_tiebreak(spark, emb_sf):
    out = {r.vec_id: r for r in q141_knn_label_prop(spark, emb_sf).collect()}
    # vec 2 sits in the axis-0 group (labels 0, 0): neighborhood vote
    # must overrule its stored label 1 — assert the precondition too so
    # a fixture drift can't make this pass vacuously
    assert 2 in out, "fixture drift: vec 2 missing from q141 output"
    assert out[2].votes >= 2, \
        "fixture drift: vec 2 lost its axis-0 neighborhood"
    assert out[2].pred_label == 0
    assert not out[2].correct
    # every prediction must come from a real label
    labels = {0, 1, 2, 3}
    assert all(r.pred_label in labels for r in out.values())
    # votes never exceed K_NN
    assert all(1 <= r.votes <= 5 for r in out.values())


@pytest.fixture(scope="module")
def ev_sf(spark, tmp_path_factory) -> str:
    """Events forming fragments with known byte totals: type 'a' has 3
    daily fragments of ~half-target size (pack 2 per file), type 'b'
    has one oversize fragment (own file) then a small one."""
    half = COMPACT_TARGET // 2 - 32   # props length for a half-target frag
    rows = []
    eid = 0
    for day, props_len in [(1, half), (2, half), (3, half)]:
        rows.append((eid, f"2024-01-0{day} 00:00:00", 1, "a",
                     1.0, "x" * props_len))
        eid += 1
    for day, props_len in [(1, COMPACT_TARGET + 100), (2, 50)]:
        rows.append((eid, f"2024-01-0{day} 00:00:00", 1, "b",
                     1.0, "x" * props_len))
        eid += 1
    d = tmp_path_factory.mktemp("ev_sf")
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def test_q140_binpack_boundaries(spark, ev_sf):
    out = q140_compaction_plan(spark, ev_sf).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    a = sorted(by_type["a"], key=lambda r: r.file_id)
    # 3 half-target fragments: first two pack into file 0, third spills
    assert [r.n_frags for r in a] == [2, 1]
    b = sorted(by_type["b"], key=lambda r: r.file_id)
    # oversize fragment owns file 0; next fragment starts past it
    assert b[0].n_frags == 1 and b[0].file_bytes > COMPACT_TARGET
    assert len(b) == 2 and b[1].file_id > b[0].file_id
    # plan conserves bytes
    total = sum(r.file_bytes for r in out)
    ev = spark.read.parquet(f"{ev_sf}/events.parquet")
    assert total == ev.select(
        F.sum(F.length("props") + 32)).collect()[0][0]


@pytest.fixture(scope="module")
def doc_sf(spark, tmp_path_factory) -> str:
    """Documents with an identical-text pair (calibration anchor) and
    three sources with known char totals 100 / 200 / 400."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa")
    rows = [
        (1, base, "en", "s1", 100),
        (2, base, "en", "s1", 100),            # exact dup of doc 1
        (3, "totally different words here now then", "en", "s2", 200),
        (4, "unrelated content again entirely novel text", "en", "s3", 400),
    ]
    d = tmp_path_factory.mktemp("doc_sf")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint").write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_q142_identical_pair_calibrates_exactly(spark, doc_sf):
    out = q142_minhash_calibration(spark, doc_sf).collect()
    # docs 1/2 are byte-identical -> all 8 minima match, est = exact = 1e6
    perfect = [r for r in out if r.matches == 8]
    assert len(perfect) == 1
    r = perfect[0]
    assert r.est_ppm == 1_000_000
    assert r.avg_exact_ppm == 1_000_000
    assert r.avg_abs_err_ppm == 0
    assert r.min_exact_ppm == r.max_exact_ppm == 1_000_000
    # estimator identity holds on every row: est_ppm = matches/8 exactly
    for row in out:
        assert row.est_ppm == row.matches * 1_000_000 // 8


def test_q143_bounds_and_conservation(spark, doc_sf):
    out = {r.source: r for r in q143_mix_reweight(spark, doc_sf).collect()}
    assert set(out) == {"s1", "s2", "s3"}
    # smallest source (s2: 200 chars; s1 has 2x100=200 too -> floor 200)
    floor_chars = min(r.total_chars for r in out.values())
    cap_chars = max(r.total_chars for r in out.values())
    for r in out.values():
        # rate never exceeds 1e6 and kept never exceeds the floor
        assert 0 < r.rate_ppm <= 1_000_000
        assert r.kept_chars <= floor_chars
        # epoch multiplier reaches the cap from below
        assert r.epochs_fp2 * r.total_chars <= cap_chars * 100
    # the smallest source keeps (nearly) everything at rate 1e6
    smallest = [r for r in out.values() if r.total_chars == floor_chars]
    assert all(r.rate_ppm == 1_000_000 for r in smallest)
    # the largest source has epochs_fp2 == 100 (1.00 epochs)
    largest = [r for r in out.values() if r.total_chars == cap_chars]
    assert all(r.epochs_fp2 == 100 for r in largest)


@pytest.fixture(scope="module")
def ks_sf(spark, tmp_path_factory) -> str:
    """Two nations: nation 1's customer and supplier balances are
    IDENTICAL distributions (KS = 0); nation 2's are fully disjoint
    ranges (KS = 1)."""
    cust = [(i, f"c{i}", "addr", nk, "p", float(b), "mkt", "c")
            for i, (nk, b) in enumerate(
                [(1, 10.00), (1, 20.00), (1, 30.00),
                 (2, 1.00), (2, 2.00)])]
    supp = [(i, f"s{i}", "addr", nk, "p", float(b), "c")
            for i, (nk, b) in enumerate(
                [(1, 10.00), (1, 20.00), (1, 30.00),
                 (2, 100.00), (2, 200.00)])]
    d = tmp_path_factory.mktemp("ks_sf")
    spark.createDataFrame(
        cust, "c_custkey bigint, c_name string, c_address string, "
              "c_nationkey bigint, c_phone string, c_acctbal double, "
              "c_mktsegment string, c_comment string"
    ).write.parquet(str(d / "customer.parquet"))
    spark.createDataFrame(
        supp, "s_suppkey bigint, s_name string, s_address string, "
              "s_nationkey bigint, s_phone string, s_acctbal double, "
              "s_comment string"
    ).write.parquet(str(d / "supplier.parquet"))
    return str(d)


def test_q144_ks_extremes(spark, ks_sf):
    from oanda_stream_processor_spark.operators.udfs import q144_cogroup_ks
    out = {r.nation_key: r for r in q144_cogroup_ks(spark, ks_sf).collect()}
    assert set(out) == {1, 2}
    # identical samples -> KS numerator 0
    assert out[1].ks_num == 0 and out[1].ks_ppm == 0
    # disjoint samples -> KS = 1 -> numerator = n_c * n_s, ppm = 1e6
    assert out[2].ks_num == out[2].n_cust * out[2].n_supp
    assert out[2].ks_ppm == 1_000_000


def test_q145_truncation_recall_bounds(spark, emb_sf):
    from oanda_stream_processor_spark.operators.similarity import (
        TOP_K,
        q145_matryoshka_recall,
    )
    out = q145_matryoshka_recall(spark, emb_sf).collect()
    # one row per query vector, recall in [0, 1e6], ppm = overlap/K
    assert len(out) == 8  # all 8 vecs have vec_id < N_QUERIES
    for r in out:
        assert 0 <= r.n_overlap <= TOP_K
        assert r.recall_ppm == r.n_overlap * 1_000_000 // TOP_K
    # identical vectors 0/1/2 rank each other on both axes: the axis-0
    # group's top-k leaders survive truncation to the first 16 dims
    # (axis 0 < 16), so their overlap is nonzero
    by_id = {r.query_id: r for r in out}
    assert by_id[1].n_overlap >= 1


def test_q146_clique_and_edge(spark, tmp_path_factory):
    from oanda_stream_processor_spark.operators.dedup import (
        q146_graph_triangles,
    )
    ta = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliett kilo lima")
    tb = "completely different words forming another tiny document here"
    rows = [
        (1, ta, "en", "s", 10), (2, ta, "en", "s", 10),
        (3, ta, "en", "s", 10),                       # 3-clique
        (4, tb, "en", "s", 10), (5, tb, "en", "s", 10),  # lone edge
        (6, "unique text with no duplicate partner anywhere at all",
         "en", "s", 10),                              # singleton
    ]
    d = tmp_path_factory.mktemp("tri_sf")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint").write.parquet(str(d / "documents.parquet"))
    out = q146_graph_triangles(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_triangles == 1          # the 3-clique
    assert r.n_edges == 4              # 3 clique edges + 1 lone edge
    assert r.n_nodes == 5              # singleton has no edge
    # wedges: clique nodes contribute C(2,2)=1 each (3), lone-edge nodes 0
    assert r.n_wedges == 3
    assert r.global_cc_ppm == 1_000_000


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=0, max_value=3 * COMPACT_TARGET),
                min_size=1, max_size=12))
def test_q140_property_time_locality(spark, tmp_path_factory, sizes):
    """For ANY fragment-size sequence: the plan conserves fragments,
    and per type the planned files cover disjoint, ordered day ranges
    (compaction must never interleave time — the property q91/q98's
    skipping effectiveness depends on)."""
    rows = [(i, f"2024-01-{i + 1:02d} 00:00:00", 1, "t", 1.0, "x" * n)
            for i, n in enumerate(sizes)]
    d = tmp_path_factory.mktemp("prop140")
    (spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string")
     .withColumn("ts", F.to_timestamp("ts"))
     .write.parquet(str(d / "events.parquet")))
    out = sorted(q140_compaction_plan(spark, str(d)).collect(),
                 key=lambda r: r.file_id)
    assert sum(r.n_frags for r in out) == len(sizes)
    for a, b in zip(out, out[1:]):
        assert a.max_day < b.min_day   # disjoint, ordered time ranges
    # file ids are non-decreasing in byte offset: recompute the rule
    total = sum(r.file_bytes for r in out)
    assert total == sum(n + 32 for n in sizes)
