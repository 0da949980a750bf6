"""Incremental connected-components maintenance
(streaming/incremental.py): per-batch label assignments + merge
events, resolved by union-find, must reproduce a full q55-style
rebuild over index ∪ batch exactly — including cross-component
bridging and the batch-id-is-new-minimum case."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.streaming.incremental import (
    build_component_index,
    incremental_component_updates,
    run_component_stream,
)

SF = "/root/testdata/sf0.001"


def _resolve_all(labels0, assignments, merges):
    """Apply merge events by union-find (keep < absorb always), then
    resolve every label reference."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for keep, absorb in merges:
        assert keep < absorb          # events only relabel DOWNWARD
        ra, rk = find(absorb), find(keep)
        if ra != rk:
            lo, hi = min(ra, rk), max(ra, rk)
            parent[hi] = lo
    out = {}
    for doc, comp in labels0:
        out[doc] = find(comp)
    for doc, comp in assignments:
        out[doc] = find(comp)
    return out


def _truth(spark, docs):
    return {r.doc_id: r.component
            for r in build_component_index(docs)[0].collect()}


def test_incremental_matches_full_rebuild_on_fixture(spark):
    """Organic corpus: sf0.001 documents split 90/10 (q109's split);
    incremental updates + union-find == full rebuild on everything."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    index_docs = docs.where(F.col("doc_id") % 10 != 0)
    batch_docs = docs.where(F.col("doc_id") % 10 == 0)

    labels0, lbl_bands = build_component_index(index_docs)
    assignments, merges = incremental_component_updates(batch_docs,
                                                        lbl_bands)
    resolved = _resolve_all(
        [(r.doc_id, r.component) for r in labels0.collect()],
        [(r.doc_id, r.component) for r in assignments.collect()],
        [(r.component_keep, r.component_absorb) for r in merges.collect()])
    assert resolved == _truth(spark, docs)


@pytest.fixture(scope="module")
def constructed(spark, tmp_path_factory):
    """Corpus with every interesting case pinned: a batch doc whose id
    is the new global minimum of an existing cluster (0 dups 15's
    text), an intra-batch-only pair (20/30 share text absent from the
    index), a no-match novel batch doc (40), and index-only clusters
    that must stay untouched (15/16, 25/26)."""
    A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
    B = ("one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen seventeen eighteen")
    C = ("red orange yellow green blue indigo violet crimson amber "
         "teal navy maroon olive coral silver golden bronze copper")
    rows = [(15, A), (16, A), (25, B), (26, B)]          # index clusters
    rows += [(0, A), (20, C), (30, C),                    # batch
             (40, " ".join(f"nv{j}q{j * 11}" for j in range(20)))]
    for i in range(41, 81):                               # index fillers
        rows.append((i, " ".join(f"f{i}w{j}x{i * 7 + j}"
                                 for j in range(16))))
    d = tmp_path_factory.mktemp("inccomp")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
         .write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_constructed_cases(spark, constructed):
    docs = (spark.read.parquet(f"{constructed}/documents.parquet")
            .select("doc_id", "text"))
    index_docs = docs.where(F.col("doc_id") % 10 != 0)
    batch_docs = docs.where(F.col("doc_id") % 10 == 0)
    labels0, lbl_bands = build_component_index(index_docs)
    assignments, merges = incremental_component_updates(batch_docs,
                                                        lbl_bands)
    asg = {r.doc_id: r.component for r in assignments.collect()}
    mg = {(r.component_keep, r.component_absorb)
          for r in merges.collect()}

    assert asg[0] == 0            # batch id IS the new global minimum
    assert (0, 15) in mg          # ...and the old cluster is absorbed
    assert asg[20] == 20 and asg[30] == 20   # intra-batch-only pair
    assert asg[40] == 40          # novel doc keeps its own id
    # index-only cluster untouched by any event
    assert not any(absorb == 25 for _, absorb in mg)

    resolved = _resolve_all(
        [(r.doc_id, r.component) for r in labels0.collect()],
        list(asg.items()), list(mg))
    truth = _truth(spark, docs)
    assert resolved == truth
    assert truth[16] == 0         # full rebuild agrees: 16 joins 0's


def test_component_stream_replay(spark, constructed, tmp_path):
    """foreachBatch wiring: replaying the batch docs as a stream emits
    the same assignments and merge events."""
    docs = (spark.read.parquet(f"{constructed}/documents.parquet")
            .select("doc_id", "text"))
    index_docs = docs.where(F.col("doc_id") % 10 != 0)
    batch_rows = (docs.where(F.col("doc_id") % 10 == 0)
                  .collect())
    src = tmp_path / "batch"
    src.mkdir()
    with open(src / "b.json", "w") as fh:
        for r in batch_rows:
            fh.write(json.dumps({"doc_id": r.doc_id, "text": r.text})
                     + "\n")
    _, lbl_bands = build_component_index(index_docs)
    got_a, got_m = [], []
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .json(str(src)))
    q = run_component_stream(
        stream, lbl_bands,
        lambda a, m, bid: (got_a.extend(map(tuple, a.collect())),
                           got_m.extend(map(tuple, m.collect()))),
        checkpoint=str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    batch_docs = docs.where(F.col("doc_id") % 10 == 0)
    exp_a, exp_m = incremental_component_updates(batch_docs, lbl_bands)
    assert sorted(got_a) == sorted(map(tuple, exp_a.collect()))
    assert sorted(got_m) == sorted(map(tuple, exp_m.collect()))


def test_propagate_min_labels_long_chain(spark):
    """Pointer-doubling convergence: a 300-node path graph (diameter
    299 — 15x the round budget) must converge within the default
    max_rounds=20 because each round roughly doubles the propagated
    distance.  This is the regression fixture for the round-9 q167
    sf0.1 failure (one-hop propagation capped at 20 rounds)."""
    from oanda_stream_processor_spark.operators.dedup import (
        propagate_min_labels,
    )
    n = 300
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    fwd = (spark.range(n - 1)
           .select(F.col("id").alias("src"),
                   (F.col("id") + 1).alias("dst")))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seed = nodes.select("doc_id", F.col("doc_id").alias("component"))
    out = propagate_min_labels(seed, edges)   # default max_rounds=20
    got = {r.doc_id: r.component for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_propagate_min_labels_two_components_star_chain(spark):
    """Mixed shapes: a chained-hubs graph (stars whose hubs form a
    path, the q167 sf0.1 failure shape) plus a disjoint component with
    a non-zero minimum; labels must not bleed across components."""
    from oanda_stream_processor_spark.operators.dedup import (
        propagate_min_labels,
    )
    # component A: 30 hubs 0..29 chained, each hub h also linked to
    # leaves 1000+10h .. 1000+10h+9 -> min label 0, diameter ~60
    pairs = [(h, h + 1) for h in range(29)]
    pairs += [(h, 1000 + 10 * h + j) for h in range(30) for j in range(10)]
    # component B: path 5000..5040 -> min label 5000
    pairs += [(i, i + 1) for i in range(5000, 5040)]
    e = spark.createDataFrame(pairs, "src: long, dst: long")
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = (edges.select(F.col("src").alias("doc_id")).distinct())
    seed = nodes.select("doc_id", F.col("doc_id").alias("component"))
    got = {r.doc_id: r.component
           for r in propagate_min_labels(seed, edges).collect()}
    for d, c in got.items():
        assert c == (5000 if d >= 5000 else 0), (d, c)


def test_star_contraction_distributed_phase_forced(spark, monkeypatch):
    """With CC_LOCAL_EDGE_CUT at its default, bench-scale graphs finish
    in the single-task union-find and the DISTRIBUTED star rounds
    (freezing included) never execute — so force them: cut=0 runs the
    whole contraction through large-star/small-star with isolated-star
    freezing, and must produce identical labels to the finisher path
    on the adversarial shapes (long chain, chained hubs, disjoint
    minimum) AND on a random graph."""
    import random

    from oanda_stream_processor_spark.operators import dedup as D

    def labels(edges):
        return {r.doc_id: r.rep for r in D.star_components(edges).collect()}

    def sym(pairs):
        e = spark.createDataFrame(pairs, "src: long, dst: long")
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    rng = random.Random(11)
    perm = list(range(120))
    rng.shuffle(perm)   # random ids along a path: adversarial for
    chain = [(perm[i], perm[i + 1]) for i in range(119)]  # min-flooding
    hubs = [(h, h + 1) for h in range(29)]
    hubs += [(h, 1000 + 10 * h + j) for h in range(30) for j in range(10)]
    hubs += [(i, i + 1) for i in range(5000, 5040)]
    rand = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    rand = [(a, b) for a, b in rand if a != b]

    for pairs in (chain, hubs, rand):
        edges = sym(pairs)
        want = labels(edges)                      # finisher path
        monkeypatch.setattr(D, "CC_LOCAL_EDGE_CUT", 0)
        got = labels(edges)                       # distributed rounds
        monkeypatch.setattr(D, "CC_LOCAL_EDGE_CUT", 2_000_000)
        assert got == want and len(got) > 0


def test_star_contraction_max_rounds_raises(spark, monkeypatch):
    """The non-convergence guard must still fire on the distributed
    path when the round budget is genuinely too small."""
    import pytest

    from oanda_stream_processor_spark.operators import dedup as D

    monkeypatch.setattr(D, "CC_LOCAL_EDGE_CUT", 0)
    pairs = [(i, i + 1) for i in range(64)]
    e = spark.createDataFrame(pairs, "src: long, dst: long")
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        D.star_components(edges, max_rounds=1)
