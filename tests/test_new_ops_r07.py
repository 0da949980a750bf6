"""Constructed-corpus invariants for the round-7 additions: q150
winnowed substring matches (detection guarantee, df-cut, containment),
q151 fixed-point PCA power iteration (known dominant axis), and q152
DSIR importance weighting (target-vocabulary doc outscores raw docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.operators.llmprep import (
    DSIR_TARGET,
    q152_dsir_importance,
)
from oanda_stream_processor_spark.operators.similarity import (
    DIM,
    q151_pca_power,
)
from oanda_stream_processor_spark.operators.textops import (
    q150_winnow_matches,
    q157_winnow_star,
)


def _doc_schema_rows(texts):
    return [(i, t, f"src{i % 20}", "en", len(t))
            for i, t in enumerate(texts)]


def _write_docs(spark, tmp, texts):
    spark.createDataFrame(
        _doc_schema_rows(texts),
        "doc_id bigint, text string, source string, lang string, "
        "n_chars int",
    ).write.parquet(str(tmp / "documents.parquet"))
    return str(tmp)


@pytest.fixture(scope="module")
def docs_sf(spark, tmp_path_factory) -> str:
    """200 docs: doc 0 == doc 1 (identical), doc 2 and doc 3 share one
    long embedded run, 196 unique fillers. With n_docs=200 the df-cut
    threshold is ceil(0.01*200)=2, so pair-shared fingerprints (df=2)
    survive while anything leaking into 3+ docs is cut."""
    dup = ("the quick brown fox jumps over the lazy dog while the "
           "band plays on and the river runs to the sea forever")
    run = "shared-verbatim-segment-that-both-documents-quote-exactly"
    texts = [
        dup,
        dup,
        f"alpha opening words {run} first unique tail 0123",
        f"totally different preamble {run} and another ending 4567",
    ]
    # unique fillers: digit soup, no 8-char window repeats across docs
    for i in range(196):
        texts.append(" ".join(f"f{i}w{j}x{i * 7 + j}" for j in range(12)))
    d = tmp_path_factory.mktemp("docs150")
    return _write_docs(spark, d, texts)


def test_q150_detects_identical_and_embedded_runs(spark, docs_sf):
    out = {(r.doc_a, r.doc_b): r
           for r in q150_winnow_matches(spark, docs_sf).collect()}
    # identical docs: equal fingerprint sets -> containment exactly 1.0
    assert (0, 1) in out
    assert out[(0, 1)].containment_ppm == 1_000_000
    # the shared run is >= GRAM+WINNOW-1 chars -> detection GUARANTEED
    assert (2, 3) in out
    assert out[(2, 3)].n_shared >= 1 + 1  # MIN_SHARED floor holds
    # no filler doc pairs with anything
    assert all(a <= 3 and b <= 3 for a, b in out)
    # ordering and bounds contracts
    for (a, b), r in out.items():
        assert a < b
        assert 250_000 <= r.containment_ppm <= 1_000_000


def test_q157_star_covers_every_q150_pair(spark, docs_sf):
    """The star graph's core guarantee: every pair the exact view
    (q150) emits lands in the SAME connected component of the q157
    edge graph — so keep-one clustering over the O(postings) star
    edges deduplicates at least everything the Ω(pairs) audit view
    would, at 2.2x (not 15.8x) measured x10 wall-clock."""
    edges = [(r.doc_a, r.doc_b)
             for r in q157_winnow_star(spark, docs_sf).collect()]
    assert edges                      # dup/run docs must link somewhere
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        assert a < b                  # hub is the min sharing doc_id
        parent[find(a)] = find(b)

    for r in q150_winnow_matches(spark, docs_sf).collect():
        assert find(r.doc_a) == find(r.doc_b), \
            f"q150 pair ({r.doc_a},{r.doc_b}) split across components"


@pytest.fixture(scope="module")
def pca_sf(spark, tmp_path_factory) -> str:
    """Vectors whose energy is dominated by axis 3 (value 0.5) with a
    small consistent axis-7 component (0.1): the top principal
    direction must be axis 3."""
    rows = []
    for i in range(40):
        v = [0.0] * DIM
        v[3] = 0.5 if i % 2 == 0 else -0.5
        v[7] = 0.1
        rows.append((i, v, 0))
    d = tmp_path_factory.mktemp("emb151")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_q151_finds_dominant_axis(spark, pca_sf):
    out = {r.pos: r for r in q151_pca_power(spark, pca_sf).collect()}
    assert set(out) == set(range(DIM))
    # max-normalized fixed point: dominant component is axis 3 at ~1e6
    mags = {p: abs(r.v_fp) for p, r in out.items()}
    assert max(mags, key=mags.get) == 3
    assert mags[3] >= 900_000
    # all non-participating axes are ~0
    for p in range(DIM):
        if p not in (3, 7):
            assert mags[p] < 50_000
    # one positive eigenvalue, identical on every row
    eigs = {r.eigval_fp for r in out.values()}
    assert len(eigs) == 1 and eigs.pop() > 0


@pytest.fixture(scope="module")
def dsir_sf(spark, tmp_path_factory) -> str:
    """Target docs (src0) speak vocabulary A; raw docs speak B; one raw
    doc (doc_id 19, src19) speaks pure A — DSIR must score it above
    every B doc and select it."""
    vocab_a = "alpha beta gamma delta epsilon zeta"
    vocab_b = "omicron sigma tau upsilon phi chi"
    texts = []
    for i in range(20):
        if i % 20 == 0:          # src0 == target
            texts.append(vocab_a + " " + vocab_a)
        elif i == 19:            # raw doc in target vocabulary
            texts.append(vocab_a + " " + vocab_a)
        else:
            texts.append(vocab_b + " " + vocab_b)
    d = tmp_path_factory.mktemp("docs152")
    return _write_docs(spark, d, texts)


def test_q152_target_vocabulary_scores_high(spark, dsir_sf):
    out = {r.doc_id: r for r in
           q152_dsir_importance(spark, dsir_sf).collect()}
    assert len(out) == 20
    # the A-speaking raw doc outscores every B doc and is kept
    a_doc = out[19]
    b_scores = [r.importance_fp for i, r in out.items()
                if r.source != DSIR_TARGET and i != 19]
    assert a_doc.source != DSIR_TARGET
    assert a_doc.keep
    assert all(a_doc.importance_fp > s for s in b_scores)
    # B docs are less target-like than the corpus average -> dropped
    b_kept = [r.keep for i, r in out.items()
              if r.source != DSIR_TARGET and i != 19]
    assert not any(b_kept)
    # keep flag is exactly the above-average gate (trunc division — the
    # engines' % follows the dividend, unlike Python's floor %)
    s, n = sum(r.importance_fp for r in out.values()), len(out)
    avg = int(s / abs(s) * (abs(s) // n)) if s else 0
    assert all((r.importance_fp > avg) == r.keep for r in out.values())


from oanda_stream_processor_spark.operators.behavior import (  # noqa: E402
    q153_turn_alternation,
)
from oanda_stream_processor_spark.operators.curation import (  # noqa: E402
    q154_padding_waste,
)
from pyspark.sql import functions as F2  # noqa: E402,F401


@pytest.fixture(scope="module")
def turns_sf(spark, tmp_path_factory) -> str:
    """Three dialogues: user 1 alternates cleanly (valid), user 2 has
    one double-turn (1 violation), user 3 is a monologue (n-1
    violations)."""
    rows, eid = [], 0
    plan = {1: ["view", "click", "view", "click"],
            2: ["view", "view", "click"],
            3: ["click", "click", "click", "click"]}
    for uid, seq in plan.items():
        for i, et in enumerate(seq):
            rows.append((eid, f"2024-01-01 00:0{i}:00", uid, et, 1.0, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("turns")
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string"
    ).withColumn("ts", F2.to_timestamp("ts"))
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def test_q153_violation_counts(spark, turns_sf):
    out = {r.user_id: r for r in
           q153_turn_alternation(spark, turns_sf).collect()}
    assert out[1].valid and out[1].n_violations == 0
    assert out[1].opening_role == "view" and out[1].closing_role == "click"
    assert not out[2].valid and out[2].n_violations == 1
    assert not out[3].valid and out[3].n_violations == 3
    assert {r.n_turns for r in out.values()} == {4, 3, 4}


def test_q154_bucket_and_waste(spark, tmp_path_factory):
    """Docs of 3, 4, and 5 tokens land in buckets 4, 4, 8; waste is
    exact integer ppm."""
    texts = ["a b c", "a b c d", "a b c d e"]
    d = tmp_path_factory.mktemp("pad")
    return_dir = _write_docs(spark, d, texts)
    out = {r.bucket: r for r in
           q154_padding_waste(spark, return_dir).collect()}
    assert set(out) == {4, 8}
    b4 = out[4]
    assert b4.n_docs == 2 and b4.real_tokens == 7 and b4.padded_tokens == 8
    assert b4.waste_ppm == 125_000        # 1/8 exactly
    b8 = out[8]
    assert b8.n_docs == 1 and b8.real_tokens == 5 and b8.padded_tokens == 8
    assert b8.waste_ppm == 375_000        # 3/8 exactly


from oanda_stream_processor_spark.operators.llmprep import (  # noqa: E402
    q155_bpe_merges,
)


@pytest.fixture(scope="module")
def bpe_sf(spark, tmp_path_factory) -> str:
    """The classic Sennrich-style corpus: low x5, lower x2, newest x6,
    widest x3 — the first five merges are hand-derivable."""
    words = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    d = tmp_path_factory.mktemp("bpe")
    return _write_docs(spark, d, [" ".join(words)])


def test_q155_classic_merge_sequence(spark, bpe_sf):
    out = sorted(q155_bpe_merges(spark, bpe_sf).collect(),
                 key=lambda r: r.step)
    got = [(r.step, r.lhs, r.rhs, r.merged, r.pair_count) for r in out]
    # step 1: (e,s) ties (s,t) and (t,</w>) at 9, wins lexicographically;
    # steps 2-3 extend to est</w>; steps 4-5 build "low" at count 7
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "est", "</w>", "est</w>", 9),
        (4, "l", "o", "lo", 7),
        (5, "lo", "w", "low", 7),
    ]


def test_q155_run_parity_for_equal_pair(spark, tmp_path_factory):
    """lhs == rhs runs merge greedily left-to-right: 'aaaa' yields two
    (a,a) merges in one step, 'aaa' yields one."""
    d = tmp_path_factory.mktemp("bpe_runs")
    sf = _write_docs(spark, d, ["aaaa aaaa aaaa aaa"])
    out = {r.step: r for r in q155_bpe_merges(spark, sf).collect()}
    # step 1: (a,a) pairs = 3 per 'aaaa' x3 + 2 in 'aaa' = 11
    assert (out[1].lhs, out[1].rhs, out[1].pair_count) == ("a", "a", 11)
    # step 2 proves the run parity applied TWO merges to 'aaaa' in one
    # step ([aa, aa, </w>]) and one to 'aaa' ([aa, a, </w>]): the pair
    # table ties (aa,aa)=3 with (aa,</w>)=3 and '</w>' < 'aa'
    # lexicographically, so the (aa,</w>) count of exactly 3 is only
    # possible if every 'aaaa' became [aa, aa, </w>]
    assert (out[2].lhs, out[2].rhs) == ("aa", "</w>")
    assert out[2].pair_count == 3
