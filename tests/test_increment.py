"""Edge-case invariants for the incremental corpus-management family
(operators/increment.py) that the fixture-driven oracle gate can't
probe directly: verdict precedence on constructed corpora and the
quota floor for rare languages. Runs on tiny in-memory documents
written to parquet so load_table's path is exercised unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.operators.increment import (
    q109_incremental_dedup,
    q112_quota_sample,
    q114_ngram_novelty,
)


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory) -> str:
    """A constructed documents table: batch docs (doc_id % 10 == 0)
    with known relationships to the index side.

    - doc 10: byte-identical to index doc 1  -> exact
    - doc 20: index doc 2's text with one token swapped -> near (shares
      most shingles, so at least one LSH band agrees), not exact
    - doc 30: unique text -> new, novelty 100%
    - doc 40: only two tokens -> no shingles; exact-only path
    """
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo")
    rows = [
        (1, base, "en", "srcA", len(base)),
        (2, base + " sierra tango uniform", "en", "srcA",
         len(base) + 22),
        (3, "completely different words entirely here now", "en", "srcB", 44),
        (10, base, "en", "srcB", len(base)),
        (20, base + " sierra tango VICTOR", "en", "srcB", len(base) + 21),
        (30, "zebra yankee xray whiskey victor unique tokens only",
         "fr", "srcB", 51),
        (40, "two tokens", "de", "srcB", 10),
    ]
    d = tmp_path_factory.mktemp("tiny_sf")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint").write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_q109_verdict_precedence(spark, tiny_sf):
    out = {r.doc_id: r.verdict
           for r in q109_incremental_dedup(spark, tiny_sf).collect()}
    assert out[10] == "exact"   # identical text: exact wins even though
    #                             its bands also collide (near)
    assert out[20] == "near"    # one-token edit: band collision, not exact
    assert out[30] == "new"
    assert out[40] == "new"     # <3 tokens: no shingles, no exact match
    assert set(out) == {10, 20, 30, 40}


def test_q114_novelty_bounds(spark, tiny_sf):
    out = {r.doc_id: r for r in q114_ngram_novelty(spark, tiny_sf).collect()}
    # doc 10 duplicates index text: zero novel shingles
    assert out[10].n_novel == 0 and out[10].novelty_ppm == 0
    # doc 30 shares nothing with the index: fully novel
    assert out[30].n_novel == out[30].n_shingles
    assert out[30].novelty_ppm == 1_000_000
    # doc 20's one-token tail edit: novel shingles only around the edit
    assert 0 < out[20].n_novel <= 3
    # doc 40 has <3 tokens -> no shingle rows at all
    assert 40 not in out


def test_q112_quota_floor_and_determinism(spark, tiny_sf):
    out = q112_quota_sample(spark, tiny_sf).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # every lang has < 20 docs here -> quota floor of 1 doc each
    assert {k: len(v) for k, v in by_lang.items()} == \
        {"en": 1, "fr": 1, "de": 1}
    # deterministic: a second run selects the identical rows
    again = q112_quota_sample(spark, tiny_sf).collect()
    assert sorted((r.doc_id, r.lang, r.sample_rank) for r in out) == \
        sorted((r.doc_id, r.lang, r.sample_rank) for r in again)
