"""q159 split-leakage audit: constructed dup clusters with known hash
assignments must be flagged leaky exactly when the naive per-doc split
straddles them, and the cluster-level assignment keeps clusters whole."""

from __future__ import annotations

import hashlib

import pytest

from oanda_stream_processor_spark.operators.dedup import (
    TRAIN_PCT,
    q159_split_leakage,
)


def _h100(i: int) -> int:
    """Python replica of the engine-side md5-mod-100 rule."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


@pytest.fixture(scope="module")
def split_sf(spark, tmp_path_factory) -> str:
    """Two exact-dup pairs with chosen hash sides: one straddling the
    80/20 boundary (leaky), one wholly in train (clean), plus unique
    fillers (singletons — excluded from the audit)."""
    train_ids = [i for i in range(200) if _h100(i) < TRAIN_PCT]
    test_ids = [i for i in range(200) if _h100(i) >= TRAIN_PCT]
    assert len(train_ids) >= 3 and len(test_ids) >= 1
    a, b = train_ids[0], test_ids[0]          # leaky pair
    c, d = train_ids[1], train_ids[2]         # clean pair
    dup1 = ("the quick brown fox jumps over the lazy dog while the "
            "band plays on and the river runs to the sea forever")
    dup2 = ("pack my box with five dozen liquor jugs while the "
            "wizards quickly jinx the gnomes before they vex him")
    rows = [(a, dup1), (b, dup1), (c, dup2), (d, dup2)]
    used = {a, b, c, d}
    filler_ids = [i for i in range(200) if i not in used][:60]
    for i in filler_ids:
        rows.append((i, " ".join(f"f{i}w{j}x{i * 7 + j}"
                                 for j in range(12))))
    sf = tmp_path_factory.mktemp("split159")
    spark.createDataFrame(
        [(i, t, f"src{i % 3}", "en", len(t)) for i, t in rows],
        "doc_id bigint, text string, source string, lang string, "
        "n_chars int",
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf), (a, b), (c, d)


def test_leaky_and_clean_clusters(spark, split_sf):
    sf, (a, b), (c, d) = split_sf
    rows = {r.component: r for r in q159_split_leakage(spark, sf).collect()}

    leaky = rows[min(a, b)]
    assert (leaky.n_docs, leaky.n_train_naive, leaky.n_test_naive) == \
        (2, 1, 1)
    assert leaky.leaky

    clean = rows[min(c, d)]
    assert (clean.n_docs, clean.n_train_naive, clean.n_test_naive) == \
        (2, 2, 0)
    assert not clean.leaky

    # cluster-level assignment is the hash of the component id — whole
    # cluster lands on one side, deterministically
    for comp, r in rows.items():
        assert r.cluster_split == \
            ("train" if _h100(comp) < TRAIN_PCT else "test")
    # singletons never appear
    assert all(r.n_docs >= 2 for r in rows.values())
