"""Token-positional postings store (streaming/proxgate.py): the
served proximity read must equal one-shot q182 after every prefix of
a doc-appending batch sequence, verbatim at full corpus, through an
availableNow stream, and for ad-hoc query frames composed after
ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.retrieval import (
    N_QUERIES,
    proximity_from,
    q182_term_proximity,
    token_postings,
)
from oanda_stream_processor_spark.streaming.proxgate import (
    build_query_term_frame,
    serve_term_proximity,
    start_token_postings_stream,
    write_batch_token_postings,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def _one_shot_on(d, qtermf):
    return proximity_from(token_postings(d), qtermf)


def test_served_proximity_tracks_appends(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    qtermf = build_query_term_frame(d)
    state = str(tmp_path / "state")
    seen = None
    for i in range(3):
        part = d.where(F.col("doc_id") % 3 == i)
        write_batch_token_postings(part, state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_term_proximity(spark, state, qtermf)
        assert _table(got) == _table(_one_shot_on(seen, qtermf)), \
            f"diverged after batch {i}"
    assert _table(serve_term_proximity(spark, state, qtermf)) == \
        _table(q182_term_proximity(spark, SF_DIR))
    # idempotent replay: re-overwriting one batch partition is a no-op
    write_batch_token_postings(d.where(F.col("doc_id") % 3 == 1),
                               state, 1)
    assert _table(serve_term_proximity(spark, state, qtermf)) == \
        _table(q182_term_proximity(spark, SF_DIR))


def test_served_proximity_adhoc_queries_and_e2e(spark, tmp_path):
    """An availableNow stream fills the store; a query frame the
    stream NEVER saw (two hand-picked terms) is then served and
    checked against the one-shot core on the same probe."""
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
    q = start_token_postings_stream(stream, state,
                                    str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    full = load_table(spark, SF_DIR, "documents")
    qtermf = build_query_term_frame(full)
    assert _table(serve_term_proximity(spark, state, qtermf)) == \
        _table(q182_term_proximity(spark, SF_DIR))

    # ad-hoc probe: the two most frequent terms of the corpus as a
    # synthetic query 999 (never part of any stream input)
    top2 = (token_postings(full).groupBy("term").count()
            .orderBy(F.desc("count"), F.asc("term")).limit(2)
            .select(F.lit(999).cast("bigint").alias("query_id"), "term"))
    got = _table(serve_term_proximity(spark, state, top2))
    want = _table(_one_shot_on(full, top2))
    assert got == want and len(got) > 0


def test_served_best_passage_tracks_appends(spark, tmp_path):
    """r13: the served passage read (shared best_passage_from core
    over the token-postings store) equals one-shot q188 per append
    prefix and verbatim at full corpus."""
    from oanda_stream_processor_spark.operators.retrieval import (
        best_passage_from,
        q188_best_passage,
    )
    from oanda_stream_processor_spark.streaming.proxgate import (
        serve_best_passage,
    )

    d = load_table(spark, SF_DIR, "documents")
    qtermf = build_query_term_frame(d)
    state = str(tmp_path / "state")
    seen = None
    for i in range(2):
        part = d.where(F.col("doc_id") % 2 == i)
        write_batch_token_postings(part, state, i)
        seen = part if seen is None else seen.unionByName(part)
        got = serve_best_passage(spark, state, qtermf)
        want = best_passage_from(token_postings(seen), qtermf)
        assert _table(got) == _table(want), f"diverged after batch {i}"
    assert _table(serve_best_passage(spark, state, qtermf)) == \
        _table(q188_best_passage(spark, SF_DIR))
