"""Streaming BM25 corpus-statistics gate — the online twin of
operators/retrieval.q175 (doc-as-query Okapi BM25 top-k).

BM25 scores factor into a per-document LOCAL part (tf, dl — properties
of the document alone, computable at ingest with no global state) and
a corpus GLOBAL part (per-term df, corpus n_docs and Σdl). The global
part is SUM-decomposable over any doc-disjoint batching of the corpus:

* df(term)   = Σ_batches df_batch(term)       (a doc's distinct terms
  are counted in exactly the batch that carries the doc);
* n_docs     = Σ_batches n_docs_batch;
* sum_dl     = Σ_batches sum_dl_batch.

So the gate maintains two tiny mergeable partials per micro-batch —
(term, df) and the one-row (n_docs, sum_dl) — each written under its
OWN batch_id=<id> partition (overwrite-by-partition = idempotent
replay, the contamgate/kmvgate recovery pattern; the merge itself is a
SUM ledger, so idempotence comes from the partition overwrite, not the
algebra). The read side merges with one groupBy.

Parity theorem (pytest-proven): BM25 pools computed by
`retrieval.bm25_pool_from` with gate-merged (df, stats) equal the
one-shot q175 pools row-for-row and score-for-score, for ANY batching —
fp contributions are pure integer-snapped functions of
(tf, df, dl, n_docs, sum_dl), all of which the merge reproduces
exactly (integer sums, no floats in state).

Scale notes (100 TB): per-batch state is |vocab_batch| + 1 rows;
merged state is |vocab| rows (Heaps-law, ~millions at web scale —
a broadcastable frame, refreshed per trigger, never a shuffle of the
corpus). The heavy side (tf of candidate documents) never enters the
gate: it stays where the documents land.

Citation: the reference (433-line tick ETL, /root/reference/src/
main.rs) has no retrieval surface; north-star extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import corpus_term_frames


def batch_df_partial(docs: DataFrame) -> DataFrame:
    """(term, df) document-frequency partial for one batch."""
    _, dfq, _, _ = corpus_term_frames(docs)
    return dfq


def batch_corpus_partial(docs: DataFrame) -> DataFrame:
    """One-row (n_docs, sum_dl) partial for one batch."""
    _, _, _, stats = corpus_term_frames(docs)
    return stats


def read_term_df(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged (term, df) over all persisted batch partials."""
    return (spark.read.parquet(os.path.join(state_dir, "df"))
            .groupBy("term").agg(F.sum("df").alias("df")))


def read_corpus_stats(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged one-row (n_docs, sum_dl)."""
    return (spark.read.parquet(os.path.join(state_dir, "corpus"))
            .agg(F.sum("n_docs").alias("n_docs"),
                 F.sum("sum_dl").alias("sum_dl")))


def start_bm25_stream(stream_docs: DataFrame, state_dir: str,
                      checkpoint_dir: str):
    """Wire a streaming documents source into the stats gate: each
    batch overwrites its own df/corpus partials under batch_id=<id>.
    Documents are atomic per batch (a doc's text arrives whole in one
    micro-batch) — the decomposition above needs doc-disjoint batches,
    which micro-batched document feeds are by construction."""
    def body(batch_df: DataFrame, batch_id: int) -> None:
        # score once per batch: both partials hang off the same tf
        # aggregate, and each is tiny — let them share the scan
        (batch_df_partial(batch_df)
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, "df", f"batch_id={batch_id}")))
        (batch_corpus_partial(batch_df)
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, "corpus",
                               f"batch_id={batch_id}")))

    return (stream_docs.writeStream
            .foreachBatch(body)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
