"""Streaming incremental ANN: micro-batches of query vectors searched
against a STATIC IVF-partitioned index via ``foreachBatch`` — the
similarity-family twin of ``streaming/incremental.py``'s dedup path.

Shape (100 TB): the index — corpus vectors with their precomputed cell
ids — is built once (`operators.similarity._ivf_cells`) and persisted
partitioned BY the cell id; the coarse-quantizer state is ONE
broadcastable row (`_ivf_centroids`). Each arriving micro-batch of
query vectors is assigned its cell with the same broadcast argmin
expression the batch path uses (per-row codegen, no shuffle), then
equi-joins the index on the cell id — the batch side is tiny, so the
join broadcasts the QUERIES and the index never shuffles off its cell
partitioning. Per-query ranking is a window partitioned by the query
id over in-cell candidates only.

This is deliberately ``foreachBatch`` over a static index (not a
stream-stream join): ANN search against a fixed corpus is a lookup,
not a co-evolution — identical to the reasoning documented for
streaming incremental dedup (`streaming/incremental.py`).

Reference basis: the reference has no search at all; this extends the
north-star similarity family (SURVEY.md §2.2 'LLM-pipeline
extensions') to the streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.similarity import TOP_K, _assign_cells, _cosine

__all__ = ["batch_topk_against_index", "run_ann_stream"]


def batch_topk_against_index(batch: DataFrame, index_cells: DataFrame,
                             cent_one: DataFrame,
                             k: int = TOP_K) -> DataFrame:
    """Top-k in-cell cosine neighbors for one (micro-)batch of query
    vectors (vec_id, embedding) against the static assigned index.

    Deterministic: rounded-cosine ordering with candidate-id tiebreak
    (the q45/q56 discipline), so results are independent of batch
    sizing and partitioning — asserted by the trigger-split test.
    """
    q = (_assign_cells(batch, cent_one)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"), "cell"))
    scored = (index_cells.join(F.broadcast(q), "cell")
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("cand_id"),
                      F.round(_cosine(F.col("q_emb"), F.col("embedding")), 6)
                       .alias("cosine")))
    wr = W.partitionBy("query_id").orderBy(F.desc("cosine"),
                                           F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(wr))
                  .where(F.col("rank") <= k))


def run_ann_stream(stream: DataFrame, index_cells: DataFrame,
                   cent_one: DataFrame, sink, *, k: int = TOP_K,
                   checkpoint: str | None = None):
    """Wire a (vec_id, embedding) stream through per-batch ANN search.

    ``sink(result_df, batch_id)`` receives each micro-batch's top-k
    frame; exactly-once to idempotent sinks via the checkpoint, the
    same guarantees as every other foreachBatch path in streaming/.
    """
    def _each(batch: DataFrame, batch_id: int) -> None:
        sink(batch_topk_against_index(batch, index_cells, cent_one, k),
             batch_id)

    writer = stream.writeStream.foreachBatch(_each) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
