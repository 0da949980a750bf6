"""10x scale-up measurement for the heavy operator families
(dedup / similarity / fingerprint) — replaces extrapolation in SCALE.md
with numbers.

Builds a x10 corpus derived from sf0.1 into /tmp:

* documents — 10 replicas with offset doc_ids; every token after the
  first gains a per-replica tag (regexp: each space becomes " {k}x"),
  so replicas share NO shingles and the candidate graph is 10 disjoint
  copies — the honest shape of a 10x corpus of distinct documents
  (identical replicas would instead explode every doc into a 10-clique
  of exact dups and measure an artifact). Text grows ~15% in bytes from
  the tags; noted, not corrected.
* embeddings — 10 replicas with offset vec_ids and per-replica label
  offsets (label + 1000k): label-blocked ops keep per-block density
  while total work scales 10x. Vectors are unchanged, so unblocked ANN
  (q45/q48) sees a true 10x candidate set against the same query set
  (vec_id < 10 exists only in replica 0).

Usage: python tools/scale_bench.py [runs_per_query] [query ...]
(optional query names restrict the run to that subset)
Prints one JSON line with min-of-N seconds at x1 and x10 per query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
X10_DIR = "/tmp/spark_graft_x10"
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ONLY = set(sys.argv[2:])

HEAVY = [
    "q41_minhash_signature", "q42_lsh_candidates", "q43_simhash",
    "q44_jaccard_pairs", "q52_fingerprint",
    "q55_dedup_components", "q57_lsh_verified_pairs",
    "q45_cosine_topk", "q46_embedding_neardup", "q47_label_centroids",
    "q48_ann_lsh", "q56_ann_ivf",
    # curation batch (documents-based; q82 walks customer -> not replicated)
    "q79_repetition_filter", "q80_contamination", "q81_sequence_packing",
    # round-2 additions: skew-cut jaccard, quantized ANN, passage dedup,
    # graph rank, LM quality gate, PPS sampling, simhash search,
    # quality canonicals
    "q87_jaccard_dfcut", "q88_ann_sq", "q89_passage_dedup",
    "q90_pagerank", "q92_ann_ivf_sq", "q93_unigram_nll",
    "q94_pps_sample", "q95_simhash_pairs", "q97_canonical_by_quality",
]


def build_x10(spark) -> None:
    from pyspark.sql import functions as F

    from oanda_stream_processor_spark.io import load_table

    if os.path.exists(os.path.join(X10_DIR, "_DONE")):
        return
    shutil.rmtree(X10_DIR, ignore_errors=True)
    os.makedirs(X10_DIR, exist_ok=True)

    docs = load_table(spark, SF_DIR, "documents")
    reps = []
    for k in range(10):
        text = (F.col("text") if k == 0 else
                F.regexp_replace("text", " ", f" {k}x"))
        reps.append(docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            text.alias("text"), "lang", "source", "n_chars"))
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(X10_DIR, "documents.parquet"))

    emb = load_table(spark, SF_DIR, "embeddings")
    reps = [emb.select((F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                       "embedding",
                       (F.col("label") + k * 1000).alias("label"))
            for k in range(10)]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(X10_DIR, "embeddings.parquet"))
    open(os.path.join(X10_DIR, "_DONE"), "w").close()


def main() -> None:
    from oanda_stream_processor_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="scale_bench")
    build_x10(spark)
    queries = ent.queries()
    results = {}
    for name in HEAVY:
        if ONLY and name not in ONLY:
            continue
        fn = queries[name]
        row = {}
        for tag, d in (("x1", SF_DIR), ("x10", X10_DIR)):
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            row[tag] = round(min(times), 3)
        row["factor"] = round(row["x10"] / row["x1"], 2) if row["x1"] else None
        results[name] = row
        print(f"# {name}: x1={row['x1']}s x10={row['x10']}s "
              f"factor={row['factor']}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "heavy_family_scaleup", "runs": RUNS,
                      "sf_dir": SF_DIR, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
