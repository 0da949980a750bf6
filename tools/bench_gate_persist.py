"""Measure the r18 gate-verdict sidecar (VERDICT r17 Next-round #5):
how much of the plan-gate probe a RESTARTED serving process skips when
the verdict is persisted under the store root.

Builds an N-batch BM25 store from the sf documents table, then times
``maxscore_gate_plan_from_postings`` + ``maxscore_gate_from_postings``
(the two store-backed gate probes a serving process pays per corpus)
under three protocols, min-of-RUNS each, clearing the in-memory memo
before every run (= fresh process):

* probe    — sidecar removed each run: the full bounded probe
  (pre-r18 restart cost);
* sidecar  — sidecar present: the r18 restart path (one JSON read);
* memo-off — SPARK_GRAFT_QUALITY_MEMO=0: the bench's timed-region
  protocol, asserted to keep probing (and never write the sidecar).

Verdicts asserted identical across all three.  Prints one JSON line.

Usage: python tools/bench_gate_persist.py [sf_dir] [n_batches] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
ROOT = "/tmp/spark_graft_gate_persist"


def main() -> None:
    from pyspark.sql import functions as F

    import oanda_stream_processor_spark.operators.retrieval as R
    from oanda_stream_processor_spark.io import load_table
    from oanda_stream_processor_spark.operators.retrieval import N_QUERIES
    from oanda_stream_processor_spark.session import get_spark
    from oanda_stream_processor_spark.streaming.bm25gate import (
        read_dl,
        read_tf,
        write_batch_partials,
    )

    spark = get_spark(app_name="bench_gate_persist")
    shutil.rmtree(ROOT, ignore_errors=True)
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    nb = N_BATCHES
    for i in range(nb):
        part = (d.where((F.col("doc_id") < N_QUERIES)
                        | (F.col("doc_id") % nb == 0)) if i == 0 else
                d.where((F.col("doc_id") >= N_QUERIES)
                        & (F.col("doc_id") % nb == i)))
        write_batch_partials(part, ROOT, i)
    side = os.path.join(ROOT, R._GATE_SIDECAR)

    def gates():
        tf, dl = read_tf(spark, ROOT), read_dl(spark, ROOT)
        return (R.maxscore_gate_plan_from_postings(tf, dl),
                R.maxscore_gate_from_postings(tf, dl))

    def best(prep) -> tuple[float, tuple]:
        out, verdicts = float("inf"), None
        for _ in range(RUNS):
            R._GATE_MEMO.clear()          # = restarted process
            prep()
            t0 = time.perf_counter()
            verdicts = gates()
            out = min(out, time.perf_counter() - t0)
        return round(out, 3), verdicts

    def rm_side():
        if os.path.isfile(side):
            os.remove(side)

    probe_s, v_probe = best(rm_side)
    assert os.path.isfile(side), "probe run did not write the sidecar"
    sidecar_s, v_side = best(lambda: None)

    os.environ["SPARK_GRAFT_QUALITY_MEMO"] = "0"
    rm_side()
    memooff_s, v_off = best(lambda: None)
    assert not os.path.isfile(side), "memo-off wrote the sidecar"
    del os.environ["SPARK_GRAFT_QUALITY_MEMO"]

    assert v_probe == v_side == v_off, "verdict diverged across paths"
    out = {
        "metric": "gate_verdict_persistence",
        "sf_dir": SF_DIR, "n_batches": nb, "runs": RUNS,
        "restart_probe_s": probe_s,
        "restart_sidecar_s": sidecar_s,
        "memo_off_probe_s": memooff_s,
        "verdicts": list(v_probe),
        "note": ("min-of-RUNS, in-memory memo cleared before every "
                 "run (= fresh process); 'probe' removes the sidecar "
                 "each run, 'sidecar' reads it, memo-off bypasses "
                 "both and is asserted to keep probing (the bench's "
                 "timed-region protocol is unchanged)"),
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
