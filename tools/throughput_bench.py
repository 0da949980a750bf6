"""Streaming-pipeline throughput: generate an N-line synthetic tick
capture, run the full parse→route→derive→encode→publish pipeline
(file-replay source, FilePublisher sink), report msgs/sec end-to-end.

The reference's implicit input rate is O(1-100) msg/s on one socket
(BASELINE.md); this measures the same pipeline semantics at replay
speed. Usage: python tools/throughput_bench.py [n_lines]
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
INSTRUMENTS = ["EUR_USD", "USD_JPY", "GBP_USD", "AUD_USD"]


def make_capture(path: str, n: int) -> None:
    rng = random.Random(42)
    with open(path, "w") as f:
        for i in range(n):
            if i % 100 == 99:
                f.write('{"type":"HEARTBEAT","time":"2026-08-13T%02d:%02d:%02d.000000000Z"}\n'
                        % (9 + i // 360000, (i // 6000) % 60, (i // 100) % 60))
                continue
            inst = INSTRUMENTS[i % len(INSTRUMENTS)]
            bid = round(1.0 + rng.random() / 10, 5)
            ask = round(bid + rng.random() / 1000, 5)
            f.write(json.dumps({
                "type": "PRICE",
                "time": "2026-08-13T%02d:%02d:%02d.%06d000Z"
                        % (9 + i // 360000, (i // 6000) % 60, (i // 100) % 60, i % 1000000),
                "instrument": inst, "status": "tradeable",
                "closeoutBid": f"{bid:.5f}", "closeoutAsk": f"{ask:.5f}",
                "bids": [{"price": f"{bid:.5f}", "liquidity": 1000000}],
                "asks": [{"price": f"{ask:.5f}", "liquidity": 1000000}],
            }) + "\n")


def main() -> None:
    from oanda_stream_processor_spark.session import get_spark
    from oanda_stream_processor_spark.streaming.pipeline import run_pipeline
    from oanda_stream_processor_spark.streaming.sinks import FilePublisher

    with tempfile.TemporaryDirectory() as td:
        capture = f"{td}/capture.ndjson"
        make_capture(capture, N)
        spark = get_spark(app_name="throughput_bench")
        pub = FilePublisher(f"{td}/out.bin")
        t0 = time.perf_counter()
        handles = run_pipeline(spark, capture, checkpoint_dir=f"{td}/ckpt",
                               publisher=pub)
        handles.process_all_available()
        handles.stop()
        dt = time.perf_counter() - t0
        with open(f"{td}/out.bin", "rb") as f:
            data = f.read()
        frames = 0
        i = 0
        while i < len(data):
            ln = int.from_bytes(data[i:i + 4], "big")
            i += 4 + ln
            frames += 1
        print(json.dumps({
            "metric": "pipeline_throughput",
            "value": round(N / dt, 1),
            "unit": "msgs/sec",
            "n_messages": N,
            "published_frames": frames,
            "wall_sec": round(dt, 2),
        }))
        assert frames == N, (frames, N)
        spark.stop()


if __name__ == "__main__":
    main()
