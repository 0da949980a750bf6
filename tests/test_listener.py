from __future__ import annotations

import uuid

from oanda_stream_processor_spark.streaming.listener import PipelineListener
from oanda_stream_processor_spark.streaming.pipeline import build_stream


def test_listener_counts_lifecycle(spark, tick_capture):
    listener = PipelineListener()
    spark.streams.addListener(listener)
    try:
        name = f"t{uuid.uuid4().hex[:8]}"
        q = (build_stream(spark, tick_capture).select("message_type")
             .writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()
        # listener events dispatch on a separate thread — poll briefly
        import time
        for _ in range(100):
            if listener.started and listener.progressed and listener.terminated:
                break
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)
    assert listener.started >= 1
    assert listener.progressed >= 1
    assert listener.errors == []
