"""Structured Streaming layer: the reference pipeline re-expressed as an
unbounded DataFrame program (readStream → parse/route/derive →
writeStream), plus the streaming operators the reference lacks
(watermarks, windowed OHLC candles, session windows, streaming dedup,
custom stateful ops)."""
