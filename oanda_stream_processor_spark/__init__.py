"""oanda_stream_processor_spark — a PySpark-native analytics engine.

A from-scratch Spark implementation of the query/data-processing
capabilities of the reference Rust pipeline ``alekna/oanda_stream_processor``
(OANDA forex tick ingest -> schema-on-read validation -> spread derivation ->
protobuf/ZMQ publish; see /root/reference/src/main.rs:24-138), re-expressed
idiomatically on the Spark DataFrame / SQL / Structured Streaming stack and
extended with the relational + LLM-data-pipeline operator surface the
reference lacks.

Layout:
  session    - SparkSession factory (AQE, Arrow, UTC, tuned shuffle partitions)
  schemas    - declared StructTypes (tick/heartbeat wire schemas, fixtures)
  io         - fixture table loaders
  config     - env-var configuration mirroring the reference's config.rs
  functions/ - column-level building blocks (tick derivations, vectors, text)
  operators/ - batch operators: relational, dedup, similarity, text, multimodal
  sources/   - NDJSON tick source (batch + streaming replay), HTTP stream source
  streaming/ - structured-streaming pipelines, candles, stateful ops, sinks
"""

__version__ = "0.1.0"
