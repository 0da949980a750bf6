"""Sources: NDJSON tick captures (batch + streaming replay) and the
OANDA HTTP chunked-stream source (PySpark Python data source API)."""
