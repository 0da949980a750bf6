"""Batch operators.

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, duckdb_sql]``; ``__spark_entry__`` merges them.
A query without an oracle entry is checked rows-only by the driver
(non-SQL-expressible ops).
"""

from __future__ import annotations
