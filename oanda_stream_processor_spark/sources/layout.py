"""Storage-layout utilities: partitioned lakes, bucketed tables, and
small-file compaction.

At 100 TB the table layout IS the query plan: a lake partitioned on the
filter column turns a full scan into a directory prune; two tables
bucketed on the join key turn a sort-merge shuffle into a zero-exchange
local join; and compaction keeps the file count from drowning the
scheduler. These helpers are thin by design — every one of them ends in
a plain DataFrame writer/reader call so Catalyst keeps full control —
but they encode the layout decisions, and `tests/test_layout.py`
asserts the resulting plans (PartitionFilters pruning, no Exchange on
bucketed joins).

Reference scope note: the reference is a stream processor with no
storage layer (SURVEY.md §2.1); this module is part of the north-star
batch-lake extension, same as the dedup/curation families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *partition_cols: str,
                      mode: str = "overwrite") -> None:
    """Write a hive-style partitioned parquet lake (one directory level
    per partition column). Filters on partition columns prune at the
    directory listing — no file is opened, let alone read.

    Pick LOW-cardinality columns (date, type, lang): each distinct
    combination is a directory, and a high-cardinality partition key
    creates the small-files problem `compact` exists to fix.
    """
    if not partition_cols:
        raise ValueError("partition_cols must name at least one column")
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned lake. Partition columns come back as real
    columns (values parsed from directory names); predicates on them
    show up under `PartitionFilters` in the scan node."""
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   *, sort: bool = True, mode: str = "overwrite") -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same key with the same bucket count
    equi-join with NO exchange on either side — at 100 TB that deletes
    the single largest shuffle in a fact-to-fact join. Sorting within
    buckets additionally removes the Sort below SortMergeJoin.
    """
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).format("parquet").saveAsTable(table)


def compact(spark: SparkSession, path: str, target_files: int,
            out_path: str | None = None) -> None:
    """Rewrite a directory of many small parquet files into
    `target_files` larger ones (round-robin repartition — keeps sizes
    even regardless of key skew). Compaction is the standing repair job
    of any streaming lake: micro-batches write a file per trigger per
    partition, and scan scheduling degrades linearly in file count."""
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(
        out_path or path + "__compacted")


# format name -> (writer kwargs, reader kwargs); CSV/JSON carry no
# embedded schema, so readers must be given one (never inferSchema in
# production: it is a full extra pass over 100 TB).
TEXT_FORMATS = ("csv", "json", "orc")


def write_as(df: DataFrame, fmt: str, path: str, *,
             mode: str = "overwrite") -> None:
    """Write in any supported interchange format (csv/json/orc)."""
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


def read_as(spark: SparkSession, fmt: str, path: str,
            schema: str | None = None) -> DataFrame:
    """Read an interchange format back. `schema` is a DDL string and is
    required for csv/json (schema-on-read formats)."""
    r = spark.read
    if fmt == "csv":
        r = r.option("header", True)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires an explicit schema "
                         "(inferSchema is a full extra data pass)")
    return r.format(fmt).load(path)
