"""Fixture-drift guard.

Round-3/4 postmortem: the driver regenerated ``events.parquet`` with ``ts``
as parquet timestamp[us] (previously INT64 TIMESTAMP(NANOS)) and every
events-table query erred at load for two rounds. This test runs first-ish
(alphabetical) and fails fast with a clear message if ``load_table`` can't
read any fixture table, or if ``events.ts`` stops being a timestamp.
"""

import os

import pytest
from pyspark.sql import types as T

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.schemas import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", sorted(FIXTURE_TABLES))
def test_load_table_succeeds(spark, name):
    df = load_table(spark, SF_DIR, name)
    # Force one real batch through the reader, not just schema resolution.
    assert df.limit(1).count() >= 0, f"fixture table {name} unreadable"


def test_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_DIR, "events")
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampType), (
        f"events.ts loaded as {ts_type}; fixture encoding drifted — "
        "update the dtype sniff in io.load_table"
    )
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row["lo"] is not None and row["hi"] is not None
