from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from oanda_stream_processor_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tick_capture() -> str:
    return "/root/repo/tests/data/ticks.ndjson"
