"""Config parity tests (/root/reference/src/config.rs:14-40)."""

from __future__ import annotations

import pytest

from oanda_stream_processor_spark.config import Config, ConfigError


def test_required_vars():
    with pytest.raises(ConfigError) as e:
        Config.from_env({})
    assert "OANDA_AUTH_TOKEN" in str(e.value)
    assert "OANDA_ACCOUNT_ID" in str(e.value)


def test_defaults():
    c = Config.from_env({"OANDA_AUTH_TOKEN": "t", "OANDA_ACCOUNT_ID": "a"})
    assert c.environment == "fxpractice"          # config.rs:21-22
    assert c.instruments == ["EUR_USD"]           # config.rs:23-24
    assert c.zmq_publisher_address == "tcp://*:9500"  # config.rs:26-27


def test_stream_url_encoding():
    c = Config.from_env({
        "OANDA_AUTH_TOKEN": "t", "OANDA_ACCOUNT_ID": "acct-1",
        "OANDA_INSTRUMENTS": "EUR_USD,USD_JPY"})
    # oanda_client.rs:14-19: URL-encoded instrument list
    assert c.stream_url() == ("https://stream-fxpractice.oanda.com/v3/accounts/"
                              "acct-1/pricing/stream?instruments=EUR_USD%2CUSD_JPY")


def test_bad_environment():
    c = Config.from_env({"OANDA_AUTH_TOKEN": "t", "OANDA_ACCOUNT_ID": "a",
                         "OANDA_ENVIRONMENT": "nope"})
    with pytest.raises(ConfigError):
        c.base_url()
