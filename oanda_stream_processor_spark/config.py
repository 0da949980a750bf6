"""Environment configuration.

Mirrors the reference's Config::from_env (/root/reference/src/config.rs:14-40):
required OANDA_AUTH_TOKEN / OANDA_ACCOUNT_ID, defaulted environment,
instruments, and publisher address, plus the derived streaming base URL.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


_ENV_HOSTS = {
    "fxpractice": "https://stream-fxpractice.oanda.com",
    "fxtrade": "https://stream-fxtrade.oanda.com",
}


@dataclass(frozen=True)
class Config:
    auth_token: str
    account_id: str
    environment: str = "fxpractice"
    instruments: list[str] = field(default_factory=lambda: ["EUR_USD"])
    zmq_publisher_address: str = "tcp://*:9500"

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "Config":
        env = dict(os.environ) if env is None else env
        missing = [k for k in ("OANDA_AUTH_TOKEN", "OANDA_ACCOUNT_ID") if not env.get(k)]
        if missing:
            raise ConfigError(f"missing required environment variables: {missing}")
        return cls(
            auth_token=env["OANDA_AUTH_TOKEN"],
            account_id=env["OANDA_ACCOUNT_ID"],
            environment=env.get("OANDA_ENVIRONMENT", "fxpractice"),
            instruments=[i.strip() for i in env.get("OANDA_INSTRUMENTS", "EUR_USD").split(",") if i.strip()],
            zmq_publisher_address=env.get("ZMQ_PUBLISHER_ADDRESS", "tcp://*:9500"),
        )

    def base_url(self) -> str:
        # config.rs:38-40 derives the host from the environment name.
        try:
            return _ENV_HOSTS[self.environment]
        except KeyError:
            raise ConfigError(f"unknown OANDA environment {self.environment!r}") from None

    def stream_url(self) -> str:
        # oanda_client.rs:14-19: pricing-stream endpoint w/ URL-encoded list.
        from urllib.parse import quote
        instruments = quote(",".join(self.instruments), safe="")
        return (f"{self.base_url()}/v3/accounts/{self.account_id}"
                f"/pricing/stream?instruments={instruments}")
