"""Exchange credentials resolution: the connectors' secrets seam.

Reference parity: the reference resolves the Kraken API key and secret
from a parameter store, one named lookup each, decrypted, and propagates
a failure of EITHER lookup (pkg/configuration/kraken.go:25-45; error
semantics pinned by pkg/configuration/kraken_test.go:17-88). This module
reproduces that contract behind a provider Protocol with three concrete
providers — environment, JSON file, in-memory static — so a deployment
picks its store by injection and tests never need a cloud client.

The parameter NAMES keep the reference's two-slot-per-exchange layout
(``<prefix>/<exchange>/key`` and ``<prefix>/<exchange>/secret``) so a
parameter-store-backed provider can be dropped in with the same names.
Credentials are resolved DRIVER-SIDE only, at connector construction —
never shipped inside tasks, never stored in DataFrames.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Protocol


class CredentialsError(Exception):
    """A lookup failed: missing parameter, unreadable store, bad format."""


@dataclass(frozen=True)
class ExchangeCredentials:
    key: str
    secret: str


class CredentialsProvider(Protocol):
    def get_credentials(self, exchange: str) -> ExchangeCredentials: ...


def _require(value: str | None, what: str) -> str:
    if not value:
        raise CredentialsError(f"missing credential: {what}")
    return value


class StaticCredentialsProvider:
    """In-memory provider for tests and embedding callers — the analogue
    of the reference's mocked parameter-store client."""

    def __init__(self, creds: dict[str, tuple[str, str]]) -> None:
        self._creds = dict(creds)

    def get_credentials(self, exchange: str) -> ExchangeCredentials:
        if exchange not in self._creds:
            raise CredentialsError(f"missing credential: {exchange}/key")
        key, secret = self._creds[exchange]
        return ExchangeCredentials(
            key=_require(key, f"{exchange}/key"),
            secret=_require(secret, f"{exchange}/secret"),
        )


class EnvCredentialsProvider:
    """Resolve from environment variables ``{PREFIX}_{EXCHANGE}_KEY`` /
    ``{PREFIX}_{EXCHANGE}_SECRET`` (e.g. DCA_KRAKEN_KEY). Two lookups,
    either missing is an error — same shape as the reference's two SSM
    GetParameter calls."""

    def __init__(self, prefix: str = "DCA", env: dict[str, str] | None = None) -> None:
        self.prefix = prefix
        self._env = env if env is not None else os.environ  # injectable for tests

    def get_credentials(self, exchange: str) -> ExchangeCredentials:
        base = f"{self.prefix}_{exchange.upper()}"
        return ExchangeCredentials(
            key=_require(self._env.get(f"{base}_KEY"), f"{base}_KEY"),
            secret=_require(self._env.get(f"{base}_SECRET"), f"{base}_SECRET"),
        )


class FileCredentialsProvider:
    """Resolve from a JSON document ``{"<exchange>": {"key": ..,
    "secret": ..}, ...}`` with owner-only permissions expected. The file
    is read per lookup (no caching) so rotation takes effect without a
    restart — parameter stores behave the same way."""

    def __init__(self, path: str) -> None:
        self.path = path

    def get_credentials(self, exchange: str) -> ExchangeCredentials:
        try:
            with open(self.path) as fh:
                doc = json.load(fh)
        except (OSError, json.JSONDecodeError) as exc:
            raise CredentialsError(f"cannot read credentials file {self.path}: {exc}") from exc
        entry = doc.get(exchange)
        if not isinstance(entry, dict):
            raise CredentialsError(f"missing credential: {exchange}/key")
        return ExchangeCredentials(
            key=_require(entry.get("key"), f"{exchange}/key"),
            secret=_require(entry.get("secret"), f"{exchange}/secret"),
        )
