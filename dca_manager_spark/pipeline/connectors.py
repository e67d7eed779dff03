"""Exchange connectors: the reference's only UDF-shaped surface.

The reference defines an ``Orderer`` interface with two methods
(pkg/orders/common.go:9-12): ``MakeOrder(order) -> OrderFufilled`` and
``ProcessTransaction(txid) -> []OrderComplete``; implementations are a real
Kraken connector (pkg/orders/kraken.go:31-115) and a deterministic fake
(pkg/orders/fake.go:11-34). A factory maps exchange name -> connector
(pkg/orders/factory.go:21-36); unknown exchanges are an error.

Engine mapping (SURVEY §2 UDF note): connectors are pluggable Python
classes invoked driver-side per order — order execution is an external
API call, inherently driver-paced (the reference loops in a lambda);
the DATA path stays in Spark. Network connectors are stubbed: this engine
is an analytics engine, not a trading bot, and the container has no
network — the Kraken stub raises unless a client is injected.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Protocol


@dataclass
class OrderFulfilled:
    """Raw order-placement result (OrderFufilled, common.go:15-19 — the
    reference's typo is not reproduced in the class name)."""

    transaction_id: str
    timestamp: int
    result: dict[str, Any]


@dataclass
class OrderComplete:
    """Normalized completed order (OrderComplete, common.go:39-50).
    Numeric fields stay decimal STRINGS at this tier — shopspring decimals
    marshal as quoted strings (SURVEY §1.3)."""

    transaction_id: str
    exchange_status: str
    pair: str
    order_type: str
    type: str
    price: str
    fee: str
    volume: str
    open_time: float
    close_time: float


class Orderer(Protocol):
    def make_order(self, order: dict[str, Any]) -> OrderFulfilled: ...

    def process_transaction(self, transaction_id: str) -> list[OrderComplete]: ...


class FakeOrderer:
    """Deterministic fake (pkg/orders/fake.go:11-34 parity): returns the
    fixed transaction id ``OEBG2U-KIRAN-4U6WHJ`` and an AddOrderResponse-
    shaped payload built from the requested order."""

    FAKE_TXID = "OEBG2U-KIRAN-4U6WHJ"

    def make_order(self, order: dict[str, Any]) -> OrderFulfilled:
        return OrderFulfilled(
            transaction_id=self.FAKE_TXID,
            timestamp=12345678,
            result={
                "transaction_ids": ["TXID"],
                "description": {
                    "pair": order.get("pair", ""),
                    "type": order.get("type", "buy"),
                    "order_type": order.get("order_type", "market"),
                    "price": order.get("price") or "0",
                    "price2": "0",
                    "leverage": "none",
                    "order": (
                        f"{order.get('type', 'buy')} {order.get('volume', '0')} "
                        f"{order.get('pair', '')} @ {order.get('order_type', 'market')}"
                    ),
                    "close": "",
                },
            },
        )

    def process_transaction(self, transaction_id: str) -> list[OrderComplete]:
        # Field values mirror the Kraken test fixture (kraken_test.go:169-180).
        return [
            OrderComplete(
                transaction_id=transaction_id,
                exchange_status="closed",
                pair="ADAGBP",
                order_type="market",
                type="buy",
                price="100.23",
                fee="1.23",
                volume="20",
                open_time=2000021133.0,
                close_time=2000021133.0,
            )
        ]


class KrakenOrderer:
    """Kraken connector shape (pkg/orders/kraken.go:31-115). The HTTP
    client is injected; without one, calls raise — no live trading from
    an analytics engine. The normalization logic (QueryOrders response ->
    OrderComplete rows, kraken.go:84-112) lives in ``normalize_response``
    so it is testable without any network."""

    def __init__(self, client: Any | None = None,
                 credentials: Any | None = None) -> None:
        # ``credentials``: ExchangeCredentials resolved by a
        # CredentialsProvider (pipeline/credentials.py) — the seam the
        # reference fills from its parameter store
        # (pkg/configuration/kraken.go:25-45). Held for the injected
        # client's auth; never serialized into tasks.
        self.client = client
        self.credentials = credentials

    def make_order(self, order: dict[str, Any]) -> OrderFulfilled:
        if self.client is None:
            raise NotImplementedError(
                "KrakenOrderer requires an injected client (no network here)"
            )
        resp = self.client.add_order(order)
        return OrderFulfilled(
            transaction_id=resp["transaction_ids"][0],
            timestamp=int(resp["timestamp"]),
            result=resp,
        )

    @staticmethod
    def normalize_response(payload: dict[str, Any]) -> list[OrderComplete]:
        """Map a QueryOrders-style response map {txid: {...}} into flat
        OrderComplete rows (kraken.go:88-112): select + rename, keep
        decimals as strings, skip empty transaction ids
        (cmd/process_orders/main.go:196-199)."""
        out: list[OrderComplete] = []
        for txid, row in payload.items():
            if not txid:
                continue
            desc = row.get("descr", {})
            out.append(
                OrderComplete(
                    transaction_id=txid,
                    exchange_status=str(row.get("status", "")),
                    pair=str(desc.get("pair", "")),
                    order_type=str(desc.get("ordertype", "")),
                    type=str(desc.get("type", "")),
                    price=str(row.get("price", "0")),
                    fee=str(row.get("fee", "0")),
                    volume=str(row.get("vol_exec", row.get("vol", "0"))),
                    open_time=float(row.get("opentm", 0.0)),
                    close_time=float(row.get("closetm", 0.0)),
                )
            )
        return out

    def process_transaction(self, transaction_id: str) -> list[OrderComplete]:
        if self.client is None:
            raise NotImplementedError(
                "KrakenOrderer requires an injected client (no network here)"
            )
        return self.normalize_response(self.client.query_orders(transaction_id))


def get_orderers(
    allow_real: bool = False,
    kraken_client: Any | None = None,
    credentials_provider: Any | None = None,
) -> dict[str, Orderer]:
    """Factory (pkg/orders/factory.go:21-36): exchange name -> connector.
    ``allow_real`` mirrors the DCA_ALLOW_REAL env branch
    (cmd/execute_orders/main.go:156-165): off => every exchange resolves to
    the deterministic fake.

    ``credentials_provider``: a pipeline.credentials.CredentialsProvider;
    when real orderers are requested, Kraken credentials are resolved
    through it at construction time (reference: GetKrakenDetails before
    building the client, cmd/execute_orders/main.go + kraken.go:25-45).
    Resolution failures raise CredentialsError here — loudly, before any
    order flow starts — rather than at first API call. A real orderer
    WITHOUT a provider is the same failure (the reference resolves
    credentials before constructing the client; silently building an
    unauthenticated client would defer the error to the first order)."""
    if not allow_real:
        return {"kraken": FakeOrderer(), "fake": FakeOrderer()}
    from dca_manager_spark.pipeline.credentials import CredentialsError

    if credentials_provider is None:
        raise CredentialsError(
            "allow_real=True requires a credentials_provider "
            "(reference resolves Kraken credentials before building the client)"
        )
    creds = credentials_provider.get_credentials("kraken")
    return {
        "kraken": KrakenOrderer(kraken_client, credentials=creds),
        "fake": FakeOrderer(),
    }


def resolve_orderer(orderers: dict[str, Orderer], exchange: str) -> Orderer:
    """Lookup with the reference's unknown-exchange error
    (cmd/process_orders/main.go:179-182)."""
    try:
        return orderers[exchange]
    except KeyError as exc:
        raise KeyError(f"no orderer registered for exchange {exchange!r}") from exc
