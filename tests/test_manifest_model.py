"""Model-based whole-surface check of ManifestTable: seeded random
sequences of upsert / delete / write_txn / update_where / delete_where /
compact / restore / vacuum against a plain Python dict model, verified
row-for-row after EVERY op, on both table types.

This is the integration net under the per-feature suites: any
interaction bug between the r13 additions (txn commits, predicate DML,
vacuum grace) and the older surface (restore, compaction, MOR
resolution) surfaces as a model divergence with the full op log in the
failure message. The model keeps one snapshot per RETAINED commit —
aligned 1:1 with table.commits() — so restore targets map exactly."""

from __future__ import annotations

import datetime
import random

import pytest

from dca_manager_spark.io.manifest import ManifestTable

TS1 = datetime.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "transaction_id string, close_time timestamp, pair string, price double"
KEYS = [f"K{i}" for i in range(14)]
PAIRS = ["BTCGBP", "ETHGBP"]


def snapshot(table):
    return {
        r.transaction_id: (r.pair, r.price) for r in table.read().collect()
    }


@pytest.mark.parametrize("table_type", ["cow", "mor"])
@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_sequences_match_dict_model(
    spark, tmp_path, table_type, seed
):
    rng = random.Random(seed)
    table = ManifestTable(
        spark,
        str(tmp_path / f"t{seed}"),
        keys=("transaction_id",),
        precombine="price",
        partition_by=("pair",),
        table_type=table_type,
    )
    model: dict[str, tuple[str, float]] = {}
    history: list[dict] = []  # one model snapshot per retained commit
    oplog: list[str] = []

    def sync_history():
        n = len(table.commits())
        if len(history) > n:
            history[:] = history[-n:]
        while len(history) < n:
            history.append(dict(model))

    def rows_df(rows):
        return spark.createDataFrame(
            [(k, TS1, p, v) for k, (p, v) in rows.items()], SCHEMA
        )

    def pick_rows(n):
        # pair is a FUNCTION OF THE KEY: key matching is partition-
        # scoped (documented, and deliberately divergent between COW
        # and MOR for cross-partition moves), so the model stays exact
        # only while keys never migrate partitions — moves are covered
        # by the dedicated partition-semantics tests instead.
        ks = rng.sample(KEYS, min(n, len(KEYS)))
        return {
            k: (PAIRS[int(k[1:]) % 2], float(rng.randint(1, 99)))
            for k in ks
        }

    first = pick_rows(6)
    table.write(rows_df(first), "upsert")
    model.update(first)
    sync_history()
    oplog.append("seed-upsert")

    for _ in range(12):
        op = rng.choice(
            ["upsert", "delete", "txn", "update_where", "delete_where",
             "compact", "restore", "vacuum"]
        )
        if op == "upsert":
            rows = pick_rows(rng.randint(1, 5))
            table.write(rows_df(rows), "upsert")
            model.update(rows)
        elif op == "delete":
            rows = pick_rows(rng.randint(1, 4))
            table.write(rows_df(rows), "delete")
            for k in rows:
                model.pop(k, None)
        elif op == "txn":
            ups = pick_rows(rng.randint(1, 3))
            dels = pick_rows(rng.randint(1, 3))
            table.write_txn(upserts=rows_df(ups), deletes=rows_df(dels))
            for k in dels:
                if k not in ups:  # upsert-wins overlap
                    model.pop(k, None)
            model.update(ups)
        elif op == "update_where":
            cut = float(rng.randint(10, 90))
            n = table.update_where(
                f"price < {cut}", {"price": "price + 1000"}
            )
            changed = 0
            for k, (p, v) in list(model.items()):
                if v < cut:
                    model[k] = (p, v + 1000)
                    changed += 1
            assert n == changed, (oplog, op, n, changed)
        elif op == "delete_where":
            cut = float(rng.randint(500, 1500))
            n = table.delete_where(f"price > {cut}")
            removed = [k for k, (_, v) in model.items() if v > cut]
            for k in removed:
                del model[k]
            assert n == len(removed), (oplog, op, n, removed)
        elif op == "compact":
            table.compact()
        elif op == "restore":
            ids = table.commits()
            target = rng.choice(ids)
            table.restore(target)
            model = dict(history[ids.index(target)])
        else:  # vacuum — content-neutral, truncates retained history
            table.vacuum(
                keep_last=rng.randint(1, 3), orphan_grace_seconds=0
            )
        sync_history()
        oplog.append(op)
        got = snapshot(table)
        assert got == model, (
            f"divergence after {oplog}: table={got} model={model}"
        )
