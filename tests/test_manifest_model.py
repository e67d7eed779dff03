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


@pytest.mark.slow
@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_random_mixed_ops_under_two_writer_races(spark, tmp_path, table_type):
    """VERDICT r13 #8: the multi-writer model check — every op writer A
    issues loses its first publish to a rival commit from writer B
    (upsert or delete) landing in the race window. The serialized
    result must equal the model applying B FIRST, then A — with A's
    predicate DML re-evaluating its predicate against B's state (the
    r14 fix) and A's keyed ops re-applying their pinned batch. Rebase
    accounting is asserted exactly: one lost race per raced op."""
    rng = random.Random(101 if table_type == "cow" else 211)
    path = tmp_path / "t"
    t1 = ManifestTable(
        spark, str(path),
        keys=("transaction_id",), precombine="price",
        partition_by=("pair",), table_type=table_type,
    )
    t2 = ManifestTable(
        spark, str(path),
        keys=("transaction_id",), precombine="price",
        partition_by=("pair",), table_type=table_type,
    )
    model: dict[str, tuple[str, float]] = {}
    oplog: list[str] = []

    def rows_df(rows):
        return spark.createDataFrame(
            [(k, TS1, p, v) for k, (p, v) in rows.items()], SCHEMA
        )

    def pick_rows(n):
        ks = rng.sample(KEYS, min(n, len(KEYS)))
        return {
            k: (PAIRS[int(k[1:]) % 2], float(rng.randint(1, 99)))
            for k in ks
        }

    def inject_race(fire_once):
        orig = t1._publish
        state = {"fired": False}

        def racy(prev_id, files, schema_json, changes=None, op="unknown"):
            if not state["fired"]:
                state["fired"] = True
                fire_once()
            return orig(prev_id, files, schema_json, changes, op=op)

        t1._publish = racy
        return lambda: setattr(t1, "_publish", orig), state

    first = pick_rows(6)
    t1.write(rows_df(first), "upsert")
    model.update(first)
    raced = 0

    for _ in range(10):
        # rival op B: lands mid-publish of A's op
        if rng.random() < 0.6:
            b_rows = pick_rows(rng.randint(1, 4))
            b_apply = lambda rows=b_rows: (
                t2.write(rows_df(rows), "upsert"),
                model.update(rows),
            )
            b_name = "B-upsert"
        else:
            b_rows = pick_rows(rng.randint(1, 3))
            b_apply = lambda rows=b_rows: (
                t2.write(rows_df(rows), "delete"),
                [model.pop(k, None) for k in rows],
            )
            b_name = "B-delete"

        restore, race_state = inject_race(b_apply)
        op = rng.choice(
            ["upsert", "delete", "txn", "update_where", "delete_where",
             "compact"]
        )
        try:
            if op == "upsert":
                rows = pick_rows(rng.randint(1, 5))
                t1.write(rows_df(rows), "upsert")
                model.update(rows)
            elif op == "delete":
                rows = pick_rows(rng.randint(1, 4))
                t1.write(rows_df(rows), "delete")
                for k in rows:
                    model.pop(k, None)
            elif op == "txn":
                ups = pick_rows(rng.randint(1, 3))
                dels = pick_rows(rng.randint(1, 3))
                t1.write_txn(upserts=rows_df(ups), deletes=rows_df(dels))
                for k in dels:
                    if k not in ups:
                        model.pop(k, None)
                model.update(ups)
            elif op == "update_where":
                cut = float(rng.randint(10, 90))
                n = t1.update_where(
                    f"price < {cut}", {"price": "price + 1000"}
                )
                changed = 0
                # predicate evaluates AFTER B's commit (the rebase
                # re-runs it) — model already holds B's effect here
                for k, (p, v) in list(model.items()):
                    if v < cut:
                        model[k] = (p, v + 1000)
                        changed += 1
                assert n == changed, (oplog, op, n, changed)
            elif op == "delete_where":
                cut = float(rng.randint(500, 1500))
                n = t1.delete_where(f"price > {cut}")
                removed = [k for k, (_, v) in model.items() if v > cut]
                for k in removed:
                    del model[k]
                assert n == len(removed), (oplog, op, n, removed)
            else:  # compact — content-neutral
                t1.compact()
        finally:
            restore()
        # the race only fires if A reached a publish at all — predicate
        # DML that matches nothing pre-rival returns without publishing
        raced += int(race_state["fired"])
        oplog.append(f"{b_name}/{op}" + ("" if race_state["fired"] else "(unraced)"))
        got = snapshot(t1)
        assert got == model, (
            f"divergence after {oplog}: table={got} model={model}"
        )

    # every op whose publish actually raced lost it exactly once and
    # rebased exactly once — exact accounting, no silent over-publish
    assert t1.rebase_count == raced, (t1.rebase_count, raced, oplog)
    assert t2.rebase_count == 0
