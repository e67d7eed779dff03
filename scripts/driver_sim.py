"""Simulate the driver's verify pass at the contract surface.

Builds a PLAIN SparkSession (no engine configs — exactly what the driver
does), imports __spark_entry__, smoke-runs entry(), then runs every
queries() entry at the given SF dir against its oracle_sql() in DuckDB with
pre-registered views, comparing row count + column names + exact values
(columns sorted by name, rows order-insensitive).

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import datetime
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((v is None, repr(v)) for v in r))
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as mod

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    df = mod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.columns}")

    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    for name in sorted(qs):
        start = time.perf_counter()
        sdf = qs[name](spark, sf_dir)
        s_cols, s_rows = canon(list(sdf.columns), [tuple(r) for r in sdf.collect()])
        took = time.perf_counter() - start
        if name not in oracles:
            print(f"  {name}: rows-only ({len(s_rows)} rows) [{took:.2f}s]")
            continue
        rel = con.sql(oracles[name])
        d_cols, d_rows = canon(list(rel.columns), rel.fetchall())
        status = "OK"
        if s_cols != d_cols:
            status = f"COLS {s_cols} vs {d_cols}"
        elif len(s_rows) != len(d_rows):
            status = f"COUNT {len(s_rows)} vs {len(d_rows)}"
        else:
            bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            if bad:
                status = f"VALUES {len(bad)} mismatched, first: {bad[0]}"
        if status != "OK":
            failures.append(name)
        print(f"  {name}: {status} ({len(s_rows)} rows) [{took:.2f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
