"""Simulate the driver's verify pass at the contract surface.

Builds a PLAIN SparkSession (no engine configs — exactly what the driver
does), imports __spark_entry__, smoke-runs entry(), then runs every
queries() entry at the given SF dir against its oracle_sql() in DuckDB.

Comparison is driver-faithful (r3 lesson — the old ``norm()`` normalized
away exactly the differences the real driver hashes):

- Both sides go through **pandas** (``DataFrame.toPandas`` /
  ``duckdb.sql(...).df()``) because that is the dtype surface the driver
  hashes: DuckDB HUGEINT -> float64, TIMESTAMPTZ -> tz-aware, etc.
- **Typed cell equality**: int vs float never match (3 != 3.0), naive vs
  tz-aware datetimes never match. Int width (int32 vs int64) is not
  distinguished — pandas ``.tolist()`` yields Python ints either way, the
  same collapse the driver's hasher applies.
- **List/array-typed output columns are a hard error** — they crash the
  real driver's hasher (``unhashable type: 'list'``, CORRECTNESS_r03
  array_functions).
- **A queries() entry without an oracle_sql() entry is a failure** — the
  driver records ``err: no_oracle`` (CORRECTNESS_r01 x3, r03
  agg_approx_distinct).

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class UnhashableColumn(Exception):
    pass


def _cells(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """Sorted column names + row tuples of plain-Python cells, rows sorted
    by a total order. Raises UnhashableColumn on list/array cells."""
    cols = sorted(pdf.columns)
    series = []
    for c in cols:
        vals = pdf[c].tolist()  # np.int64->int, np.float64->float, keeps tz
        for v in vals:
            if isinstance(v, (list, tuple, np.ndarray, dict)):
                raise UnhashableColumn(
                    f"column {c!r} holds {type(v).__name__} cells — the "
                    "driver's hasher crashes on these; stringify with "
                    "concat_ws/array_to_string"
                )
        series.append(vals)
    rows = [tuple(s[i] for s in series) for i in range(len(pdf))]
    rows.sort(key=lambda r: tuple((v is None, type(v).__name__, repr(v)) for v in r))
    return cols, rows


def typed_equal(a, b) -> bool:
    """Driver-faithful equality: no int/float coercion, no tz stripping."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    if isinstance(a, datetime.datetime) or isinstance(b, datetime.datetime):
        if not (isinstance(a, datetime.datetime) and isinstance(b, datetime.datetime)):
            return False
        # Missing == missing, mirroring the NaN rule above (pd.NaT is a
        # datetime subclass but NaT != NaT under ==).
        if pd.isna(a) or pd.isna(b):
            return bool(pd.isna(a) and pd.isna(b))
        if (a.tzinfo is None) != (b.tzinfo is None):
            return False
        return a == b
    if type(a) is not type(b):
        return False
    return a == b


def compare(sdf_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    s_cols, s_rows = _cells(sdf_pdf)
    d_cols, d_rows = _cells(oracle_pdf)
    if s_cols != d_cols:
        return f"COLS {s_cols} vs {d_cols}"
    if len(s_rows) != len(d_rows):
        return f"COUNT {len(s_rows)} vs {len(d_rows)}"
    bad = [
        (i, a, b)
        for i, (ra, rb) in enumerate(zip(s_rows, d_rows))
        for a, b in zip(ra, rb)
        if not typed_equal(a, b)
    ]
    if bad:
        i, a, b = bad[0]
        return (
            f"VALUES {len(bad)} mismatched cells, first at row {i}: "
            f"spark {type(a).__name__}:{a!r} vs oracle {type(b).__name__}:{b!r}"
        )
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
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
        if only and name not in only:
            continue
        start = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            s_pdf = sdf.toPandas()
            if name not in oracles:
                raise UnhashableColumn("no_oracle — the driver records this as err")
            d_pdf = con.sql(oracles[name]).df()
            status = compare(s_pdf, d_pdf)
            nrows = len(s_pdf)
        except UnhashableColumn as exc:
            status, nrows = f"DRIVER-ERR {exc}", -1
        took = time.perf_counter() - start
        if status != "OK":
            failures.append(name)
        print(f"  {name}: {status} ({nrows} rows) [{took:.2f}s]")

    n = len(only) if only else len(qs)
    print(f"\n{n - len(failures)}/{n} queries match at {sf_dir}")
    if failures:
        print("FAILURES:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
