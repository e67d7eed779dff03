"""Dump explain('formatted') for named catalog entries (no execution).

Usage: python scripts/dump_plans.py OUTDIR SUFFIX name...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dca_manager_spark.plans.queries import get_queries
    from dca_manager_spark.session import get_bench_session

    qs = get_queries()
    spark = get_bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}{suffix}.txt ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
