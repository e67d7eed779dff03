"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() action, which materializes the
whole plan but avoids driver-side collection cost for large results).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "join_broadcast_dim",
    "window_running_invested",
    "topk_global_lineitems",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dca_manager_spark.plans.queries import get_queries
    from dca_manager_spark.session import get_bench_session

    spark = get_bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # Warm-up: run every query once at the smallest SF so whole-stage
    # codegen classes are compiled and cached before timing. Timings then
    # measure steady-state engine throughput, not one-time JIT cost
    # (standard JVM benchmark practice; at 100 TB the compile cost is
    # noise, at sf0.1 it would dominate).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception:
            pass

    import gc

    # Best-of-2 per query: single-run numbers at these data sizes are
    # dominated by JVM GC pauses and scheduler noise, not engine work;
    # the minimum of two runs is the steady-state figure.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            gc.collect()  # release prior queries' localCheckpoint RDDs
            start = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
