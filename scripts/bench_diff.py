"""Diff two bench result files (bench_results.json / BENCH_r*.json).

Prints totals, per-query deltas beyond a noise threshold, and entries
present on only one side — the first thing to run when a round's bench
number moves. Remember the measurement caveats (ROUND_NOTES): sub-2s
entries swing +/-0.5s between sessions, and runs executed concurrently
with other Spark sessions are inflated ~30%.

Usage: python scripts/bench_diff.py OLD.json NEW.json [threshold=0.5]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    oq = old.get("queries", {})
    nq = new.get("queries", {})

    for key in ("value", "total_md5_parity", "total_production",
                "total_floor_adjusted", "overhead_per_query_sec"):
        if key in old or key in new:
            print(f"{key}: {old.get(key, '-')} -> {new.get(key, '-')}")

    shared = sorted(set(oq) & set(nq), key=lambda n: -(abs(nq[n] - oq[n])))
    moved = [(n, oq[n], nq[n]) for n in shared if abs(nq[n] - oq[n]) >= thr]
    if moved:
        print(f"\nmoved >= {thr}s:")
        for n, a, b in moved:
            print(f"  {n}: {a:.3f} -> {b:.3f}  ({b - a:+.3f})")
    only_old = {n: oq[n] for n in oq if n not in nq}
    only_new = {n: nq[n] for n in nq if n not in oq}
    if only_old:
        print(f"\nremoved ({sum(only_old.values()):.3f}s): "
              + ", ".join(f"{n}={v}" for n, v in sorted(only_old.items())))
    if only_new:
        print(f"\nadded ({sum(only_new.values()):.3f}s): "
              + ", ".join(f"{n}={v}" for n, v in sorted(only_new.items())))


if __name__ == "__main__":
    main()
