"""Catalog-wide oracle gate as a (slow) test: runs the driver-contract
simulation (scripts/driver_sim.py — plain SparkSession, DuckDB oracles,
exact value compare) at two SFs, so catalog-wide oracle drift is caught
in-repo with one command:

    python -m pytest tests/test_driver_sim.py -m slow -q

Deselected in the default run (`-m "not slow"` or plain `pytest tests/`
keeps these out via the explicit marker filter below being opt-in).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_driver_sim_full_catalog(sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    import re

    tail = "\n".join(out.stdout.strip().splitlines()[-3:])
    assert out.returncode == 0, f"driver_sim failed:\n{tail}\n{out.stderr[-2000:]}"
    m = re.search(r"(\d+)/(\d+) queries match", out.stdout)
    assert m and m.group(1) == m.group(2), tail


def test_typed_equal_missing_value_semantics():
    """The comparator treats missing==missing as EQUAL for both float NaN
    and datetime NaT (pd.NaT is a datetime subclass where NaT != NaT
    under ==), but never collapses missing against a real value — the r6
    as-of-join lesson."""
    import datetime

    import pandas as pd

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from driver_sim import typed_equal

    ts = datetime.datetime(2024, 1, 1)
    assert typed_equal(float("nan"), float("nan"))
    assert typed_equal(pd.NaT, pd.NaT)
    assert not typed_equal(pd.NaT, ts)
    assert not typed_equal(ts, pd.NaT)
    assert typed_equal(ts, ts)
    assert not typed_equal(None, ts)
    assert typed_equal(None, None)
