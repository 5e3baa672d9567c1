"""Instrumentation tests: traffic accounting, bench records, printers."""

import json

import numpy as np

from swtpu.core.encode import encode
from swtpu.instrument.access import (reference_v61_traffic, report,
                                     scan_traffic, stripe_traffic)
from swtpu.instrument.metrics import BenchRecord, gcups, memory_footprint_bytes
from swtpu.instrument.printers import format_matrix, format_predecessor_matrix


def test_traffic_model_orders():
    m = n = 25632
    ours = stripe_traffic(m, n)
    theirs = reference_v61_traffic(m, n)
    # the whole point: per-cell traffic orders of magnitude below v6.1
    assert ours.bytes_per_cell < 0.01
    assert theirs.bytes_per_cell > 100
    assert "eliminates" in theirs.notes
    assert len(report(m, n).splitlines()) == 5


def test_scan_traffic_traceback_dominates():
    t0 = scan_traffic(4096, 4096, traceback=False)
    t1 = scan_traffic(4096, 4096, traceback=True)
    assert t1.hbm_write_bytes > 100 * t0.hbm_write_bytes


def test_bench_record_json():
    r = BenchRecord(name="x", m=100, n=200, fill_s=0.5, plan="scan")
    d = json.loads(r.to_json())
    assert d["cells"] == 20000
    assert abs(d["gcups"] - gcups(20000, 0.5)) < 1e-12


def test_memory_footprint():
    assert memory_footprint_bytes(1000, 1000, traceback=False) < \
        memory_footprint_bytes(1000, 1000, traceback=True)


def test_printers_roundtrip():
    H = np.array([[0, 1], [2, 3]], np.int32)
    assert format_matrix(H) == "0\t1\n2\t3\n"
    P = np.array([[0, 1], [2, -3]], np.int8)
    s = format_predecessor_matrix(P, color=False)
    assert "↑" in s and "←" in s and "↖" in s


def test_sweep_grids():
    from swtpu.bench_sweep import _grid
    sq = _grid("square", quick=False)
    assert sq[0] == (32, 32) and sq[-1] == (25632, 25632)
    rc = _grid("rect", quick=False)
    assert rc[0] == (2, 2000) and rc[-1] == (145002, 2000)
