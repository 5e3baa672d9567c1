#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Metric: GCUPS (giga DP-cell updates per second) for a single-pair
score-only fill on one chip, the reference's headline measurement
("Elapsed time for scoring matrix computation" with -DSKIP_BACKTRACK=1,
makefile:9). Baseline: the reference's best-ever 0.54 GCUPS
(44-core Power9, SMT, 25632^2 — BASELINE.md).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/swtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_GCUPS = 0.54
M = N = 25632          # the reference's largest standard sweep size


def main():
    from swtpu.core.encode import random_pair
    from swtpu.engine.align import _fill_fn_for_bench

    a, b = random_pair(M, N, seed=0)
    a, b = jnp.asarray(a), jnp.asarray(b)

    fn, plan = _fill_fn_for_bench(M, N)

    def run():
        # NOTE: fetch the scalars — block_until_ready is unreliable through
        # the axon device tunnel (returns before execution completes).
        out = fn(a, b)
        return tuple(int(x) for x in out)

    t0 = time.perf_counter()
    vals = run()
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        vals = run()
        times.append(time.perf_counter() - t0)
    fill_s = min(times)
    score = vals[0]

    gcups = M * N / fill_s / 1e9
    print(json.dumps({
        "metric": "single_chip_fill_GCUPS",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
        "details": {
            "m": M, "n": N, "plan": plan, "fill_s": round(fill_s, 4),
            "compile_s": round(compile_s, 2), "score": score,
            "backend": jax.default_backend(),
            "baseline": "reference v1 OpenMP 44T lassen, 0.54 GCUPS @25632^2",
        },
    }))


if __name__ == "__main__":
    main()
