#!/usr/bin/env python
"""Round-2 TPU measurement session (run on the real chip when idle):

1. unroll study at the bench size: compile seconds vs GCUPS for U in
   {8, 16, 32} — the compile-latency diet data (VERDICT #6);
2. protein (BLOSUM62+affine) GCUPS with the select-tree scoring
   (target >= 50, VERDICT #5);
3. shape-aware sweep: square + rectangular grid entries persisted to the
   tuned table dispatch consults (VERDICT #8).

Writes results to bench_results/round2_tpu.json and refreshes
swtpu_tuned_v5e.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/swtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def probe(max_s=10.0):
    t0 = time.perf_counter()
    int(jnp.sum(jnp.arange(8)))          # backend init + first compile
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(jnp.sum(jnp.arange(9)))          # warm-path fetch (~35 ms healthy)
    warm = time.perf_counter() - t0
    print(f"tunnel probe: cold {cold:.2f}s warm {warm:.2f}s")
    return warm < max_s


def time_call(fn, k=10, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            fn()
        np.asarray(fn())
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def unroll_study(results):
    from swtpu import Scoring
    from swtpu.core.encode import random_pair
    from swtpu.kernels import pallas_fill as pf

    M = N = 25632
    a, b = random_pair(M, N, seed=0)
    T, R, CB = pf.choose_params(M, N)
    C = pf.DEFAULT_CHUNK
    ap, bt, _ = pf._build_inputs(a, b, T, C, R, CB)
    apj, btj = jnp.asarray(ap), jnp.asarray(bt)
    rows = []
    for U, spec in ((8, True), (16, True), (32, True), (32, False),
                    (16, False)):
        kw = dict(scoring=Scoring(), T=T, R=R, C=C, CB=CB, m=M, n=N,
                  return_p=False, interpret=False, unroll=U,
                  specialize_chunks=spec)
        t0 = time.perf_counter()
        np.asarray(pf._stripe_call(apj, btj, **kw)[0])
        compile_s = time.perf_counter() - t0
        fill = time_call(lambda: pf._stripe_call(apj, btj, **kw)[0])
        rows.append({"U": U, "specialize": spec,
                     "compile_s": round(compile_s, 1),
                     "fill_s": round(fill, 5),
                     "gcups": round(M * N / fill / 1e9, 1)})
        print("unroll", rows[-1])
    results["unroll_study"] = rows


def protein_bench(results):
    from swtpu import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels import pallas_fill as pf

    M = N = 25632
    rng = np.random.default_rng(0)
    a = rng.integers(0, 20, M).astype(np.int8)
    b = rng.integers(0, 20, N).astype(np.int8)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    C = pf.DEFAULT_CHUNK
    rows = []
    for CB in (1, 2):
        # the round-1 select CHAIN made CB=2 lose; the tree shortens the
        # per-cell dependency, so re-measure the column-blocking tradeoff
        T, R, _ = pf.choose_params(M, N, affine=True, cb_max=1)
        ap, bt, _ = pf._build_inputs(a, b, T, C, R, CB)
        btp = pf._build_profile(bt, np.asarray(BLOSUM62, np.int32))
        apj, btj = jnp.asarray(ap), jnp.asarray(btp)
        kw = dict(scoring=sc, T=T, R=R, C=C, CB=CB, m=M, n=N,
                  return_p=False, interpret=False,
                  unroll=pf._auto_unroll(C, False), nsym=21)
        t0 = time.perf_counter()
        np.asarray(pf._stripe_call(apj, btj, **kw)[0])
        compile_s = time.perf_counter() - t0
        fill = time_call(lambda: pf._stripe_call(apj, btj, **kw)[0])
        rows.append({"T": T, "R": R, "CB": CB,
                     "compile_s": round(compile_s, 1),
                     "fill_s": round(fill, 5),
                     "gcups": round(M * N / fill / 1e9, 1)})
        print("protein", rows[-1])
    results["protein_blosum_affine"] = rows


def shape_sweep(results):
    from swtpu.dispatch import autotune

    # focused grid: the rectangular entries the round-1 table lacked plus a
    # square refresh; R narrowed to the known-good register blockings to
    # bound compile count (each distinct config is a fresh Mosaic compile)
    sizes = ((2000, 145002), (145002, 2000), (2000, 25632), 8192, 25632)
    table = autotune.sweep(sizes=sizes, r_candidates=(4, 8),
                           cb_candidates=(1, 2), unrolls=(8, 32))
    # merge with the existing table (keep sizes we did not re-measure)
    old = autotune.load("swtpu_tuned_v5e.json")
    if old:
        seen = {(e["m"], e["n"]) for e in table["entries"]}
        for e in old["entries"]:
            if (e["m"], e["n"]) not in seen:
                table["entries"].append(e)
    autotune.save(table, "swtpu_tuned_v5e.json")
    results["sweep"] = [
        {"m": e["m"], "n": e["n"], "best": e["best"]}
        for e in table["entries"]]


def main():
    # NOT jax.default_backend(): the axon plugin stays visible even under
    # JAX_PLATFORMS=cpu (CLAUDE.md gotcha) — a CPU-configured session
    # would sweep interpreter timings into the tuned table
    from swtpu.dispatch.plan import current_platform
    assert current_platform() == "tpu", current_platform()
    if not probe():
        print("tunnel too slow; aborting")
        return 1
    results = {}
    for step in (unroll_study, protein_bench, shape_sweep):
        try:
            step(results)
        except Exception as e:
            results[step.__name__] = f"failed: {type(e).__name__}: {e}"
            print("FAILED", step.__name__, e)
    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/round2_tpu.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
