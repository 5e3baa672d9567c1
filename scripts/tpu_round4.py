#!/usr/bin/env python
"""Round-4 TPU measurement session (run on the real chip when healthy):

1. HEADLINE refresh (25632^2 linear, tuned config) for comparability.
2. AFFINE WIDE SWEEP (VERDICT r3 #3): the round-3 affine champion came
   from a 9-point grid at fixed T/C/U. This sweeps (T, R, CB, U, C)
   properly — including CB=8 and the round-4 shortened F-chain cell —
   merges winners into swtpu_tuned_v5e.json, and emits a cycles/step
   decomposition table (the chain-decomposition evidence: either affine
   reaches ~model 1.5x of linear, or the table shows which term binds).
3. PAIRS PACKED (VERDICT r3 #4 done-criterion): 64 x 1056^2 effective
   GCUPS through pairs_packed_score_fn (target >= 20; round 3's pair
   grid measured 4.0) + the pair-grid comparison + a bigger shape.
4. PIPE STAGE OVERHEAD (VERDICT r3 #5): time single pipeline stages on a
   1-device mesh across block_rows, subtract the modeled fill, fit the
   per-stage overhead in model-cycles; prints the constant to bake into
   dispatch/plan.py (replacing the invented 50_000.0).
5. FLOOR DECOMPOSITION (VERDICT r3 Weak #4/#8 evidence): split the flat
   ~6 ms per-call mid-size time into dispatch vs fetch vs kernel by
   timing K back-to-back dispatches with one fetch at K in {1, 2, 10,
   50} for a tiny and a 4128^2 fill.
6. MIDSIZE REFRESH: 4128^2 / 8192^2 device rows at the bench K=10
   methodology, for the dead-zone crossover table next to
   bench_results/deadzone_r4_hostsimd.jsonl.
7. PROTEIN refresh: BLOSUM62+affine headline with the shortened F-chain.

Writes bench_results/round4_tpu.json (merge/rerun mode: pass step names
as argv to rerun only those). Run scripts/tpu_batch_sweep.py separately
for the batch|-signature entries (VERDICT r3 #2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/swtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_results",
                   "round4_tpu.json")
TUNED = os.path.join(os.path.dirname(__file__), "..",
                     "swtpu_tuned_v5e.json")
M = N = 25632
V5E_GHZ = 0.94                      # v5e TensorCore clock, for cyc/step


def probe(max_s=10.0):
    t0 = time.perf_counter()
    int(jnp.sum(jnp.arange(8)))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(jnp.sum(jnp.arange(9)))
    warm = time.perf_counter() - t0
    print(f"tunnel probe: cold {cold:.2f}s warm {warm:.2f}s", flush=True)
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


def _steps_for(T, R, CB, m, n):
    from swtpu.kernels.pallas_fill import _steps
    L = T // R
    return -(-n // T) * _steps(m, L, CB)


def headline(results):
    from swtpu.dispatch.autotune import _time_stripe

    best = _time_stripe(M, N, T=28672, C=128, R=32, CB=4, unroll=32,
                        repeats=3, k=10)
    results["headline"] = {
        "config": "T=28672 R=32 CB=4 U=32", "fill_s": round(best, 5),
        "gcups": round(M * N / best / 1e9, 1)}
    print("headline:", results["headline"], flush=True)


def affine_wide_sweep(results):
    """The widened affine grid + cycles/step decomposition."""
    from swtpu import Scoring
    from swtpu.dispatch import autotune
    from swtpu.dispatch.autotune import _time_stripe, scoring_sig
    from swtpu.kernels.pallas_fill import LANES

    aff = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    sig = scoring_sig(aff)
    pol = autotune.Policy(autotune.load(TUNED) or {"entries": []})
    rows = []
    grid = []
    # most promising regions first (the 64-config cap trims the tail):
    # deep register blocking, then the round-3 champion's neighborhood
    for U, C in ((32, 128), (16, 128), (32, 256)):
        for R in (32, 16, 8):
            for CB in (4, 2, 8, 1):
                for SUB in (7, 8, 14, 16, 4):
                    T = LANES * SUB * R
                    if T > N + LANES * R or T < 8192:
                        continue
                    T = min(T, -(-N // (LANES * R)) * LANES * R)
                    grid.append((T, R, CB, U, C))
    seen = set()
    for (T, R, CB, U, C) in grid:
        key = (T, R, CB, U, C)
        if key in seen:
            continue
        seen.add(key)
        if len(seen) > 64:              # bounded session
            break
        try:
            dt = _time_stripe(M, N, T=T, C=C, R=R, CB=CB, unroll=U,
                              repeats=2, k=5, scoring=aff)
        except Exception as e:
            print("  skip", key, type(e).__name__, flush=True)
            continue
        steps = _steps_for(T, R, CB, M, N)
        row = {"T": T, "R": R, "CB": CB, "U": U, "C": C,
               "fill_s": round(dt, 5),
               "gcups": round(M * N / dt / 1e9, 1),
               "cyc_per_step": round(dt * V5E_GHZ * 1e9 / steps, 1)}
        rows.append(row)
        pol.observe(M, N, "stripe", T=T, C=C, R=R, CB=CB, unroll=U,
                    seconds=dt, sig=sig, kind="sweep")
        print("  affine", row, flush=True)
    rows.sort(key=lambda r: -r["gcups"])
    results["affine_wide_sweep"] = rows[:24]
    autotune.save(pol.table, TUNED)
    print("affine champion:", rows[0] if rows else None, flush=True)
    # linear comparison anchor under the same session
    lin = _time_stripe(M, N, T=28672, C=128, R=32, CB=4, unroll=32,
                       repeats=2, k=5)
    results["affine_vs_linear"] = {
        "linear_gcups": round(M * N / lin / 1e9, 1),
        "affine_gcups": rows[0]["gcups"] if rows else None,
        "ratio": round(lin and (rows[0]["gcups"] /
                                (M * N / lin / 1e9)), 3) if rows else None,
        "model_ratio_op_count": "COST_LIN(10,10) vs COST_AFF(16,12)"}


def linear_cb8_probe(results):
    """Does deeper column blocking pay for linear at/beyond the headline
    size? The model says breakeven (~250+7*190 chain vs 2x cells/step of
    CB=4); measure instead of guessing."""
    from swtpu.dispatch.autotune import _time_stripe

    out = {}
    for size, T in ((25632, 28672), (65536, 65536)):
        for CB in (4, 8):
            try:
                dt = _time_stripe(size, size, T=min(T, 28672 if size <
                                                    30000 else 65536),
                                  C=128, R=32, CB=CB, unroll=32,
                                  repeats=2, k=5)
                out[f"{size}sq_CB{CB}"] = round(size * size / dt / 1e9, 1)
            except Exception as e:
                out[f"{size}sq_CB{CB}"] = f"failed: {type(e).__name__}"
            print("  cb8", size, CB, out[f"{size}sq_CB{CB}"], flush=True)
    results["linear_cb8_probe"] = out


def pairs_packed(results):
    from swtpu.core.encode import random_batch
    from swtpu.kernels.pallas_fill import (pairs_packed_score_fn,
                                           pairs_score_fn)

    out = {}
    for B, s in ((64, 1056), (64, 4096), (256, 1056)):
        a, b = random_batch(B, s, s, seed=0)
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        fn = pairs_packed_score_fn(B, s, s)
        np.asarray(fn(aj, bj)[0])
        dt = time_call(lambda: fn(aj, bj)[0])
        out[f"packed_{B}x{s}sq"] = {
            "fill_s": round(dt, 5),
            "gcups_effective": round(B * s * s / dt / 1e9, 1),
            "config": fn.config}
        print("  pairs", f"{B}x{s}", out[f"packed_{B}x{s}sq"], flush=True)
    # config mini-sweep at the bench shape: R (ramp = B*n/R) vs stripe
    # height (S*m term) vs the default heuristic
    B, s = 64, 1056
    a, b = random_batch(B, s, s, seed=0)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    for R, sub_ in ((32, 16), (32, 8), (16, 16), (32, 4)):
        try:
            fn = pairs_packed_score_fn(B, s, s, R=R, T=128 * sub_ * R)
            np.asarray(fn(aj, bj)[0])
            dt = time_call(lambda: fn(aj, bj)[0], k=5, repeats=2)
            out[f"cfg_R{R}_SUB{sub_}"] = round(B * s * s / dt / 1e9, 1)
        except Exception as e:
            out[f"cfg_R{R}_SUB{sub_}"] = f"failed: {type(e).__name__}"
        print("  pairs cfg", R, sub_, out[f"cfg_R{R}_SUB{sub_}"],
              flush=True)
    # grid comparison at the bench shape
    B, s = 64, 1056
    a, b = random_batch(B, s, s, seed=0)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    gfn = pairs_score_fn(B, s, s)
    np.asarray(gfn(aj, bj)[0])
    dt = time_call(lambda: gfn(aj, bj)[0])
    out["grid_64x1056sq"] = {"fill_s": round(dt, 5),
                             "gcups_effective":
                             round(B * s * s / dt / 1e9, 1)}
    results["pairs_packed"] = out


def pipe_stage_overhead(results):
    """Per-stage overhead of the pipeline stage program, measured on a
    1-device mesh: stage wall time minus the modeled block-fill time,
    across block_rows. Reported in seconds AND model-cycles (the unit
    dispatch/plan.PIPE_STAGE_OVERHEAD uses)."""
    from swtpu import Scoring
    from swtpu.dist.checkpoint import ResumablePipeline
    from swtpu.dist.mesh import pipeline_mesh
    from swtpu.kernels.pallas_fill import choose_params_cost

    mesh = pipeline_mesh(1)     # the real chip (axon may not name 'tpu')
    rows = []
    m = 8192                           # per-device columns
    for R in (256, 512, 1024, 2048):
        n = 16 * R                     # 16 stages
        rp = ResumablePipeline(mesh, m, n, block_rows=R,
                               stages_per_segment=8, scoring=Scoring(),
                               block_fill="stripe")
        sh = rp._sharding()
        a_sh = jax.device_put(
            np.random.default_rng(0).integers(0, 4, (1, m)).astype(np.int8),
            sh)
        b = np.random.default_rng(1).integers(0, 4, n).astype(np.int8)
        carry = rp.init()
        carry = rp.segment(a_sh, b, carry, 0)          # compile + warm
        jax.block_until_ready(carry["bs"])
        t0 = time.perf_counter()
        reps = 3
        for seg in range(1, 1 + reps):
            carry = rp.segment(a_sh, b, carry, seg % rp.num_segments)
        np.asarray(carry["bs"])
        per_stage = (time.perf_counter() - t0) / (reps * 8)
        # modeled fill cost of one (m x R) block in model cycles
        _, _, _, cost = choose_params_cost(m, R, affine=False)
        # convert model cycles -> seconds via the measured headline
        # anchor: the 25632^2 champion's modeled cost vs measured time
        # (a prior run may have left a 'failed: ...' STRING here)
        _, _, _, anchor_cost = choose_params_cost(M, N)
        head = results.get("headline")
        anchor_s = (head.get("fill_s", 0.0065)
                    if isinstance(head, dict) else 0.0065)
        s_per_model_cyc = anchor_s / anchor_cost
        fill_model_s = cost * s_per_model_cyc
        overhead_s = max(0.0, per_stage - fill_model_s)
        rows.append({"block_rows": R, "stage_s": round(per_stage, 6),
                     "modeled_fill_s": round(fill_model_s, 6),
                     "overhead_s": round(overhead_s, 6),
                     "overhead_model_cycles":
                     round(overhead_s / s_per_model_cyc, 0)})
        print("  stage", rows[-1], flush=True)
    med = sorted(r["overhead_model_cycles"] for r in rows)[len(rows) // 2]
    results["pipe_stage_overhead"] = {
        "rows": rows, "fitted_overhead_model_cycles": med,
        "action": "written to swtpu_pipe_overhead.json (the fit record "
                  "dispatch/plan.pipe_stage_overhead() loads)"}
    rec_path = os.path.join(os.path.dirname(__file__), "..",
                            "swtpu_pipe_overhead.json")
    with open(rec_path, "w") as f:
        json.dump({"fitted_overhead_model_cycles": med,
                   "fit_rows": rows,
                   "method": "per-stage wall time minus modeled block "
                             "fill, median across block_rows, 1-device "
                             "mesh on the real chip "
                             "(scripts/tpu_round4.py::pipe_stage_overhead)",
                   "date": time.strftime("%Y-%m-%d %H:%M")}, f, indent=1)
    print("fitted PIPE_STAGE_OVERHEAD =", med, "model cycles ->",
          rec_path, flush=True)


def floor_decomp(results):
    """Split the flat mid-size per-call time into dispatch vs fetch vs
    kernel: K back-to-back dispatches + ONE final fetch, K in
    {1, 2, 10, 50}; wall(K) ~ K*dispatch + kernel*K + fetch."""
    from swtpu.dispatch.autotune import _rand_inputs
    from swtpu.kernels import pallas_fill as pf
    from swtpu import Scoring

    out = {}
    for label, (m, n) in (("tiny_1056sq", (1056, 1056)),
                          ("mid_4128sq", (4128, 4128))):
        T, R, CB = pf.choose_params(m, n)
        a, b = _rand_inputs(m, n, None)
        ap, bt, _ = pf._build_inputs(a, b, T, 128, R, CB)
        apj, btj = jnp.asarray(ap), jnp.asarray(bt)
        kw = dict(scoring=Scoring(), T=T, R=R, C=128, CB=CB, m=m, n=n,
                  return_p=False, interpret=False, unroll=32)
        np.asarray(pf._stripe_call(apj, btj, **kw)[0])
        walls = {}
        for K in (1, 2, 10, 50):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K - 1):
                    pf._stripe_call(apj, btj, **kw)
                np.asarray(pf._stripe_call(apj, btj, **kw)[0])
                best = min(best, time.perf_counter() - t0)
            walls[K] = best
        # slope between K=10 and K=50 = per-dispatch cost incl. kernel;
        # intercept at K->0 = the one-time fetch/roundtrip
        slope = (walls[50] - walls[10]) / 40
        out[label] = {"wall_s_by_K": {k: round(v, 5)
                                      for k, v in walls.items()},
                      "per_dispatch_incl_kernel_s": round(slope, 6),
                      "one_time_fetch_s":
                      round(walls[10] - 10 * slope, 5),
                      "config": f"T={T} R={R} CB={CB}"}
        print("  floor", label, out[label], flush=True)
    results["floor_decomp"] = out
    # the tiny problem's single-call wall IS the device floor the
    # host-SIMD crossover derivation divides against
    # (core.config._device_floor_s) — commit the fit record
    rec_path = os.path.join(os.path.dirname(__file__), "..",
                            "swtpu_device_floor.json")
    with open(rec_path, "w") as f:
        json.dump({"floor_s": out["tiny_1056sq"]["wall_s_by_K"][1],
                   "method": "single dispatch+fetch of a 1056^2 stripe "
                             "fill, min of 3 "
                             "(scripts/tpu_round4.py::floor_decomp)",
                   "decomp": out,
                   "date": time.strftime("%Y-%m-%d %H:%M")}, f, indent=1)
    print("device floor ->", rec_path, flush=True)


def midsize_refresh(results):
    from swtpu.dispatch.autotune import _time_stripe
    from swtpu.kernels.pallas_fill import choose_params

    out = {}
    for s in (4128, 8192):
        T, R, CB = choose_params(s, s)
        dt = _time_stripe(s, s, T=T, C=128, R=R, CB=CB, unroll=32,
                          repeats=3, k=10)
        out[f"{s}sq"] = {"fill_s": round(dt, 5),
                         "gcups": round(s * s / dt / 1e9, 2),
                         "config": f"T={T} R={R} CB={CB}",
                         "host_simd_jsonl":
                         "bench_results/deadzone_r4_hostsimd.jsonl"}
        print("  midsize", s, out[f"{s}sq"], flush=True)
    results["midsize_refresh"] = out


def protein_refresh(results):
    from swtpu import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.dispatch.autotune import _time_stripe

    aff = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    dt = _time_stripe(M, N, T=28672, C=128, R=32, CB=4, unroll=32,
                      repeats=3, k=10, scoring=aff, substitution=BLOSUM62)
    results["protein_refresh"] = {
        "config": "T=28672 R=32 CB=4 U=32 BLOSUM62 packed",
        "gcups": round(M * N / dt / 1e9, 1)}
    print("protein:", results["protein_refresh"], flush=True)


def synth_mapping_workload(L=1_000_000, B=2000, qlen=100, seed=7,
                           err=0.02):
    """The mapping benchmark's shared workload (planted reads with 2%
    errors) — ONE definition so the CPU (scripts/map_cpu_warm.py) and
    TPU (map_refresh) figures stay comparable."""
    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, L).astype(np.int8)
    reads = []
    for _ in range(B):
        s = int(rng.integers(0, L - qlen))
        r = ref[s:s + qlen].copy()
        errs = rng.random(qlen) < err
        r[errs] = (r[errs] + rng.integers(1, 4, errs.sum())) % 4
        reads.append(r)
    return ref, reads


def map_refresh(results):
    """TPU-path mapping benchmark (VERDICT r4 #5): map_reads end-to-end
    on chip (batch stripe search + align_hits), cold + warm reads/s,
    same shape as bench_results/map_cpu_r4.json's 27.9/s CPU figure."""
    from swtpu.dist.mapping import map_reads

    L, B, qlen = 1_000_000, 2000, 100
    ref, reads = synth_mapping_workload(L, B, qlen)
    t0 = time.perf_counter()
    res = map_reads(ref, reads)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = map_reads(ref, reads)
    warm = time.perf_counter() - t0
    mapped = sum(1 for r in res.records if not r.is_unmapped)
    results["map_refresh"] = {
        "B": B, "qlen": qlen, "L": L, "mapped": mapped,
        "cold_s": round(cold, 2), "cold_reads_per_s": round(B / cold, 1),
        "warm_s": round(warm, 2), "warm_reads_per_s": round(B / warm, 1),
        "cpu_baseline": "bench_results/map_cpu_r4.json 27.9/s cold"}
    print("map:", results["map_refresh"], flush=True)


def amortize_probe(results):
    """score_many vs per-pair score() on mixed mid-size pairs (the
    VERDICT r4 #4 RTT amortization): K problems through shape-bucketed
    batch dispatches vs K sequential device round-trips."""
    from swtpu import score as _score, score_many
    from swtpu.core.encode import random_pair

    # min side > 10667 keeps the per-pair path OFF the host-SIMD tier
    # (int16 score cap), so both paths measure the device
    rng_shapes = [(16000, 15000), (15000, 16000), (14500, 15500),
                  (15500, 14500), (16300, 16300), (15000, 15000),
                  (16000, 16000), (14500, 16300)]
    pairs = [random_pair(m, n, seed=s) for s, (m, n) in
             enumerate(rng_shapes)] * 2                 # 16 problems
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    cells = sum(len(a) * len(b) for a, b in pairs)
    # warm both paths (compiles out of the timing)
    np.asarray(score_many(a_list, b_list).scores)
    per0 = [_score(a, b) for a, b in pairs]
    t0 = time.perf_counter()
    hits = score_many(a_list, b_list)
    sm = np.asarray(hits.scores)
    many_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    per = [_score(a, b) for a, b in pairs]
    per_s = time.perf_counter() - t0
    assert list(sm) == per == per0
    results["amortize_probe"] = {
        "K": len(pairs), "cells": cells,
        "score_many_s": round(many_s, 4),
        "per_pair_s": round(per_s, 4),
        "speedup": round(per_s / many_s, 2),
        "score_many_gcups_eff": round(cells / many_s / 1e9, 1),
        "per_pair_gcups_eff": round(cells / per_s / 1e9, 1)}
    print("amortize:", results["amortize_probe"], flush=True)


def main():
    if not probe():
        print("tunnel unhealthy; aborting (rerun later)", flush=True)
        sys.exit(2)
    only = set(sys.argv[1:])
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)      # merge mode
    results["date"] = time.strftime("%Y-%m-%d %H:%M")
    steps = [("headline", headline),
             ("pairs_packed", pairs_packed),
             ("affine_wide_sweep", affine_wide_sweep),
             ("floor_decomp", floor_decomp),
             ("midsize_refresh", midsize_refresh),
             ("pipe_stage_overhead", pipe_stage_overhead),
             ("protein_refresh", protein_refresh),
             ("linear_cb8_probe", linear_cb8_probe),
             ("map_refresh", map_refresh),
             ("amortize_probe", amortize_probe)]
    degraded = False
    for name, fn in steps:
        if only and name not in only:
            continue
        if not probe():
            results[name] = "skipped: tunnel degraded"
            print(f"{name}: tunnel degraded, skipping rest", flush=True)
            degraded = True
        else:
            try:
                fn(results)
            except Exception as e:
                results[name] = f"failed: {type(e).__name__}: {e}"
                print(name, "FAILED", e, flush=True)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        if degraded:
            break
    print("wrote", OUT, flush=True)
    if degraded:
        sys.exit(3)       # the watcher keeps watching and reruns later


if __name__ == "__main__":
    main()
