#!/usr/bin/env python
"""Round-3 TPU measurement session (run on the real chip when healthy):

1. CHAMPION COMPILE STUDY (VERDICT r2 #5): healthy cold-compile seconds
   AND warm GCUPS for the shipped champion (T=28672, R=32, CB=4, U=32)
   and its near-peers (R=16/CB=2 class, U=8/16 diets) at 25632^2, with a
   FRESH persistent-cache dir so the numbers are true cold compiles.
2. SCORING-AWARE SWEEPS (VERDICT r2 #3): autotune.sweep for affine and
   BLOSUM62(+affine) signatures at {8192, 25632}; merged into
   swtpu_tuned_v5e.json via the sig-keyed Policy.merge.
3. STRIPE-SPEED PROTEIN LEAN TRACEBACK (VERDICT r2 #1b): BLOSUM62+affine
   windowed alignment wall time at a mega window.
4. PAIRS-SMALL EFFECTIVE RATE (VERDICT r2 #8): 64 x 1056^2 in one
   dispatch vs the ~6 ms per-call floor.
5. Headline refresh for comparability.

Writes bench_results/round3_tpu.json; refreshes swtpu_tuned_v5e.json.
Aborts early if the tunnel probe is unhealthy (>10 s warm fetch).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# fresh persistent-cache dir: compile numbers must be true cold compiles
_CACHE = tempfile.mkdtemp(prefix="swtpu-r3-cache-")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_results",
                   "round3_tpu.json")


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


def compile_study(results):
    """Cold compile + warm rate for the champion and near-peer configs."""
    from swtpu import Scoring
    from swtpu.core.encode import random_pair
    from swtpu.kernels import pallas_fill as pf

    M = N = 25632
    a, b = random_pair(M, N, seed=0)
    rows = []
    # (T, R, CB, U): champion; R-diet; U-diets at champion blocking;
    # round-1 classic
    for T, R, CB, U in ((28672, 32, 4, 32), (25632, 16, 2, 32),
                        (28672, 32, 4, 16), (28672, 32, 4, 8),
                        (26624, 8, 2, 32)):
        T = min(-(-T // (128 * R)) * 128 * R,
                -(-N // (128 * R)) * 128 * R)
        C = pf.DEFAULT_CHUNK
        ap, bt, _ = pf._build_inputs(a, b, T, C, R, CB)
        apj, btj = jnp.asarray(ap), jnp.asarray(bt)
        kw = dict(scoring=Scoring(), T=T, R=R, C=C, CB=CB, m=M, n=N,
                  return_p=False, interpret=False, unroll=U)
        t0 = time.perf_counter()
        np.asarray(pf._stripe_call(apj, btj, **kw)[0])
        compile_s = time.perf_counter() - t0
        fill = time_call(lambda: pf._stripe_call(apj, btj, **kw)[0])
        rows.append({"T": T, "R": R, "CB": CB, "U": U,
                     "compile_s": round(compile_s, 1),
                     "fill_s": round(fill, 5),
                     "gcups": round(M * N / fill / 1e9, 1)})
        print("compile_study", rows[-1], flush=True)
    results["compile_study"] = rows


def scoring_sweeps(results):
    """Affine + BLOSUM62 tuned entries, merged into the persisted table."""
    from swtpu import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.dispatch import autotune

    aff = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    tables = {}
    tables["affine"] = autotune.sweep(
        sizes=(8192, 25632), r_candidates=(8, 16, 32),
        cb_candidates=(1, 2, 4), unrolls=(32,), scoring=aff)
    tables["protein"] = autotune.sweep(
        sizes=(8192, 25632), r_candidates=(8, 16, 32),
        cb_candidates=(1, 2, 4), unrolls=(32,), scoring=aff,
        substitution=BLOSUM62)
    results["scoring_sweeps"] = tables

    path = os.path.join(os.path.dirname(__file__), "..",
                        "swtpu_tuned_v5e.json")
    pol = autotune.Policy(autotune.load(path) or {"entries": []})
    for t in tables.values():
        pol.merge(t)
    autotune.save(pol.table, path)
    print("merged tuned table ->", path, flush=True)


def sweep_refresh(results):
    """Refresh stale / missing tuned rows with healthy measurements.

    The committed linear 25632^2 row (73.2 GCUPS) was measured through a
    degraded tunnel — the compile study reproduces 101.3 for the same
    config healthy — and the big-matrix affine/protein signatures have
    no entries at all, so large protein pipelines dispatch on linear
    rows. Stripe-only: at 65536^2 the scan plan costs minutes/dispatch
    and never wins.
    """
    from swtpu import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.dispatch import autotune
    from swtpu.kernels.pallas_fill import LANES

    lin = Scoring()
    aff = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    jobs = [  # (m, n, scoring, substitution, (T,R,CB,U) candidates)
        (25632, 25632, lin, None,
         ((28672, 32, 4, 32), (26624, 16, 2, 32))),
        (65536, 65536, aff, None,
         ((65536, 32, 4, 32), (65536, 16, 2, 32))),
        (65536, 65536, aff, BLOSUM62,
         ((65536, 32, 4, 32), (65536, 16, 2, 32))),
    ]
    table = {"entries": []}
    out = []
    for m, n, sc, sub, cands in jobs:
        sig = autotune.scoring_sig(sc, sub)
        rows = []
        for T, R, CB, U in cands:
            T = min(-(-T // (LANES * R)) * LANES * R,
                    -(-n // (LANES * R)) * LANES * R)
            try:
                dt = autotune._time_stripe(m, n, T, 128, R=R, CB=CB,
                                           unroll=U, scoring=sc,
                                           substitution=sub)
            except Exception as e:
                print("sweep_refresh skip", sig, (T, R, CB, U), e,
                      flush=True)
                continue
            rows.append({"plan": "stripe", "T": T, "R": R, "CB": CB,
                         "C": 128, "unroll": U, "s": dt,
                         "gcups": autotune.gcups(m * n, dt),
                         "kind": "sweep"})
            print(f"sweep_refresh {m}x{n} [{sig}] T={T} R={R} CB={CB} "
                  f"U={U}: {rows[-1]['gcups']:.1f} GCUPS", flush=True)
        if not rows:
            continue
        best = max(rows, key=lambda r: r["gcups"])
        table["entries"].append({"m": m, "n": n, "sig": sig,
                                 "best": best, "all": rows})
        out.append({"m": m, "n": n, "sig": sig,
                    "best_gcups": round(best["gcups"], 1),
                    "best_cfg": (best["T"], best["R"], best["CB"],
                                 best["unroll"])})
    results["sweep_refresh"] = out

    path = os.path.join(os.path.dirname(__file__), "..",
                        "swtpu_tuned_v5e.json")
    pol = autotune.Policy(autotune.load(path) or {"entries": []})
    pol.merge(table)
    autotune.save(pol.table, path)
    print("merged tuned table ->", path, flush=True)


def protein_lean_traceback(results):
    """Stripe-speed BLOSUM62+affine windowed traceback (VERDICT #1b)."""
    from swtpu import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.engine import traceback as tb

    from swtpu.core.encode import PROTEIN_ALPHABET

    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    n = m = 12800
    rng = np.random.default_rng(0)
    a = rng.integers(0, 20, m).astype(np.int8)
    b = rng.integers(0, 20, n).astype(np.int8)
    b[100:m - 100] = a[100:m - 100]     # long homology => mega window
    t0 = time.perf_counter()
    got = tb.windowed(a, b, sc, sub=BLOSUM62, alphabet=PROTEIN_ALPHABET)
    cold = time.perf_counter() - t0
    assert got is not None
    t0 = time.perf_counter()
    got = tb.windowed(a, b, sc, sub=BLOSUM62, alphabet=PROTEIN_ALPHABET)
    warm = time.perf_counter() - t0
    score = got[0]
    results["protein_lean_traceback"] = {
        "m": m, "n": n, "score": int(score),
        "cold_s": round(cold, 2), "warm_s": round(warm, 2)}
    print("protein_lean_traceback", results["protein_lean_traceback"],
          flush=True)


def pairs_small(results):
    from swtpu.core.encode import random_batch
    from swtpu.kernels.pallas_fill import pairs_score_fn

    B, mp = 64, 1056
    a, b = random_batch(B, mp, mp, seed=0)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    fn = pairs_score_fn(B, mp, mp)
    t0 = time.perf_counter()
    np.asarray(fn(aj, bj)[0])
    compile_s = time.perf_counter() - t0
    best = time_call(lambda: fn(aj, bj)[0])
    results["pairs_small"] = {
        "B": B, "m": mp, "compile_s": round(compile_s, 1),
        "dispatch_s": round(best, 4),
        "effective_gcups": round(B * mp * mp / best / 1e9, 1),
        "single_call_floor_gcups_r2": 0.18}
    print("pairs_small", results["pairs_small"], flush=True)


def headline(results):
    from swtpu import Scoring
    from swtpu.core.encode import random_pair
    from swtpu.kernels import pallas_fill as pf

    M = N = 25632
    a, b = random_pair(M, N, seed=0)
    T, R, CB = pf.choose_params(M, N)
    C = pf.DEFAULT_CHUNK
    ap, bt, _ = pf._build_inputs(a, b, T, C, R, CB)
    apj, btj = jnp.asarray(ap), jnp.asarray(bt)
    kw = dict(scoring=Scoring(), T=T, R=R, C=C, CB=CB, m=M, n=N,
              return_p=False, interpret=False, unroll=32)
    np.asarray(pf._stripe_call(apj, btj, **kw)[0])
    fill = time_call(lambda: pf._stripe_call(apj, btj, **kw)[0])
    results["headline"] = {"gcups": round(M * N / fill / 1e9, 1),
                           "config": (T, R, CB)}
    print("headline", results["headline"], flush=True)


def main():
    if not probe():
        print("tunnel unhealthy; aborting (rerun later)", flush=True)
        sys.exit(2)
    only = set(sys.argv[1:])
    results = {}
    if only and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)      # rerun mode: merge into prior results
    results.update({"date": time.strftime("%Y-%m-%d %H:%M"),
                    "cache_dir": _CACHE})
    steps = [("compile_study", compile_study),
             ("headline", headline),
             ("pairs_small", pairs_small),
             ("protein_lean_traceback", protein_lean_traceback),
             ("scoring_sweeps", scoring_sweeps),
             ("sweep_refresh", sweep_refresh)]
    for name, fn in steps:
        if only and name not in only:
            continue
        if not probe():
            results[name] = "skipped: tunnel degraded"
            print(f"{name}: tunnel degraded, skipping rest", flush=True)
            break
        try:
            fn(results)
        except Exception as e:
            results[name] = f"failed: {type(e).__name__}: {e}"
            print(name, "FAILED", e, flush=True)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
