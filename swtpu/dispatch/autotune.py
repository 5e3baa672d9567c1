"""Autotuning — the TPU-native analog of tuneCutoff.sh and Apollo.

The reference tunes its serial/parallel CUTOFF by sed-rewriting parameters.h
and rebuilding over {1..1024} (tuneCutoff.sh:1-15), and v8 delegates the
per-diagonal policy to Apollo's measured-timing model
(omp_smithW-v8-apollo.cpp:304-420). Here tuning is runtime:

* `sweep()` measures GCUPS over a grid of (plan, stripe T, chunk C) on the
  live device and returns the winners per problem size;
* `save()/load()` persist the tuned table as JSON (no rebuilds);
* `Policy` is the Apollo analog: it picks the plan for a problem size from
  the tuned table (nearest measured size), and can update online from
  observed timings — measured cost replaces the hand-set thresholds.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.config import EngineConfig, Scoring
from ..instrument.metrics import gcups


def _time_stripe(m: int, n: int, T: int, C: int, R: int = 1,
                 CB: int = 1, unroll: int = 1, repeats: int = 2,
                 k: int = 5) -> float:
    from ..core.encode import random_pair
    from ..kernels import pallas_fill as pf

    a, b = random_pair(m, n, seed=0)
    ap, bt, _ = pf._build_inputs(a, b, T, C, R, CB)
    apj, btj = jnp.asarray(ap), jnp.asarray(bt)
    kw = dict(scoring=Scoring(), T=T, R=R, C=C, CB=CB, m=m, n=n,
              unroll=unroll, return_p=False,
              interpret=pf._interpret_default())
    np.asarray(pf._stripe_call(apj, btj, **kw)[0])    # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            pf._stripe_call(apj, btj, **kw)
        np.asarray(pf._stripe_call(apj, btj, **kw)[0])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def _time_scan(m: int, n: int, repeats: int = 2, k: int = 3) -> float:
    from ..core.encode import random_pair
    from ..kernels.scan_fill import scan_fill

    a, b = random_pair(m, n, seed=0)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    int(scan_fill(aj, bj).max_score)                  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            scan_fill(aj, bj)
        int(scan_fill(aj, bj).max_score)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def sweep(sizes=(512, 2048, 8192, 25632),
          r_candidates=(1, 4, 8, 16, 32),
          cb_candidates=(1, 2, 4),
          c_candidates=(128,),
          unrolls=(8, 32),
          verbose: bool = True,
          allow_non_tpu: bool = False) -> dict:
    """Measure all plans over the size grid; returns the tuned table.

    ``sizes`` entries are square side lengths (int) or rectangular
    ``(m, n)`` tuples — the reference sweeps both grids
    ({32..26000..512} square, 2000 x {2..150000..5000} rect; run-v0.sh).
    Refuses to run off-TPU by default: timing interpreter-mode kernels
    would persist a garbage table that dispatch then trusts."""
    from ..kernels.pallas_fill import LANES, choose_params
    from .plan import current_platform

    if not allow_non_tpu and current_platform() != "tpu":
        raise RuntimeError(
            f"autotune.sweep measures the live device; refusing to tune on "
            f"platform {current_platform()!r} (pass allow_non_tpu=True to "
            f"override, e.g. for CI smoke tests)")

    table = {"entries": []}
    for s in sizes:
        m, n = (s, s) if isinstance(s, int) else (int(s[0]), int(s[1]))
        rows = []
        dt = _time_scan(m, n)
        rows.append({"plan": "scan", "T": None, "R": None, "CB": None,
                     "C": None, "unroll": None, "s": dt,
                     "gcups": gcups(m * n, dt)})
        tried = set()
        for R in r_candidates:
            Tc, _, _ = choose_params(m, n, r_max=R, cb_max=1)
            Tc = -(-Tc // (LANES * R)) * LANES * R
            Tc = min(Tc, -(-n // (LANES * R)) * LANES * R)
            for CB in cb_candidates:
                for C in c_candidates:
                    for U in unrolls:
                        if C % U or (Tc, R, CB, C, U) in tried:
                            continue
                        tried.add((Tc, R, CB, C, U))
                        try:
                            dt = _time_stripe(m, n, Tc, C, R=R, CB=CB,
                                              unroll=U)
                        except Exception:
                            continue
                        rows.append({"plan": "stripe", "T": Tc, "R": R,
                                     "CB": CB, "C": C, "unroll": U, "s": dt,
                                     "gcups": gcups(m * n, dt)})
        best = max(rows, key=lambda r: r["gcups"])
        table["entries"].append({"m": m, "n": n, "best": best, "all": rows})
        if verbose:
            print(f"size {s}: best {best['plan']} T={best['T']} "
                  f"R={best['R']} CB={best['CB']} C={best['C']} "
                  f"U={best['unroll']} {best['gcups']:.1f} GCUPS")
    return table


def save(table: dict, path="swtpu_tuned.json") -> None:
    Path(path).write_text(json.dumps(table, indent=1))


def load(path="swtpu_tuned.json") -> Optional[dict]:
    p = Path(path)
    return json.loads(p.read_text()) if p.exists() else None


@dataclasses.dataclass
class Policy:
    """Measured-cost plan selector (the Apollo analog: the model is a table
    of observed timings instead of hand thresholds; `observe` updates it
    online the way region->end() feeds Apollo's model)."""

    table: Optional[dict] = None

    def choose_near(self, m: int, n: int, max_cells_ratio: float = 6.0,
                    max_aspect_ratio: float = 4.0) -> Optional[dict]:
        """Best measured config of the nearest entry in (cells, aspect)
        log-space, or None when nothing is near enough — shape matters
        (the engine's transpose trick is worth ~2x on thin problems), so a
        2000 x 145002 rectangle must not silently resolve to a square
        entry, and a tiny problem must not inherit a 25632^2 config."""
        import math
        if not self.table or not self.table.get("entries"):
            return None
        cells, aspect = m * n, m / n

        def dist(e):
            dc = abs(math.log(max(e["m"] * e["n"], 1) / cells))
            da = abs(math.log((e["m"] / e["n"]) / aspect))
            return dc, da

        entry = min(self.table["entries"], key=lambda e: sum(dist(e)))
        dc, da = dist(entry)
        # tuned T is size-specific (a 25632^2-tuned stripe height applied
        # to 65536^2 would force 3 stripes where one is optimal), so the
        # cells gate is deliberately tight; beyond it the engine's cost
        # model generalizes better than a transferred config
        if dc > math.log(max_cells_ratio) or da > math.log(max_aspect_ratio):
            return None
        return dict(entry["best"])

    def choose(self, m: int, n: int) -> dict:
        got = self.choose_near(m, n)
        if got is not None:
            return got
        from .plan import choose_plan
        return {"plan": choose_plan(m, n), "T": None, "R": None,
                "CB": None, "C": None, "unroll": None}

    def observe(self, m: int, n: int, plan: str, T, C, seconds: float,
                R=None, CB=None, unroll=None):
        if self.table is None:
            self.table = {"entries": []}
        row = {"plan": plan, "T": T, "R": R, "CB": CB, "C": C,
               "unroll": unroll, "s": seconds,
               "gcups": gcups(m * n, seconds)}
        for e in self.table["entries"]:
            if e["m"] == m and e["n"] == n:
                e["all"].append(row)
                if len(e["all"]) > 64:       # bounded history: every warm
                    del e["all"][:-64]       # align() call observes
                if row["gcups"] > e["best"]["gcups"]:
                    e["best"] = row
                return
        self.table["entries"].append({"m": m, "n": n, "best": row,
                                      "all": [row]})
