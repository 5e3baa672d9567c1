"""Adaptive execution-plan dispatch — the v7/v8 analog.

The reference picks serial / CPU-parallel / GPU per *diagonal* with fixed
thresholds (omp_smithW-v7-adaptive.cpp:106-107,303-397) or an Apollo-learned
policy (omp_smithW-v8-apollo.cpp:304-420). Under XLA the whole fill is one
compiled program, so the dispatch granularity is the *problem*, not the
diagonal. Three tiers mirror v7's serial/CPU/GPU ladder:

* 'scan'     — small problems run the XLA scan plan (lower launch overhead);
* 'stripe'   — large single-chip problems run the Pallas stripe kernel;
* 'pipeline' — problems beyond the single-kernel width cap go to the
  multi-chip sequence-parallel pipeline (dist/pipeline.py).

When a persisted autotune table is available (the Apollo analog), dispatch
returns the *measured best executed configuration* — plan AND the stripe
kernel's (T, R, CB, C, unroll) — not just a plan name; `align()`/`score()`
run exactly that config. Live timed paths feed `Policy.observe` (the
region->end() analog, omp_smithW-v8-apollo.cpp:420) so the table keeps
learning online.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax

from ..core.config import EngineConfig, Scoring


def current_platform() -> str:
    """Platform computations actually land on (respects jax_default_device,
    which the tests use to pin virtual CPU devices — jax.default_backend()
    alone would still claim 'tpu' under the axon plugin)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


@dataclasses.dataclass(frozen=True)
class ExecPlan:
    """A fully resolved execution decision: the plan tier plus the stripe
    kernel configuration to run (None fields = engine cost-model choice).
    `source` records whether a measured table or the static thresholds
    decided — the v8-vs-v7 distinction."""

    plan: str                      # 'host' | 'scan' | 'stripe' | 'pipeline'
    T: Optional[int] = None
    R: Optional[int] = None
    CB: Optional[int] = None
    C: Optional[int] = None
    unroll: Optional[int] = None
    source: str = "threshold"      # 'threshold' | 'tuned'


_policy_cache = {"loaded": False, "policy": None}

# Pipeline-tier profit projection constants. The per-stage overhead charges
# the halo ppermute + stage-loop bookkeeping in the cost model's cycle
# units; the margin requires a clearly-better projection before leaving
# the measured single-chip path, because multi-chip rates cannot be
# measured in a single-chip environment (the pipeline itself is
# CPU-mesh-tested). PIPE_STAGE_OVERHEAD_FALLBACK is the pre-measurement
# projection; the MEASURED constant comes from the committed fit record
# (scripts/tpu_round4.py::pipe_stage_overhead -> swtpu_pipe_overhead.json:
# per-stage wall time minus modeled block fill, median across block_rows,
# on the real chip) via `pipe_stage_overhead()`.
PIPE_STAGE_OVERHEAD_FALLBACK = 50_000.0
PIPE_MIN_SPEEDUP = 1.5

_pipe_overhead_cache = {"loaded": False, "value": None, "source": "fallback"}


def pipe_stage_overhead() -> float:
    """Per-stage pipeline overhead in model cycles: the fitted constant
    from the on-chip fit record when one is committed (env
    SWTPU_PIPE_OVERHEAD_RECORD or swtpu_pipe_overhead.json beside the
    tuned table / CWD), else the documented fallback projection."""
    if not _pipe_overhead_cache["loaded"]:
        _pipe_overhead_cache["loaded"] = True
        from ..core.config import load_fit_record
        v = load_fit_record("SWTPU_PIPE_OVERHEAD_RECORD",
                            "swtpu_pipe_overhead.json",
                            "fitted_overhead_model_cycles")
        if v is not None:
            _pipe_overhead_cache["value"] = v
            _pipe_overhead_cache["source"] = "fit record"
    v = _pipe_overhead_cache["value"]
    return PIPE_STAGE_OVERHEAD_FALLBACK if v is None else v


def local_tpu_devices() -> int:
    """Number of attached TPU chips this process could mesh over."""
    try:
        return len([d for d in jax.devices() if d.platform == "tpu"])
    except Exception:
        return 1


def pipeline_projection(m: int, n: int, D: int,
                        scoring: Optional[Scoring] = None,
                        block_rows: Optional[int] = None) -> tuple:
    """(projected speedup, best block_rows) of the D-chip
    sequence-parallel pipeline over the single-chip stripe kernel, from
    the measured per-step cost model
    (kernels.pallas_fill.choose_params_cost): stages x per-stage block
    cost (+ overhead) vs one whole-matrix fill, maximized over the
    block-row grid. The v7 analog gated the GPU tier by measured benefit
    (omp_smithW-v7-adaptive.cpp:106-107,328-397); here the benefit is
    projected because only one chip is attachable at tuning time. The
    model says what the measured numbers say: below ~10^5-wide problems
    a single max-T stripe already amortizes the whole wavefront (the
    serial chain is per-step, lane-count-free), so the mesh only wins
    once the vector-throughput term binds — mega-matrices."""
    from ..kernels.pallas_fill import choose_params_cost
    if D < 2:
        return 0.0, 0
    affine = scoring.is_affine if scoring is not None else False
    single = choose_params_cost(m, n, affine=affine)[3]
    mc = max(m // D, 1)
    if block_rows:
        cands = (block_rows,)
    else:
        # geometric block-rows grid scaled to the problem (replaces the
        # round-3 hardcoded list, VERDICT r3 #5): from one stripe-height
        # block up to n/D (fewer blocks than devices leaves chips idle)
        hi = max(4096, n // D)
        cands = tuple(4096 << k for k in range(8) if 4096 << k <= hi) \
            or (4096,)
    best, best_br = 0.0, 0
    for br in cands:
        br = min(br, n)
        nblocks = -(-n // br)
        stage_cost = choose_params_cost(mc, br, affine=affine)[3] \
            + pipe_stage_overhead()
        speedup = single / ((nblocks + D - 1) * stage_cost)
        if speedup > best:
            best, best_br = speedup, br
    return best, best_br


def _tuned_policy(create: bool = False):
    """Lazily load the persisted autotune table (the Apollo analog): the
    SWTPU_TUNED_TABLE env var wins, else the default filenames in the
    working directory. With create=True, returns a fresh in-memory Policy
    when no table exists, so live observations accumulate (online v8 mode
    without a prior sweep)."""
    if not _policy_cache["loaded"]:
        _policy_cache["loaded"] = True
        import os
        from .autotune import Policy, load
        cands = [os.environ.get("SWTPU_TUNED_TABLE"),
                 "swtpu_tuned.json", "swtpu_tuned_v5e.json"]
        for c in cands:
            if c:
                table = load(c)
                if table:
                    _policy_cache["policy"] = Policy(table)
                    break
    if create and _policy_cache["policy"] is None:
        from .autotune import Policy
        _policy_cache["policy"] = Policy()
    return _policy_cache["policy"]


def _sanitize(e: dict, m: int, n: int) -> Optional[ExecPlan]:
    """Validate a tuned table row against this problem's constraints; the
    kernel would reject invalid combos, so dispatch must never emit one."""
    from ..kernels.pallas_fill import DEFAULT_CHUNK, LANES
    plan = e.get("plan", "stripe")
    if plan != "stripe":
        return ExecPlan(plan, source="tuned")
    T, R, CB = e.get("T"), e.get("R"), e.get("CB")
    C, unroll = e.get("C"), e.get("unroll")
    if R is not None and (R & (R - 1) or R < 1):
        return None
    if CB is not None and (CB & (CB - 1) or CB < 1):
        return None
    if T is not None:
        R_ = R or 1
        T = -(-T // (LANES * R_)) * LANES * R_    # multiple of 128*R
    if C is not None and C % LANES:
        C = DEFAULT_CHUNK
    # unroll must divide the FINAL C (checked after any C replacement)
    if unroll is not None and (C or DEFAULT_CHUNK) % unroll:
        unroll = None                             # let the engine re-derive
    return ExecPlan("stripe", T=T, R=R, CB=CB, C=C, unroll=unroll,
                    source="tuned")


def choose_exec(m: int, n: int, config: EngineConfig = EngineConfig(),
                scoring: Optional[Scoring] = None,
                substitution=None) -> ExecPlan:
    """Resolve the execution plan AND kernel configuration for a single-pair
    problem of m cols, n rows.

    Tier order: beyond the single-kernel width cap -> 'pipeline'
    (m > MAX_WIDTH: the Q stream + boundary ring no longer fit VMEM; the
    multi-chip column-stripe pipeline splits m across devices). Otherwise,
    measured-cost dispatch when a tuned table has a near-enough entry OF
    THE SAME SCORING SIGNATURE (the v8/Apollo analog — Apollo's model is
    per-region; a linear-DNA champion must not land on BLOSUM+affine);
    static size thresholds else (the v7 analog)."""
    from ..kernels.pallas_fill import MAX_WIDTH
    cells = m * n
    if m > MAX_WIDTH:
        return ExecPlan("pipeline")
    # serial host tier (the v7 "serial if small" branch,
    # omp_smithW-v7-adaptive.cpp:304-314): below this size the native C
    # fill finishes before a device dispatch would even return. The very
    # first available() of a process may build the library (~2 s,
    # once per checkout); every later call is a cached-bool read.
    if cells <= config.host_max_cells and config.band is None:
        from ..runtime_native import available
        if available():
            return ExecPlan("host")
    if current_platform() != "tpu":
        return ExecPlan("scan")
    if scoring is not None:
        from ..kernels.pallas_fill import (_penalties_negative,
                                           _sub_gaps_ok)
        ok = (_sub_gaps_ok(scoring) if substitution is not None
              else _penalties_negative(scoring))
        if not ok:
            return ExecPlan("scan")
    # profit-gated pipeline tier BELOW the width cap (the v7 benefit
    # gate): with D >= 2 attached chips and a projected >= PIPE_MIN_SPEEDUP
    # from the cost model, the mesh wins even though one kernel would fit
    D = local_tpu_devices()
    if D >= 2 \
            and pipeline_projection(m, n, D, scoring)[0] >= PIPE_MIN_SPEEDUP:
        return ExecPlan("pipeline", source="projected")
    pol = _tuned_policy()
    if pol is not None:
        from .autotune import scoring_sig
        e = pol.choose_near(m, n, sig=scoring_sig(scoring, substitution))
        if e is not None:
            got = _sanitize(e, m, n)
            if got is not None:
                return got
    if cells <= config.scan_max_cells:
        return ExecPlan("scan")
    return ExecPlan("stripe")


def choose_plan(m: int, n: int, config: EngineConfig = EngineConfig()) -> str:
    """Plan-name-only view of choose_exec (back-compat surface)."""
    return choose_exec(m, n, config).plan


def observe(m: int, n: int, plan: str, seconds: float, T=None, R=None,
            CB=None, C=None, unroll=None, sig: str = "linear") -> None:
    """Feed a live measured timing back into the session policy — the
    Apollo region->end() analog (omp_smithW-v8-apollo.cpp:420). Called by
    the engine's warm timed paths; accumulates in memory and, when
    SWTPU_AUTOTUNE_PERSIST names a file, auto-saves at process exit with
    a disk-table merge (the APOLLO_CROSS_EXECUTION analog,
    run-v8.sh:15)."""
    pol = _tuned_policy(create=True)
    pol.observe(m, n, plan, T, C, seconds, R=R, CB=CB, unroll=unroll,
                sig=sig)
    _register_autopersist()


def session_policy():
    """The live Policy (loaded table + online observations), or None."""
    return _tuned_policy()


_persist_state = {"registered": False}


def persist_session_policy(path: Optional[str] = None) -> Optional[str]:
    """Merge the session policy's table into the one at ``path`` (env
    SWTPU_AUTOTUNE_PERSIST when omitted) and save. Returns the path
    written, or None when there is nothing to persist. Merge semantics:
    per (m, n, sig) the better-GCUPS best wins, so two processes
    alternating cannot lose each other's measurements."""
    import os
    path = path or os.environ.get("SWTPU_AUTOTUNE_PERSIST")
    pol = _policy_cache["policy"]
    if not path or pol is None or not pol.table \
            or not pol.table.get("entries"):
        return None
    from .autotune import Policy, load, save
    merged = Policy({"entries": []})
    merged.merge(load(path))
    merged.merge(pol.table)
    save(merged.table, path)
    return path


def _register_autopersist() -> None:
    import atexit
    import os
    if _persist_state["registered"] \
            or not os.environ.get("SWTPU_AUTOTUNE_PERSIST"):
        return
    _persist_state["registered"] = True
    atexit.register(persist_session_policy)
