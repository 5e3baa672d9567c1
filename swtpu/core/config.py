"""Scoring model and framework configuration.

TPU-native re-design of the reference's compile-time configuration surface:

* the reference hard-codes ``matchScore=3 / missmatchScore=-3 / gapScore=-2``
  as globals (``serial_smithW.c:59-61``) and predecessor codes
  ``NONE/UP/LEFT/DIAGONAL = 0/1/2/3`` (``serial_smithW.c:23-27``);
* ``parameters.h`` holds the serial-vs-parallel ``CUTOFF=1024`` knob and the
  print-only ``FACTOR=128``;
* v7's adaptive thresholds ``MEDIUM=10240 / LARGE=20480`` live at
  ``omp_smithW-v7-adaptive.cpp:106-107``.

Here all of that is *runtime* configuration carried by frozen dataclasses so it
can flow through ``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Predecessor codes — parity contract with the reference constant block
# (serial_smithW.c:23-27). The traceback marks path cells by negation
# (PATH = -1 multiplier, serial_smithW.c:274).
NONE = 0
UP = 1
LEFT = 2
DIAGONAL = 3
PATH = -1
# Affine traceback state bits OR'd into P (capability extension; the
# reference is linear-gap only): E/F at this cell chose gap EXTENSION
# (ties prefer extension). Needed for exact Gotoh alignment strings.
E_EXT = 4
F_EXT = 8


@dataclasses.dataclass(frozen=True)
class Scoring:
    """Substitution + gap model.

    ``mode='linear'`` reproduces the reference exactly (one gap penalty,
    serial_smithW.c:61,195-198). ``mode='affine'`` adds Gotoh H/E/F
    recurrences (gap_open charged on opening, gap_extend per extension) —
    a capability extension called for by the TPU build's north star.
    """

    match: int = 3
    mismatch: int = -3
    gap: int = -2                 # linear gap penalty (mode='linear')
    gap_open: int = -4            # affine: cost of the first gap position
    gap_extend: int = -1          # affine: cost of each further gap position
    mode: str = "linear"          # 'linear' | 'affine'

    def __post_init__(self):
        if self.mode not in ("linear", "affine"):
            raise ValueError(f"unknown gap mode {self.mode!r}")

    @property
    def is_affine(self) -> bool:
        return self.mode == "affine"


# The reference's built-in golden example (Wikipedia): a="TGTTACGG",
# b="GGTTGACTA" (serial_smithW.c:107-124). Invariants: global max score 13 at
# padded row-major index 69 (i=7, j=6 with m=9 padded columns), bottom-right
# cell H[last]==7 (omp_smithW-v1-refinedOrig.cpp:229-238).
BUILTIN_A = "TGTTACGG"
BUILTIN_B = "GGTTGACTA"
BUILTIN_MAX_SCORE = 13
BUILTIN_MAX_POS = 69          # row-major index in the padded (n+1)x(m+1) matrix
BUILTIN_LAST_CELL = 7


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Execution-plan configuration (the parameters.h / v7-threshold analog).

    Thresholds are in *cells* (m*n) unless noted. ``dispatch/autotune.py`` can
    rewrite these from measured GCUPS — the ``tuneCutoff.sh`` analog, but at
    runtime instead of sed-rebuild.
    """

    # tiny problems run the native serial fill ON HOST (csrc sw_fill —
    # the reference's v0/serial tier as a dispatch backend,
    # omp_smithW-v7-adaptive.cpp:304-314's "serial if small" analog): a
    # device dispatch costs more than the whole fill below this size
    # (measured: 64^2 native ~80 us vs >=200 us dispatch+fetch on a local
    # chip, multi-ms through a tunnel — raise this for remote/tunneled
    # deployments where the floor is larger).
    host_max_cells: int = 1 << 13
    # SCORE-ONLY requests below this many cells run the striped AVX2 host
    # fill (csrc sw_score_simd: 6.5-8.5 GCUPS on one core) — the mid-size
    # dead-zone fix (VERDICT r3 #6): between host_max_cells and where the
    # stripe kernel amortizes its per-dispatch floor, the host SIMD fill
    # finishes before a device dispatch would even return (1056^2 in
    # 0.17 ms vs a ~6 ms tunnel floor). None (the default) DERIVES the
    # crossover on this host: measured per-core SIMD rate (one-time
    # ~1 ms probe, runtime_native.measured_simd_gcups) x the device
    # dispatch floor (the committed on-chip fit record
    # swtpu_device_floor.json when present, else the documented tunnel
    # default) — so the threshold is a measurement, not a single-machine
    # constant (VERDICT r4 #8). Set an int to pin it (0 disables the
    # tier). The int16 score cap gates eligibility independently
    # (runtime_native.score_simd).
    host_simd_max_cells: Optional[int] = None
    # lax.scan full-matrix fill is fastest below this many cells (compile
    # overhead amortization; the CUTOFF=1024 analog at a coarser granularity).
    # Measured on v5e: the stripe kernel wins from ~128^2 up (both are
    # dispatch-latency-bound below that).
    scan_max_cells: int = 1 << 14
    # Pallas stripe kernel parameters. None = auto (cost-model choice;
    # kernels.pallas_fill.choose_params).
    stripe_rows: Optional[int] = None        # rows per stripe (T = 128*SUB*R)
    stripe_rows_per_lane: Optional[int] = None   # register blocking factor R
    # banded mode: half-width of the band (|i-j| <= band). None = full matrix.
    band: Optional[int] = None
    # keep the predecessor matrix for traceback. False = score-only
    # (the -DSKIP_BACKTRACK=1 benchmark mode, makefile:9).
    traceback: bool = True
    # 'full'    = device-captured P matrix, exact reference tie-breaking
    # 'windowed'= locate + window refill (O(window) memory)
    # 'hirschberg' = O(m+n) memory divide-and-conquer
    # 'auto'    = full below full_p_max_cells, windowed above; on TPU the
    #             full-P cap additionally shrinks to
    #             tpu_full_p_fetch_max_cells (see below)
    traceback_method: str = "auto"
    full_p_max_cells: int = 1 << 28
    # TPU-only ceiling for the full-P traceback route: full-P fetches the
    # whole m*n int8 P matrix through the device tunnel, whose large-
    # buffer rate makes it the wall above ~16 Mcells. Measured round 5
    # (bench_results/traceback_crossover_r5.jsonl, warm align+traceback):
    #   2048^2 full 0.20 s vs windowed 0.92 s   -> full wins
    #   4128^2 full 0.95 s vs windowed 0.92 s   -> tie (the crossover)
    #   8192^2 full 2.07 s vs windowed 0.89 s   -> windowed wins
    #   12800^2 full 22.8 s vs windowed 1.01 s  -> windowed 22x
    # Windowed is ~1 s flat (window-dispatch floor bound), full-P grows
    # with the fetch. 1<<24 = 16.7 Mcells keeps <=4096^2 on the exact-P
    # route and sends larger problems to the lean traceback.
    tpu_full_p_fetch_max_cells: int = 1 << 24
    # score dtype; int32 is the parity dtype (reference uses C int).
    dtype: str = "int32"

    def simd_cells_cap(self) -> int:
        """The effective host-SIMD crossover in cells: the pinned value
        when set, else the measured derivation for this host."""
        if self.host_simd_max_cells is not None:
            return self.host_simd_max_cells
        return derived_host_simd_max_cells()


# --- host-SIMD crossover derivation (VERDICT r4 #8) -----------------------

# Flat per-call device time for a small problem through the axon tunnel
# (dispatch + fetch + kernel), measured round 3 — replaced by the on-chip
# fit record (scripts/tpu_round4.py::floor_decomp) when one is committed.
DEVICE_FLOOR_FALLBACK_S = 6.4e-3

_simd_cap_cache: dict = {"value": None}


def load_fit_record(env_var: str, filename: str, key: str):
    """Resolve a committed measurement fit record: the env-var path when
    set (authoritative), else ``filename`` in the CWD then the repo root.
    Returns the float under ``key``, or None (absent/malformed records
    never crash dispatch). Shared by the device-floor and pipeline
    stage-overhead loaders."""
    import json
    import os
    env = os.environ.get(env_var)
    if env:
        cands = [env]
    else:
        here = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cands = [filename, os.path.join(here, filename)]
    for c in cands:
        if c and os.path.exists(c):
            try:
                with open(c) as f:
                    return float(json.load(f)[key])
            except (OSError, KeyError, TypeError, ValueError):
                continue
    return None


def _device_floor_s() -> float:
    """Per-call device floor in seconds: the committed on-chip fit record
    (env SWTPU_DEVICE_FLOOR_RECORD, else swtpu_device_floor.json in the
    CWD / repo root), else the documented fallback."""
    got = load_fit_record("SWTPU_DEVICE_FLOOR_RECORD",
                          "swtpu_device_floor.json", "floor_s")
    return DEVICE_FLOOR_FALLBACK_S if got is None else got


# the SIMD tier's own hard shape limit (positions ride int16 lanes):
# on hosts with no device to dispatch to there is no crossover — every
# eligible problem belongs to the SIMD tier, so the cap is the tier's
# eligibility ceiling itself
SIMD_SHAPE_LIMIT_CELLS = 32767 * 32767


def derived_host_simd_max_cells() -> int:
    """Measured crossover: cells where this host's striped-SIMD fill takes
    as long as one device round-trip — per-core SIMD GCUPS (one-time
    probe) x the device floor. On non-TPU platforms the fallthrough is
    the vmapped scan, not a device, and the SIMD tier always wins where
    it is eligible — the cap is its own shape ceiling. 0 when the SIMD
    tier is unavailable (routing then skips it entirely). Cached per
    process."""
    if _simd_cap_cache["value"] is None:
        from ..runtime_native import measured_simd_gcups
        rate = measured_simd_gcups()
        if rate is None:
            _simd_cap_cache["value"] = 0
        else:
            from ..dispatch.plan import current_platform
            if current_platform() != "tpu":
                _simd_cap_cache["value"] = SIMD_SHAPE_LIMIT_CELLS
            else:
                _simd_cap_cache["value"] = int(rate * 1e9
                                               * _device_floor_s())
    return _simd_cap_cache["value"]
