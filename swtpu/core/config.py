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
    # 0.17 ms vs a ~6 ms tunnel floor). Default 48 Mcells (~7k^2): the
    # measured crossover vs the tunneled v5e's flat ~6.4 ms per-call
    # device time (8.3 GCUPS * 6.4 ms ~ 53 Mcells); lower it for local
    # chips where the dispatch floor is ~0.2 ms. The int16 score cap
    # gates eligibility independently (runtime_native.score_simd).
    host_simd_max_cells: int = 48_000_000
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
    # 'auto'    = full below full_p_max_cells, windowed above
    traceback_method: str = "auto"
    full_p_max_cells: int = 1 << 28
    # score dtype; int32 is the parity dtype (reference uses C int).
    dtype: str = "int32"
