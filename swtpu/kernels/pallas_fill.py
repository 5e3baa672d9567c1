"""Pallas TPU stripe kernel — the single-chip performance path.

TPU-native re-design of the reference's GPU strategies. Where the CUDA family
launches one thread per cell of one anti-diagonal
(simple-cuda/cuda_global_mem_smithW.cu:165-261) and the rotated family keeps
three rolling diagonal buffers in unified memory
(rotated-cuda/sw-rotated-cuda-unified.cu:225-241), this kernel:

* processes the matrix in **stripes of T = 128*SUB*R rows**; each of the
  L = 128*SUB lanes owns **R consecutive rows** and computes **CB
  consecutive columns per step** (register + column blocking), so the
  expensive cross-lane data movement happens once per R*CB cells and the
  fixed per-step serial chain amortizes over CB*T cells;
* sweeps the stripe's anti-diagonals with a **row-stationary systolic
  layout**: lane k processes rows [k*R+1, (k+1)*R] at columns
  CB*(t-k)+1..+CB on step t. Within a lane's (R, CB) block the UP/DIAG/LEFT
  dependencies are this step's / last step's own registers — only the block
  top row needs the neighbouring lane's bottom row, one linearized
  lane-shift per column slot (two `pltpu.roll`s + select);
* slides **CB query streams** one lane per step: lane 0 ingests a[CB*t+c]
  per slot, so scoring is a vector compare (match/mismatch) or an nsym-way
  select chain over a per-stripe query profile (substitution matrices) —
  no gathers, no rotated storage;
* drops all validity masking: with negative mismatch/gap penalties,
  pre-start lanes provably stay at the zero floor (sentinel query codes
  force mismatches; every inflow is <= 0), and post-finish lanes compute
  garbage that strictly decays by >=1 per step — it can never equal the
  true maximum, so the max/argmax reductions are unaffected;
* chains stripes through a **bottom-row boundary ring** in VMEM scratch
  (persistent across the sequential TPU grid), the analog of the reference's
  data-residency lesson (v6.3's device-resident H/P,
  omp_smithW-v6.3-target-inlined.cpp:237-332): nothing round-trips to HBM
  between stripes except the optional predecessor stream;
* tracks the global max with per-lane packed [score | row | col] registers
  under a strict-> update (column bits compared within a step only) —
  exactly row-major first-occurrence per lane — reduced once per stripe,
  replacing `omp critical` / atomicCAS retry loops (omp_smithW.c:384-387,
  cuda_global_mem_smithW.cu:246-260) with race-free vector selects.

See DESIGN.md for the measured per-step cost model behind the (T, R, CB)
choices and the no-masking correctness argument.

All state lives in VMEM/SMEM scratch; steps are chunked (C per grid step) so
the predecessor stream pipelines to HBM through Pallas's automatic double
buffering while compute continues.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import (DIAGONAL, E_EXT, F_EXT, LEFT, NONE,
                           UP, EngineConfig, Scoring)

LANES = 128
BIG = 2**30

# Practical single-kernel width cap: Q + boundary ring must fit VMEM
# (4 bytes * ~2m each; 16 MB VMEM). Beyond this, the multi-chip pipeline or
# host-level column chunking takes over.
MAX_WIDTH = 1 << 20


def choose_stripe_rows(m: int, n: int, t_max: int = 16384) -> int:
    """R=1 legacy helper: stripe height minimizing steps = stripes*(m+T)."""
    best_T, best_steps = LANES, None
    s_max = -(-n // LANES)
    for s_cnt in range(1, s_max + 1):
        T = -(-n // (LANES * s_cnt)) * LANES
        if T > t_max:
            continue
        steps = s_cnt * (m + T - 1)
        if best_steps is None or steps < best_steps:
            best_steps, best_T = steps, T
    return best_T


# Cost model for (T, R, CB), calibrated on v5e (rounds 1-2):
# cycles/step ~ max(CHAIN(CB), BETA * V) where CHAIN is the cross-step
# serial dependency cost (rolls -> selects -> in-step (R, CB) chain) and
# V = CB * vregs * (per_row*R + per_step) counts vector instructions.
# Round-2 same-session anchors at 25632^2 (u32, fused): (R8,CB2)=530,
# (R16,CB2)=470, (R32,CB2)=486, (R16,CB4)=902, (R32,CB4)=820,
# (R16,CB8)=1434; 65536^2 (R32,CB4)=1059 (ALU term engaged: SUB=16).
# CHAIN is ~flat in R up to 32 (R=64 collapses on register pressure —
# hard cap) and grows ~190 cyc per extra CB slot. Deep register blocking
# pays because it shrinks the lane count and so the ramp bubble:
# (T=28672,R=32,CB=4) measured 103 GCUPS vs the round-1 champion
# (T=26624,R=8,CB=2) at 92.5.
_CHAIN0, _CHAINC = 250.0, 190.0
_BETA = 0.3
_COST_LIN = (10, 10)   # per-row, per-step vector instr factors (linear gap)
_COST_AFF = (16, 12)

DEFAULT_CHUNK = 128
DEFAULT_UNROLL = 32


def choose_params_cost(m: int, n: int, affine: bool = False,
                       r_max: int = 32, sub_max: int = 128,
                       t_cap: Optional[int] = None,
                       cb_max: int = 4) -> tuple:
    """(T, R, CB, modeled_cost_cycles) minimizing the modeled fill time.
    T = 128*SUB*R. t_cap bounds the stripe height (the P-capture path
    needs CB*C*T*4 bytes of double-buffered VMEM for its output block).
    The cost is in model cycles — meaningful only as a RATIO between
    shapes (the dispatch projections divide two of them)."""
    per_row, per_step = _COST_AFF if affine else _COST_LIN
    best = (LANES, 1, 1)
    best_cost = None
    for CB in (1, 2, 4):
        if CB > cb_max:
            continue
        for R in (1, 2, 4, 8, 16, 32):
            if R > r_max:
                continue
            for SUB in range(1, sub_max + 1):
                T = LANES * SUB * R
                if t_cap is not None and T * CB > t_cap:
                    continue
                stripes = -(-n // T)
                if stripes > 1 and (stripes - 1) * T >= n:
                    continue                  # a smaller SUB covers n too
                L = LANES * SUB
                steps = stripes * (-(-m // CB) + L - 1)
                vregs = -(-SUB // 8)          # ceil(SUB/8) vregs per tile
                V = CB * vregs * (per_row * R + per_step)
                cost = steps * max(_CHAIN0 + _CHAINC * (CB - 1), _BETA * V)
                if best_cost is None or cost < best_cost:
                    best_cost, best = cost, (T, R, CB)
    return best + (best_cost if best_cost is not None else float("inf"),)


def choose_params(m: int, n: int, affine: bool = False,
                  r_max: int = 32, sub_max: int = 128,
                  t_cap: Optional[int] = None,
                  cb_max: int = 4) -> tuple:
    """Pick (T, R, CB) minimizing the modeled fill time (see
    choose_params_cost)."""
    return choose_params_cost(m, n, affine=affine, r_max=r_max,
                              sub_max=sub_max, t_cap=t_cap,
                              cb_max=cb_max)[:3]


def _auto_unroll(C: int, interpret: bool) -> int:
    if interpret:
        return 1          # interpret mode: keep tracing cheap
    u = DEFAULT_UNROLL
    while C % u:
        u //= 2
    return max(u, 1)


def stripe_fill_supported(m: int, n: int, traceback: bool,
                          scoring: Scoring = Scoring()) -> bool:
    if not (m >= 2 and n >= 1 and m <= MAX_WIDTH):
        return False
    return _penalties_negative(scoring)


def _penalties_negative(scoring: Scoring) -> bool:
    """The unmasked kernel's precondition (see module docstring)."""
    if scoring.mismatch >= 0:
        return False
    if scoring.is_affine:
        return scoring.gap_open < 0 and scoring.gap_extend < 0
    return scoring.gap < 0


def _interpret_default() -> bool:
    from ..dispatch.plan import current_platform
    try:
        return current_platform() != "tpu"
    except Exception:
        return True


# Test hook for the debug sanitizer (instrument/sanitize.py): skews the
# boundary-ring consumer offset so a deliberately broken ring is CAUGHT by
# the invariant checks. Must stay 0 in production; interpret-mode only
# (Mosaic requires 128-multiple lane offsets).
_DEBUG_RING_SKEW = 0


def _kernel(scoring: Scoring, T: int, R: int, C: int, m: int, n: int,
            steps: int, num_chunks: int, return_p: bool,
            batch: bool = False, unroll: int = 1,
            boundary: bool = False, want_bottom: bool = False,
            pairs: bool = False, local: bool = True, CB: int = 1,
            nsym: int = 0, band: int = 0, debug_h: bool = False,
            specialize_chunks: bool = False, npack: int = 0,
            winject: int = 0):
    L = T // R                       # lanes per stripe
    sub_rows = L // LANES
    if R & (R - 1):
        # the packed argmax bit layout [score | R-1-r | CB-1-c] masks with
        # R-1; a non-power-of-two would silently corrupt positions
        raise ValueError(f"R must be a power of two, got {R}")
    logR = R.bit_length() - 1
    logCB = CB.bit_length() - 1      # CB checked by every caller
    match = int(scoring.match)
    mismatch = int(scoring.mismatch)
    affine = scoring.is_affine
    if affine:
        g_open = int(scoring.gap_open)
        g_ext = int(scoring.gap_extend)
        neg = -(1 << 24)
    else:
        gap = int(scoring.gap)
    # Boundary-row rings (one per column slot) indexed by step:
    # bot[c][t] == bottom-row value of step t of the stripe above at column
    # CB*(t-L+1) + c + 1. Written one aligned C-slice per chunk, read L-1
    # elements ahead, so a single buffer per slot serves producer (this
    # stripe) and consumer (next stripe).
    bot_len = num_chunks * C + L + C + 256
    # right-edge capture: column m is computed by exactly one column slot
    rc_slot = (m - 1) % CB
    rc_t0 = (m - 1) // CB            # ... by lane (t - rc_t0) at step t

    def kernel(a_ref, b_ref, *rest):
        # Batch mode ('many reads packed in rows'): an extra reset-mask
        # input marks read-start rows whose UP/DIAG inflow is forced to the
        # zero boundary, making each read's DP independent; per-lane best
        # registers are exported so the host reduces per read.
        if batch:
            greset_ref = rest[0]
            rest = rest[1:]
        if winject:
            # Packed-pairs mode ('many same-shape INDEPENDENT pairs in one
            # stripe chain'): pairs pack back-to-back in rows exactly like
            # batch mode, but each pair has its OWN query stream. Lanes
            # where a pair starts (every `winject` = rlen/R lanes) plus
            # lane 0 of every stripe INJECT their stream value from a
            # precomputed tensor inj[s, t, lane] = a_g[CB*(t - lane) + c]
            # instead of receiving the rolled neighbour value — the
            # systolic shift then distributes each pair's stream across
            # its own lanes only. This removes the per-pair ramp bubble of
            # the pairs grid (one ramp for the whole packed batch instead
            # of B ramps; VERDICT r3 #4).
            inj_ref = rest[0]
            rest = rest[1:]
        if boundary:
            # top_ref: the boundary rings pre-filled with the caller's top
            # boundary row; lc_ref: per-(row, lane) left-column values
            # ([0] = H(i, 0) for the LEFT operand at j=1, [1] = H(i-1, 0)
            # for the DIAG operand, [2] = E(i, 0) in affine mode), injected
            # on each lane's first step. Affine adds ftop_ref: the F rings
            # of the caller's top boundary row.
            top_ref, lc_ref = rest[0], rest[1]
            rest = rest[2:]
            if affine:
                ftop_ref = rest[0]
                rest = rest[1:]
        best_ref, rc_ref = rest[0], rest[1]
        rest = rest[2:]
        if batch:
            lbest_ref, lbest_t_ref = rest[0], rest[1]
            rest = rest[2:]
            if CB > 1:
                lbcb_ref = rest[0]
                rest = rest[1:]
        if boundary and affine:
            rce = rest[0]           # right-column E capture (halo payload)
            rest = rest[1:]
        if return_p:
            p_ref = rest[0]
            rest = rest[1:]
        if debug_h:
            dbg_ref = rest[0]          # per-step H capture (sanitizer)
            rest = rest[1:]
        if want_bottom:
            bot = rest[0]           # rings exposed as an output
            rest = rest[1:]
            if affine:
                fbot = rest[0]      # F rings output (bottom F row)
                rest = rest[1:]
        # Scratch: hp holds the LAST column slot's R per-row wavefronts of
        # the previous step; (c1, c2)[c] the lane/sublane rolls of the
        # previous step's bottom row per slot; hs the previous step's
        # slot-(CB-1) row-0 UP operand (= this step's slot-0 row-0 DIAG);
        # (w1, w2)[c] the rolls of the CB query windows.
        if affine and want_bottom:
            (hp, c1, c2, hs, w1, w2, best, best_t, bcb, rc,
             ep, f1, f2) = rest
        elif affine:
            (hp, c1, c2, hs, w1, w2, best, best_t, bcb, rc, bot,
             ep, f1, f2, fbot) = rest
        elif want_bottom:
            (hp, c1, c2, hs, w1, w2, best, best_t, bcb, rc) = rest
        else:
            (hp, c1, c2, hs, w1, w2, best, best_t, bcb, rc, bot) = rest

        # with a leading pair grid dimension, the scratch state simply
        # re-initializes at each pair's (stripe 0, chunk 0)
        g0 = 1 if pairs else 0
        if pairs:
            p_idx = pl.program_id(0)
        s_idx = pl.program_id(g0)
        c_idx = pl.program_id(g0 + 1)

        col = jax.lax.broadcasted_iota(jnp.int32, (sub_rows, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (sub_rows, LANES), 0)
        lin = row * LANES + col                     # lane id k
        origin = lin == 0
        col0 = col == 0
        if winject:
            # pair-start lanes inject; lane 0 injects too (its pair's
            # stream continues from the previous stripe, re-based)
            injmask = jnp.logical_or(
                (s_idx * L + lin) % winject == 0, origin)

        @pl.when(c_idx == 0)
        def _init_stripe():
            zero = jnp.zeros((R, sub_rows, LANES), jnp.int32)
            czero = jnp.zeros((CB, sub_rows, LANES), jnp.int32)
            hp[...] = zero
            c1[...] = czero
            c2[...] = czero
            hs[...] = zero[0]
            w1[...] = czero - 1                     # sentinel codes
            w2[...] = czero - 1
            best[...] = zero[0]
            best_t[...] = zero[0]
            if CB > 1:
                bcb[...] = zero[0]
            rc[...] = zero
            if affine and boundary:
                rce[...] = zero[None] + neg
            if affine:
                ep[...] = zero + neg
                f1[...] = czero + neg
                f2[...] = czero + neg

            @pl.when(s_idx == 0)
            def _():
                if boundary:
                    bot[...] = top_ref[...]
                else:
                    bot[...] = jnp.zeros((CB, bot_len), jnp.int32)
                if affine:
                    if boundary:
                        fbot[...] = ftop_ref[...]
                    else:
                        # F(0, j) = -inf: no vertical gap enters from row 0
                        fbot[...] = jnp.full((CB, bot_len), neg, jnp.int32)

            # (row-0 DIAG for the very first step — the H(0,0) corner — is
            # delivered by the left-column inject at t == lin == 0, so the
            # plain zero init of hs is correct in the boundary case too.)

        if band:
            # banded mode: cells with |i - j| > band are forced to the zero
            # floor (matching the scan plan's band semantics). The diagonal
            # offset j - i = CB*t - lin*(CB+R) - s*T + (c - r) costs one
            # broadcast per step plus two compares per cell.
            bandbase = lin * (CB + R) + s_idx * T
        if nsym:
            # substitution-matrix mode: b_ref is a per-symbol query PROFILE
            # (prof[q][r][lane] = S[q, b_code(row)]; padding rows hold
            # NEG_SUB) and the per-cell score is a select tree over the
            # nsym possible query codes — no gathers on the VPU
            profs = [[b_ref[0, q, r] for r in range(R)]
                     for q in range(nsym)]
        elif npack:
            # int8-PACKED profiles: 4 adjacent query symbols per int32
            # word (prof8[g] holds S[4g..4g+3, b] as bytes), so the
            # per-cell select tree runs over ceil(nsym/4) words and one
            # hoisted variable shift extracts the byte — ~10 vector ops
            # per cell vs ~22 for the unpacked tree. Requires |S| <= 127.
            profs8 = [[b_ref[0, g, r] for r in range(R)]
                      for g in range(npack)]
        else:
            btiles = [b_ref[0, r] for r in range(R)]
        if batch:
            gmasks = [greset_ref[0, r] != 0 for r in range(R)]
        if boundary:
            lcl = [lc_ref[0, 0, r] for r in range(R)]   # H(i, 0)
            lcd = [lc_ref[0, 1, r] for r in range(R)]   # H(i-1, 0)
            if affine:
                lce = [lc_ref[0, 2, r] for r in range(R)]   # E(i, 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        # Chunk-start aligned vector loads (Mosaic requires 128-multiple lane
        # offsets); per-step boundary scalars come from registers rolled one
        # lane per step:
        #   bw[c][0, 127+tl] = ring_c[cc*C + L - 1 + tl] = H(above, j_c(t))
        #   av[c][0, tl]     = a[CB*t + c] — the slot-c query stream
        bw0 = [bot[c:c + 1, pl.ds(c_idx * C + L - 128 + _DEBUG_RING_SKEW,
                                  C + 128)]
               for c in range(CB)]
        av0 = [a_ref[0, c:c + 1, pl.ds(c_idx * C, C)] for c in range(CB)]
        if affine:
            fw0 = [fbot[c:c + 1, pl.ds(c_idx * C + L - 128, C + 128)]
                   for c in range(CB)]

        def lane_rolls(x):
            r1 = pltpu.roll(x, 1, axis=1)
            r2 = pltpu.roll(r1, 1, axis=0)
            return r1, r2

        def make_step(track_rc, inject=False):
            def step(tl, carry):
                # Steps past the stripe's true extent (the chunk-padding
                # tail) are harmless: every lane is post-finish there and its
                # decaying garbage can never reach the true maximum.
                if affine:
                    (hvs, hr1, hr2, hsv, wr1, wr2, botbuf, bw, av,
                     evs, fv1, fv2, fw, fbuf) = carry
                else:
                    hvs, hr1, hr2, hsv, wr1, wr2, botbuf, bw, av = carry
                t = c_idx * C + tl

                h_tops, wvs = [], []
                if winject:
                    iv = inj_ref[0, tl]          # (sub_rows, LANES)
                for c in range(CB):
                    ht = jnp.where(origin, bw[c][0, 127],
                                   jnp.where(col0, hr2[c], hr1[c]))
                    if batch:
                        ht = jnp.where(gmasks[0], 0, ht)
                    h_tops.append(ht)
                    if winject:
                        wvs.append(jnp.where(injmask, iv,
                                             jnp.where(col0, wr2[c],
                                                       wr1[c])))
                    else:
                        wvs.append(jnp.where(origin, av[c][0, 0],
                                             jnp.where(col0, wr2[c],
                                                       wr1[c])))
                if nsym:
                    # substitution select tree: the query-code bit masks are
                    # hoisted per column slot (shared by all R rows), so the
                    # per-cell cost drops from nsym compares + nsym chained
                    # selects to ~nsym tournament selects of depth
                    # ceil(log2 nsym) — the chain, not the op count, is
                    # what the per-step cost model charges (DESIGN.md §5)
                    nbits = max(1, (nsym - 1).bit_length())
                    wneg = [wvs[c] < 0 for c in range(CB)]
                    wbit = [[((wvs[c] >> k) & 1) == 1 for k in range(nbits)]
                            for c in range(CB)]
                if npack:
                    # packed mode: tree bits start above the in-word byte
                    # index (bits 0-1 select the byte via the shift)
                    nbits8 = max(1, (npack - 1).bit_length())
                    wneg = [wvs[c] < 0 for c in range(CB)]
                    wsh = [(wvs[c] & 3) * 8 for c in range(CB)]
                    wbit8 = [[((wvs[c] >> (k + 2)) & 1) == 1
                              for k in range(nbits8)] for c in range(CB)]
                if affine:
                    f_tops = []
                    for c in range(CB):
                        ft = jnp.where(origin, fw[c][0, 127],
                                       jnp.where(col0, fv2[c], fv1[c]))
                        if batch:
                            ft = jnp.where(gmasks[0], neg, ft)
                        f_tops.append(ft)

                if inject:
                    # each lane's first step computes column j=1 in slot 0:
                    # swap in the caller's left boundary for LEFT and DIAG
                    first = lin == t

                new_h = [[None] * R for _ in range(CB)]
                new_e = [None] * R
                new_es = [[None] * R for _ in range(CB)]  # per-slot E
                f_bots = [None] * CB
                packed = None
                for c in range(CB):
                    up = h_tops[c]
                    dg = hsv if c == 0 else h_tops[c - 1]
                    if affine:
                        fprev = f_tops[c]
                    for r in range(R):
                        if r > 0:
                            up = new_h[c][r - 1]
                            dg = hvs[r - 1] if c == 0 else new_h[c - 1][r - 1]
                            if batch:
                                up = jnp.where(gmasks[r], 0, up)
                                dg = jnp.where(gmasks[r], 0, dg)
                                if affine:
                                    fprev = jnp.where(gmasks[r], neg, fprev)
                        lv = hvs[r] if c == 0 else new_h[c - 1][r]
                        if affine:
                            ev = evs[r] if c == 0 else new_e[r]
                        if inject and c == 0:
                            dg = jnp.where(first, lcd[r], dg)
                            lv = jnp.where(first, lcl[r], lv)
                            if affine:
                                ev = jnp.where(first, lce[r], ev)
                        if nsym:
                            # tournament over the profile leaves: level k
                            # pairs nodes differing in query-code bit k
                            nodes = [profs[q][r] for q in range(nsym)]
                            for k in range(nbits):
                                nxt = [jnp.where(wbit[c][k], nodes[q0 + 1],
                                                 nodes[q0])
                                       for q0 in range(0, len(nodes) - 1, 2)]
                                if len(nodes) % 2:
                                    nxt.append(nodes[-1])
                                nodes = nxt
                            # sentinel queries (a-padding, code < 0) must
                            # score NEG so post-finish garbage decays
                            sub = jnp.where(wneg[c], jnp.int32(-(1 << 20)),
                                            nodes[0])
                        elif npack:
                            nodes = [profs8[g][r] for g in range(npack)]
                            for k in range(nbits8):
                                nxt = [jnp.where(wbit8[c][k],
                                                 nodes[g0 + 1], nodes[g0])
                                       for g0 in range(0, len(nodes) - 1, 2)]
                                if len(nodes) % 2:
                                    nxt.append(nodes[-1])
                                nodes = nxt
                            byte = (nodes[0] >> wsh[c]) & 0xFF
                            sub = jnp.where(wneg[c],
                                            jnp.int32(-(1 << 20)),
                                            (byte ^ 0x80) - 0x80)
                        else:
                            sub = jnp.where(wvs[c] == btiles[r], match,
                                            mismatch)
                        diag = dg + sub
                        if affine:
                            fprev0 = fprev
                            e_new = jnp.maximum(lv + g_open, ev + g_ext)
                            f_new = jnp.maximum(up + g_open, fprev + g_ext)
                            u_val, l_val = f_new, e_new
                            new_e[r] = e_new
                            new_es[c][r] = e_new
                            fprev = f_new
                        else:
                            if return_p:
                                # pred capture needs UP and LEFT apart
                                u_val = up + gap
                                l_val = lv + gap
                            else:
                                # keep the serial up-path short (2 dependent
                                # ops): everything not involving `up` folds
                                # into dl first
                                dl = jnp.maximum(diag, lv + gap)
                                if local:
                                    dl = jnp.maximum(dl, 0)

                        if return_p:
                            zero = jnp.zeros_like(diag)
                            hn = zero
                            pn = zero
                            take = diag > hn
                            hn = jnp.where(take, diag, hn)
                            pn = jnp.where(take, jnp.int32(DIAGONAL), pn)
                            take = u_val > hn
                            hn = jnp.where(take, u_val, hn)
                            pn = jnp.where(take, jnp.int32(UP), pn)
                            take = l_val > hn
                            hn = jnp.where(take, l_val, hn)
                            pn = jnp.where(take, jnp.int32(LEFT), pn)
                            if affine:
                                # Gotoh state bits (tie -> extend), matching
                                # the oracle/scan conventions exactly
                                pn = (pn
                                      + jnp.where(e_new == ev + g_ext,
                                                  jnp.int32(E_EXT), 0)
                                      + jnp.where(f_new == fprev0 + g_ext,
                                                  jnp.int32(F_EXT), 0))
                            if band:
                                doff = CB * t - bandbase + (c - r)
                                pn = jnp.where(abs(doff) <= band, pn,
                                               jnp.int32(NONE))
                            p_ref[0, tl, c, r] = pn
                        elif affine:
                            # keep the F-dependent path short (the affine
                            # mirror of linear's dl trick, DESIGN §5 item
                            # 4): diag/E/floor fold into dl OFF the
                            # up->F->H row chain (lv, ev come from the
                            # previous step or the c-1 slot), so the
                            # chained tail after f_new is ONE max instead
                            # of two
                            dl = jnp.maximum(diag,
                                             jnp.maximum(l_val, 0)
                                             if local else l_val)
                            hn = jnp.maximum(dl, u_val)
                        else:
                            # (global/NW mode differs only in dl's floor;
                            # deep negatives are clamped for the packed
                            # argmax below — callers use the max solely
                            # when it is positive)
                            hn = jnp.maximum(dl, up + gap)
                        if band:
                            doff = CB * t - bandbase + (c - r)
                            hn = jnp.where(abs(doff) <= band, hn, 0)
                        if debug_h:
                            dbg_ref[0, tl, c, r] = hn
                        new_h[c][r] = hn
                        up = hn
                        hpk = hn if local else jnp.maximum(hn, -8)
                        # pack [score | R-1-r | CB-1-c]: tree max picks the
                        # row-major-first cell within this step
                        pk = hpk
                        if R > 1 or CB > 1:
                            pk = (hpk << (logR + logCB)) + \
                                ((R - 1 - r) << logCB) + (CB - 1 - c)
                        packed = pk if packed is None else \
                            jnp.maximum(packed, pk)
                    if affine:
                        f_bots[c] = fprev        # F of row R-1, slot c

                # row-major first occurrence per lane: the within-step
                # winner carries its column in the low bits (compared only
                # within the step); across steps the strict > runs on the
                # column-stripped value so a later occurrence of the same
                # (score, row) never displaces the earlier (smaller-j) one
                # (serial_smithW.c:240)
                pk_nc = packed >> logCB if CB > 1 else packed
                better = pk_nc > best[...]
                best[...] = jnp.where(better, pk_nc, best[...])
                best_t[...] = jnp.where(better, t, best_t[...])
                if CB > 1:
                    bcb[...] = jnp.where(better, packed & (CB - 1), bcb[...])

                if track_rc:
                    # right-edge capture for pipeline halos / last_cell
                    edge = lin == t - rc_t0
                    for r in range(R):
                        rc[r] = jnp.where(edge, new_h[rc_slot][r], rc[r])
                    if affine and boundary:
                        for r in range(R):
                            rce[0, r] = jnp.where(edge, new_es[rc_slot][r],
                                                  rce[0, r])

                nr = [lane_rolls(new_h[c][R - 1]) for c in range(CB)]
                nw = [lane_rolls(wvs[c]) for c in range(CB)]
                # the roll wraparound parks the bottom row's last-lane value
                # at nr[c][1][0, 0]: exactly what this stripe exports
                botbuf = tuple(
                    jnp.where(ciota == tl, nr[c][1][0, 0], botbuf[c])
                    for c in range(CB))

                out = (tuple(new_h[CB - 1]),
                       tuple(x[0] for x in nr), tuple(x[1] for x in nr),
                       h_tops[CB - 1],
                       tuple(x[0] for x in nw), tuple(x[1] for x in nw),
                       botbuf,
                       tuple(pltpu.roll(bw[c], C + 127, axis=1)
                             for c in range(CB)),
                       tuple(pltpu.roll(av[c], C - 1, axis=1)
                             for c in range(CB)))
                if affine:
                    nf = [lane_rolls(f_bots[c]) for c in range(CB)]
                    fbuf = tuple(
                        jnp.where(ciota == tl, nf[c][1][0, 0], fbuf[c])
                        for c in range(CB))
                    out = out + (tuple(new_e),
                                 tuple(x[0] for x in nf),
                                 tuple(x[1] for x in nf),
                                 tuple(pltpu.roll(fw[c], C + 127, axis=1)
                                       for c in range(CB)),
                                 fbuf)
                return out
            return step

        def run_chunk(track_rc, inject=False):
            carry0 = (tuple(hp[r] for r in range(R)),
                      tuple(c1[c] for c in range(CB)),
                      tuple(c2[c] for c in range(CB)),
                      hs[...],
                      tuple(w1[c] for c in range(CB)),
                      tuple(w2[c] for c in range(CB)),
                      tuple(jnp.zeros((1, C), jnp.int32)
                            for _ in range(CB)),
                      tuple(bw0), tuple(av0))
            if affine:
                carry0 = carry0 + (tuple(ep[r] for r in range(R)),
                                   tuple(f1[c] for c in range(CB)),
                                   tuple(f2[c] for c in range(CB)),
                                   tuple(fw0),
                                   tuple(jnp.full((1, C), neg, jnp.int32)
                                         for _ in range(CB)))
            step = make_step(track_rc, inject)
            if unroll == 1:
                carry = jax.lax.fori_loop(0, C, step, carry0)
            else:
                def block(blk, c):
                    for u in range(unroll):
                        c = step(blk * unroll + u, c)
                    return c
                carry = jax.lax.fori_loop(0, C // unroll, block, carry0)
            # persist wavefront state for the next chunk; flush boundaries
            for r in range(R):
                hp[r] = carry[0][r]
            for c in range(CB):
                c1[c] = carry[1][c]
                c2[c] = carry[2][c]
                w1[c] = carry[4][c]
                w2[c] = carry[5][c]
                bot[c:c + 1, pl.ds(c_idx * C, C)] = carry[6][c]
            hs[...] = carry[3]
            if affine:
                for r in range(R):
                    ep[r] = carry[9][r]
                for c in range(CB):
                    f1[c] = carry[10][c]
                    f2[c] = carry[11][c]
                    fbot[c:c + 1, pl.ds(c_idx * C, C)] = carry[13][c]

        # specialize_chunks=False (the DEFAULT, measured 2026-08-17:
        # 92.4 GCUPS / 4.8 s compile vs 90.4 / 9.3 s specialized at
        # 25632^2 U=32) traces ONE unconditional chunk body: every chunk
        # pays the rc/inject selects, but the halved code size schedules
        # better AND compiles in half the time. specialize_chunks=True
        # keeps the round-1 behavior: trace only the (rc, inject) combos
        # that occur (rc fires for t in [rc_t0, rc_t0+L), inject for
        # t in [0, L)).
        if not specialize_chunks:
            run_chunk(True, boundary)
        else:
            base = c_idx * C
            touches_edge = jnp.logical_and(base + C > rc_t0,
                                           base < rc_t0 + L)
            combos = set()
            for cb_ in range(0, num_chunks * C, C):
                rc_on = cb_ + C > rc_t0 and cb_ < rc_t0 + L
                inj_on = boundary and cb_ < L
                combos.add((rc_on, inj_on))
            if boundary:
                injecting = base < L
            for rc_on, inj_on in sorted(combos):
                pred = touches_edge if rc_on \
                    else jnp.logical_not(touches_edge)
                if boundary:
                    ipred = injecting if inj_on \
                        else jnp.logical_not(injecting)
                    pred = jnp.logical_and(pred, ipred)
                pl.when(pred)(functools.partial(run_chunk, rc_on, inj_on))

        @pl.when(c_idx == num_chunks - 1)
        def _finish_stripe():
            bv = best[...]
            sc = bv >> logR if R > 1 else bv
            s_star = jnp.max(sc)
            rowv = (lin << logR) + (R - 1 - (bv & (R - 1))) if R > 1 else lin
            li = jnp.where(sc == s_star, rowv, BIG)
            row_star = jnp.min(li)
            t_star = jnp.max(jnp.where(li == row_star, best_t[...], -1))
            if CB > 1:
                cb_star = jnp.max(jnp.where(li == row_star, bcb[...], -1))
                col_star = CB - 1 - cb_star
            else:
                col_star = jnp.int32(0)
            if pairs:
                best_ref[p_idx, s_idx, 0] = s_star
                best_ref[p_idx, s_idx, 1] = row_star
                best_ref[p_idx, s_idx, 2] = t_star
                best_ref[p_idx, s_idx, 3] = col_star
                rc_ref[0, 0] = rc[...]
            else:
                best_ref[s_idx, 0] = s_star
                best_ref[s_idx, 1] = row_star
                best_ref[s_idx, 2] = t_star
                best_ref[s_idx, 3] = col_star
                rc_ref[0] = rc[...]
            if batch:
                lbest_ref[0] = bv
                lbest_t_ref[0] = best_t[...]
                if CB > 1:
                    lbcb_ref[0] = bcb[...]

    return kernel


@jax.jit
def _pack_p(p):
    """Pack predecessor codes (0..15: base code + affine E/F state bits)
    8-per-int32 along the steps axis for cheap device->host transfer;
    `_unpack_p` reverses on the host."""
    S, steps, CB, R, sub, lanes = p.shape
    pr = p.reshape(S, steps // 8, 8, CB, R, sub, lanes)
    shifts = (4 * jnp.arange(8, dtype=jnp.int32))[None, None, :, None,
                                                  None, None, None]
    return jnp.sum(pr << shifts, axis=2)


def _unpack_p(packed: np.ndarray) -> np.ndarray:
    S, sp8, CB, R, sub, lanes = packed.shape
    out = np.empty((8, S, sp8, CB, R, sub, lanes), np.int8)
    for k in range(8):
        out[k] = ((packed >> (4 * k)) & 15).astype(np.int8)
    return np.ascontiguousarray(out.transpose(1, 2, 0, 3, 4, 5, 6)) \
        .reshape(S, sp8 * 8, CB, R, sub, lanes)


class StripeOut(NamedTuple):
    max_score: jax.Array
    max_i: jax.Array
    max_j: jax.Array
    last_cell: jax.Array
    right_col: jax.Array            # (n+1,) int32
    p_stripes: Optional[jax.Array]  # (S, steps_pad, R, L) diag-major or None


def _check_packing(m: int, n: int, R: int, scoring: Scoring, CB: int = 1):
    if R & (R - 1):
        raise ValueError(f"R must be a power of two, got {R}")
    if not _penalties_negative(scoring):
        raise ValueError(
            "stripe kernel requires negative mismatch/gap penalties "
            "(use plan='scan' for degenerate scorings)")
    hi = max(abs(int(scoring.match)), 1) * min(m, n)
    if hi * R * CB >= (1 << 30):
        raise ValueError("score range too large for packed argmax; lower R")


def _steps(m: int, L: int, CB: int) -> int:
    return -(-m // CB) + L - 1


def _build_inputs(a_codes: np.ndarray, b_codes: np.ndarray, T: int, C: int,
                  R: int = 1, CB: int = 1):
    m, n = len(a_codes), len(b_codes)
    L = T // R
    num_stripes = -(-n // T)
    num_chunks = -(-_steps(m, L, CB) // C)
    # a split into CB column-slot streams, sentinel-padded (-1) to the
    # chunked step count: ap[0, c, t] = a[CB*t + c]
    ap = np.full((1, CB, num_chunks * C), -1, dtype=np.int32)
    aa = np.full((CB * num_chunks * C,), -1, np.int32)
    aa[:m] = a_codes.astype(np.int32)
    ap[0] = aa.reshape(num_chunks * C, CB).T
    # b padded with sentinel -2 (never matches codes or the a sentinel);
    # lane lin's row r is global stripe row lin*R + r -> b[..., r, lin]
    bp = np.full((num_stripes * T,), -2, dtype=np.int32)
    bp[:n] = b_codes.astype(np.int32)
    bt = (bp.reshape(num_stripes, L, R).transpose(0, 2, 1)
          .reshape(num_stripes, R, L // LANES, LANES))
    return np.ascontiguousarray(ap), np.ascontiguousarray(bt), num_stripes


def _ring_len(m: int, T: int, R: int, C: int, CB: int = 1) -> int:
    L = T // R
    num_chunks = -(-_steps(m, L, CB) // C)
    return num_chunks * C + L + C + 256


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "T", "R", "C", "m", "n", "return_p",
                     "interpret", "unroll", "want_bottom", "local", "CB",
                     "nsym", "band", "debug_h", "specialize_chunks",
                     "npack", "winject"),
)
def _stripe_call(q, bt, greset=None, inj=None, top=None, lc=None,
                 ftop=None, *,
                 scoring, T, R=1, C=256, m, n, return_p, interpret,
                 unroll=1, want_bottom=False, local=True, CB=1, nsym=0,
                 band=0, debug_h=False, specialize_chunks=False, npack=0,
                 winject=0):
    num_stripes = bt.shape[0]
    L = T // R
    steps = _steps(m, L, CB)
    num_chunks = -(-steps // C)
    sub_rows = L // LANES
    boundary = top is not None
    batch = greset is not None

    if C % unroll:
        raise ValueError(f"C={C} must be a multiple of unroll={unroll}")
    if CB & (CB - 1):
        raise ValueError(f"CB={CB} must be a power of two")

    if boundary and batch:
        raise ValueError("boundary injection and batch mode are exclusive")
    if bool(winject) != (inj is not None):
        raise ValueError("winject (lanes per pair) and inj go together")
    if winject and not (batch and CB == 1 and local and not return_p
                        and not boundary and not band):
        raise NotImplementedError(
            "packed-pairs stream injection: batch scoring mode only "
            "(CB=1, local, no P capture, no boundary, no band)")
    if not local and not (boundary and not return_p and not batch):
        raise NotImplementedError(
            "global (NW) mode requires boundary injection; P capture and "
            "batch mode are not supported there")
    if nsym and npack:
        raise ValueError("nsym and npack are exclusive profile modes")
    if band and (boundary or batch or not local):
        raise NotImplementedError("banded mode: plain single-pair fills")
    if debug_h and not interpret:
        raise ValueError("debug_h (sanitizer capture) is interpret-only")
    kernel = _kernel(scoring, T, R, C, m, n, steps, num_chunks, return_p,
                     batch=batch, unroll=unroll, boundary=boundary,
                     want_bottom=want_bottom, local=local, CB=CB,
                     nsym=nsym, band=band, debug_h=debug_h,
                     specialize_chunks=specialize_chunks, npack=npack,
                     winject=winject)

    out_shape = [
        jax.ShapeDtypeStruct((num_stripes, 8), jnp.int32),                 # best
        jax.ShapeDtypeStruct((num_stripes, R, sub_rows, LANES), jnp.int32),  # rc
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # best: full, stripe-indexed
        pl.BlockSpec((1, R, sub_rows, LANES), lambda s, c: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if boundary and scoring.is_affine:
        # right-column E capture, accumulated in place per stripe
        out_shape.append(jax.ShapeDtypeStruct(
            (num_stripes, R, sub_rows, LANES), jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, R, sub_rows, LANES), lambda s, c: (s, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if batch:
        for _ in range(3 if CB > 1 else 2):      # per-lane best, t[, col]
            out_shape.append(jax.ShapeDtypeStruct(
                (num_stripes, sub_rows, LANES), jnp.int32))
            out_specs.append(pl.BlockSpec(
                (1, sub_rows, LANES), lambda s, c: (s, 0, 0),
                memory_space=pltpu.VMEM))
    if return_p:
        out_shape.append(jax.ShapeDtypeStruct(
            (num_stripes, num_chunks * C, CB, R, sub_rows, LANES),
            jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, C, CB, R, sub_rows, LANES), lambda s, c: (s, c, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    if debug_h:
        out_shape.append(jax.ShapeDtypeStruct(
            (num_stripes, num_chunks * C, CB, R, sub_rows, LANES),
            jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, C, CB, R, sub_rows, LANES), lambda s, c: (s, c, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    rlen = _ring_len(m, T, R, C, CB)
    if want_bottom:
        # expose the boundary rings as an output: after the last stripe
        # they hold the whole fill's bottom row
        nrings = 2 if scoring.is_affine else 1
        for _ in range(nrings):
            out_shape.append(jax.ShapeDtypeStruct((CB, rlen), jnp.int32))
            out_specs.append(pl.BlockSpec((CB, rlen), lambda s, c: (0, 0),
                                          memory_space=pltpu.VMEM))

    tile = pltpu.VMEM((sub_rows, LANES), jnp.int32)
    rtile = pltpu.VMEM((R, sub_rows, LANES), jnp.int32)
    ctile = pltpu.VMEM((CB, sub_rows, LANES), jnp.int32)
    ring = pltpu.VMEM((CB, rlen), jnp.int32)
    scratch = [
        rtile,                                  # hp (R per-row wavefronts)
        ctile, ctile,                           # c1, c2 (per column slot)
        tile,                                   # hs
        ctile, ctile,                           # w1, w2
        tile,                                   # best (packed, col-less)
        tile,                                   # best_t
        tile,                                   # bcb (winning column slot)
        rtile,                                  # rc
    ]
    if not want_bottom:
        scratch.append(ring)                    # bottom-row boundary rings
    if scoring.is_affine:
        scratch += [
            rtile,                              # ep
            ctile, ctile,                       # f1, f2
        ]
        if not want_bottom:
            scratch.append(ring)                # F boundary rings
    

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),      # a streams (1, CB, *)
        pl.BlockSpec((1, nsym or npack, R, sub_rows, LANES),
                     lambda s, c: (s, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)       # query profile
        if (nsym or npack) else
        pl.BlockSpec((1, R, sub_rows, LANES), lambda s, c: (s, 0, 0, 0),
                     memory_space=pltpu.VMEM),      # b stripe
    ]
    args = [q, bt]
    if batch:
        in_specs.append(pl.BlockSpec((1, R, sub_rows, LANES),
                                     lambda s, c: (s, 0, 0, 0),
                                     memory_space=pltpu.VMEM))  # reset mask
        args.append(greset)
    if winject:
        # per-(stripe, chunk) stream-injection block: inj[s, t, lane] is
        # the value a pair-start lane swaps in at step t (sentinel -1
        # elsewhere/out of range); streamed chunk-by-chunk like the P
        # output so only (C, L) ints sit in VMEM at once
        in_specs.append(pl.BlockSpec((1, C, sub_rows, LANES),
                                     lambda s, c: (s, c, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(inj)
    if boundary:
        nlc = 3 if scoring.is_affine else 2
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # top rings
        in_specs.append(pl.BlockSpec(
            (1, nlc, R, sub_rows, LANES), lambda s, c: (s, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))                           # left cols
        args.extend([top, lc])
        if scoring.is_affine:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # F top
            args.append(ftop)

    outs = pl.pallas_call(
        kernel,
        grid=(num_stripes, num_chunks),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*args)
    return outs


NEG_SUB = -(1 << 20)


def _build_profile(bt: np.ndarray, table: np.ndarray) -> np.ndarray:
    """(S, R, sub, L) target codes -> (S, nsym, R, sub, L) query profile:
    prof[s, q, r, :, :] = table[q, bt[s, r]]; padding codes -> NEG_SUB."""
    nsym = table.shape[0]
    emb = np.full((nsym, nsym + 4), NEG_SUB, np.int32)
    emb[:, 4:] = table
    prof = emb[:, bt + 4]                     # (nsym, S, R, sub, L)
    return np.ascontiguousarray(prof.transpose(1, 0, 2, 3, 4))


def _pack_fits(table: np.ndarray) -> bool:
    """int8-packed profiles require every score in [-127, 127] (the
    sentinel byte is -128); BLOSUM/PAM tables all fit."""
    return int(np.abs(table).max()) <= 127


def _packed_embed(table: np.ndarray) -> np.ndarray:
    """(nsym, nsym) score table -> (ceil(nsym/4), nsym+4) int32 packed
    embedding indexed by target code+4: byte k of word g holds
    S[4g+k, b] (two's complement); sentinel target codes and padding
    symbols hold -128 so padded rows mismatch strongly and decay (the
    NEG_SUB analog at int8 scale)."""
    nsym = table.shape[0]
    ngroups = -(-nsym // 4)
    emb = np.full((4 * ngroups, nsym + 4), -128, np.int64)
    emb[:nsym, 4:] = np.asarray(table, np.int64)
    by = emb & 0xFF
    packed = (by[0::4] | (by[1::4] << 8) | (by[2::4] << 16)
              | (by[3::4] << 24))             # (ngroups, nsym+4)
    return packed.astype(np.uint32).view(np.int32)


def _build_profile_packed(bt: np.ndarray, table: np.ndarray) -> np.ndarray:
    """(S, R, sub, L) target codes -> (S, ceil(nsym/4), R, sub, L) int32
    packed profile (see _packed_embed for the byte layout)."""
    packed = _packed_embed(table)[:, bt + 4]  # (ngroups, S, R, sub, L)
    return np.ascontiguousarray(packed.transpose(1, 0, 2, 3, 4))


def _lane_major_to_rowmajor(x: np.ndarray, T: int, R: int) -> np.ndarray:
    """(S, R, sub, 128) per-stripe lane-major values -> flat row order."""
    S = x.shape[0]
    L = T // R
    return (x.reshape(S, R, L).transpose(0, 2, 1).reshape(S * T))


def stripe_fill_raw(
    a_codes: np.ndarray,
    b_codes: np.ndarray,
    scoring: Scoring = Scoring(),
    T: Optional[int] = None,
    R: Optional[int] = None,
    C: int = DEFAULT_CHUNK,
    CB: Optional[int] = None,
    return_p: bool = False,
    unroll: Optional[int] = None,
    interpret: Optional[bool] = None,
    substitution=None,
    band: Optional[int] = None,
) -> StripeOut:
    """Run the stripe kernel; returns device arrays + host-reduced best.

    ``substitution``: optional (A, A) int score table — protein/BLOSUM
    mode. The per-stripe query profile prof[q] = S[q, b] replaces the
    match/mismatch compare (the scan plan's sub_table analog)."""
    m, n = len(a_codes), len(b_codes)
    if interpret is None:
        interpret = _interpret_default()
    if substitution is not None and CB is None \
            and not _pack_fits(np.asarray(substitution)):
        CB = 1      # the UNPACKED tree is throughput-bound at CB=1;
        #             packed profiles leave CB to the cost model, whose
        #             champion (R=32, CB=4) measured 70.1 GCUPS BLOSUM62
        #             affine @25632^2 vs 61.6 at (R=8, CB=2)
    T, R, CB = _resolve_params(m, n, T, R, scoring, return_p=return_p,
                               CB=CB)
    nsym = npack = 0
    if substitution is not None:
        substitution = np.asarray(substitution, np.int32)
        hi = max(int(substitution.max()), 1) * min(m, n)
        if hi * R * CB >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
        if not _sub_gaps_ok(scoring):
            raise ValueError("substitution mode needs negative gaps")
        if _pack_fits(substitution):
            npack = -(-substitution.shape[0] // 4)
        else:
            nsym = substitution.shape[0]
    else:
        _check_packing(m, n, R, scoring, CB)
    ap, bt, num_stripes = _build_inputs(a_codes, b_codes, T, C, R, CB)
    if nsym:
        bt = _build_profile(bt, substitution)
    elif npack:
        bt = _build_profile_packed(bt, substitution)

    if unroll is None:
        unroll = _auto_unroll(C, interpret)
    outs = _stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), scoring=scoring, T=T, R=R, C=C,
        m=m, n=n, return_p=return_p, interpret=interpret, unroll=unroll,
        CB=CB, nsym=nsym, npack=npack, band=int(band) if band else 0)
    best = np.asarray(outs[0])
    rc = _lane_major_to_rowmajor(np.asarray(outs[1]), T, R)[:n]
    p_stripes = None
    if return_p:
        p_stripes = outs[2]
        if p_stripes.shape[1] % 8 == 0:
            # 4-bit pack on device: 8x smaller transfer off the chip
            p_stripes = _unpack_p(np.asarray(_pack_p(p_stripes)))
        else:
            p_stripes = np.asarray(p_stripes).astype(np.int8)

    # lexicographic reduce across stripes: score desc, then stripe asc
    # (smaller stripe = smaller row, matching first-occurrence row-major)
    scores = best[:, 0]
    s_star = int(scores.max(initial=0))
    if s_star <= 0:
        bi = bj = 0
        s_star = 0
    else:
        sidx = int(np.argmax(scores == s_star))
        rowv, t = int(best[sidx, 1]), int(best[sidx, 2])
        colw = int(best[sidx, 3])
        bi = sidx * T + rowv + 1
        bj = CB * (t - rowv // R) + colw + 1
    right_col = np.concatenate([[0], rc]).astype(np.int32)
    last_cell = int(right_col[n])
    return StripeOut(
        max_score=np.int32(s_star), max_i=np.int32(bi), max_j=np.int32(bj),
        last_cell=np.int32(last_cell), right_col=right_col,
        p_stripes=p_stripes,
    )


# P capture writes a (C, T) int32 block per chunk, double-buffered; keep it
# well under the 16 MB VMEM budget (with C=128: T <= 4096 -> 4 MB buffers).
P_T_CAP = 4096


def _resolve_params(m, n, T, R, scoring, return_p=False,
                    CB=None) -> tuple:
    cap = P_T_CAP if return_p else None
    if T is None and R is None:
        T, R, cb = choose_params(m, n, affine=scoring.is_affine, t_cap=cap)
        if CB is None:
            CB = cb
    elif R is None:
        R = 1
    elif T is None:
        T, _, _ = choose_params(m, n, affine=scoring.is_affine, r_max=R,
                                t_cap=cap, cb_max=1)
        # choose_params may have settled on a smaller internal R; round T
        # up to a multiple of 128*R so the requested R is always honored
        T = -(-T // (LANES * R)) * (LANES * R)
    if CB is None:
        CB = 1
    if T % (LANES * R):
        raise ValueError(f"T={T} must be a multiple of 128*R (R={R})")
    # never use more stripes than needed to cover n
    T = min(T, -(-n // (LANES * R)) * LANES * R)
    return T, R, CB


def stripe_fill(a_codes, b_codes, scoring: Scoring = Scoring(),
                config: EngineConfig = EngineConfig(),
                return_p: bool = False, return_h: bool = False,
                substitution=None, band=None,
                T: Optional[int] = None, R: Optional[int] = None,
                CB: Optional[int] = None, C: Optional[int] = None,
                unroll: Optional[int] = None):
    """Engine adapter: returns (FillOut-like, P row-major or None, H=None).
    Explicit T/R/CB/C/unroll (e.g. from the autotune table via dispatch)
    override the EngineConfig fields and the cost model."""
    out = stripe_fill_raw(
        np.asarray(a_codes, np.int8), np.asarray(b_codes, np.int8),
        scoring=scoring,
        T=T if T is not None else config.stripe_rows,
        R=R if R is not None else config.stripe_rows_per_lane,
        CB=CB, C=C if C is not None else DEFAULT_CHUNK, unroll=unroll,
        return_p=return_p, substitution=substitution, band=band)
    P = None
    if return_p and out.p_stripes is not None:
        P = p_stripes_to_rowmajor(
            np.asarray(out.p_stripes), len(b_codes), len(a_codes))
    if return_h:
        raise NotImplementedError(
            "stripe plan does not materialize H; use plan='scan'")
    return out, P, None


def p_stripes_to_rowmajor(p: np.ndarray, n: int, m: int) -> np.ndarray:
    """(S, steps_pad, CB, R, sub, 128) diag-major P -> (n+1, m+1) int8.

    Stripe-local cell (i_l = lin*R + r + 1, j = t - lin + 1) lives at
    [s, t, r, lin // 128, lin % 128]. The map is constant-stride in every
    index, so it is a zero-copy `as_strided` view followed by one
    contiguous transpose-copy per stripe (a fancy-index gather here costs
    minutes at 10^9 cells).
    """
    S, steps_pad, CB, R, sub, lanes = p.shape
    L = sub * lanes
    T = L * R
    out = np.zeros((n + 1, m + 1), dtype=np.int8)
    # fold (t, c) into one axis q = t*CB + c; j - 1 = q - CB*lane
    pf = np.ascontiguousarray(p.reshape(S, steps_pad * CB, R, L)).astype(
        np.int8, copy=False)
    es = pf.itemsize
    for s in range(S):
        rows = min(T, n - s * T)
        if rows <= 0:
            break
        # V[lane, j-1, r] = pf[s, CB*lane + j - 1, r, lane]
        V = np.lib.stride_tricks.as_strided(
            pf[s],
            shape=(L, m, R),
            strides=((CB * R * L + 1) * es, R * L * es, L * es),
        )
        blk = np.ascontiguousarray(V.transpose(0, 2, 1)).reshape(T, m)
        out[s * T + 1: s * T + rows + 1, 1:] = blk[:rows]
    return out


def stripe_score_fn(m: int, n: int, scoring: Scoring = Scoring(),
                    T: Optional[int] = None, R: Optional[int] = None,
                    C: int = DEFAULT_CHUNK, CB: Optional[int] = None,
                    unroll: Optional[int] = None, want_last: bool = False,
                    substitution=None):
    """Jittable (a, b) -> (max_score, max_i, max_j[, last_cell]) using the
    stripe kernel with all input prep and reductions on device —
    including the substitution-profile build (packed int8 words when the
    table fits, the unpacked select tree otherwise)."""
    interpret = _interpret_default()
    nsym = npack = 0
    emb = None
    if substitution is not None:
        if not _sub_gaps_ok(scoring):
            raise ValueError("substitution mode needs negative gaps")
        if CB is None and not _pack_fits(np.asarray(substitution)):
            CB = 1
        nsym, npack, emb = _sub_embed(substitution)
    T, R, CB = _resolve_params(m, n, T, R, scoring, CB=CB)
    if substitution is None:
        _check_packing(m, n, R, scoring, CB)
    else:
        hi = max(int(np.asarray(substitution).max()), 1) * min(m, n)
        if hi * R * CB >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
    u = _auto_unroll(C, interpret) if unroll is None else unroll
    L = T // R

    def fn(a, b):
        # inputs as device arrays of codes; build q/bt on device
        ap, bt = _device_inputs(a, b, m, n, T, C, R, CB)
        if nsym or npack:
            bt = _profile_on_device(bt, emb, nsym, npack)
        outs = _stripe_call(ap, bt, scoring=scoring, T=T, R=R, C=C, m=m,
                            n=n, return_p=False, interpret=interpret,
                            unroll=u, CB=CB, nsym=nsym, npack=npack)
        best = outs[0]
        scores = best[:, 0]
        s_star = jnp.max(scores)
        sidx = jnp.argmax(scores == s_star).astype(jnp.int32)
        rowv = best[sidx, 1]
        t = best[sidx, 2]
        colw = best[sidx, 3]
        has = s_star > 0
        bi = jnp.where(has, sidx * T + rowv + 1, 0)
        bj = jnp.where(has, CB * (t - rowv // R) + colw + 1, 0)
        res = (jnp.maximum(s_star, 0), bi, bj)
        if want_last:
            # H[n, m] from the right-column capture: global row n lives in
            # stripe S-1 at (r, lane) decoded from the lane-major layout
            li = (n - 1) % T
            last = outs[1][-1, li % R, (li // R) // LANES,
                           (li // R) % LANES]
            res = res + (last,)
        return res

    return jax.jit(fn)


def _device_inputs(a, b, m, n, T, C, R=1, CB=1):
    L = T // R
    num_stripes = -(-n // T)
    num_chunks = -(-_steps(m, L, CB) // C)
    aa = jnp.full((CB * num_chunks * C,), -1, jnp.int32)
    aa = aa.at[:m].set(a.astype(jnp.int32))
    ap = aa.reshape(num_chunks * C, CB).T[None]
    bp = jnp.full((num_stripes * T,), -2, jnp.int32)
    bp = bp.at[:n].set(b.astype(jnp.int32))
    bt = (bp.reshape(num_stripes, L, R).transpose(0, 2, 1)
          .reshape(num_stripes, R, L // LANES, LANES))
    return ap, bt


class BatchStripeOut(NamedTuple):
    scores: np.ndarray      # (B,) int32
    read_i: np.ndarray      # (B,) int32 1-based read row of the first max
    win_j: np.ndarray       # (B,) int32 1-based window column of the max


def batch_fill_raw(
    reads: np.ndarray,          # (B, r) int8, -3 padding for short reads
    window: np.ndarray,         # (W,) int8 target sequence
    scoring: Scoring = Scoring(),
    T: Optional[int] = None,
    R: Optional[int] = None,
    C: int = DEFAULT_CHUNK,
    unroll: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> BatchStripeOut:
    """Batch mode of the stripe kernel: B reads packed back-to-back in rows
    (read g owns rows [g*r, (g+1)*r)), a reset mask forcing the zero top
    boundary at every read start, per-lane max registers exported and
    reduced per read on the host — BASELINE config 3's layout (many short
    reads, one target window), one kernel sweep for the whole batch.

    R must divide the read length so no lane straddles two reads (each
    lane's packed best then attributes to exactly one read)."""
    B, rlen = reads.shape
    W = len(window)
    if interpret is None:
        interpret = _interpret_default()
    if R is None:
        # prefer a divisor of the read length (zero pad waste); else the
        # classic R=8 with sentinel padding (bounded waste for short reads)
        R = next((r for r in (32, 16, 8, 4, 2, 1)
                  if (T is None or T % (LANES * r) == 0)
                  and rlen % r == 0),
                 next(r for r in (8, 4, 2, 1)
                      if T is None or T % (LANES * r) == 0))
        if rlen % R:
            # pad every read to a multiple of R with the -3 sentinel: the
            # padding rows mismatch everywhere, their values strictly decay,
            # and they can never displace a real row's maximum
            pad = -(-rlen // R) * R - rlen
            reads = np.concatenate(
                [reads, np.full((B, pad), -3, np.int8)], axis=1)
            rlen += pad
    elif rlen % R:
        raise ValueError(f"R={R} must divide the read length {rlen}")
    n = B * rlen
    if T is None:
        T, _, _ = choose_params(W, n, affine=scoring.is_affine, r_max=R,
                                cb_max=1)
        T = -(-T // (LANES * R)) * LANES * R
    T, R, _ = _resolve_params(W, n, T, R, scoring, CB=1)
    _check_packing(W, n, R, scoring)

    ap, bt, num_stripes = _build_inputs(
        np.asarray(window, np.int8), reads.reshape(-1), T, C, R)
    gr = np.zeros((num_stripes * T,), np.int32)
    gr[np.arange(B) * rlen] = 1
    L = T // R
    grt = (gr.reshape(num_stripes, L, R).transpose(0, 2, 1)
           .reshape(num_stripes, R, L // LANES, LANES))

    if unroll is None:
        unroll = _auto_unroll(C, interpret)
    outs = _stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), jnp.asarray(np.ascontiguousarray(grt)),
        scoring=scoring, T=T, R=R, C=C, m=W, n=n, return_p=False,
        interpret=interpret, unroll=unroll)
    lanes_total = num_stripes * L
    lpacked = np.asarray(outs[2]).reshape(lanes_total)
    lbest_t = np.asarray(outs[3]).reshape(lanes_total)
    lanes_per_read = rlen // R
    lp = lpacked[: B * lanes_per_read].reshape(B, lanes_per_read)
    lt = lbest_t[: B * lanes_per_read].reshape(B, lanes_per_read)

    if R > 1:
        lsc = lp >> (R.bit_length() - 1)
        lrr = (R - 1) - (lp & (R - 1))
    else:
        lsc, lrr = lp, np.zeros_like(lp)
    scores = lsc.max(axis=1)
    lane_in_read = np.argmax(lsc == scores[:, None], axis=1)
    ar = np.arange(B)
    r_at = lrr[ar, lane_in_read]
    t_at = lt[ar, lane_in_read]
    glane = ar * lanes_per_read + lane_in_read
    read_i = (lane_in_read * R + r_at + 1).astype(np.int32)
    # column decode uses the within-stripe lane: each stripe sweeps its own
    # step counter, so j = t - (glane mod L) + 1
    win_j = (t_at - glane % L + 1).astype(np.int32)
    nohit = scores <= 0
    scores = np.maximum(scores, 0)
    read_i[nohit] = 0
    win_j[nohit] = 0
    return BatchStripeOut(scores.astype(np.int32), read_i, win_j)


def _sub_embed(substitution):
    """Raw (A, A) int table -> (nsym, npack, emb) for the on-device profile
    build: packed int8 words when every score fits int8 (4 symbols/word),
    the unpacked NEG_SUB-padded select-tree table otherwise. The leading
    4 sentinel columns catch the -1/-2/-3 padding codes (indexed at
    code + 4)."""
    sub32 = np.asarray(substitution, np.int32)
    A = sub32.shape[0]
    if _pack_fits(sub32):
        npack = -(-A // 4)
        emb8 = np.full((4 * npack, A + 4), -128, np.int64)
        emb8[:A, 4:] = sub32
        return 0, npack, jnp.asarray(emb8.astype(np.int32))
    emb = np.concatenate([np.full((A, 4), NEG_SUB, np.int32), sub32],
                         axis=1)
    return A, 0, jnp.asarray(emb)


def _profile_on_device(bt, emb, nsym: int, npack: int):
    """(..., R, sub, L) device target codes -> per-stripe query profile in
    the layout _kernel expects — the group axis lands just before R, so
    this serves both the single-pair (S, R, sub, L) and the pairs-grid
    (B, S, R, sub, L) layouts (the device twin of
    _build_profile[_packed]). Codes outside [-3, A) clamp to the -4
    sentinel column (value NEG_SUB / -128): out-of-alphabet residues
    behave as padding — a strong mismatch — instead of silently aliasing
    a real symbol through jnp's clamped gather."""
    A = emb.shape[1] - 4
    bt = jnp.where((bt >= -3) & (bt < A), bt, -4)
    pos = bt.ndim - 3                      # group axis goes before R
    if nsym:
        return jnp.moveaxis(emb[:, bt + 4], 0, pos)
    prof = emb[:, bt + 4]
    by = prof & 0xFF
    return jnp.moveaxis(by[0::4] | (by[1::4] << 8) | (by[2::4] << 16)
                        | (by[3::4] << 24), 0, pos)


def _sub_gaps_ok(scoring: Scoring) -> bool:
    """Substitution mode's unmasked-fill precondition: only the gap
    penalties must be negative (sentinel profile rows supply the strongly
    negative 'mismatch')."""
    if scoring.is_affine:
        return scoring.gap_open < 0 and scoring.gap_extend < 0
    return scoring.gap < 0


def stripe_block_fn(m: int, n: int, scoring: Scoring = Scoring(),
                    T: Optional[int] = None, R: Optional[int] = None,
                    C: int = DEFAULT_CHUNK, unroll: Optional[int] = None,
                    interpret: Optional[bool] = None, local: bool = True,
                    want_bottom: bool = True, substitution=None):
    """Jittable boundary-injected block fill for the multi-chip pipeline
    and the linear-space traceback passes.

    Returns fn(a, b, top_row, left_col) -> (max_score, max_i, max_j,
    last_cell, bottom_row, right_col) with scan_fill's boundary semantics
    (top_row/left_col are the padded H values of row 0 / column 0, both of
    which include the shared H[0,0] corner). All inputs/outputs are device
    arrays so the fn composes with shard_map + ppermute halo exchange.

    local=False runs the global (Needleman-Wunsch) recurrence — no zero
    floor, boundaries as injected; the (max, position) outputs are valid
    only when the true max is positive (the anchored-reverse contract).
    want_bottom=False skips the bottom-row export (then bottom_row is
    last_cell only) and lifts the n % T divisibility requirement.

    Affine mode takes fn(a, b, top_row, left_col, top_f, left_e) and
    returns (..., bottom_row, right_col, bottom_f, right_e) — the Gotoh
    block decomposition with full H/E/F boundary continuation.

    ``substitution``: optional (A, A) int table — the profile modes
    compose with boundary injection (the reference's scoring hook runs
    inside every strategy, serial_smithW.c:251-256; so does this one),
    which is what lets protein/BLOSUM workloads ride the multi-chip
    pipeline and the linear-space traceback at stripe speed.
    """
    if interpret is None:
        interpret = _interpret_default()
    T, R, _ = _resolve_params(m, n, T, R, scoring, CB=1)
    nsym = npack = 0
    emb = None
    if substitution is not None:
        if not _sub_gaps_ok(scoring):
            raise ValueError("substitution mode needs negative gaps")
        hi = max(int(np.asarray(substitution).max()), 1) * min(m, n)
        if hi * R >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
        nsym, npack, emb = _sub_embed(substitution)
    else:
        _check_packing(m, n, R, scoring)
    L = T // R
    num_stripes = -(-n // T)
    if want_bottom and num_stripes * T != n:
        # the ring only holds the true matrix bottom row if the last stripe's
        # bottom lane is row n exactly
        raise ValueError(f"n={n} must be a multiple of the stripe height "
                         f"T={T} for bottom-row export")
    rlen = _ring_len(m, T, R, C)
    u = _auto_unroll(C, interpret) if unroll is None else unroll

    affine = scoring.is_affine
    NEGR = jnp.int32(-(1 << 24))    # kernel-internal F/E sentinel scale

    def lane_major(vec):
        return (vec.reshape(num_stripes, L, R).transpose(0, 2, 1)
                .reshape(num_stripes, R, L // LANES, LANES))

    def fn(a, b, top_row, left_col, top_f=None, left_e=None):
        ap, bt = _device_inputs(a, b, m, n, T, C, R)
        if nsym or npack:
            bt = _profile_on_device(bt, emb, nsym, npack)
        top = jnp.zeros((1, rlen), jnp.int32)
        top = jax.lax.dynamic_update_slice(
            top, top_row.astype(jnp.int32)[None, :], (0, L - 2))
        # left-column tiles: [0] = H(i, 0) for LEFT at j=1, [1] = H(i-1, 0)
        # for DIAG; lane-major layout (stripe, r, sub, lane)
        lp = jnp.zeros((num_stripes * T + 1,), jnp.int32)
        lp = jax.lax.dynamic_update_slice(lp, left_col.astype(jnp.int32),
                                          (0,))
        lcd = lane_major(lp[:num_stripes * T])
        lcl = lane_major(lp[1:num_stripes * T + 1])
        planes = [lcl, lcd]
        ftop = None
        if affine:
            # clamp external -inf (-2^30) to the kernel's gentler sentinel
            # so per-step g_ext decay cannot underflow int32
            tf = jnp.maximum(top_f.astype(jnp.int32), NEGR)
            le = jnp.maximum(left_e.astype(jnp.int32), NEGR)
            ftop = jnp.full((1, rlen), NEGR, jnp.int32)
            ftop = jax.lax.dynamic_update_slice(ftop, tf[None, :],
                                                (0, L - 2))
            lpe = jnp.full((num_stripes * T + 1,), NEGR, jnp.int32)
            lpe = jax.lax.dynamic_update_slice(lpe, le, (0,))
            planes.append(lane_major(lpe[1:num_stripes * T + 1]))
        lc = jnp.stack(planes, axis=1)

        outs = _stripe_call(ap, bt, None, None, top, lc, ftop,
                            scoring=scoring,
                            T=T, R=R, C=C, m=m, n=n, return_p=False,
                            interpret=interpret, unroll=u,
                            want_bottom=want_bottom, local=local,
                            nsym=nsym, npack=npack)
        outs = list(outs)
        best, rc = outs.pop(0), outs.pop(0)
        rce = outs.pop(0) if affine else None
        ring = outs.pop(0) if want_bottom else None
        fring = outs.pop(0) if (want_bottom and affine) else None

        scores = best[:, 0]
        s_star = jnp.max(scores)
        sidx = jnp.argmax(scores == s_star).astype(jnp.int32)
        rowv = best[sidx, 1]
        t_star = best[sidx, 2]
        has = s_star > 0
        bi = jnp.where(has, sidx * T + rowv + 1, 0)
        bj = jnp.where(has, t_star - rowv // R + 1, 0)

        # lane-major rc -> row-major right column, corner from top_row[m]
        def rm(x):
            return (x.reshape(num_stripes, R, L).transpose(0, 2, 1)
                    .reshape(num_stripes * T))[:n]

        right_col = jnp.concatenate([top_row[m:m + 1].astype(jnp.int32),
                                     rm(rc)])
        if want_bottom:
            bottom_row = jnp.concatenate(
                [left_col[n:n + 1].astype(jnp.int32),
                 jax.lax.dynamic_slice(ring[0], (L - 1,), (m,))])
        else:
            bottom_row = right_col[n:n + 1]
        last_cell = right_col[n]
        res = (jnp.maximum(s_star, 0), bi, bj, last_cell,
               bottom_row, right_col)
        if affine:
            right_e = jnp.concatenate(
                [jnp.full((1,), NEGR, jnp.int32), rm(rce)])
            if want_bottom:
                bottom_f = jnp.concatenate(
                    [jnp.full((1,), NEGR, jnp.int32),
                     jax.lax.dynamic_slice(fring[0], (L - 1,), (m,))])
            else:
                bottom_f = right_e[n:n + 1]
            res = res + (bottom_f, right_e)
        return res

    return jax.jit(fn)


def batch_score_fn(B: int, rlen: int, W: int,
                   scoring: Scoring = Scoring(),
                   T: Optional[int] = None, R: Optional[int] = None,
                   C: int = DEFAULT_CHUNK, CB: int = 2,
                   unroll: Optional[int] = None,
                   interpret: Optional[bool] = None,
                   substitution=None):
    """Jittable batch scorer: fn(reads (B, rlen) int, window (W,) int) ->
    (scores (B,), read_i (B,), win_j (B,)) — the device-resident form of
    `batch_fill_raw` for use inside shard_map / window-scan loops (the
    reads tiling is loop-invariant; only the window changes per call).
    Pad reads with the -3 sentinel; rlen should be a multiple of 8 for the
    full register-blocking win."""
    if interpret is None:
        interpret = _interpret_default()
    if R is None:
        R = next(r for r in (32, 16, 8, 4, 2, 1)
                 if rlen % r == 0 and (T is None or T % (LANES * r) == 0))
    elif rlen % R:
        raise ValueError(f"R={R} must divide the padded read length {rlen}")
    n = B * rlen
    if T is None:
        T, _, _ = choose_params(W, n, affine=scoring.is_affine, r_max=R,
                                cb_max=1)
        T = -(-T // (LANES * R)) * LANES * R
    nsym = npack = 0
    sub_emb = None
    if substitution is not None:
        substitution = np.asarray(substitution, np.int32)
        CB = 1 if CB is None or CB == 2 else CB   # profile path: CB=1 wins
        nsym, npack, sub_emb = _sub_embed(substitution)
    T, R, CB = _resolve_params(W, n, T, R, scoring, CB=CB)
    if substitution is None:
        _check_packing(W, n, R, scoring, CB)
    else:
        hi = max(int(substitution.max()), 1) * min(W, n)
        if hi * R * CB >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
    u = _auto_unroll(C, interpret) if unroll is None else unroll
    L = T // R
    num_stripes = -(-n // T)
    lanes_per_read = rlen // R

    num_chunks = -(-_steps(W, L, CB) // C)

    def prepare(reads):
        """Window-invariant read tiling + reset mask; call once, reuse the
        result across every window scored against the same batch."""
        gr = jnp.zeros((num_stripes * T,), jnp.int32)
        gr = gr.at[jnp.arange(B) * rlen].set(1)
        grt = (gr.reshape(num_stripes, L, R).transpose(0, 2, 1)
               .reshape(num_stripes, R, L // LANES, LANES))
        bp = jnp.full((num_stripes * T,), -2, jnp.int32)
        bp = bp.at[:n].set(reads.reshape(-1).astype(jnp.int32))
        bt = (bp.reshape(num_stripes, L, R).transpose(0, 2, 1)
              .reshape(num_stripes, R, L // LANES, LANES))
        if nsym or npack:
            # (S, nsym|npack, R, sub, L) query profile (see _build_profile)
            bt = _profile_on_device(bt, sub_emb, nsym, npack)
        return bt, grt

    def score_prepared(prepared, window):
        bt, grt = prepared
        aa = jnp.full((CB * num_chunks * C,), -1, jnp.int32)
        aa = aa.at[:W].set(window.astype(jnp.int32))
        ap = aa.reshape(num_chunks * C, CB).T[None]
        outs = _stripe_call(ap, bt, grt, scoring=scoring, T=T, R=R, C=C,
                            CB=CB, m=W, n=n, return_p=False,
                            interpret=interpret, unroll=u, nsym=nsym,
                            npack=npack)
        lanes_total = num_stripes * L
        npr = B * lanes_per_read

        def per_read(x):
            return x.reshape(lanes_total)[:npr].reshape(B, lanes_per_read)

        lp = per_read(outs[2])
        lt = per_read(outs[3])
        lcb = per_read(outs[4]) if CB > 1 else None
        if R > 1:
            lsc = lp >> (R.bit_length() - 1)
            lrr = (R - 1) - (lp & (R - 1))
        else:
            lsc, lrr = lp, jnp.zeros_like(lp)
        scores = jnp.max(lsc, axis=1)
        lane_in_read = jnp.argmax(lsc == scores[:, None], axis=1) \
            .astype(jnp.int32)
        ar = jnp.arange(B)
        r_at = lrr[ar, lane_in_read]
        t_at = lt[ar, lane_in_read]
        col_at = (CB - 1 - lcb[ar, lane_in_read]) if CB > 1 else 0
        glane = ar * lanes_per_read + lane_in_read
        read_i = lane_in_read * R + r_at + 1
        # j = CB*(t - within-stripe lane) + col + 1
        win_j = CB * (t_at - glane % L) + col_at + 1
        has = scores > 0
        return (jnp.maximum(scores, 0),
                jnp.where(has, read_i, 0).astype(jnp.int32),
                jnp.where(has, win_j, 0).astype(jnp.int32))

    fn = jax.jit(lambda reads, window: score_prepared(prepare(reads),
                                                      window))
    fn.prepare = jax.jit(prepare)
    fn.score_prepared = jax.jit(score_prepared)
    fn.config = {"T": T, "R": R, "CB": CB, "C": C, "unroll": u}
    return fn


def packed_pairs_geometry(n: int, R: Optional[int] = None) -> tuple:
    """(R, rlen, lanes_per_pair) for the packed-pairs mode — the ONE
    source of truth for its packing geometry (the score fn, the routing
    cap estimate in dist/batch, and the sanitizer all consult this).
    Default R: largest power-of-two register depth whose row padding
    stays <= 1/8 of the pair (the ramp shrinks as 1/R; padding rows cost
    pad*m garbage cells per pair)."""
    if R is None:
        R = next((r for r in (32, 16, 8, 4, 2, 1)
                  if (-n % r) * 8 <= n), 1)
    rlen = -(-n // R) * R                  # per-pair padded row count
    return R, rlen, rlen // R


def pairs_packed_score_fn(B: int, m: int, n: int,
                          scoring: Scoring = Scoring(),
                          T: Optional[int] = None,
                          R: Optional[int] = None,
                          C: int = DEFAULT_CHUNK,
                          unroll: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          substitution=None):
    """Jittable packed-pairs scorer: fn(a_batch (B, m), b_batch (B, n)) ->
    (scores, max_i, max_j), each (B,) int32 — `pairs_score_fn`'s exact
    contract (row-major first-occurrence argmax per pair) with a
    different execution: every pair's target rows pack back-to-back into
    ONE stripe chain (batch mode's reset-mask row packing) and each
    pair's own query stream is INJECTED at its boundary lanes (kernel
    ``winject`` mode), so the whole batch pays one ramp bubble instead
    of B of them. Cost model: steps = S*ceil(m) + L_total versus the
    pairs grid's B*(m + L_pair) — at 64 x 1056^2 that's ~3.3k steps
    against ~84k, the round-3 VERDICT #4 fix (4.0 effective GCUPS ->
    this path's projection is several tens).

    Same-shape pairs only (the reference's whole workload model is one
    (m, n) per run, omp_smithW.c:87-96); ragged batches pad to the
    enclosing shape upstream. Memory: the injection tensor is
    steps_pad * L_total ints in HBM (~steps * B*n/R * 4 bytes), streamed
    chunk-wise through VMEM.
    """
    if interpret is None:
        interpret = _interpret_default()
    R, rlen, lpp = packed_pairs_geometry(n, R)
    ntot = B * rlen
    if T is None:
        # one stripe if the injection chunk block fits VMEM (SUB <= 16:
        # 2 x C*SUB*128*4 = 2 MB double-buffered at C=128); else the
        # fewest stripes at that cap, then BALANCED — every stripe pays
        # full steps_pad, so a barely-used tail stripe (e.g. 64x1056:
        # 67584 lanes at T=65536 -> stripe 2 is 97% padding) costs the
        # same as a full one; equal stripes shrink L and with it the
        # per-stripe step count (measured 13.7 -> ~19 eff GCUPS there).
        sub_total = -(-ntot // (LANES * R))
        ns = -(-sub_total // 16)
        sub = -(-sub_total // ns)
        T = LANES * sub * R
    T, R, _ = _resolve_params(m, ntot, T, R, scoring, CB=1)
    nsym = npack = 0
    sub_emb = None
    if substitution is not None:
        substitution = np.asarray(substitution, np.int32)
        hi = max(int(substitution.max()), 1) * min(m, n)
        if hi * R >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
        if not _sub_gaps_ok(scoring):
            raise ValueError("substitution mode needs negative gaps")
        nsym, npack, sub_emb = _sub_embed(substitution)
    else:
        _check_packing(m, ntot, R, scoring, 1)
    L = T // R
    sub_rows = L // LANES
    num_stripes = -(-ntot // T)
    steps_pad = -(-_steps(m, L, 1) // C) * C
    inj_bytes = num_stripes * steps_pad * L * 4
    if inj_bytes > (2 << 30):
        raise ValueError(
            f"packed-pairs injection tensor would need {inj_bytes >> 20} "
            "MB of HBM (~1/R of the batch's cell count); use the pair "
            "grid (pairs_score_fn / batch_score plan='stripe') for this "
            "shape")
    u = _auto_unroll(C, interpret) if unroll is None else unroll

    def prepare(a_batch, b_batch):
        # --- packed target rows + reset mask (as batch_score_fn) ---
        gr = jnp.zeros((num_stripes * T,), jnp.int32)
        gr = gr.at[jnp.arange(B) * rlen].set(1)
        grt = (gr.reshape(num_stripes, L, R).transpose(0, 2, 1)
               .reshape(num_stripes, R, sub_rows, LANES))
        bp = jnp.full((B, rlen), -3, jnp.int32)
        bp = bp.at[:, :n].set(b_batch.astype(jnp.int32))
        bp = jnp.concatenate(
            [bp.reshape(-1),
             jnp.full((num_stripes * T - ntot,), -2, jnp.int32)])
        bt = (bp.reshape(num_stripes, L, R).transpose(0, 2, 1)
              .reshape(num_stripes, R, sub_rows, LANES))
        if nsym or npack:
            bt = _profile_on_device(bt, sub_emb, nsym, npack)
        # --- per-pair stream injection: inj[s, t, k] = a_g[t - k] for
        # lane k = pair-g start (or lane 0), sentinel -1 outside [0, m) ---
        Ap = jnp.full((B, steps_pad), -1, jnp.int32)
        Ap = Ap.at[:, :m].set(a_batch.astype(jnp.int32))
        inj = jnp.full((num_stripes, steps_pad, L), -1, jnp.int32)
        for s in range(num_stripes):
            base = s * L
            ks = {0} | set(range((-base) % lpp, L, lpp))
            for k in sorted(ks):
                g = (base + k) // lpp
                if g >= B:
                    break                  # padding rows past the last pair
                if k == 0:
                    inj = inj.at[s, :, 0].set(Ap[g])
                else:
                    inj = inj.at[s, k:, k].set(Ap[g, :steps_pad - k])
        return (bt, grt,
                inj.reshape(num_stripes, steps_pad, sub_rows, LANES))

    def score_prepared(prepared):
        bt, grt, inj = prepared
        ap = jnp.full((1, 1, steps_pad), -1, jnp.int32)   # stream unused
        outs = _stripe_call(ap, bt, grt, inj, scoring=scoring, T=T, R=R,
                            C=C, m=m, n=ntot, return_p=False,
                            interpret=interpret, unroll=u, nsym=nsym,
                            npack=npack, winject=lpp)
        lanes_total = num_stripes * L
        npr = B * lpp

        def per_pair(x):
            return x.reshape(lanes_total)[:npr].reshape(B, lpp)

        lp = per_pair(outs[2])
        lt = per_pair(outs[3])
        if R > 1:
            lsc = lp >> (R.bit_length() - 1)
            lrr = (R - 1) - (lp & (R - 1))
        else:
            lsc, lrr = lp, jnp.zeros_like(lp)
        scores = jnp.max(lsc, axis=1)
        lane_in_pair = jnp.argmax(lsc == scores[:, None], axis=1) \
            .astype(jnp.int32)
        ar = jnp.arange(B)
        r_at = lrr[ar, lane_in_pair]
        t_at = lt[ar, lane_in_pair]
        glane = ar * lpp + lane_in_pair
        bi = lane_in_pair * R + r_at + 1
        bj = t_at - glane % L + 1
        has = scores > 0
        return (jnp.maximum(scores, 0),
                jnp.where(has, bi, 0).astype(jnp.int32),
                jnp.where(has, bj, 0).astype(jnp.int32))

    fn = jax.jit(lambda a_batch, b_batch:
                 score_prepared(prepare(a_batch, b_batch)))
    fn.prepare = jax.jit(prepare)     # (bt, grt, inj) — the sanitizer
    #                                   reuses THIS build, never a copy
    fn.config = {"T": T, "R": R, "CB": 1, "C": C, "unroll": u,
                 "rlen": rlen, "lpp": lpp, "nsym": nsym, "npack": npack,
                 "num_stripes": num_stripes, "steps_pad": steps_pad}
    return fn


def pairs_score_fn(B: int, m: int, n: int,
                   scoring: Scoring = Scoring(),
                   T: Optional[int] = None, R: Optional[int] = None,
                   C: int = DEFAULT_CHUNK, CB: Optional[int] = None,
                   unroll: Optional[int] = None,
                   interpret: Optional[bool] = None,
                   substitution=None):
    """Jittable batched-pairs scorer: fn(a_batch (B, m), b_batch (B, n)) ->
    (scores, max_i, max_j), each (B,) int32.

    Unlike `batch_score_fn` (many reads vs ONE shared window), every pair
    here has its own query: the kernel gains a leading grid dimension over
    pairs, and the per-stripe scratch state simply re-initializes at each
    pair's first (stripe, chunk). This is BASELINE config 3's data-parallel
    layout executed as one Pallas program per device shard instead of a
    vmapped XLA scan. ``substitution`` enables protein/BLOSUM scoring via
    per-pair query profiles built in-trace from the static embedding
    (the reference's scoring hook runs in every strategy,
    serial_smithW.c:251-256)."""
    if interpret is None:
        interpret = _interpret_default()
    if CB is None:
        CB = 1   # per-pair grids are small; the longer CB chain loses
    T, R, CB = _resolve_params(m, n, T, R, scoring, CB=CB)
    nsym = npack = 0
    sub_emb = None
    if substitution is not None:
        sub32 = np.asarray(substitution, np.int32)
        hi = max(int(sub32.max()), 1) * min(m, n)
        if hi * R * CB >= (1 << 30):
            raise ValueError("score range too large for packed argmax")
        if not _sub_gaps_ok(scoring):
            raise ValueError("substitution mode needs negative gaps")
        nsym, npack, sub_emb = _sub_embed(sub32)
    else:
        _check_packing(m, n, R, scoring, CB)
    L = T // R
    sub_rows = L // LANES
    num_stripes = -(-n // T)
    steps = _steps(m, L, CB)
    num_chunks = -(-steps // C)
    u = _auto_unroll(C, interpret) if unroll is None else unroll
    if C % u:
        raise ValueError(f"C={C} must be a multiple of unroll={u}")

    kernel = _kernel(scoring, T, R, C, m, n, steps, num_chunks,
                     return_p=False, unroll=u, pairs=True, CB=CB,
                     nsym=nsym, npack=npack)

    out_shape = (
        jax.ShapeDtypeStruct((B, num_stripes, 8), jnp.int32),
        jax.ShapeDtypeStruct((B, num_stripes, R, sub_rows, LANES),
                             jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, R, sub_rows, LANES),
                     lambda p, s, c: (p, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    tile = pltpu.VMEM((sub_rows, LANES), jnp.int32)
    rtile = pltpu.VMEM((R, sub_rows, LANES), jnp.int32)
    ctile = pltpu.VMEM((CB, sub_rows, LANES), jnp.int32)
    ring = pltpu.VMEM((CB, _ring_len(m, T, R, C, CB)), jnp.int32)
    scratch = [rtile, ctile, ctile, tile, ctile, ctile,
               tile, tile, tile, rtile, ring]
    if scoring.is_affine:
        scratch += [rtile, ctile, ctile, ring]
    in_specs = (
        pl.BlockSpec((1, 1, CB, num_chunks * C),
                     lambda p, s, c: (p, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nsym or npack, R, sub_rows, LANES),
                     lambda p, s, c: (p, s, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)     # query profile
        if (nsym or npack) else
        pl.BlockSpec((1, 1, R, sub_rows, LANES),
                     lambda p, s, c: (p, s, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    def kernel3(a_ref, b_ref, *rest):
        # drop the leading pair-block dim so the 2D kernel body applies
        # (.at keeps these as ref views, not loads)
        return kernel(a_ref.at[0], b_ref.at[0], *rest)

    call = pl.pallas_call(
        kernel3,
        grid=(B, num_stripes, num_chunks),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )

    def fn(a_batch, b_batch):
        aa = jnp.full((B, CB * num_chunks * C), -1, jnp.int32)
        aa = aa.at[:, :m].set(a_batch.astype(jnp.int32))
        ap = aa.reshape(B, num_chunks * C, CB).transpose(0, 2, 1)[:, None]
        bp = jnp.full((B, num_stripes * T), -2, jnp.int32)
        bp = bp.at[:, :n].set(b_batch.astype(jnp.int32))
        bt = (bp.reshape(B, num_stripes, L, R).transpose(0, 1, 3, 2)
              .reshape(B, num_stripes, R, sub_rows, LANES))
        if sub_emb is not None:
            # in-trace per-pair profile build: (B, S, R, sub, L) codes ->
            # (B, S, G, R, sub, L) profile
            bt = _profile_on_device(bt, sub_emb, nsym, npack)
        best, _rc = call(ap, bt)
        sc = best[:, :, 0]                       # (B, S)
        s_star = jnp.max(sc, axis=1)
        sidx = jnp.argmax(sc == s_star[:, None], axis=1).astype(jnp.int32)
        ar = jnp.arange(B)
        rowv = best[ar, sidx, 1]
        t_star = best[ar, sidx, 2]
        colw = best[ar, sidx, 3]
        has = s_star > 0
        bi = jnp.where(has, sidx * T + rowv + 1, 0)
        bj = jnp.where(has, CB * (t_star - rowv // R) + colw + 1, 0)
        return jnp.maximum(s_star, 0), bi, bj

    return jax.jit(fn)
