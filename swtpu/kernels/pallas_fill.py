"""Pallas TPU stripe kernel — the single-chip performance path.

TPU-native re-design of the reference's GPU strategies. Where the CUDA family
launches one thread per cell of one anti-diagonal
(simple-cuda/cuda_global_mem_smithW.cu:165-261) and the rotated family keeps
three rolling diagonal buffers in unified memory
(rotated-cuda/sw-rotated-cuda-unified.cu:225-241), this kernel:

* processes the matrix in **stripes of T rows** (T = 1024 default, held as a
  (T/128, 128) int32 register tile = full VPU lanes);
* sweeps the stripe's anti-diagonals with a **row-stationary systolic
  layout**: lane k is row k+1 of the stripe; per step, LEFT is the same lane
  one step back, UP/DIAG are lane k-1 one/two steps back — one linearized
  lane-shift (two `pltpu.roll`s + select) implements the dependency;
* slides the **query window** one lane per step: lane 0 ingests a[t] at step
  t (a chunk of `a` is loaded 128-aligned and rolled one lane per step), so
  substitution scoring is a single vector compare — no gathers, no rotated
  storage;
* chains stripes through a **bottom-row boundary buffer** in VMEM scratch
  (persistent across the sequential TPU grid), the analog of the reference's
  data-residency lesson (v6.3's device-resident H/P,
  omp_smithW-v6.3-target-inlined.cpp:237-332): nothing round-trips to HBM
  between stripes except the optional predecessor stream;
* tracks the global max with per-lane (first-step-wins) registers reduced
  once per stripe — replacing `omp critical` / atomicCAS retry loops with
  race-free vector selects.

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

from ..core.config import DIAGONAL, LEFT, NONE, UP, EngineConfig, Scoring

LANES = 128
BIG = 2**30

# Practical single-kernel width cap: Q + boundary row must fit VMEM
# (4 bytes * ~2m each; 16 MB VMEM). Beyond this, the multi-chip pipeline or
# host-level column chunking takes over.
MAX_WIDTH = 1 << 20


def choose_stripe_rows(m: int, n: int, t_max: int = 16384) -> int:
    """Pick the stripe height minimizing total steps = stripes * (m + T):
    big T amortizes the per-step dependency latency; small T shrinks the
    diagonal ramp bubble and stripe padding. Exhaustive over stripe counts
    (cheap: <= n/128 candidates)."""
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


def stripe_fill_supported(m: int, n: int, traceback: bool) -> bool:
    return m >= 2 and n >= 1 and m <= MAX_WIDTH


def _interpret_default() -> bool:
    from ..dispatch.plan import current_platform
    try:
        return current_platform() != "tpu"
    except Exception:
        return True


def _kernel(scoring: Scoring, T: int, C: int, m: int, n: int,
            steps: int, num_chunks: int, return_p: bool,
            batch: bool = False):
    sub_rows = T // LANES
    match = int(scoring.match)
    mismatch = int(scoring.mismatch)
    gap = int(scoring.gap)
    affine = scoring.is_affine
    if affine:
        g_open = int(scoring.gap_open)
        g_ext = int(scoring.gap_extend)
        neg = -(1 << 24)
    # Boundary-row ring indexed by step: bot[t] == bottom-lane value of step
    # t of the stripe above (= H(stripe_top - 1, j = t - T + 2)). Written one
    # aligned C-slice per chunk, read T-2 elements ahead, so a single buffer
    # serves producer (this stripe) and consumer (next stripe).
    bot_len = num_chunks * C + T + C + 256

    def kernel(a_ref, b_ref, *rest):
        # Batch mode ('many reads packed in lanes'): an extra reset-mask
        # input marks read-start lanes whose UP/DIAG inflow is forced to the
        # zero boundary, making each read's DP independent; per-lane best
        # registers are exported so the host reduces per read.
        if batch:
            greset_ref = rest[0]
            rest = rest[1:]
        best_ref, rc_ref = rest[0], rest[1]
        rest = rest[2:]
        if batch:
            lbest_ref, lbest_t_ref = rest[0], rest[1]
            rest = rest[2:]
        if return_p:
            p_ref = rest[0]
            rest = rest[1:]
        # Chunk-persistent state. The wavefront registers are carried through
        # the step loop PRE-ROLLED: (c1, c2) are the lane/sublane rolls of
        # the previous step's H row (so the UP/DIAG shifts are two selects,
        # not two rolls), (p1, p2) the rolls from two steps back, (w1, w2)
        # the rolls of the query window. Rolling happens once per step on the
        # freshly computed hn/wv — 4 rolls/step instead of 6, and the roll
        # wraparound delivers the bottom-lane value at [0, 0] for free.
        if affine:
            (hv, c1, c2, p1, p2, w1, w2, best, best_t, rc, bot,
             ev, fr1, fr2, fbot) = rest
        else:
            (hv, c1, c2, p1, p2, w1, w2, best, best_t, rc, bot) = rest

        s_idx = pl.program_id(0)
        c_idx = pl.program_id(1)

        col = jax.lax.broadcasted_iota(jnp.int32, (sub_rows, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (sub_rows, LANES), 0)
        lin = row * LANES + col                     # lane id k; row i = k+1
        origin = lin == 0
        col0 = col == 0

        # rows beyond n (stripe padding) are permanently invalid
        rowlim = n - s_idx * T - 1                  # lane valid iff lin <= rowlim

        @pl.when(c_idx == 0)
        def _init_stripe():
            zero = jnp.zeros((sub_rows, LANES), jnp.int32)
            hv[...] = zero
            c1[...] = zero
            c2[...] = zero
            p1[...] = zero
            p2[...] = zero
            w1[...] = zero - 1                      # sentinel codes
            w2[...] = zero - 1
            best[...] = zero
            best_t[...] = zero
            rc[...] = zero
            if affine:
                ev[...] = zero + neg
                fr1[...] = zero + neg
                fr2[...] = zero + neg

            @pl.when(s_idx == 0)
            def _():
                bot[...] = jnp.zeros((1, bot_len), jnp.int32)
                if affine:
                    # F(0, j) = -inf: no vertical gap enters from row 0
                    fbot[...] = jnp.full((1, bot_len), neg, jnp.int32)

        btile = b_ref[0]
        if batch:
            gmask = greset_ref[0] != 0
        ciota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        # Chunk-start aligned vector loads (Mosaic requires 128-multiple lane
        # offsets); per-step boundary scalars come from registers rolled one
        # lane per step:
        #   bw[0, 126 + tl] = bot_ring[c*C + T - 2 + tl] = H(row above, j = t)
        #   av[0, tl]       = a[t] — the query code entering lane 0 at step t
        bw0 = bot[0:1, pl.ds(c_idx * C + T - 128, C + 128)]
        av0 = a_ref[0:1, pl.ds(c_idx * C, C)]
        if affine:
            fw0 = fbot[0:1, pl.ds(c_idx * C + T - 128, C + 128)]

        def lane_rolls(x):
            r1 = pltpu.roll(x, 1, axis=1)
            r2 = pltpu.roll(r1, 1, axis=0)
            return r1, r2

        def step(tl, carry):
            # Steps past the stripe's true extent (the chunk-padding tail)
            # are harmless: every lane is invalid there, hn collapses to 0,
            # and the strict-> best update never fires.
            if affine:
                (h1v, hr1, hr2, q1, q2, wr1, wr2, botbuf, bw, av,
                 e1v, f1r1, f1r2, fw, fbuf) = carry
            else:
                h1v, hr1, hr2, q1, q2, wr1, wr2, botbuf, bw, av = carry
            t = c_idx * C + tl

            di_in = bw[0, 126]
            up_in = bw[0, 127]
            h1s = jnp.where(origin, up_in, jnp.where(col0, hr2, hr1))
            h2s = jnp.where(origin, di_in, jnp.where(col0, q2, q1))
            if batch:
                # read-start lanes see the zero top boundary, not the
                # previous read's bottom row
                h1s = jnp.where(gmask, 0, h1s)
                h2s = jnp.where(gmask, 0, h2s)
            wv = jnp.where(origin, av[0, 0], jnp.where(col0, wr2, wr1))

            valid = (lin >= t - m + 1) & (lin <= rowlim)

            sub = jnp.where(wv == btile, match, mismatch)
            diag = h2s + sub
            if affine:
                f_sh = jnp.where(origin, fw[0, 127],
                                 jnp.where(col0, f1r2, f1r1))
                if batch:
                    f_sh = jnp.where(gmask, neg, f_sh)
                e_new = jnp.maximum(h1v + g_open, e1v + g_ext)
                f_new = jnp.maximum(h1s + g_open, f_sh + g_ext)
                up = f_new
                left = e_new
                e_out = jnp.where(valid, e_new, neg)
                f_out = jnp.where(valid, f_new, neg)
            else:
                up = h1s + gap
                left = h1v + gap

            zero = jnp.zeros_like(h1v)
            if return_p:
                hn = zero
                pn = zero
                take = diag > hn
                hn = jnp.where(take, diag, hn)
                pn = jnp.where(take, jnp.int32(DIAGONAL), pn)
                take = up > hn
                hn = jnp.where(take, up, hn)
                pn = jnp.where(take, jnp.int32(UP), pn)
                take = left > hn
                hn = jnp.where(take, left, hn)
                pn = jnp.where(take, jnp.int32(LEFT), pn)
                pn = jnp.where(valid, pn, jnp.int32(NONE))
                p_ref[0, tl] = pn
            else:
                hn = jnp.maximum(jnp.maximum(diag, up),
                                 jnp.maximum(left, zero))
            hn = jnp.where(valid, hn, zero)

            # first-occurrence max per lane (strict >, so the smallest
            # step — i.e. smallest j — wins per row; serial_smithW.c:240)
            better = hn > best[...]
            best[...] = jnp.where(better, hn, best[...])
            best_t[...] = jnp.where(better, t, best_t[...])

            # right-edge capture for pipeline halos / last_cell
            rc[...] = jnp.where(lin == t - m + 1, hn, rc[...])

            nr1, nr2 = lane_rolls(hn)
            nw1, nw2 = lane_rolls(wv)
            # the roll wraparound parks hn[T-1 lane] at nr2[0, 0]: exactly
            # the bottom-row value this stripe exports to the next one
            botbuf = jnp.where(ciota == tl, nr2[0, 0], botbuf)

            out = (hn, nr1, nr2, hr1, hr2, nw1, nw2, botbuf,
                   pltpu.roll(bw, C + 127, axis=1),
                   pltpu.roll(av, C - 1, axis=1))
            if affine:
                nf1, nf2 = lane_rolls(f_out)
                fbuf = jnp.where(ciota == tl, nf2[0, 0], fbuf)
                out = out + (e_out, nf1, nf2,
                             pltpu.roll(fw, C + 127, axis=1), fbuf)
            return out

        carry0 = (hv[...], c1[...], c2[...], p1[...], p2[...],
                  w1[...], w2[...], jnp.zeros((1, C), jnp.int32), bw0, av0)
        if affine:
            carry0 = carry0 + (ev[...], fr1[...], fr2[...], fw0,
                               jnp.full((1, C), neg, jnp.int32))
        carry = jax.lax.fori_loop(0, C, step, carry0)

        # persist wavefront state for the next chunk; flush boundary slices
        hv[...], c1[...], c2[...], p1[...], p2[...], w1[...], w2[...] = \
            carry[:7]
        bot[0:1, pl.ds(c_idx * C, C)] = carry[7]
        if affine:
            ev[...], fr1[...], fr2[...] = carry[10], carry[11], carry[12]
            fbot[0:1, pl.ds(c_idx * C, C)] = carry[14]

        @pl.when(c_idx == num_chunks - 1)
        def _finish_stripe():
            bv = best[...]
            s_star = jnp.max(bv)
            li = jnp.where(bv == s_star, lin, BIG)
            k_star = jnp.min(li)
            t_star = jnp.max(jnp.where(lin == k_star, best_t[...], -1))
            best_ref[s_idx, 0] = s_star
            best_ref[s_idx, 1] = k_star
            best_ref[s_idx, 2] = t_star
            rc_ref[0] = rc[...]
            if batch:
                lbest_ref[0] = bv
                lbest_t_ref[0] = best_t[...]

    return kernel


class StripeOut(NamedTuple):
    max_score: jax.Array
    max_i: jax.Array
    max_j: jax.Array
    last_cell: jax.Array
    right_col: jax.Array            # (n+1,) int32
    p_stripes: Optional[jax.Array]  # (S, steps_pad, T) int32 diag-major or None


def _build_inputs(a_codes: np.ndarray, b_codes: np.ndarray, T: int, C: int):
    m, n = len(a_codes), len(b_codes)
    num_stripes = -(-n // T)
    steps = m + T - 1
    num_chunks = -(-steps // C)
    # a, sentinel-padded (-1) to the chunked step count: ap[0, t] = a[t]
    ap = np.full((1, num_chunks * C), -1, dtype=np.int32)
    ap[0, :m] = a_codes.astype(np.int32)
    # b padded with sentinel -2 (never matches codes or the a sentinel)
    bp = np.full((num_stripes * T,), -2, dtype=np.int32)
    bp[:n] = b_codes.astype(np.int32)
    bt = bp.reshape(num_stripes, T // LANES, LANES)
    return ap, bt, num_stripes


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "T", "C", "m", "n", "return_p", "interpret"),
)
def _stripe_call(q, bt, greset=None, *, scoring, T, C, m, n, return_p,
                 interpret):
    num_stripes = bt.shape[0]
    steps = m + T - 1
    num_chunks = -(-steps // C)
    sub_rows = T // LANES
    batch = greset is not None

    kernel = _kernel(scoring, T, C, m, n, steps, num_chunks, return_p,
                     batch=batch)

    out_shape = [
        jax.ShapeDtypeStruct((num_stripes, 8), jnp.int32),                 # best
        jax.ShapeDtypeStruct((num_stripes, sub_rows, LANES), jnp.int32),   # rc
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),    # best: full array, indexed by stripe
        pl.BlockSpec((1, sub_rows, LANES), lambda s, c: (s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if batch:
        for _ in range(2):                        # per-lane best, best_t
            out_shape.append(jax.ShapeDtypeStruct(
                (num_stripes, sub_rows, LANES), jnp.int32))
            out_specs.append(pl.BlockSpec(
                (1, sub_rows, LANES), lambda s, c: (s, 0, 0),
                memory_space=pltpu.VMEM))
    if return_p:
        out_shape.append(jax.ShapeDtypeStruct(
            (num_stripes, num_chunks * C, sub_rows, LANES), jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, C, sub_rows, LANES), lambda s, c: (s, c, 0, 0),
            memory_space=pltpu.VMEM))

    tile = pltpu.VMEM((sub_rows, LANES), jnp.int32)
    scratch = [tile] * 7 + [                        # hv,c1,c2,p1,p2,w1,w2
        tile,                                       # best
        tile,                                       # best_t
        tile,                                       # rc
        pltpu.VMEM((1, num_chunks * C + T + C + 256),
                   jnp.int32),                      # bottom-row boundary ring
    ]
    if scoring.is_affine:
        scratch += [
            tile,                                   # e value
            tile, tile,                             # f rolls
            pltpu.VMEM((1, num_chunks * C + T + C + 256),
                       jnp.int32),                  # F boundary ring
        ]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),      # a_pad (full)
        pl.BlockSpec((1, sub_rows, LANES), lambda s, c: (s, 0, 0),
                     memory_space=pltpu.VMEM),      # b stripe
    ]
    args = [q, bt]
    if batch:
        in_specs.append(pl.BlockSpec((1, sub_rows, LANES),
                                     lambda s, c: (s, 0, 0),
                                     memory_space=pltpu.VMEM))  # reset mask
        args.append(greset)

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


def stripe_fill_raw(
    a_codes: np.ndarray,
    b_codes: np.ndarray,
    scoring: Scoring = Scoring(),
    T: Optional[int] = None,
    C: int = 256,
    return_p: bool = False,
    interpret: Optional[bool] = None,
) -> StripeOut:
    """Run the stripe kernel; returns device arrays + host-reduced best."""
    m, n = len(a_codes), len(b_codes)
    if interpret is None:
        interpret = _interpret_default()
    if T is None:
        T = choose_stripe_rows(m, n)
    T = min(T, max(LANES, ((n + LANES - 1) // LANES) * LANES))
    ap, bt, num_stripes = _build_inputs(a_codes, b_codes, T, C)

    outs = _stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), scoring=scoring, T=T, C=C,
        m=m, n=n, return_p=return_p, interpret=interpret)
    best = np.asarray(outs[0])
    rc = np.asarray(outs[1]).reshape(num_stripes * T)[:n]
    p_stripes = outs[2] if return_p else None

    # lexicographic reduce across stripes: score desc, then stripe asc
    # (smaller stripe = smaller row, matching first-occurrence row-major)
    scores = best[:, 0]
    s_star = int(scores.max(initial=0))
    if s_star <= 0:
        bi = bj = 0
    else:
        sidx = int(np.argmax(scores == s_star))
        k, t = int(best[sidx, 1]), int(best[sidx, 2])
        bi = sidx * T + k + 1
        bj = t - k + 1
    right_col = np.concatenate([[0], rc]).astype(np.int32)
    last_cell = int(right_col[n])
    return StripeOut(
        max_score=np.int32(s_star), max_i=np.int32(bi), max_j=np.int32(bj),
        last_cell=np.int32(last_cell), right_col=right_col,
        p_stripes=p_stripes,
    )


def stripe_fill(a_codes, b_codes, scoring: Scoring = Scoring(),
                config: EngineConfig = EngineConfig(),
                return_p: bool = False, return_h: bool = False):
    """Engine adapter: returns (FillOut-like, P row-major or None, H=None)."""
    out = stripe_fill_raw(
        np.asarray(a_codes, np.int8), np.asarray(b_codes, np.int8),
        scoring=scoring, T=config.stripe_rows, return_p=return_p)
    P = None
    if return_p and out.p_stripes is not None:
        P = p_stripes_to_rowmajor(
            np.asarray(out.p_stripes), len(b_codes), len(a_codes))
    if return_h:
        raise NotImplementedError(
            "stripe plan does not materialize H; use plan='scan'")
    return out, P, None


def p_stripes_to_rowmajor(p: np.ndarray, n: int, m: int) -> np.ndarray:
    """(S, steps_pad, sub, 128) diag-major P -> padded (n+1, m+1) int8.

    Stripe-local cell (i_l = k+1, j = t-k+1) lives at [s, t, k//128, k%128].
    """
    S, steps_pad, sub, lanes = p.shape
    T = sub * lanes
    out = np.zeros((n + 1, m + 1), dtype=np.int8)
    pf = p.reshape(S, steps_pad, T)
    for s in range(S):
        rows = min(T, n - s * T)
        if rows <= 0:
            break
        kk = np.arange(rows)[:, None]          # stripe-local lane
        jj = np.arange(1, m + 1)[None, :]
        tt = kk + jj - 1                       # step where (k, j) was computed
        out[s * T + 1: s * T + rows + 1, 1:] = pf[s, tt, kk].astype(np.int8)
    return out


def stripe_score_fn(m: int, n: int, scoring: Scoring = Scoring(),
                    T: Optional[int] = None, C: int = 256):
    """Jittable (a, b) -> (max_score, max_i, max_j) using the stripe kernel
    with the cross-stripe reduction done on device (for benching)."""
    interpret = _interpret_default()
    if T is None:
        T = choose_stripe_rows(m, n)
    T = min(T, max(LANES, ((n + LANES - 1) // LANES) * LANES))

    def fn(a, b):
        # inputs as device arrays of codes; build q/bt on device
        ap, bt = _device_inputs(a, b, m, n, T, C)
        outs = _stripe_call(ap, bt, scoring=scoring, T=T, C=C, m=m, n=n,
                            return_p=False, interpret=interpret)
        best = outs[0]
        scores = best[:, 0]
        s_star = jnp.max(scores)
        sidx = jnp.argmax(scores == s_star).astype(jnp.int32)
        k = best[sidx, 1]
        t = best[sidx, 2]
        has = s_star > 0
        bi = jnp.where(has, sidx * T + k + 1, 0)
        bj = jnp.where(has, t - k + 1, 0)
        return s_star, bi, bj

    return fn


def _device_inputs(a, b, m, n, T, C):
    num_stripes = -(-n // T)
    steps = m + T - 1
    num_chunks = -(-steps // C)
    ap = jnp.full((1, num_chunks * C), -1, jnp.int32)
    ap = ap.at[0, :m].set(a.astype(jnp.int32))
    bp = jnp.full((num_stripes * T,), -2, jnp.int32)
    bp = bp.at[:n].set(b.astype(jnp.int32))
    bt = bp.reshape(num_stripes, T // LANES, LANES)
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
    C: int = 256,
    interpret: Optional[bool] = None,
) -> BatchStripeOut:
    """Batch mode of the stripe kernel: B reads packed back-to-back in lanes
    (read g owns lanes [g*r, (g+1)*r)), a reset mask forcing the zero top
    boundary at every read start, per-lane max registers exported and
    reduced per read on the host — BASELINE config 3's layout (many short
    reads, one target window), one kernel sweep for the whole batch."""
    B, r = reads.shape
    W = len(window)
    n = B * r
    if interpret is None:
        interpret = _interpret_default()
    if T is None:
        T = choose_stripe_rows(W, n)
    T = min(T, max(LANES, ((n + LANES - 1) // LANES) * LANES))

    ap, bt, num_stripes = _build_inputs(
        np.asarray(window, np.int8), reads.reshape(-1), T, C)
    gr = np.zeros((num_stripes * T,), np.int32)
    gr[np.arange(B) * r] = 1
    grt = gr.reshape(num_stripes, T // LANES, LANES)

    outs = _stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), jnp.asarray(grt),
        scoring=scoring, T=T, C=C, m=W, n=n, return_p=False,
        interpret=interpret)
    lbest = np.asarray(outs[2]).reshape(num_stripes * T)[:n].reshape(B, r)
    lbest_t = np.asarray(outs[3]).reshape(num_stripes * T)[:n].reshape(B, r)

    scores = lbest.max(axis=1)
    row = np.argmax(lbest == scores[:, None], axis=1)      # min read row
    t_at = lbest_t[np.arange(B), row]
    lane = np.arange(B) * r + row
    read_i = (row + 1).astype(np.int32)
    win_j = (t_at - lane + 1).astype(np.int32)
    nohit = scores <= 0
    read_i[nohit] = 0
    win_j[nohit] = 0
    return BatchStripeOut(scores.astype(np.int32), read_i, win_j)
