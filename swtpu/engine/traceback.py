"""Memory-lean traceback for huge matrices: locate + windowed refill +
Hirschberg divide-and-conquer.

The reference keeps the full O(mn) predecessor matrix and walks it on the
host (serial_smithW.c:262-277); its memory-lean rotated family simply leaves
traceback unimplemented (rotated-cuda/sw-rotated.cu:286-319 is a TODO stub).
This module closes that gap TPU-natively:

1. `locate()` — forward score pass finds the alignment END; a second score
   pass on the reversed clipped prefixes finds the START (the classic
   reverse-SW trick). O(1) extra memory.
2. `windowed()` — if the located window fits a budget, refill just the
   window with predecessors and walk it. O(window) memory.
3. `hirschberg()` — otherwise, global-align the located substrings in
   O(m+n) memory via divide-and-conquer, with the row-splitting passes
   running the device NW fill (`scan_fill(local=False)`) and only the
   O(small) base cases materializing matrices.

Note on parity: full-P traceback (the default engine path) reproduces the
reference's tie-breaking exactly. The linear-space paths return an optimal
alignment with the same score; on ties the path may differ (standard for
Hirschberg-style methods).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.config import DIAGONAL, LEFT, NONE, UP, Scoring
from ..core.encode import DNA_ALPHABET
from ..kernels.scan_fill import diag_to_rowmajor, scan_fill

_STRIPE_MIN_CELLS = 1 << 20


def _use_stripe(m: int, n: int, scoring: Scoring) -> bool:
    from ..dispatch.plan import current_platform
    from ..kernels.pallas_fill import _penalties_negative
    return (current_platform() == "tpu" and not scoring.is_affine
            and _penalties_negative(scoring) and m >= 2 and n >= 1
            and m * n >= _STRIPE_MIN_CELLS)


_fn_cache = {}


def _cached(kind, m, n, scoring, **kw):
    key = (kind, m, n, scoring, tuple(sorted(kw.items())))
    if key not in _fn_cache:
        from ..kernels import pallas_fill as pf
        maker = {"score": pf.stripe_score_fn, "block": pf.stripe_block_fn}
        _fn_cache[key] = maker[kind](m, n, scoring, **kw)
        if len(_fn_cache) > 64:
            _fn_cache.pop(next(iter(_fn_cache)))
    return _fn_cache[key]


def _local_score(a: np.ndarray, b: np.ndarray, scoring: Scoring):
    """Score-only forward pass: (max_score, max_i, max_j)."""
    m, n = len(a), len(b)
    if _use_stripe(m, n, scoring):
        fn = _cached("score", m, n, scoring)
        s, i, j = fn(jnp.asarray(a), jnp.asarray(b))
        return int(s), int(i), int(j)
    out = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=scoring)
    return int(out.max_score), int(out.max_i), int(out.max_j)


def _nw_argmax(a: np.ndarray, b: np.ndarray, scoring: Scoring,
               top: np.ndarray, left: np.ndarray):
    """Global-mode fill with injected boundaries; returns
    (max_score, max_i, max_j). Used by the anchored reverse pass, whose
    max is guaranteed positive."""
    m, n = len(a), len(b)
    if _use_stripe(m, n, scoring):
        fn = _cached("block", m, n, scoring, local=False, want_bottom=False)
        s, i, j, _, _, _ = fn(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(top), jnp.asarray(left))
        return int(s), int(i), int(j)
    out = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=scoring,
                    local=False, top_row=jnp.asarray(top),
                    left_col=jnp.asarray(left))
    return int(out.max_score), int(out.max_i), int(out.max_j)


class Located(NamedTuple):
    score: int
    start_i: int     # first aligned row (1-based, padded coords)
    start_j: int
    end_i: int       # last aligned row
    end_j: int


def locate(a: np.ndarray, b: np.ndarray,
           scoring: Scoring = Scoring()) -> Optional[Located]:
    """Find score + start/end cells of the optimal local alignment with two
    score-only passes (no P matrix)."""
    score, ei, ej = _local_score(a, b, scoring)
    if score <= 0:
        return None
    # Anchored reverse pass over the clipped reversed prefixes: global-mode
    # DP with -inf boundaries (except the origin) scores only paths that
    # START at the forward end cell, so its argmax is the true START of a
    # path ending exactly at (ei, ej). A plain reverse SW would be wrong:
    # its zero floor lets it pick a different equal-scoring path whose end
    # is elsewhere, breaking the window extraction.
    ar = a[:ej][::-1].copy()
    br = b[:ei][::-1].copy()
    NEG = -(1 << 30)
    top = np.full((ej + 1,), NEG, np.int32)
    left = np.full((ei + 1,), NEG, np.int32)
    top[0] = left[0] = 0
    rs, ri, rj = _nw_argmax(ar, br, scoring, top, left)
    assert rs == score, (rs, score)
    si = ei - ri + 1
    sj = ej - rj + 1
    return Located(score, si, sj, ei, ej)


def _nw_host(a: np.ndarray, b: np.ndarray, scoring: Scoring):
    """Small dense global alignment on host; returns (aligned_a, aligned_b).
    Base case of the Hirschberg recursion."""
    m, n = len(a), len(b)
    g = scoring.gap
    H = np.zeros((n + 1, m + 1), np.int64)
    H[0, :] = g * np.arange(m + 1)
    H[:, 0] = g * np.arange(n + 1)
    P = np.zeros((n + 1, m + 1), np.int8)
    P[0, 1:] = LEFT
    P[1:, 0] = UP
    sub = np.where(b[:, None] == a[None, :], scoring.match,
                   scoring.mismatch).astype(np.int64)
    # anti-diagonal vectorized NW fill (same wavefront trick as oracle.fill,
    # without the zero floor)
    for d in range(2, n + m + 1):
        i_lo, i_hi = max(1, d - m), min(n, d - 1)
        if i_lo > i_hi:
            continue
        ii = np.arange(i_lo, i_hi + 1)
        jj = d - ii
        diag = H[ii - 1, jj - 1] + sub[ii - 1, jj - 1]
        up = H[ii - 1, jj] + g
        left = H[ii, jj - 1] + g
        best = np.maximum(np.maximum(diag, up), left)
        pred = np.where(diag == best, DIAGONAL,
                        np.where(up == best, UP, LEFT)).astype(np.int8)
        H[ii, jj] = best
        P[ii, jj] = pred
    # walk from (n, m) to (0, 0)
    out_a, out_b = [], []
    i, j = n, m
    while i > 0 or j > 0:
        code = P[i, j]
        if code == DIAGONAL:
            out_a.append(a[j - 1]); out_b.append(b[i - 1]); i -= 1; j -= 1
        elif code == UP:
            out_a.append(-1); out_b.append(b[i - 1]); i -= 1
        else:
            out_a.append(a[j - 1]); out_b.append(-1); j -= 1
    return out_a[::-1], out_b[::-1]


def _nw_last_row(a: np.ndarray, b: np.ndarray, scoring: Scoring) -> np.ndarray:
    """Last row of the global DP via the device fill. O(m) output."""
    m, n = len(a), len(b)
    if n == 0:
        return scoring.gap * np.arange(m + 1)
    g = scoring.gap
    # Bucket the query length to a power of two so the Hirschberg
    # recursion's arbitrary split widths reuse ~log2(m) compiled shapes
    # instead of one per node (compile time dominated giant tracebacks).
    # NW values at columns <= m are unaffected by sentinel-padded columns
    # to their right (the DP flows left to right), so padding is exact.
    mp = max(16, 1 << (m - 1).bit_length())
    a_pad = np.full((mp,), -1, np.int8)
    a_pad[:m] = a
    top = (g * np.arange(mp + 1)).astype(np.int32)
    left = (g * np.arange(n + 1)).astype(np.int32)
    if _use_stripe(n, mp, scoring):
        # transposed stripe fill: the bottom row of (a, b) is the right
        # column of (b, a), which the kernel exports for any length
        # (padded a-rows sit below the real rows and cannot affect them)
        fn = _cached("block", n, mp, scoring, local=False,
                     want_bottom=False)
        _, _, _, _, _, right = fn(jnp.asarray(b), jnp.asarray(a_pad),
                                  jnp.asarray(left), jnp.asarray(top))
        return np.asarray(right[:m + 1]).astype(np.int64)
    out = scan_fill(jnp.asarray(a_pad), jnp.asarray(b), scoring=scoring,
                    local=False, top_row=jnp.asarray(top),
                    left_col=jnp.asarray(left))
    return np.asarray(out.bottom_row[:m + 1]).astype(np.int64)


_BASE_CELLS = 1 << 18


def _hirschberg(a: np.ndarray, b: np.ndarray, scoring: Scoring):
    m, n = len(a), len(b)
    if m == 0:
        return [-1] * n, list(b)
    if n == 0:
        return list(a), [-1] * m
    if (m + 1) * (n + 1) <= _BASE_CELLS or n == 1:
        return _nw_host(a, b, scoring)
    half = n // 2
    top = _nw_last_row(a, b[:half], scoring)
    bot = _nw_last_row(a[::-1].copy(), b[half:][::-1].copy(), scoring)[::-1]
    split = int(np.argmax(top + bot))
    a1, b1 = _hirschberg(a[:split], b[:half], scoring)
    a2, b2 = _hirschberg(a[split:], b[half:], scoring)
    return a1 + a2, b1 + b2


def _render(codes_a, codes_b, alphabet=DNA_ALPHABET):
    ra = "".join("-" if c == -1 else alphabet[c] for c in codes_a)
    rb = "".join("-" if c == -1 else alphabet[c] for c in codes_b)
    return ra, rb


def hirschberg(a: np.ndarray, b: np.ndarray, scoring: Scoring = Scoring()):
    """O(m+n)-memory optimal local alignment. Returns (score, Located,
    aligned_a, aligned_b) or None if nothing scores above 0.

    Linear-gap only (Gotoh/Myers-Miller state splitting for affine is a
    planned extension; affine traceback is available via the full-P path).
    """
    if scoring.is_affine:
        raise NotImplementedError("hirschberg supports linear gaps only")
    loc = locate(a, b, scoring)
    if loc is None:
        return None
    sub_a = a[loc.start_j - 1: loc.end_j]
    sub_b = b[loc.start_i - 1: loc.end_i]
    ca, cb = _hirschberg(np.asarray(sub_a), np.asarray(sub_b), scoring)
    ra, rb = _render(ca, cb)
    return loc.score, loc, ra, rb


def _stripe_window_walk(sub_a, sub_b, wn, wm, scoring):
    """LOCAL P-capture refill on the stripe kernel + an ON-DEVICE walk of
    the predecessor chain. The P tensor (O(window) int32) never leaves the
    chip — only the O(path) code sequence does. The window's bottom-right
    corner is the located end cell, so walking from there reproduces an
    optimal path; the zero-floor NONE stop is the located start."""
    import jax
    from jax import lax
    from ..kernels import pallas_fill as pf

    T, R, _ = pf._resolve_params(wm, wn, None, None, scoring,
                                 return_p=True, CB=1)
    pf._check_packing(wm, wn, R, scoring)
    ap, bt, S = pf._build_inputs(sub_a, sub_b, T, pf.DEFAULT_CHUNK, R)
    interp = pf._interpret_default()
    outs = pf._stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), scoring=scoring, T=T, R=R,
        C=pf.DEFAULT_CHUNK, m=wm, n=wn, return_p=True, interpret=interp,
        unroll=pf._auto_unroll(pf.DEFAULT_CHUNK, interp))
    pdev = outs[2]                 # (S, steps_pad, R, sub, 128) on device

    @jax.jit
    def walk(p):
        cap = wn + wm

        def body(carry):
            i, j, pos, codes = carry
            li = i - 1
            s_ = li // T
            lin = (li % T) // R
            r_ = li % R
            t_ = lin + j - 1
            code = p[s_, t_, 0, r_, lin // 128, lin % 128]
            codes = codes.at[pos].set(code.astype(jnp.int8))
            di = jnp.where(code == DIAGONAL, 1, jnp.where(code == UP, 1, 0))
            dj = jnp.where(code == DIAGONAL, 1, jnp.where(code == LEFT, 1, 0))
            # pos always advances; a written NONE terminates via cond and
            # is trimmed on the host
            return i - di, j - dj, pos + 1, codes

        def cond(carry):
            i, j, pos, codes = carry
            moved = (pos == 0) | (codes[pos - 1] != NONE)
            return (i > 0) & (j > 0) & moved & (pos < cap)

        codes0 = jnp.full((cap,), jnp.int8(NONE))
        i, j, pos, codes = lax.while_loop(
            cond, body, (jnp.int32(wn), jnp.int32(wm), jnp.int32(0), codes0))
        return pos, codes

    pos, codes = walk(pdev)
    npos = int(pos)
    cds = np.asarray(codes)[:npos]
    if npos and cds[-1] == NONE:
        cds = cds[:-1]
    out_a, out_b = [], []
    i, j = wn, wm
    for code in cds:
        if code == DIAGONAL:
            out_a.append(sub_a[j - 1]); out_b.append(sub_b[i - 1])
            i -= 1; j -= 1
        elif code == UP:
            out_a.append(-1); out_b.append(sub_b[i - 1]); i -= 1
        else:
            out_a.append(sub_a[j - 1]); out_b.append(-1); j -= 1
    return out_a[::-1], out_b[::-1]


def windowed(a: np.ndarray, b: np.ndarray, scoring: Scoring = Scoring(),
             max_window_cells: Optional[int] = None):
    """Locate, then refill only the alignment window with predecessors and
    walk it. Falls back to hirschberg() when the window exceeds the budget."""
    if scoring.is_affine:
        raise NotImplementedError("windowed traceback supports linear gaps")
    loc = locate(a, b, scoring)
    if loc is None:
        return None
    wm = loc.end_j - loc.start_j + 1
    wn = loc.end_i - loc.start_i + 1
    if max_window_cells is None:
        # the stripe refill keeps P on-device (int32 in HBM) and walks it
        # there, so the budget is HBM, not transfer: 2^29 cells = 2 GB of P
        max_window_cells = (1 << 30) if _use_stripe(wm, wn, scoring) \
            else (1 << 26)
    if wm * wn > max_window_cells:
        return hirschberg(a, b, scoring)
    sub_a = np.asarray(a[loc.start_j - 1: loc.end_j])
    sub_b = np.asarray(b[loc.start_i - 1: loc.end_i])
    if _use_stripe(wm, wn, scoring):
        ca, cb = _stripe_window_walk(sub_a, sub_b, wn, wm, scoring)
        ra, rb = _render(ca, cb)
        return loc.score, loc, ra, rb
    g = scoring.gap
    top = jnp.asarray(g * np.arange(wm + 1), jnp.int32)
    left = jnp.asarray(g * np.arange(wn + 1), jnp.int32)
    out = scan_fill(jnp.asarray(sub_a), jnp.asarray(sub_b), scoring=scoring,
                    local=False, top_row=top, left_col=left, return_p=True)
    P = diag_to_rowmajor(out.p_diag, wn, wm)
    P[0, 1:] = LEFT
    P[1:, 0] = UP
    out_a, out_b = [], []
    i, j = wn, wm
    while i > 0 or j > 0:
        code = P[i, j]
        if code == DIAGONAL:
            out_a.append(sub_a[j - 1]); out_b.append(sub_b[i - 1])
            i -= 1; j -= 1
        elif code == UP:
            out_a.append(-1); out_b.append(sub_b[i - 1]); i -= 1
        else:
            out_a.append(sub_a[j - 1]); out_b.append(-1); j -= 1
    ra, rb = _render(out_a[::-1], out_b[::-1])
    return loc.score, loc, ra, rb
