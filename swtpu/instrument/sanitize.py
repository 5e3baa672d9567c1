"""Debug-mode kernel sanitizer — the C22 analog.

The reference's rotated-omp DEBUG build wraps every element access in
`at()`/`set()` sentinels that catch out-of-bounds, read-of-uninitialized and
double-writes (rotated-cuda/sw-rotated-omp.cc:77-117). The stripe kernel's
correctness rests on invariants of comparable subtlety (CLAUDE.md pins
them): the UNMASKED fill is only valid because (1) pre-start lanes provably
stay at the zero floor, (2) post-finish garbage strictly decays and can
never tie the true maximum, and (3) the boundary-ring consumer offset
`up_in(t) = ring[t + L - 1]` keeps the producer >=128 lanes ahead.

`sanitize_stripe()` checks all three STRUCTURALLY: it runs the kernel in
interpret mode with a per-step H capture (`debug_h`) and verifies every
computed value against the NumPy oracle — valid cells bit-equal, pre-start
cells exactly zero, out-of-range cells strictly below the true max and
strictly decaying. A future violation of any invariant (e.g. a broken ring
offset — see the `_DEBUG_RING_SKEW` test hook) is caught here as a
structural error, not as a wrong answer three layers downstream.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.config import Scoring


class SanitizeError(AssertionError):
    """A stripe-kernel invariant was violated."""


@dataclasses.dataclass
class SanitizeReport:
    valid_cells: int          # in-matrix cells checked bit-equal vs oracle
    prestart_cells: int       # pre-start lane slots verified == 0
    garbage_cells: int        # post-finish/padded slots verified < max
    config: tuple             # (T, R, CB, C)


def sanitize_stripe(a: np.ndarray, b: np.ndarray,
                    scoring: Scoring = Scoring(),
                    T=None, R=None, CB=None, C: int = 128,
                    substitution=None) -> SanitizeReport:
    """Run the stripe kernel in interpret mode with full H capture and
    check every invariant of the unmasked fill. Raises SanitizeError on
    the first violation; returns a coverage report otherwise.
    ``substitution``: optional score table — the profile modes (packed
    int8 words / unpacked select tree) obey the same three invariants
    (their sentinel rows supply the decaying inflow) and are checked
    identically."""
    from ..core import oracle
    from ..kernels import pallas_fill as pf

    a = np.asarray(a, np.int8)
    b = np.asarray(b, np.int8)
    m, n = len(a), len(b)
    nsym = npack = 0
    if substitution is not None and CB is None \
            and not pf._pack_fits(np.asarray(substitution)):
        CB = 1
    T, R, CB = pf._resolve_params(m, n, T, R, scoring, CB=CB)
    if substitution is None:
        pf._check_packing(m, n, R, scoring, CB)
    ap, bt, S = pf._build_inputs(a, b, T, C, R, CB)
    if substitution is not None:
        sub32 = np.asarray(substitution, np.int32)
        if pf._pack_fits(sub32):
            npack = -(-sub32.shape[0] // 4)
            bt = pf._build_profile_packed(bt, sub32)
        else:
            nsym = sub32.shape[0]
            bt = pf._build_profile(bt, sub32)
    outs = pf._stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), scoring=scoring, T=T, R=R, C=C,
        CB=CB, m=m, n=n, return_p=False, interpret=True, unroll=1,
        nsym=nsym, npack=npack, debug_h=True)
    best = np.asarray(outs[0])
    dbg = np.asarray(outs[2])     # (S, steps_pad, CB, R, sub, LANES)

    ref = oracle.fill(a, b, scoring, sub=substitution)
    Sn, steps_pad, CBn, Rn, sub, LN = dbg.shape
    L = sub * LN

    # cell map: slot (s, t, c, r, lin) computes (i, j) =
    # (s*T + lin*R + r + 1, CB*(t - lin) + c + 1)
    t_ = np.arange(steps_pad)[None, :, None, None, None]
    c_ = np.arange(CBn)[None, None, :, None, None]
    r_ = np.arange(Rn)[None, None, None, :, None]
    lin_ = np.arange(L)[None, None, None, None, :]
    s_ = np.arange(Sn)[:, None, None, None, None]
    dbgf = dbg.reshape(Sn, steps_pad, CBn, Rn, L)
    jj = CBn * (t_ - lin_) + c_ + 1
    ii = s_ * T + lin_ * Rn + r_ + 1
    pre = jj < 1
    valid = (jj >= 1) & (jj <= m) & (ii <= n)
    garbage = ~pre & ~valid

    # invariant 1: pre-start lanes stay at the zero floor (the unmasked
    # fill's induction base — any nonzero here means a sentinel or ring
    # offset leak)
    bad = pre & (dbgf != 0)
    if bad.any():
        s0, t0, c0, r0, l0 = [int(x[0]) for x in np.nonzero(bad)]
        raise SanitizeError(
            f"pre-start lane slot (stripe={s0}, step={t0}, slot={c0}, "
            f"r={r0}, lane={l0}) holds {dbgf[s0, t0, c0, r0, l0]} != 0")

    # invariant 2: every in-matrix cell is bit-equal to the oracle (this is
    # where a skewed boundary ring or broken left-inject shows up)
    iv = np.where(valid, ii, 0)
    jv = np.where(valid, jj, 0)
    want = ref.H[iv, jv]
    bad = valid & (dbgf != want)
    if bad.any():
        s0, t0, c0, r0, l0 = [int(x[0]) for x in np.nonzero(bad)]
        i0 = s0 * T + l0 * Rn + r0 + 1
        j0 = CBn * (t0 - l0) + c0 + 1
        raise SanitizeError(
            f"cell (i={i0}, j={j0}) = {dbgf[s0, t0, c0, r0, l0]} != oracle "
            f"{ref.H[i0, j0]} (stripe={s0}, step={t0}, slot={c0}, r={r0}, "
            f"lane={l0}) — boundary-ring/injection invariant violated")

    # invariant 3: out-of-range garbage never ties the true max (the
    # decay argument) and strictly decays step over step
    if ref.max_score > 0:
        bad = garbage & (dbgf >= ref.max_score)
        if bad.any():
            s0, t0, c0, r0, l0 = [int(x[0]) for x in np.nonzero(bad)]
            raise SanitizeError(
                f"garbage slot (stripe={s0}, step={t0}, slot={c0}, r={r0}, "
                f"lane={l0}) = {dbgf[s0, t0, c0, r0, l0]} >= max "
                f"{ref.max_score}: the decay invariant is broken")
        # decay envelope: every post-finish (j > m) inflow subtracts >= 1,
        # so the PER-COLUMN maximum G(j) = max over garbage cells of column
        # j strictly decreases with j until the zero floor clamps it.
        # (Individual lanes need not be monotone in affine mode — an E/F
        # state can recover toward a slower-decaying neighbor — but the
        # envelope decay is what guarantees garbage never re-ties the max.)
        post = np.broadcast_to(garbage & (jj > m), dbgf.shape)
        if post.any():
            jpost = np.broadcast_to(jj, dbgf.shape)[post] - m - 1
            vals = dbgf[post]
            ncol = int(jpost.max()) + 1
            G = np.full((ncol,), -(1 << 62), np.int64)
            np.maximum.at(G, jpost, vals.astype(np.int64))
            have = G > -(1 << 61)
            for j0 in range(ncol - 1):
                if have[j0] and have[j0 + 1] and G[j0 + 1] != 0 \
                        and G[j0 + 1] >= G[j0]:
                    raise SanitizeError(
                        f"garbage column envelope fails strict decay at "
                        f"j={m + 1 + j0}: G={G[j0]} -> {G[j0 + 1]}")

    # end-to-end: the kernel's own reduction agrees with the oracle
    got = int(best[:, 0].max(initial=0))
    if max(got, 0) != max(ref.max_score, 0):
        raise SanitizeError(
            f"kernel max {got} != oracle max {ref.max_score}")

    return SanitizeReport(
        valid_cells=int(valid.sum()), prestart_cells=int(pre.sum()),
        garbage_cells=int(garbage.sum()), config=(T, R, CB, C))


def sanitize_pairs_packed(a_batch: np.ndarray, b_batch: np.ndarray,
                          scoring: Scoring = Scoring(),
                          T=None, R=None, C: int = 128,
                          substitution=None) -> SanitizeReport:
    """Structural checker for the packed-pairs winject mode (round 4):
    B pairs share one stripe chain, each pair's query stream injected at
    its boundary lanes. The unmasked-fill invariants become PER-PAIR:

    1. slots before a pair's stream arrives (column < 1 in the pair's own
       rebased coordinates) hold exactly 0;
    2. every in-pair cell is bit-equal to that pair's oracle (a wrong
       injection shift or a reset-mask leak shows up here);
    3. pad rows (the R-alignment tail of each pair) and post-finish
       columns never reach the pair's own max, with per-pair per-column
       envelope decay past column m.
    """
    from ..core import oracle
    from ..kernels import pallas_fill as pf

    a_batch = np.asarray(a_batch, np.int8)
    b_batch = np.asarray(b_batch, np.int8)
    B, m = a_batch.shape
    n = b_batch.shape[1]
    fn = pf.pairs_packed_score_fn(B, m, n, scoring=scoring, T=T, R=R,
                                  C=C, interpret=True,
                                  substitution=substitution)
    cfg = fn.config
    rlen, lpp, T_, R_ = cfg["rlen"], cfg["lpp"], cfg["T"], cfg["R"]
    ntot = B * rlen

    # re-run the kernel with debug_h capture on the EXACT packing the
    # score fn builds (fn.prepare is the one source of truth — a
    # desynchronized copy here would validate the wrong geometry)
    import jax.numpy as jnp
    btj, grt, inj = fn.prepare(jnp.asarray(a_batch), jnp.asarray(b_batch))
    ap = jnp.full((1, 1, cfg["steps_pad"]), -1, jnp.int32)
    outs = pf._stripe_call(
        ap, btj, grt, inj,
        scoring=scoring, T=T_, R=R_, C=C, m=m, n=ntot, return_p=False,
        interpret=True, unroll=1, nsym=cfg["nsym"], npack=cfg["npack"],
        winject=lpp, debug_h=True)
    dbg = np.asarray(outs[-1])     # (S, steps_pad, 1, R, sub, LANES)
    Sn, sp, CBn, Rn, sub, LN = dbg.shape
    Lc = sub * LN
    dbgf = dbg.reshape(Sn, sp, CBn, Rn, Lc)

    refs = [oracle.fill(a_batch[g], b_batch[g], scoring, sub=substitution)
            for g in range(B)]
    maxes = np.array([r.max_score for r in refs])
    H = np.zeros((B, n + 1, m + 1), np.int32)
    for g in range(B):
        H[g] = refs[g].H

    t_ = np.arange(sp)[None, :, None, None, None]
    r_ = np.arange(Rn)[None, None, None, :, None]
    lin_ = np.arange(Lc)[None, None, None, None, :]
    s_ = np.arange(Sn)[:, None, None, None, None]
    c0 = np.zeros((1, 1, CBn, 1, 1), np.int64)
    ii = s_ * T_ + lin_ * Rn + r_ + 1 + c0       # global packed row
    jj = t_ - lin_ + 1 + c0                      # pair-rebased column
    g_ = (ii - 1) // rlen
    bi = (ii - 1) % rlen + 1
    pre = jj < 1
    valid = ~pre & (jj <= m) & (g_ < B) & (bi <= n)
    garbage = ~pre & ~valid

    bad = pre & (dbgf != 0)
    if bad.any():
        idx = [int(x[0]) for x in np.nonzero(bad)]
        raise SanitizeError(f"packed-pairs pre-start slot {idx} holds "
                            f"{dbgf[tuple(idx)]} != 0")

    gv = np.where(valid, g_, 0)
    want = H[gv, np.where(valid, bi, 0), np.where(valid, jj, 0)]
    bad = valid & (dbgf != want)
    if bad.any():
        s0, t0, cc, r0, l0 = [int(x[0]) for x in np.nonzero(bad)]
        i0 = s0 * T_ + l0 * Rn + r0 + 1
        raise SanitizeError(
            f"packed-pairs cell pair={(i0 - 1) // rlen} "
            f"(i={(i0 - 1) % rlen + 1}, j={t0 - l0 + 1}) = "
            f"{dbgf[s0, t0, cc, r0, l0]} != oracle "
            f"{H[(i0 - 1) // rlen, (i0 - 1) % rlen + 1, t0 - l0 + 1]} — "
            "injection shift or reset-mask invariant violated")

    # garbage slots attribute to a pair (pad rows / post-finish columns of
    # that pair) or to the all-pad tail; they may never reach the pair's
    # own max
    gg = np.clip(g_, 0, B - 1)
    cap = np.where((g_ < B) & (maxes[gg] > 0), maxes[gg], 1 << 30)
    bad = garbage & (dbgf >= cap)
    if bad.any():
        idx = [int(x[0]) for x in np.nonzero(bad)]
        raise SanitizeError(
            f"packed-pairs garbage slot {idx} = {dbgf[tuple(idx)]} "
            f">= its pair's max: decay invariant broken")

    # per-pair per-column envelope decay past column m
    post = garbage & (jj > m) & (g_ < B)
    if post.any():
        postb = np.broadcast_to(post, dbgf.shape)
        jpost = (np.broadcast_to(jj, dbgf.shape)[postb] - m - 1)
        gpost = np.broadcast_to(g_, dbgf.shape)[postb]
        vals = dbgf[postb].astype(np.int64)
        ncol = int(jpost.max()) + 1
        G = np.full((B, ncol), -(1 << 62), np.int64)
        np.maximum.at(G, (gpost, jpost), vals)
        have = G > -(1 << 61)
        for g in range(B):
            for j0 in range(ncol - 1):
                if have[g, j0] and have[g, j0 + 1] and G[g, j0 + 1] != 0 \
                        and G[g, j0 + 1] >= G[g, j0]:
                    raise SanitizeError(
                        f"packed-pairs pair {g} garbage envelope fails "
                        f"strict decay at j={m + 1 + j0}: "
                        f"{G[g, j0]} -> {G[g, j0 + 1]}")

    # end-to-end: the public fn agrees with every pair's oracle
    s, i_, j_ = fn(jnp.asarray(a_batch), jnp.asarray(b_batch))
    for g in range(B):
        if int(s[g]) != max(refs[g].max_score, 0):
            raise SanitizeError(
                f"packed-pairs pair {g}: kernel max {int(s[g])} != "
                f"oracle {refs[g].max_score}")

    return SanitizeReport(
        valid_cells=int(valid.sum()), prestart_cells=int(pre.sum()),
        garbage_cells=int(garbage.sum()), config=(T_, R_, 1, C))
