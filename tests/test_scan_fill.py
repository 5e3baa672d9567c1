"""Parity tests: XLA scan plan vs the golden oracle — exact H/P/maxpos
equality on the builtin example and random property inputs, plus boundary
injection, banding, affine mode, and batching via vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swtpu import (
    BUILTIN_A, BUILTIN_B, BUILTIN_LAST_CELL, BUILTIN_MAX_SCORE,
    Scoring, encode,
)
from swtpu.core import oracle
from swtpu.core.encode import random_pair
from swtpu.kernels.scan_fill import diag_to_rowmajor, scan_fill


def run(a, b, scoring=Scoring(), **kw):
    return scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=scoring, **kw)


def test_builtin():
    a, b = encode(BUILTIN_A), encode(BUILTIN_B)
    out = run(a, b, return_p=True, return_h=True)
    assert int(out.max_score) == BUILTIN_MAX_SCORE
    assert int(out.last_cell) == BUILTIN_LAST_CELL
    assert (int(out.max_i), int(out.max_j)) == (7, 6)
    ref = oracle.fill(a, b)
    np.testing.assert_array_equal(diag_to_rowmajor(out.h_diag, len(b), len(a)), ref.H)
    np.testing.assert_array_equal(diag_to_rowmajor(out.p_diag, len(b), len(a)), ref.P)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("shape", [(13, 7), (7, 13), (64, 64), (1, 5), (5, 1), (128, 31)])
def test_property_parity(seed, shape):
    m, n = shape
    a, b = random_pair(m, n, seed=seed + 100 * m + n)
    ref = oracle.fill(a, b)
    out = run(a, b, return_p=True, return_h=True)
    np.testing.assert_array_equal(diag_to_rowmajor(out.h_diag, n, m), ref.H)
    np.testing.assert_array_equal(diag_to_rowmajor(out.p_diag, n, m), ref.P)
    assert int(out.max_score) == ref.max_score
    i, j = ref.max_ij
    assert (int(out.max_i), int(out.max_j)) == (i, j)
    # boundary outputs
    np.testing.assert_array_equal(np.asarray(out.bottom_row), ref.H[-1, :])
    np.testing.assert_array_equal(np.asarray(out.right_col), ref.H[:, -1])


def test_boundary_injection_equals_monolithic():
    """Fill a 2x2 block decomposition with injected halos; every block must
    reproduce the corresponding slice of the monolithic fill — the invariant
    behind stripe chaining and the multi-chip pipeline."""
    m, n = 24, 20
    a, b = random_pair(m, n, seed=7)
    ref = oracle.fill(a, b)
    ms, ns = m // 2, n // 2
    # block (0,0)
    o00 = run(a[:ms], b[:ns], return_h=True)
    # block (0,1): columns ms.., needs left col from block (0,0) right edge
    o01 = run(a[ms:], b[:ns], return_h=True,
              left_col=jnp.asarray(ref.H[: ns + 1, ms]))
    # block (1,0): rows ns.., top row from block (0,0) bottom edge
    o10 = run(a[:ms], b[ns:], return_h=True,
              top_row=jnp.asarray(ref.H[ns, : ms + 1]))
    # block (1,1): both halos
    o11 = run(a[ms:], b[ns:], return_h=True,
              top_row=jnp.asarray(ref.H[ns, ms:]),
              left_col=jnp.asarray(ref.H[ns:, ms]))
    h00 = diag_to_rowmajor(o00.h_diag, ns, ms)
    h01 = diag_to_rowmajor(o01.h_diag, ns, m - ms)
    h10 = diag_to_rowmajor(o10.h_diag, n - ns, ms)
    h11 = diag_to_rowmajor(o11.h_diag, n - ns, m - ms)
    np.testing.assert_array_equal(h00[1:, 1:], ref.H[1:ns + 1, 1:ms + 1])
    np.testing.assert_array_equal(h01[1:, 1:], ref.H[1:ns + 1, ms + 1:])
    np.testing.assert_array_equal(h10[1:, 1:], ref.H[ns + 1:, 1:ms + 1])
    np.testing.assert_array_equal(h11[1:, 1:], ref.H[ns + 1:, ms + 1:])


def test_banded_matches_full_when_band_covers():
    m = n = 40
    a, b = random_pair(m, n, seed=11)
    full = run(a, b)
    banded = run(a, b, band=max(m, n) + 2)
    assert int(full.max_score) == int(banded.max_score)


def test_banded_restricts():
    # an off-diagonal match is invisible to a narrow band
    a = encode("AAAAAAAATTTT")
    b = encode("TTTTAAAAAAAA")
    full = run(a, b)
    banded = run(a, b, band=2)
    assert int(banded.max_score) < int(full.max_score)


def test_affine_parity_with_oracle():
    sc = Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    for seed, (m, n) in [(0, (19, 23)), (1, (40, 12))]:
        a, b = random_pair(m, n, seed=seed)
        ref = oracle.fill_loop(a, b, sc)
        out = run(a, b, sc, return_p=True, return_h=True)
        np.testing.assert_array_equal(diag_to_rowmajor(out.h_diag, n, m), ref.H)
        np.testing.assert_array_equal(diag_to_rowmajor(out.p_diag, n, m), ref.P)
        assert int(out.max_score) == ref.max_score


def test_vmap_batch():
    from swtpu.core.encode import random_batch
    B, m, n = 6, 33, 17
    aa, bb = random_batch(B, m, n, seed=5)
    f = jax.vmap(lambda a, b: scan_fill(a, b).max_score)
    scores = np.asarray(f(jnp.asarray(aa), jnp.asarray(bb)))
    for i in range(B):
        assert scores[i] == oracle.fill(aa[i], bb[i]).max_score


def test_affine_block_decomposition():
    """Gotoh fill split into 2x2 boundary-injected blocks with H/E/F halos
    must reproduce the monolithic affine fill exactly."""
    import jax.numpy as jnp
    import numpy as np
    import swtpu
    from swtpu.core import oracle
    from swtpu.core.encode import random_pair
    from swtpu.kernels.scan_fill import scan_fill

    sc = swtpu.Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    m, n = 64, 50
    a, b = random_pair(m, n, seed=81)
    ref = oracle.fill_loop(a, b, sc)
    NEG = -(1 << 30)

    hm, hn = m // 2, n // 2
    # block grid state: top (H, F) rows per column block, left (H, E) cols
    tops = [(jnp.zeros(hm + 1, jnp.int32), jnp.full((hm + 1,), NEG,
                                                    jnp.int32))
            for _ in range(2)]
    best = (0, 0, 0)
    for bi_ in range(2):
        left_h = jnp.zeros((hn + 1,), jnp.int32)
        left_e = jnp.full((hn + 1,), NEG, jnp.int32)
        for bj_ in range(2):
            th, tf = tops[bj_]
            # stitch the shared corner H(bi*hn, bj*hm)
            out = scan_fill(
                jnp.asarray(a[bj_ * hm:(bj_ + 1) * hm]),
                jnp.asarray(b[bi_ * hn:(bi_ + 1) * hn]),
                scoring=sc, top_row=th, left_col=left_h,
                top_f=tf, left_e=left_e)
            gi = bi_ * hn + int(out.max_i)
            gj = bj_ * hm + int(out.max_j)
            cand = (int(out.max_score), gi, gj)
            if cand[0] > best[0] or (cand[0] == best[0] and
                                     (cand[1], cand[2]) < (best[1],
                                                           best[2])):
                best = cand
            tops[bj_] = (out.bottom_row, out.bottom_f)
            left_h, left_e = out.right_col, out.right_e
    assert best[0] == ref.max_score
    assert (best[1], best[2]) == ref.max_ij
