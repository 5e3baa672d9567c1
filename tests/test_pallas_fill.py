"""Pallas stripe kernel parity vs the golden oracle (interpret mode on CPU;
the same kernel is validated on real TPU hardware by scripts/bench)."""

import numpy as np
import pytest

import swtpu
from swtpu.core import oracle
from swtpu.core.encode import encode, random_pair
from swtpu.kernels.pallas_fill import (p_stripes_to_rowmajor, stripe_fill_raw)


def check(m, n, T=128, C=128, R=None, scoring=swtpu.Scoring(), seed=None):
    a, b = random_pair(m, n, seed=seed if seed is not None else m * 31 + n)
    ref = oracle.fill(a, b, scoring) if not scoring.is_affine \
        else oracle.fill_loop(a, b, scoring)
    out = stripe_fill_raw(a, b, scoring=scoring, T=T, C=C, R=R,
                          return_p=True)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij
    assert int(out.last_cell) == int(ref.H[-1, -1])
    np.testing.assert_array_equal(out.right_col, ref.H[:, -1])
    P = p_stripes_to_rowmajor(np.asarray(out.p_stripes), n, m)
    np.testing.assert_array_equal(P, ref.P)


def test_builtin_golden():
    a, b = encode(swtpu.BUILTIN_A), encode(swtpu.BUILTIN_B)
    out = stripe_fill_raw(a, b, return_p=True)
    assert int(out.max_score) == swtpu.BUILTIN_MAX_SCORE
    assert (int(out.max_i), int(out.max_j)) == (7, 6)
    assert int(out.last_cell) == swtpu.BUILTIN_LAST_CELL


def test_single_stripe():
    check(60, 100)


def test_multi_stripe():
    check(50, 300)          # 3 stripes of 128


def test_wide():
    check(300, 50, T=256)


def test_stripe_boundary_exact():
    check(100, 128)         # n == T exactly
    check(100, 129)         # one row into stripe 2


def test_multi_chunk():
    check(520, 130, C=128)  # several chunks per stripe


def test_affine_stripe():
    check(80, 200, scoring=swtpu.Scoring(mode="affine", gap_open=-5,
                                         gap_extend=-1))


def test_register_blocked_r2():
    check(70, 300, T=512, R=2)          # 2 stripes, rows split across lanes


def test_register_blocked_r4():
    check(120, 600, T=512, C=256, R=4)


def test_register_blocked_r8():
    check(90, 1100, T=1024, R=8)        # 2 stripes of 128 lanes x 8 rows


def test_register_blocked_r8_affine():
    check(80, 1030, T=1024, R=8,
          scoring=swtpu.Scoring(mode="affine", gap_open=-5, gap_extend=-1))


def test_register_blocked_tie_positions():
    # repeated sequence creates many tied maxima; packed argmax must keep
    # the row-major first occurrence across rows of one lane
    a = np.tile(encode("ACGT"), 12)
    b = np.tile(encode("ACGT"), 40)
    ref = oracle.fill(a, b)
    out = stripe_fill_raw(a, b, T=256, C=128, R=2, return_p=True)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij


def test_choose_params_covers_shapes():
    from swtpu.kernels.pallas_fill import choose_params
    for m, n in ((100, 100), (25632, 25632), (2000, 145002), (64, 70000)):
        T, R, CB = choose_params(m, n)
        assert T % (128 * R) == 0
        assert R in (1, 2, 4, 8, 16, 32)
        assert CB in (1, 2, 4)


def test_batch_register_blocked():
    from swtpu.kernels.pallas_fill import batch_fill_raw
    from swtpu.core.encode import random_batch
    rng_w = np.random.default_rng(3)
    B, r, W = 7, 24, 120
    reads, _ = random_batch(B, r, 1, seed=9)
    window = rng_w.integers(0, 4, W).astype(np.int8)
    window[40:40 + r] = reads[5]
    out = batch_fill_raw(reads, window, T=1024, C=128, R=8)
    for g in range(B):
        ref = oracle.fill(window, reads[g])
        assert int(out.scores[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(out.read_i[g]), int(out.win_j[g])) == ref.max_ij, g


def test_score_fn_device_reduce():
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_score_fn
    m, n = 96, 260
    a, b = random_pair(m, n, seed=4)
    ref = oracle.fill(a, b)
    fn = stripe_score_fn(m, n, T=128, C=128)
    s, i, j = fn(jnp.asarray(a), jnp.asarray(b))
    assert int(s) == ref.max_score
    assert (int(i), int(j)) == ref.max_ij


def test_batch_mode_matches_per_pair_oracle():
    from swtpu.kernels.pallas_fill import batch_fill_raw
    from swtpu.core.encode import random_batch
    rng_w = np.random.default_rng(42)
    B, r, W = 5, 20, 150
    reads, _ = random_batch(B, r, 1, seed=6)
    window = rng_w.integers(0, 4, W).astype(np.int8)
    # plant read 2 into the window for a strong hit
    window[60:60 + r] = reads[2]
    out = batch_fill_raw(reads, window, T=128, C=128)
    for g in range(B):
        ref = oracle.fill(window, reads[g])
        assert int(out.scores[g]) == ref.max_score, g
        if ref.max_score > 0:
            i, j = ref.max_ij
            assert (int(out.read_i[g]), int(out.win_j[g])) == (i, j), g
    assert int(out.scores[2]) == 3 * r


def test_batch_mode_short_padded_reads():
    from swtpu.kernels.pallas_fill import batch_fill_raw
    rng = np.random.default_rng(7)
    window = rng.integers(0, 4, 100).astype(np.int8)
    r = 24
    reads = np.full((3, r), -3, np.int8)
    reads[0, :10] = window[30:40]      # short read, padded
    reads[1, :] = window[50:50 + r]    # full-length
    reads[2, :16] = window[5:21]
    out = batch_fill_raw(reads, window, T=128, C=128)
    assert int(out.scores[0]) == 30
    assert int(out.scores[1]) == 3 * r
    assert int(out.scores[2]) == 48
    assert int(out.win_j[1]) == 50 + r


def test_boundary_injected_block_matches_scan():
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill
    rng = np.random.default_rng(11)
    m, n = 70, 256
    a, b = random_pair(m, n, seed=12)
    top = rng.integers(0, 9, m + 1).astype(np.int32)
    left = rng.integers(0, 9, n + 1).astype(np.int32)
    left[0] = top[0]                   # shared H(0,0) corner
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b),
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left))
    for R in (1, 2):
        fn = stripe_block_fn(m, n, T=256, R=R, C=128)
        s, i, j, last, bottom, right = fn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
            jnp.asarray(left))
        assert int(s) == int(ref.max_score), R
        assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j)), R
        assert int(last) == int(ref.last_cell), R
        np.testing.assert_array_equal(np.asarray(bottom),
                                      np.asarray(ref.bottom_row))
        np.testing.assert_array_equal(np.asarray(right),
                                      np.asarray(ref.right_col))


def test_boundary_injected_multi_stripe():
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill
    rng = np.random.default_rng(21)
    m, n = 150, 512                    # 2 stripes of T=256
    a, b = random_pair(m, n, seed=22)
    top = rng.integers(0, 7, m + 1).astype(np.int32)
    left = rng.integers(0, 7, n + 1).astype(np.int32)
    left[0] = top[0]
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b),
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left))
    fn = stripe_block_fn(m, n, T=256, R=2, C=128)
    s, i, j, last, bottom, right = fn(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(top), jnp.asarray(left))
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
    np.testing.assert_array_equal(np.asarray(bottom),
                                  np.asarray(ref.bottom_row))
    np.testing.assert_array_equal(np.asarray(right),
                                  np.asarray(ref.right_col))


def test_nw_mode_matches_scan():
    """Global (NW) stripe mode vs scan_fill(local=False): argmax (for the
    anchored-reverse contract, max > 0) and the right column (used
    transposed as the Hirschberg bottom row)."""
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    m, n = 90, 300
    a, b = random_pair(m, n, seed=41)
    b[:m] = a          # strong diagonal so the NW max is positive
    g = swtpu.Scoring().gap
    top = (g * np.arange(m + 1)).astype(np.int32)
    left = (g * np.arange(n + 1)).astype(np.int32)
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), local=False,
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left))
    fn = stripe_block_fn(m, n, T=256, R=2, C=128, local=False,
                         want_bottom=False)
    s, i, j, last, _, right = fn(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(top), jnp.asarray(left))
    assert int(ref.max_score) > 0
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
    assert int(last) == int(ref.last_cell)
    np.testing.assert_array_equal(np.asarray(right),
                                  np.asarray(ref.right_col))


def test_nw_anchored_reverse_boundaries():
    """NW stripe mode with the locate() -inf boundary pattern."""
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    m, n = 70, 260
    a, b = random_pair(m, n, seed=43)
    NEG = -(1 << 30)
    top = np.full((m + 1,), NEG, np.int32); top[0] = 0
    left = np.full((n + 1,), NEG, np.int32); left[0] = 0
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), local=False,
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left))
    fn = stripe_block_fn(m, n, T=128, R=1, C=128, local=False,
                         want_bottom=False)
    s, i, j, _, _, _ = fn(jnp.asarray(a), jnp.asarray(b),
                          jnp.asarray(top), jnp.asarray(left))
    if int(ref.max_score) > 0:
        assert int(s) == int(ref.max_score)
        assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))


def test_column_blocked_cb2():
    a, b = random_pair(77, 300, seed=51)
    ref = oracle.fill(a, b)
    out = stripe_fill_raw(a, b, T=256, C=128, R=2, CB=2, return_p=True)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij
    assert int(out.last_cell) == int(ref.H[-1, -1])
    np.testing.assert_array_equal(out.right_col, ref.H[:, -1])
    P = p_stripes_to_rowmajor(np.asarray(out.p_stripes), 300, 77)
    np.testing.assert_array_equal(P, ref.P)


def test_column_blocked_cb4_r4():
    a, b = random_pair(130, 600, seed=52)
    ref = oracle.fill(a, b)
    out = stripe_fill_raw(a, b, T=512, C=128, R=4, CB=4, return_p=True)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij
    np.testing.assert_array_equal(out.right_col, ref.H[:, -1])
    P = p_stripes_to_rowmajor(np.asarray(out.p_stripes), 600, 130)
    np.testing.assert_array_equal(P, ref.P)


def test_column_blocked_ties_first_occurrence():
    # heavy ties: first-occurrence must survive the within-step column
    # packing and the cross-step column-stripped compare
    a = np.tile(encode("ACGT"), 13)      # m=52: not a CB multiple
    b = np.tile(encode("ACGT"), 70)
    ref = oracle.fill(a, b)
    for CB in (2, 4):
        out = stripe_fill_raw(a, b, T=512, C=128, R=4, CB=CB)
        assert int(out.max_score) == ref.max_score, CB
        assert (int(out.max_i), int(out.max_j)) == ref.max_ij, CB


def test_column_blocked_affine():
    sc = swtpu.Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    a, b = random_pair(90, 500, seed=53)
    ref = oracle.fill_loop(a, b, sc)
    out = stripe_fill_raw(a, b, scoring=sc, T=256, C=128, R=2, CB=2)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij
    np.testing.assert_array_equal(out.right_col, ref.H[:, -1])


def test_column_blocked_score_fn():
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_score_fn
    m, n = 95, 260
    a, b = random_pair(m, n, seed=54)
    ref = oracle.fill(a, b)
    fn = stripe_score_fn(m, n, T=128, C=128, CB=2)
    s, i, j = fn(jnp.asarray(a), jnp.asarray(b))
    assert int(s) == ref.max_score
    assert (int(i), int(j)) == ref.max_ij


def test_fuzz_configs_vs_oracle():
    """Random shapes x random (T, R, CB) configs, P + positions exact."""
    rng = np.random.default_rng(99)
    for trial in range(14):
        R = int(rng.choice([1, 2, 4, 8]))
        CB = int(rng.choice([1, 2, 4]))
        sub = int(rng.integers(1, 3))
        stripes = int(rng.integers(1, 3))
        T = 128 * sub * R
        n = int(rng.integers(max(1, (stripes - 1) * T + 1), stripes * T + 1))
        m = int(rng.integers(2, 400))
        a, b = random_pair(m, n, seed=1000 + trial)
        ref = oracle.fill(a, b)
        out = stripe_fill_raw(a, b, T=T, C=128, R=R, CB=CB, return_p=True)
        ctx = dict(trial=trial, m=m, n=n, T=T, R=R, CB=CB)
        assert int(out.max_score) == ref.max_score, ctx
        assert (int(out.max_i), int(out.max_j)) == ref.max_ij, ctx
        assert int(out.last_cell) == int(ref.H[-1, -1]), ctx
        np.testing.assert_array_equal(out.right_col, ref.H[:, -1],
                                      err_msg=str(ctx))
        P = p_stripes_to_rowmajor(np.asarray(out.p_stripes), n, m)
        np.testing.assert_array_equal(P, ref.P, err_msg=str(ctx))


def test_banded_matches_scan():
    """Banded stripe mode vs the scan plan's band: scores, positions, P."""
    import jax.numpy as jnp
    from swtpu.kernels.scan_fill import diag_to_rowmajor, scan_fill

    for band, R, CB in ((8, 1, 1), (25, 2, 2), (60, 4, 1)):
        a, b = random_pair(90, 300, seed=400 + band)
        ref = scan_fill(jnp.asarray(a), jnp.asarray(b), band=band,
                        return_p=True)
        out = stripe_fill_raw(a, b, T=512, C=128, R=R, CB=CB, band=band,
                              return_p=True)
        assert int(out.max_score) == int(ref.max_score), band
        assert (int(out.max_i), int(out.max_j)) == (int(ref.max_i),
                                                    int(ref.max_j)), band
        P1 = p_stripes_to_rowmajor(np.asarray(out.p_stripes), 300, 90)
        P2 = diag_to_rowmajor(ref.p_diag, 300, 90)
        np.testing.assert_array_equal(P1, P2, err_msg=str(band))


@pytest.mark.parametrize("spec", [False, True])
def test_chunk_body_variants_match_oracle(spec):
    """Both chunk-body variants — fused (default; one unconditional trace)
    and specialized (per-combo traces) — must be bit-identical."""
    import jax.numpy as jnp
    from swtpu import Scoring
    from swtpu.core import oracle
    from swtpu.core.encode import random_pair
    from swtpu.kernels import pallas_fill as pf

    a, b = random_pair(170, 300, seed=8)
    ref = oracle.fill(a, b)
    ap, bt, _ = pf._build_inputs(a, b, 128, 128, 1, 1)
    outs = pf._stripe_call(
        jnp.asarray(ap), jnp.asarray(bt), scoring=Scoring(), T=128, R=1,
        C=128, m=170, n=300, return_p=False, interpret=True, unroll=1,
        specialize_chunks=spec)
    best = np.asarray(outs[0])
    assert int(best[:, 0].max()) == ref.max_score
    # right-column capture must fire in both variants
    rc = pf._lane_major_to_rowmajor(np.asarray(outs[1]), 128, 1)[:300]
    assert np.array_equal(rc, ref.H[1:, 170])


def test_affine_nw_block_matches_scan():
    """Affine global (NW) stripe block fill: max/argmax and halos must
    match the scan plan's local=False affine fill under anchored (-inf)
    boundaries — the affine locate reverse-pass contract."""
    import jax.numpy as jnp
    from swtpu import Scoring
    from swtpu.core.encode import random_pair
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    sc = Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    m, n = 48, 128
    a, b = random_pair(m, n, seed=21)
    b[10:40] = a[5:35]                 # a positive anchored optimum
    NEG = -(1 << 30)
    top = np.full((m + 1,), NEG, np.int32)
    left = np.full((n + 1,), NEG, np.int32)
    top[0] = left[0] = 0
    top_f = np.full((m + 1,), NEG, np.int32)
    left_e = np.full((n + 1,), NEG, np.int32)

    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=sc,
                    local=False, top_row=jnp.asarray(top),
                    left_col=jnp.asarray(left))
    fn = stripe_block_fn(m, n, sc, T=128, R=1, local=False,
                         want_bottom=True, interpret=True)
    s, i, j, last, bottom, right, bottom_f, right_e = fn(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
        jnp.asarray(left), jnp.asarray(top_f), jnp.asarray(left_e))
    assert int(ref.max_score) > 0
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
    assert int(last) == int(ref.last_cell)
    np.testing.assert_array_equal(np.asarray(bottom),
                                  np.asarray(ref.bottom_row))
    np.testing.assert_array_equal(np.asarray(right),
                                  np.asarray(ref.right_col))
    # E/F halos: clamp the scan's -inf sentinels to the kernel's gentler
    # scale before comparing (values above the sentinel range are exact)
    NEGR = -(1 << 24)
    sf = np.maximum(np.asarray(ref.bottom_f), NEGR)
    se = np.maximum(np.asarray(ref.right_e), NEGR)
    kf = np.asarray(bottom_f)
    ke = np.asarray(right_e)
    real_f = sf > NEGR // 2
    real_e = se > NEGR // 2
    np.testing.assert_array_equal(kf[real_f], sf[real_f])
    np.testing.assert_array_equal(ke[real_e], se[real_e])


def test_affine_locate_stripe_path(monkeypatch):
    """locate() with affine scoring through the stripe NW reverse pass
    (platform faked to tpu, interpret forced) must match the oracle."""
    from swtpu.core import oracle
    from swtpu.core.encode import random_pair
    from swtpu import Scoring
    from swtpu.dispatch import plan as planmod
    from swtpu.engine import traceback as tb
    from swtpu.kernels import pallas_fill as pf

    monkeypatch.setattr(planmod, "current_platform", lambda: "tpu")
    monkeypatch.setattr(pf, "_interpret_default", lambda: True)
    monkeypatch.setattr(tb, "_STRIPE_MIN_CELLS", 1)
    monkeypatch.setattr(tb, "_fn_cache", {})
    sc = Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    a, b = random_pair(96, 200, seed=33)
    b[20:80] = a[10:70]
    ref = oracle.fill(a, b, sc)
    loc = tb.locate(a, b, sc)
    assert loc.score == ref.max_score
    assert (loc.end_i, loc.end_j) == ref.max_ij
    assert loc.last_cell == int(ref.H[-1, -1])


@pytest.mark.parametrize("T,R,CB", [(2048, 16, 4), (4096, 32, 2)])
def test_deep_register_blocking_matches_oracle(T, R, CB):
    """Round-2 frontier configs (R in {16, 32}, CB=4) must stay bit-exact
    (the production champion is T=28672, R=32, CB=4 on v5e)."""
    a, b = random_pair(300, 2048 if T == 2048 else 4096, seed=42)
    ref = oracle.fill(a, b)
    out = stripe_fill_raw(a, b, T=T, R=R, CB=CB)
    assert int(out.max_score) == ref.max_score
    assert (int(out.max_i), int(out.max_j)) == ref.max_ij
    assert int(out.last_cell) == int(ref.H[-1, -1])


Scoring = swtpu.Scoring


def _rand_protein(m, n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 20, m).astype(np.int8),
            rng.integers(0, 20, n).astype(np.int8))


def _embedded(sub):
    from swtpu.core.substitution import embed_sentinels
    import jax.numpy as jnp
    return jnp.asarray(embed_sentinels(np.asarray(sub)))


def test_boundary_injected_substitution_block():
    """Profile modes compose with boundary injection (the reference's
    scoring hook runs inside every strategy, serial_smithW.c:251-256):
    packed int8 BLOSUM62 profile, linear gaps, injected boundaries."""
    import jax.numpy as jnp
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    rng = np.random.default_rng(31)
    m, n = 70, 256
    a, b = _rand_protein(m, n, 32)
    top = rng.integers(0, 9, m + 1).astype(np.int32)
    left = rng.integers(0, 9, n + 1).astype(np.int32)
    left[0] = top[0]
    sc = Scoring(gap=-4)
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=sc,
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left),
                    sub_table=_embedded(BLOSUM62))
    for R in (1, 2):
        fn = stripe_block_fn(m, n, sc, T=256, R=R, C=128,
                             substitution=BLOSUM62)
        s, i, j, last, bottom, right = fn(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
            jnp.asarray(left))
        assert int(s) == int(ref.max_score), R
        assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j)), R
        assert int(last) == int(ref.last_cell), R
        np.testing.assert_array_equal(np.asarray(bottom),
                                      np.asarray(ref.bottom_row))
        np.testing.assert_array_equal(np.asarray(right),
                                      np.asarray(ref.right_col))


def test_boundary_injected_substitution_affine():
    """BLOSUM62 + Gotoh gaps + injected H/E/F boundaries (the multi-chip
    pipeline's per-stage protein fill) vs the scan plan."""
    import jax.numpy as jnp
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    rng = np.random.default_rng(41)
    m, n = 60, 256
    a, b = _rand_protein(m, n, 42)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    NEG = -(1 << 24)
    top = rng.integers(0, 9, m + 1).astype(np.int32)
    left = rng.integers(0, 9, n + 1).astype(np.int32)
    left[0] = top[0]
    top_f = np.full((m + 1,), NEG, np.int32)
    left_e = np.full((n + 1,), NEG, np.int32)
    top_f[m // 2] = int(top[m // 2]) - 3      # a live F entering the block
    left_e[n // 3] = int(left[n // 3]) - 2
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=sc,
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left),
                    top_f=jnp.asarray(top_f), left_e=jnp.asarray(left_e),
                    sub_table=_embedded(BLOSUM62))
    fn = stripe_block_fn(m, n, sc, T=256, R=2, C=128,
                         substitution=BLOSUM62)
    s, i, j, last, bottom, right, bottom_f, right_e = fn(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
        jnp.asarray(left), jnp.asarray(top_f), jnp.asarray(left_e))
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
    assert int(last) == int(ref.last_cell)
    np.testing.assert_array_equal(np.asarray(bottom),
                                  np.asarray(ref.bottom_row))
    np.testing.assert_array_equal(np.asarray(right),
                                  np.asarray(ref.right_col))
    np.testing.assert_array_equal(np.asarray(bottom_f)[1:],
                                  np.asarray(ref.bottom_f)[1:])
    np.testing.assert_array_equal(np.asarray(right_e)[1:],
                                  np.asarray(ref.right_e)[1:])


def test_boundary_injected_substitution_unpacked_tree():
    """Scores beyond int8 force the unpacked select tree; it must compose
    with boundary injection identically."""
    import jax.numpy as jnp
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    rng = np.random.default_rng(51)
    A = 6
    S = rng.integers(-9, 10, (A, A)).astype(np.int32) * 40   # |S| > 127
    m, n = 40, 128
    a = rng.integers(0, A, m).astype(np.int8)
    b = rng.integers(0, A, n).astype(np.int8)
    top = rng.integers(0, 30, m + 1).astype(np.int32)
    left = rng.integers(0, 30, n + 1).astype(np.int32)
    left[0] = top[0]
    sc = Scoring(gap=-30)
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=sc,
                    top_row=jnp.asarray(top), left_col=jnp.asarray(left),
                    sub_table=_embedded(S))
    fn = stripe_block_fn(m, n, sc, T=128, R=1, C=128, substitution=S)
    s, i, j, last, bottom, right = fn(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
        jnp.asarray(left))
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
    np.testing.assert_array_equal(np.asarray(bottom),
                                  np.asarray(ref.bottom_row))
    np.testing.assert_array_equal(np.asarray(right),
                                  np.asarray(ref.right_col))


def test_nw_substitution_block_matches_scan():
    """Global (NW) mode + substitution profile: the anchored-reverse pass
    for protein lean traceback."""
    import jax.numpy as jnp
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import stripe_block_fn
    from swtpu.kernels.scan_fill import scan_fill

    m, n = 50, 128
    a, b = _rand_protein(m, n, 61)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    NEG = -(1 << 24)
    top = np.full((m + 1,), NEG, np.int32)
    left = np.full((n + 1,), NEG, np.int32)
    top[0] = left[0] = 0
    negf = jnp.full((m + 1,), NEG, jnp.int32)
    nege = jnp.full((n + 1,), NEG, jnp.int32)
    ref = scan_fill(jnp.asarray(a), jnp.asarray(b), scoring=sc,
                    local=False, top_row=jnp.asarray(top),
                    left_col=jnp.asarray(left),
                    sub_table=_embedded(BLOSUM62))
    fn = stripe_block_fn(m, n, sc, T=128, R=1, C=128, local=False,
                         want_bottom=False, substitution=BLOSUM62)
    s, i, j, *_ = fn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(top),
                     jnp.asarray(left), negf, nege)
    assert int(s) == int(ref.max_score)
    assert (int(i), int(j)) == (int(ref.max_i), int(ref.max_j))
