"""Multi-device batch tests on the 8-virtual-CPU mesh — coverage the
reference never had (it is strictly single-node, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from swtpu.core import oracle
from swtpu.core.encode import random_batch
from swtpu.dist.batch import (batch_score, make_best_hit_reducer,
                              make_sharded_batch_scorer)
from swtpu.dist.mesh import data_mesh


@pytest.fixture(scope="module")
def mesh():
    return data_mesh(8, platform="cpu")


def test_batch_score_single_device():
    aa, bb = random_batch(5, 40, 30, seed=0)
    hits = batch_score(aa, bb)
    for k in range(5):
        ref = oracle.fill(aa[k], bb[k])
        assert int(hits.scores[k]) == ref.max_score
        assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij


def test_sharded_batch_matches_oracle(mesh):
    B, m, n = 16, 48, 32
    aa, bb = random_batch(B, m, n, seed=1)
    scorer = make_sharded_batch_scorer(mesh)
    hits = scorer(jax.numpy.asarray(aa), jax.numpy.asarray(bb))
    for k in range(B):
        ref = oracle.fill(aa[k], bb[k])
        assert int(hits.scores[k]) == ref.max_score, k
        assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij


def test_best_hit_reducer(mesh):
    B, m, n = 24, 40, 24
    aa, bb = random_batch(B, m, n, seed=2)
    reducer = make_best_hit_reducer(mesh)
    best = reducer(jax.numpy.asarray(aa), jax.numpy.asarray(bb))
    refs = [oracle.fill(aa[k], bb[k]) for k in range(B)]
    scores = [r.max_score for r in refs]
    top = max(scores)
    first = scores.index(top)          # first-pair-wins tie rule
    assert int(best.score) == top
    assert int(best.pair) == first
    assert (int(best.max_i), int(best.max_j)) == refs[first].max_ij


def test_pairs_kernel_matches_oracle():
    """The pair-grid Pallas scorer (interpret mode) vs per-pair oracle."""
    import numpy as np
    import jax.numpy as jnp
    from swtpu.core import oracle
    from swtpu.core.encode import random_batch
    from swtpu.kernels.pallas_fill import pairs_score_fn

    B, m, n = 6, 40, 300
    aa, bb = random_batch(B, m, n, seed=13)
    fn = pairs_score_fn(B, m, n, T=256, R=2, C=128, interpret=True)
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g])
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g


def test_pairs_packed_kernel_matches_oracle():
    """The packed-pairs scorer (one stripe chain, per-pair stream
    injection — VERDICT r3 #4) vs per-pair oracle, stressing every
    packing irregularity at once: n not a multiple of R (row padding),
    pairs straddling stripe boundaries (lanes-per-pair does not divide
    the lane count, so lane 0 of stripe 1 is MID-pair and re-bases its
    pair's stream), and multiple stripes chained through the ring."""
    import jax.numpy as jnp
    from swtpu.core import oracle
    from swtpu.core.encode import random_batch
    from swtpu.kernels.pallas_fill import pairs_packed_score_fn

    B, m, n = 45, 40, 5                 # rlen=6 at R=2 -> lpp=3; S=2
    aa, bb = random_batch(B, m, n, seed=13)
    fn = pairs_packed_score_fn(B, m, n, T=256, R=2, C=128,
                               interpret=True)
    assert fn.config["rlen"] == 6 and fn.config["lpp"] == 3
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g])
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g


def test_pairs_packed_matches_pairs_grid():
    """Packed pairs and the pair-grid kernel agree bit-exactly (scores
    AND first-occurrence positions) on a tie-rich repeated-motif batch."""
    import jax.numpy as jnp
    from swtpu.core.encode import random_batch
    from swtpu.kernels.pallas_fill import (pairs_packed_score_fn,
                                           pairs_score_fn)

    B, m, n = 8, 64, 96
    aa, bb = random_batch(B, m, n, seed=17)
    # plant the same motif twice per pair so max-score ties exist
    aa[:, 10:18] = aa[:, 40:48]
    bb[:, 5:13] = aa[:, 10:18]
    bb[:, 60:68] = aa[:, 10:18]
    grid = pairs_score_fn(B, m, n, T=256, R=2, C=128, interpret=True)
    packed = pairs_packed_score_fn(B, m, n, T=512, R=4, C=128,
                                   interpret=True)
    g = grid(jnp.asarray(aa), jnp.asarray(bb))
    p = packed(jnp.asarray(aa), jnp.asarray(bb))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(p[k]))


def test_pairs_packed_affine_and_substitution():
    """Affine gaps and the packed BLOSUM62 profile compose with the
    packed-pairs stream injection (the profile is built from the packed
    target rows per pair; the injected stream carries raw codes)."""
    import jax.numpy as jnp
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import pairs_packed_score_fn

    B, m, n = 7, 52, 33
    aa, bb = _protein_batch(B, m, n, seed=23)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    fn = pairs_packed_score_fn(B, m, n, scoring=sc, T=512, R=4, C=128,
                               interpret=True, substitution=BLOSUM62)
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g], sc, sub=BLOSUM62)
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g

    # plain affine (no substitution) too
    sc2 = Scoring(mode="affine", gap_open=-4, gap_extend=-1)
    from swtpu.core.encode import random_batch
    aa2, bb2 = random_batch(5, 30, 44, seed=29)
    fn2 = pairs_packed_score_fn(5, 30, 44, scoring=sc2, T=256, R=2,
                                C=128, interpret=True)
    s2, i2, j2 = fn2(jnp.asarray(aa2), jnp.asarray(bb2))
    for g in range(5):
        ref = oracle.fill(aa2[g], bb2[g], sc2)
        assert int(s2[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i2[g]), int(j2[g])) == ref.max_ij, g


def test_batch_score_stripe_plan_matches_scan():
    import numpy as np
    from swtpu.core.encode import random_batch
    from swtpu.dist.batch import batch_score

    B, m, n = 4, 64, 128
    aa, bb = random_batch(B, m, n, seed=14)
    scan = batch_score(aa, bb, plan="scan")
    for forced in ("stripe", "packed"):
        got = batch_score(aa, bb, plan=forced, interpret=True)
        np.testing.assert_array_equal(np.asarray(scan.scores),
                                      np.asarray(got.scores), forced)
        np.testing.assert_array_equal(np.asarray(scan.max_i),
                                      np.asarray(got.max_i), forced)
        np.testing.assert_array_equal(np.asarray(scan.max_j),
                                      np.asarray(got.max_j), forced)


def test_batch_score_auto_routes_packed_on_tpu(monkeypatch):
    """plan='auto' on TPU sends small same-shape batches to the
    packed-pairs kernel (VERDICT r3 #4: automatic routing), and sends
    over-cap batches to the pair grid instead."""
    import swtpu.dist.batch as dbatch

    monkeypatch.setattr("swtpu.dispatch.plan.current_platform",
                        lambda: "tpu")
    from swtpu.core.config import Scoring

    sc = Scoring()
    assert dbatch._use_packed_kernel(sc, None, 64, 1056, 1056, "auto")
    # huge pairs: injection tensor would blow the HBM cap -> pair grid
    assert not dbatch._use_packed_kernel(sc, None, 64, 25632, 25632,
                                         "auto")
    assert dbatch._use_pairs_kernel(sc, None, 25632, 25632, "auto", None)
    # banded batches never take a stripe path
    assert not dbatch._use_packed_kernel(sc, 4, 8, 64, 64, "auto")
    with pytest.raises(ValueError, match="packed"):
        dbatch._use_packed_kernel(sc, 4, 8, 64, 64, "packed")
    # single pair or oversized batch: no packing win / bounded trace
    assert not dbatch._use_packed_kernel(sc, None, 1, 64, 64, "auto")
    assert not dbatch._use_packed_kernel(sc, None, 4096, 64, 64, "auto")


def test_banded_batch_contract():
    """The banded plan matrix is an API contract (VERDICT r4 #7 /
    DESIGN.md §6): every stripe-family plan REJECTS band with a typed
    error through the PUBLIC batch_score surface, and plan='auto' routes
    banded batches to the vmapped scan, whose banded scores match the
    single-pair banded scan (and the band actually restricts)."""
    import jax.numpy as jnp

    from swtpu.core.encode import encode, random_batch
    from swtpu.dist.batch import batch_score
    from swtpu.kernels.scan_fill import scan_fill

    aa, bb = random_batch(4, 48, 40, seed=11)
    for plan in ("packed", "stripe", "host-simd"):
        with pytest.raises(ValueError, match="band"):
            batch_score(aa, bb, band=8, plan=plan)
    hits = batch_score(aa, bb, band=8)            # auto -> vmapped scan
    for k in range(4):
        ref = scan_fill(jnp.asarray(aa[k]), jnp.asarray(bb[k]), band=8)
        assert int(hits.scores[k]) == int(ref.max_score)
    # the band does restrict: an off-diagonal match is invisible
    a = np.tile(encode("AAAAAAAATTTT"), (2, 1))
    b = np.tile(encode("TTTTAAAAAAAA"), (2, 1))
    narrow = batch_score(a, b, band=2)
    full = batch_score(a, b, plan="scan")
    assert int(narrow.scores[0]) < int(full.scores[0])


def test_score_many_heterogeneous_matches_oracle():
    """score_many (VERDICT r4 #4 amortization: one dispatch per shape
    bucket instead of per problem): exact score AND first-occurrence
    positions vs the oracle across heterogeneous shapes, linear / affine
    / BLOSUM62, empty operands, and the per-pair fallback for scorings
    where padding is not provably exact."""
    import swtpu
    from swtpu.core import oracle
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62

    rng = np.random.default_rng(5)
    shapes = [(37, 211), (64, 64), (211, 37), (5, 300), (130, 129),
              (64, 64), (1, 1), (97, 3)]
    a_list = [rng.integers(0, 4, m).astype(np.int8) for m, _ in shapes]
    b_list = [rng.integers(0, 4, n).astype(np.int8) for _, n in shapes]
    # plant homology in a few pairs so scores/positions are non-trivial
    b_list[0][20:50] = a_list[0][2:32]
    b_list[4][:60] = a_list[4][60:120]
    for scoring, sub in [
            (Scoring(), None),
            (Scoring(match=5, mismatch=-3, gap=-4), None),
            (Scoring(mode="affine", gap_open=-11, gap_extend=-1), None)]:
        hits = swtpu.score_many(a_list, b_list, scoring=scoring,
                                substitution=sub)
        for k, (a, b) in enumerate(zip(a_list, b_list)):
            ref = oracle.fill(a, b, scoring)
            assert int(hits.scores[k]) == ref.max_score, (scoring, k)
            assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij

    # protein: substitution table + affine through the same bucketing
    aff = Scoring(mode="affine", gap_open=-10, gap_extend=-1)
    ap = [rng.integers(0, 20, m).astype(np.int8) for m in (33, 120, 33)]
    bp = [rng.integers(0, 20, n).astype(np.int8) for n in (150, 45, 150)]
    bp[0][10:30] = ap[0][5:25]
    sub = np.asarray(BLOSUM62)
    hits = swtpu.score_many(ap, bp, scoring=aff, substitution=sub)
    for k, (a, b) in enumerate(zip(ap, bp)):
        ref = oracle.fill(a, b, aff, sub=sub)
        assert int(hits.scores[k]) == ref.max_score
        assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij

    # empty operands score 0 at (0, 0)
    hits = swtpu.score_many([np.zeros(0, np.int8), a_list[0]],
                            [b_list[0], np.zeros(0, np.int8)])
    assert (int(hits.scores[0]), int(hits.scores[1])) == (0, 0)

    # non-negative mismatch: padding unprovable -> per-pair fallback,
    # still exact
    weird = Scoring(match=2, mismatch=0, gap=-1)
    hits = swtpu.score_many(a_list[:3], b_list[:3], scoring=weird)
    for k in range(3):
        ref = oracle.fill(a_list[k], b_list[k], weird)
        assert int(hits.scores[k]) == ref.max_score
        assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij

    with pytest.raises(ValueError, match="sequences"):
        swtpu.score_many(a_list, b_list[:2])


def test_align_many_best_first_with_exact_strings(monkeypatch):
    """align_many: batch_align's contract over heterogeneous shapes —
    best-first order, `top` truncation, alignment strings that re-score
    to the oracle max."""
    import swtpu
    from swtpu.core import oracle

    rng = np.random.default_rng(3)
    a_list = [rng.integers(0, 4, m).astype(np.int8)
              for m in (80, 200, 40)]
    b_list = [rng.integers(0, 4, n).astype(np.int8)
              for n in (150, 60, 300)]
    b_list[1][5:45] = a_list[1][100:140]      # pair 1 is the best hit
    got = swtpu.align_many(a_list, b_list)
    assert [i for i, _ in got][0] == 1
    scores = [oracle.fill(a, b).max_score
              for a, b in zip(a_list, b_list)]
    assert [r.max_score for _, r in got] == sorted(scores, reverse=True)
    for i, res in got:
        s = 0
        for x, y in zip(res.aligned_a, res.aligned_b):
            s += -2 if "-" in (x, y) else (3 if x == y else -3)
        assert s == scores[i]
    top1 = swtpu.align_many(a_list, b_list, top=1)
    assert len(top1) == 1 and top1[0][0] == 1


def test_score_many_padding_exact_on_packed_kernel(monkeypatch):
    """score_many's sentinel padding (-3 a-pad, -2 b-pad) through the
    PACKED Pallas kernel (the TPU bucket route, interpret mode here):
    scores and positions equal the UNPADDED oracle — the pad region can
    never rise above the zero floor or steal the first-occurrence
    argmax."""
    from swtpu.core import oracle
    from swtpu.dist.batch import batch_score

    rng = np.random.default_rng(9)
    lens = [(37, 50), (64, 33), (17, 64)]
    mb, nb = 64, 64
    aa = np.full((len(lens), mb), -3, np.int8)
    bb = np.full((len(lens), nb), -2, np.int8)
    raw = []
    for r, (m, n) in enumerate(lens):
        a = rng.integers(0, 4, m).astype(np.int8)
        b = rng.integers(0, 4, n).astype(np.int8)
        b[: m // 2] = a[: m // 2]          # planted prefix homology
        aa[r, :m], bb[r, :n] = a, b
        raw.append((a, b))
    monkeypatch.setattr("swtpu.dispatch.plan.current_platform",
                        lambda: "tpu")
    hits = batch_score(aa, bb, plan="packed", interpret=True)
    for r, (a, b) in enumerate(raw):
        ref = oracle.fill(a, b)
        assert int(hits.scores[r]) == ref.max_score
        assert (int(hits.max_i[r]), int(hits.max_j[r])) == ref.max_ij


def _protein_batch(B, m, n, seed, overlap=True):
    rng = np.random.default_rng(seed)
    aa = rng.integers(0, 20, (B, m)).astype(np.int8)
    bb = rng.integers(0, 20, (B, n)).astype(np.int8)
    if overlap:       # plant homology so scores are non-trivial
        k = min(m, n) // 2
        bb[:, 5:5 + k] = aa[:, 3:3 + k]
    return aa, bb


def test_pairs_kernel_substitution_matches_oracle():
    """Protein scoring through the pair-grid kernel: packed BLOSUM62
    profile + affine gaps, bit-equal score AND argmax vs the oracle —
    the reference's scoring hook runs in every strategy
    (serial_smithW.c:251-256)."""
    import jax.numpy as jnp
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import pairs_score_fn

    B, m, n = 4, 60, 280
    aa, bb = _protein_batch(B, m, n, seed=21)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    fn = pairs_score_fn(B, m, n, scoring=sc, T=256, R=2, C=128,
                        interpret=True, substitution=BLOSUM62)
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g], sc, sub=BLOSUM62)
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g


def test_pairs_kernel_unpacked_profile_matches_oracle():
    """Tables with |score| > 127 fall back to the unpacked select tree —
    same parity contract through the pairs grid."""
    import jax.numpy as jnp
    from swtpu.core.config import Scoring
    from swtpu.kernels.pallas_fill import pairs_score_fn

    rng = np.random.default_rng(22)
    A = 6
    big = rng.integers(-200, 201, (A, A)).astype(np.int32)
    big = ((big + big.T) // 2).astype(np.int32)
    np.fill_diagonal(big, np.abs(np.diag(big)) + 150)
    B, m, n = 3, 48, 260
    aa = rng.integers(0, A, (B, m)).astype(np.int8)
    bb = rng.integers(0, A, (B, n)).astype(np.int8)
    sc = Scoring(mode="affine", gap_open=-60, gap_extend=-8)
    fn = pairs_score_fn(B, m, n, scoring=sc, T=256, R=2, C=128,
                        interpret=True, substitution=big)
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g], sc, sub=big)
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g


def test_pairs_kernel_out_of_range_codes_are_sentinels():
    """Residue codes outside the table alphabet score as padding (strong
    mismatch) in the in-trace profile build — never silently alias a real
    symbol through jnp's clamped gather."""
    import jax.numpy as jnp
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62
    from swtpu.kernels.pallas_fill import pairs_score_fn

    B, m, n = 2, 40, 150
    aa, bb = _protein_batch(B, m, n, seed=26)
    bad = bb.copy()
    bad[:, ::7] = 25                      # out of the 20-symbol alphabet
    masked = bad.copy()
    masked[:, ::7] = -2                   # explicit padding sentinel
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    fn = pairs_score_fn(B, m, n, scoring=sc, T=256, R=2, C=128,
                        interpret=True, substitution=BLOSUM62)
    s_bad = np.asarray(fn(jnp.asarray(aa), jnp.asarray(bad))[0])
    s_masked = np.asarray(fn(jnp.asarray(aa), jnp.asarray(masked))[0])
    np.testing.assert_array_equal(s_bad, s_masked)


def test_batch_score_substitution_scan_and_stripe_agree():
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62

    B, m, n = 4, 64, 140
    aa, bb = _protein_batch(B, m, n, seed=23)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    scan = batch_score(aa, bb, sc, plan="scan", substitution=BLOSUM62)
    stripe = batch_score(aa, bb, sc, plan="stripe", interpret=True,
                         substitution=BLOSUM62)
    np.testing.assert_array_equal(np.asarray(scan.scores),
                                  np.asarray(stripe.scores))
    np.testing.assert_array_equal(np.asarray(scan.max_i),
                                  np.asarray(stripe.max_i))
    np.testing.assert_array_equal(np.asarray(scan.max_j),
                                  np.asarray(stripe.max_j))
    for k in range(B):
        ref = oracle.fill(aa[k], bb[k], sc, sub=BLOSUM62)
        assert int(scan.scores[k]) == ref.max_score, k


def test_sharded_batch_substitution(mesh):
    """Protein batch sharded over the 8-device mesh matches the oracle —
    the data-parallel strategy is scoring-universal too."""
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62

    B, m, n = 16, 40, 36
    aa, bb = _protein_batch(B, m, n, seed=24)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    scorer = make_sharded_batch_scorer(mesh, sc, substitution=BLOSUM62)
    hits = scorer(jax.numpy.asarray(aa), jax.numpy.asarray(bb))
    for k in range(B):
        ref = oracle.fill(aa[k], bb[k], sc, sub=BLOSUM62)
        assert int(hits.scores[k]) == ref.max_score, k
        assert (int(hits.max_i[k]), int(hits.max_j[k])) == ref.max_ij


def test_best_hit_reducer_substitution(mesh):
    from swtpu.core.config import Scoring
    from swtpu.core.substitution import BLOSUM62

    B, m, n = 16, 36, 30
    aa, bb = _protein_batch(B, m, n, seed=25)
    sc = Scoring(mode="affine", gap_open=-11, gap_extend=-1)
    reducer = make_best_hit_reducer(mesh, sc, substitution=BLOSUM62)
    best = reducer(jax.numpy.asarray(aa), jax.numpy.asarray(bb))
    refs = [oracle.fill(aa[k], bb[k], sc, sub=BLOSUM62) for k in range(B)]
    scores = [r.max_score for r in refs]
    top = max(scores)
    first = scores.index(top)
    assert int(best.score) == top
    assert int(best.pair) == first
    assert (int(best.max_i), int(best.max_j)) == refs[first].max_ij


def test_multihost_two_process_dryrun():
    """REAL multi-process jax.distributed (VERDICT r3 Missing #3): two
    local CPU processes initialize against a localhost coordinator, build
    one spanning 8-device mesh, and run the sharded batch scorer + the
    best-hit pmax reducer, each verifying results against the oracle. No
    monkeypatching — this is the actual coordination service a pod slice
    uses over DCN."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "multihost_dryrun.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, script], env=env, timeout=280,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("MULTIHOST_OK") == 2, out.stdout


def test_initialize_multihost_plumbing(monkeypatch):
    """Argument plumbing of the multi-host entry point (no pod slice in
    this environment — verified by interception, documented unverifiable
    end-to-end here)."""
    import jax
    from swtpu.dist.mesh import initialize_multihost

    seen = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: seen.update(kw))
    initialize_multihost(coordinator_address="10.0.0.1:1234",
                         num_processes=4, process_id=2)
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}


def test_initialize_multihost_autodetect(monkeypatch):
    """Omitted arguments are NOT forwarded (TPU pods auto-detect them);
    extra kwargs pass through."""
    import jax
    from swtpu.dist.mesh import initialize_multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    initialize_multihost()
    assert calls[-1] == {}
    initialize_multihost(process_id=0, local_device_ids=[0])
    assert calls[-1] == {"process_id": 0, "local_device_ids": [0]}


def test_batch_align_strings_match_oracle():
    """batch_align: one batched scoring dispatch, host tracebacks for the
    selected pairs, best-first order, scores cross-checked."""
    from swtpu.core import oracle
    from swtpu.core.encode import random_batch
    from swtpu.dist.batch import batch_align

    a, b = random_batch(5, 48, 40, seed=33)
    recs = batch_align(a, b, top=3)
    assert len(recs) == 3
    scores = [r.max_score for _, r in recs]
    assert scores == sorted(scores, reverse=True)
    for i, res in recs:
        ref = oracle.fill(a[i], b[i])
        assert res.max_score == ref.max_score
        mi, mj = ref.max_ij
        ra, rb = oracle.alignment_strings(a[i], b[i], ref.P,
                                          mi * (48 + 1) + mj)
        assert (res.aligned_a, res.aligned_b) == (ra, rb)


def test_pairs_packed_config_fuzz():
    """Randomized (B, m, n, R, T) packed-pairs configurations vs the
    oracle — catches packing-geometry edge cases the fixed-shape tests
    miss (single-lane pairs, pair == stripe, B=1, one-column streams)."""
    import jax.numpy as jnp
    from swtpu.core import oracle
    from swtpu.kernels.pallas_fill import pairs_packed_score_fn

    rng = np.random.default_rng(41)
    cases = [
        (1, 8, 8, 1, 128),      # single pair, R=1
        (2, 3, 1, 1, 128),      # one-row pairs
        (5, 1, 9, 1, 128),      # one-column stream
        (128, 12, 2, 2, 256),   # pair == one lane (rlen == R)
        (16, 33, 16, 16, 2048), # lpp == 1, R == rlen
    ]
    for _ in range(4):
        B = int(rng.integers(2, 20))
        m = int(rng.integers(2, 60))
        n = int(rng.integers(2, 40))
        R = int(rng.choice([1, 2, 4]))
        cases.append((B, m, n, R, 128 * R * int(rng.integers(1, 3))))
    for (B, m, n, R, T) in cases:
        aa = rng.integers(0, 4, (B, m)).astype(np.int8)
        bb = rng.integers(0, 4, (B, n)).astype(np.int8)
        fn = pairs_packed_score_fn(B, m, n, T=T, R=R, C=128,
                                   interpret=True)
        s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
        for g in range(B):
            ref = oracle.fill(aa[g], bb[g])
            assert int(s[g]) == ref.max_score, (B, m, n, R, T, g)
            if ref.max_score > 0:
                assert (int(i[g]), int(j[g])) == ref.max_ij, \
                    (B, m, n, R, T, g)


def test_pairs_packed_balanced_default_stripes():
    """The default-T chooser BALANCES multi-stripe packings (round 5):
    every stripe pays full steps_pad, so a barely-used tail stripe (the
    64x1056 bench shape left stripe 2 of T=65536 97% padding) costs the
    same as a full one. Pins (a) the chosen geometry at the bench shape
    and (b) bit-exactness through a small balanced multi-stripe fill."""
    import jax.numpy as jnp
    from swtpu.core import oracle
    from swtpu.kernels.pallas_fill import (LANES, pairs_packed_score_fn,
                                           packed_pairs_geometry)

    # (a) geometry at the bench shape: 64 x 1056 -> R=32, ntot=67584
    # lanes = 16.5 sub-blocks -> 2 stripes of sub=9 (T=36864), NOT one
    # full + one 3%-used stripe at the old T=65536. Pin the PRODUCTION
    # chooser's output (fn.config), not a re-derivation of its formula.
    R, rlen, lpp = packed_pairs_geometry(1056)
    assert (R, rlen, lpp) == (32, 1056, 33)
    fn_bench = pairs_packed_score_fn(64, 1056, 1056, interpret=True)
    assert fn_bench.config["T"] == 36864, fn_bench.config
    assert fn_bench.config["num_stripes"] == 2, fn_bench.config
    assert LANES * 9 * R == 36864                  # 2 balanced sub=9

    # (b) exactness through the default-T multi-stripe path (R=2 keeps
    # the interpret-mode fill small: ntot=5400 > 16*128*2 -> 2 stripes
    # of T=2816).
    rng = np.random.default_rng(7)
    B, m, n = 6, 24, 900
    aa = rng.integers(0, 4, (B, m)).astype(np.int8)
    bb = rng.integers(0, 4, (B, n)).astype(np.int8)
    fn = pairs_packed_score_fn(B, m, n, R=2, interpret=True)
    s, i, j = fn(jnp.asarray(aa), jnp.asarray(bb))
    for g in range(B):
        ref = oracle.fill(aa[g], bb[g])
        assert int(s[g]) == ref.max_score, g
        if ref.max_score > 0:
            assert (int(i[g]), int(j[g])) == ref.max_ij, g
