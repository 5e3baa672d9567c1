"""Debug-mode sanitizer tests (the C22 analog): a clean kernel passes all
invariant checks; a deliberately broken boundary-ring offset is CAUGHT."""

import numpy as np
import pytest

from swtpu import Scoring
from swtpu.core.encode import random_pair
from swtpu.instrument.sanitize import SanitizeError, sanitize_stripe
from swtpu.kernels import pallas_fill as pf


def test_sanitizer_clean_pass_multistripe():
    a, b = random_pair(150, 300, seed=0)
    rep = sanitize_stripe(a, b, T=128, R=1, CB=1)
    assert rep.valid_cells == 150 * 300
    assert rep.prestart_cells > 0 and rep.garbage_cells > 0


def test_sanitizer_clean_pass_blocked_config():
    a, b = random_pair(100, 512, seed=1)
    rep = sanitize_stripe(a, b, T=256, R=2, CB=2)
    assert rep.valid_cells == 100 * 512
    assert rep.config[:3] == (256, 2, 2)


def test_sanitizer_clean_pass_affine():
    a, b = random_pair(80, 256, seed=2)
    sc = Scoring(mode="affine", gap_open=-5, gap_extend=-1)
    rep = sanitize_stripe(a, b, scoring=sc, T=128, R=1)
    assert rep.valid_cells == 80 * 256


def test_sanitizer_catches_broken_ring_offset(monkeypatch):
    """Skew the boundary-ring consumer by one slot: stripe 2 then reads a
    shifted top boundary — a wrong-answer class the round-1 framework could
    only detect as a downstream mismatch. The sanitizer must pinpoint it
    as an invariant violation."""
    a, b = random_pair(150, 300, seed=3)
    monkeypatch.setattr(pf, "_DEBUG_RING_SKEW", 1)
    pf._stripe_call.clear_cache()    # the skew is baked in at trace time
    try:
        with pytest.raises(SanitizeError, match="invariant|!= oracle"):
            sanitize_stripe(a, b, T=128, R=1, CB=1)
    finally:
        monkeypatch.setattr(pf, "_DEBUG_RING_SKEW", 0)
        pf._stripe_call.clear_cache()


def test_sanitizer_catches_positive_mismatch_scoring():
    """A scoring that violates the unmasked kernel's precondition must be
    refused before it can produce silently wrong fills."""
    a, b = random_pair(64, 64, seed=4)
    with pytest.raises(ValueError, match="negative"):
        sanitize_stripe(a, b, scoring=Scoring(mismatch=1))


def test_sanitizer_champion_config_class():
    """The production champion's config class (deep register blocking
    R=32, CB=4) passes every structural invariant check."""
    a, b = random_pair(90, 8192, seed=5)
    rep = sanitize_stripe(a, b, T=4096, R=32, CB=4)
    assert rep.valid_cells == 90 * 8192
    assert rep.config[:3] == (4096, 32, 4)


def test_sanitizer_substitution_profiles():
    """The profile modes (packed int8 + unpacked tree) obey the same
    three structural invariants; the sanitizer checks them with a
    substitution oracle (round 3: scoring hook is plan-universal)."""
    from swtpu.core.substitution import BLOSUM62

    rng = np.random.default_rng(8)
    a = rng.integers(0, 20, 70).astype(np.int8)
    b = rng.integers(0, 20, 300).astype(np.int8)
    b[40:90] = a[10:60]
    rep = sanitize_stripe(a, b, scoring=Scoring(gap=-4),
                          substitution=BLOSUM62, T=256, R=2)
    assert rep.valid_cells == 70 * 300
    # unpacked select tree (scores beyond int8)
    S = (rng.integers(-5, 6, (6, 6)) * 50).astype(np.int32)
    np.fill_diagonal(S, 200)
    a2 = rng.integers(0, 6, 60).astype(np.int8)
    b2 = rng.integers(0, 6, 256).astype(np.int8)
    rep2 = sanitize_stripe(a2, b2, scoring=Scoring(gap=-60),
                           substitution=S, T=256, R=2)
    assert rep2.valid_cells == 60 * 256
    # affine + profile
    rep3 = sanitize_stripe(a, b,
                           scoring=Scoring(mode="affine", gap_open=-11,
                                           gap_extend=-1),
                           substitution=BLOSUM62, T=256, R=2)
    assert rep3.valid_cells == 70 * 300


def test_sanitize_pairs_packed_modes():
    """The winject packed-pairs mode obeys the per-pair structural
    invariants (pre-stream zeros, per-pair bit-equality, pad/post-finish
    decay) across row padding, stripe-straddling pairs, affine, and the
    packed BLOSUM62 profile."""
    from swtpu.core.config import Scoring
    from swtpu.core.encode import random_batch
    from swtpu.core.substitution import BLOSUM62
    from swtpu.instrument.sanitize import sanitize_pairs_packed

    aa, bb = random_batch(9, 40, 5, seed=3)      # rlen pad; lpp=3 vs L=128
    rep = sanitize_pairs_packed(aa, bb, T=256, R=2)
    assert rep.valid_cells == 9 * 40 * 5
    aa, bb = random_batch(4, 30, 17, seed=5)
    sanitize_pairs_packed(
        aa, bb, Scoring(mode="affine", gap_open=-4, gap_extend=-1),
        T=256, R=2)
    rng = np.random.default_rng(9)
    aa = rng.integers(0, 20, (3, 24)).astype(np.int8)
    bb = rng.integers(0, 20, (3, 10)).astype(np.int8)
    sanitize_pairs_packed(
        aa, bb, Scoring(mode="affine", gap_open=-11, gap_extend=-1),
        T=256, R=2, substitution=BLOSUM62)


def test_sanitize_pairs_packed_catches_broken_ring(monkeypatch):
    """A deliberately skewed boundary ring (the C22-analog negative test)
    is caught by the packed-pairs checker as a structural violation, not
    a silent wrong answer."""
    import swtpu.kernels.pallas_fill as pf
    from swtpu.core.encode import random_batch
    from swtpu.instrument.sanitize import (SanitizeError,
                                           sanitize_pairs_packed)

    monkeypatch.setattr(pf, "_DEBUG_RING_SKEW", 1)
    aa, bb = random_batch(4, 40, 130, seed=7)    # 2 stripes at T=256, R=2
    with pytest.raises(SanitizeError):
        sanitize_pairs_packed(aa, bb, T=256, R=2)
