"""Linear-space traceback tests: locate / windowed / hirschberg must return
alignments whose score equals the oracle's optimum."""

import numpy as np
import pytest

from swtpu import Scoring
from swtpu.core import oracle
from swtpu.core.encode import DNA_ALPHABET, encode, random_pair
from swtpu.engine import traceback as tb


def alignment_score(ra: str, rb: str, scoring: Scoring = Scoring()) -> int:
    s = 0
    for x, y in zip(ra, rb):
        if x == "-" or y == "-":
            s += scoring.gap
        elif x == y:
            s += scoring.match
        else:
            s += scoring.mismatch
    return s


@pytest.mark.parametrize("shape,seed", [((60, 50), 0), ((200, 40), 1),
                                        ((37, 133), 2), ((128, 128), 3)])
def test_locate_matches_oracle(shape, seed):
    m, n = shape
    a, b = random_pair(m, n, seed=seed)
    ref = oracle.fill(a, b)
    loc = tb.locate(a, b)
    assert loc.score == ref.max_score
    assert (loc.end_i, loc.end_j) == ref.max_ij
    # the reference path's start (walked from full P) must be reachable:
    # our located start must give the same score via windowed refill
    got = tb.windowed(a, b)
    assert got is not None
    score, loc2, ra, rb = got
    assert score == ref.max_score
    assert alignment_score(ra, rb) == ref.max_score
    assert len(ra) == len(rb)


@pytest.mark.parametrize("seed", range(3))
def test_hirschberg_score_parity(seed):
    a, b = random_pair(180, 150, seed=seed + 10)
    ref = oracle.fill(a, b)
    if ref.max_score <= 0:
        pytest.skip("degenerate")
    score, loc, ra, rb = tb.hirschberg(a, b)
    assert score == ref.max_score
    assert alignment_score(ra, rb) == ref.max_score
    # aligned strings reproduce the located substrings when gaps removed
    assert ra.replace("-", "") == "".join(
        DNA_ALPHABET[c] for c in a[loc.start_j - 1: loc.end_j])
    assert rb.replace("-", "") == "".join(
        DNA_ALPHABET[c] for c in b[loc.start_i - 1: loc.end_i])


def test_hirschberg_recursion_depth():
    # force recursion past base size
    old = tb._BASE_CELLS
    tb._BASE_CELLS = 64
    try:
        a, b = random_pair(90, 80, seed=7)
        ref = oracle.fill(a, b)
        score, loc, ra, rb = tb.hirschberg(a, b)
        assert score == ref.max_score
        assert alignment_score(ra, rb) == ref.max_score
    finally:
        tb._BASE_CELLS = old


def test_windowed_falls_back_to_hirschberg():
    a, b = random_pair(256, 256, seed=9)
    ref = oracle.fill(a, b)
    got = tb.windowed(a, b, max_window_cells=16)   # absurdly small budget
    score, loc, ra, rb = got
    assert score == ref.max_score
    assert alignment_score(ra, rb) == ref.max_score


def test_no_alignment():
    a = encode("AAAA")
    b = encode("TTTT")
    assert tb.locate(a, b) is None
    assert tb.windowed(a, b) is None


def test_stripe_window_walk_matches_oracle():
    """Device-resident predecessor walk (interpret mode) vs the oracle's
    host backtrack on the same window."""
    import numpy as np
    import swtpu
    from swtpu.core import oracle
    from swtpu.core.encode import random_pair
    from swtpu.engine.traceback import _render, _stripe_window_walk

    m, n = 120, 300
    a, b = random_pair(m, n, seed=77)
    b[40:90] = a[10:60]               # planted block
    ref = oracle.fill(a, b)
    ei, ej = ref.max_ij
    # window = everything up to the end cell (start at 1,1 for simplicity)
    sub_a, sub_b = a[:ej], b[:ei]
    ca, cb = _stripe_window_walk(sub_a, sub_b, ei, ej, swtpu.Scoring())
    ra, rb = _render(ca, cb)
    s = swtpu.Scoring()
    sc = sum(s.gap if '-' in (x, y) else (s.match if x == y else s.mismatch)
             for x, y in zip(ra, rb))
    assert sc == ref.max_score
