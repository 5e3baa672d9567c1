"""Golden oracle tests — the reference's built-in verification, made real.

The reference's only unit test is asserts on the Wikipedia example
(omp_smithW-v1-refinedOrig.cpp:229-238): max score 13 at padded index 69,
bottom-right cell 7. These tests pin the oracle to those invariants and prove
the vectorized oracle equals the exact-semantics loop oracle.
"""

import numpy as np
import pytest

from swtpu import (
    BUILTIN_A, BUILTIN_B, BUILTIN_LAST_CELL, BUILTIN_MAX_POS,
    BUILTIN_MAX_SCORE, Scoring, encode,
)
from swtpu.core import oracle


def test_builtin_example_loop():
    a, b = encode(BUILTIN_A), encode(BUILTIN_B)
    r = oracle.fill_loop(a, b)
    assert r.max_score == BUILTIN_MAX_SCORE
    assert r.max_pos == BUILTIN_MAX_POS
    assert r.H[-1, -1] == BUILTIN_LAST_CELL
    assert r.H.flat[r.max_pos] == BUILTIN_MAX_SCORE
    assert r.max_ij == (7, 6)


def test_builtin_example_vectorized():
    a, b = encode(BUILTIN_A), encode(BUILTIN_B)
    r = oracle.fill(a, b)
    assert r.max_score == BUILTIN_MAX_SCORE
    assert r.max_pos == BUILTIN_MAX_POS
    assert r.H[-1, -1] == BUILTIN_LAST_CELL


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("shape", [(8, 9), (17, 5), (33, 33), (64, 48)])
def test_vectorized_matches_loop(seed, shape):
    from swtpu.core.encode import random_pair
    m, n = shape
    a, b = random_pair(m, n, seed=seed)
    r1 = oracle.fill_loop(a, b)
    r2 = oracle.fill(a, b)
    np.testing.assert_array_equal(r1.H, r2.H)
    np.testing.assert_array_equal(r1.P, r2.P)
    assert r1.max_pos == r2.max_pos


def test_backtrack_builtin():
    a, b = encode(BUILTIN_A), encode(BUILTIN_B)
    r = oracle.fill_loop(a, b)
    path = oracle.backtrack(r.P, r.max_pos)
    assert path[0] == BUILTIN_MAX_POS
    # Wikipedia alignment: GTT-AC / GTTGAC
    sa, sb = oracle.alignment_strings(a, b, r.P, r.max_pos)
    assert sa == "GTT-AC"
    assert sb == "GTTGAC"


def test_mark_path_negates_only_path():
    a, b = encode(BUILTIN_A), encode(BUILTIN_B)
    r = oracle.fill_loop(a, b)
    marked = oracle.mark_path(r.P, r.max_pos)
    negs = np.argwhere(marked.reshape(-1) < 0).ravel()
    assert set(negs.tolist()) == set(oracle.backtrack(r.P, r.max_pos))


def test_affine_reduces_to_linear_when_open_equals_extend():
    # With gap_open == gap_extend == gap, Gotoh == linear-gap scores.
    from swtpu.core.encode import random_pair
    a, b = random_pair(20, 16, seed=3)
    lin = oracle.fill_loop(a, b, Scoring())
    aff = oracle.fill_loop(
        a, b, Scoring(mode="affine", gap_open=-2, gap_extend=-2))
    np.testing.assert_array_equal(lin.H, aff.H)


def test_affine_penalizes_opening_more():
    # a long gap should cost open + (k-1)*extend, not k*open
    a = encode("ACGTACGTAAAAACGTACGT")
    b = encode("ACGTACGTCGTACGT")
    aff = oracle.fill_loop(
        a, b, Scoring(mode="affine", gap_open=-4, gap_extend=-1))
    # alignment: ACGTACGT-----CGTACGT vs b, 15 matches*3 - (4 + 4*1) = 37
    assert aff.max_score == 37
