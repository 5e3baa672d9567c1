"""Protein/BLOSUM substitution-matrix tests."""

import numpy as np
import pytest

import swtpu
from swtpu.core import oracle
from swtpu.core.encode import PROTEIN_ALPHABET, encode
from swtpu.core.substitution import BLOSUM62, dna_matrix


def test_dna_matrix_equals_compare_path():
    a, b = swtpu.random_pair(40, 30, seed=1)
    ref = oracle.fill(a, b)
    via_matrix = oracle.fill(a, b, sub=dna_matrix())
    np.testing.assert_array_equal(ref.H, via_matrix.H)
    r = swtpu.align(a, b, substitution=dna_matrix())
    assert r.max_score == ref.max_score
    assert r.max_pos == ref.max_pos


def test_blosum62_protein_alignment():
    # classic example: identical peptides score the diagonal sum
    pep = "HEAGAWGHEE"
    codes = encode(pep, PROTEIN_ALPHABET)
    r = swtpu.align(codes, codes, substitution=BLOSUM62,
                    scoring=swtpu.Scoring(gap=-8),
                    alphabet=PROTEIN_ALPHABET)
    expect = int(sum(BLOSUM62[c, c] for c in codes))
    assert r.max_score == expect
    assert r.aligned_a == pep


def test_blosum62_vs_oracle_random():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 20, 50).astype(np.int8)
    b = rng.integers(0, 20, 40).astype(np.int8)
    sc = swtpu.Scoring(gap=-6)
    ref = oracle.fill(a, b, sc, sub=BLOSUM62)
    r = swtpu.align(a, b, scoring=sc, substitution=BLOSUM62,
                    alphabet=PROTEIN_ALPHABET)
    assert r.max_score == ref.max_score
    assert r.max_pos == ref.max_pos


def test_blosum62_affine():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 20, 30).astype(np.int8)
    b = rng.integers(0, 20, 30).astype(np.int8)
    sc = swtpu.Scoring(mode="affine", gap_open=-10, gap_extend=-1)
    ref = oracle.fill_loop(a, b, sc, sub=BLOSUM62)
    r = swtpu.align(a, b, scoring=sc, substitution=BLOSUM62,
                    alphabet=PROTEIN_ALPHABET)
    assert r.max_score == ref.max_score
