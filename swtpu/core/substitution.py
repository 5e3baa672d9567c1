"""Substitution-matrix scoring (protein alignment).

The reference scores DNA only, via a match/mismatch compare
(matchMissmatchScore, serial_smithW.c:251-256). General substitution
matrices (BLOSUM/PAM) extend the same engine to proteins: the per-cell
substitution becomes a table lookup S[query_code, target_code].

Sentinel handling: all swtpu padding sentinels (-1 query pad, -2 target pad,
-3 read pad) map to a strongly negative score so padded cells can never
contribute to an alignment — the matrix is embedded into a (A+3, A+3) table
indexed by ``code + 3``.
"""

from __future__ import annotations

import numpy as np

from .encode import PROTEIN_ALPHABET

NEG_SUB = -(1 << 20)

# BLOSUM62 over ARNDCQEGHILKMFPSTWYVX (standard published half-bit matrix).
_B62 = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0 -1
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3 -1
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3 -1
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3 -1
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1 -1
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2 -1
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2 -1
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3 -1
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3 -1
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3 -1
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1 -1
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2 -1
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1 -1
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1 -1
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2 -1
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2 -1
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0 -1
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3 -1
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1 -1
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4 -1
-1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
"""

BLOSUM62 = np.array([[int(x) for x in row.split()]
                     for row in _B62.strip().splitlines()], dtype=np.int32)
assert BLOSUM62.shape == (len(PROTEIN_ALPHABET),) * 2
assert (BLOSUM62 == BLOSUM62.T).all()


def dna_matrix(match: int = 3, mismatch: int = -3) -> np.ndarray:
    """The reference's match/mismatch model as a 4x4 matrix (so the
    substitution-matrix path can be parity-tested against the compare path)."""
    s = np.full((4, 4), mismatch, np.int32)
    np.fill_diagonal(s, match)
    return s


def embed_sentinels(S: np.ndarray) -> np.ndarray:
    """(A, A) -> (A+3, A+3) table indexed by code+3; sentinel rows/cols get
    NEG_SUB so padding never aligns."""
    A = S.shape[0]
    out = np.full((A + 3, A + 3), NEG_SUB, np.int32)
    out[3:, 3:] = S
    return out
