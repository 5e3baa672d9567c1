"""swtpu — TPU-native Smith-Waterman local alignment framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
C/OpenMP/CUDA codebase (chunhualiao/Smith-Waterman): exact int32 wavefront DP
fill, max-score tracking, traceback, multiple execution plans behind one API,
adaptive dispatch, banded and affine-gap modes, batched and multi-chip
(shard_map) scaling.
"""

from .core.config import (
    BUILTIN_A,
    BUILTIN_B,
    BUILTIN_LAST_CELL,
    BUILTIN_MAX_POS,
    BUILTIN_MAX_SCORE,
    DIAGONAL,
    LEFT,
    NONE,
    PATH,
    UP,
    EngineConfig,
    Scoring,
)
from .core.encode import decode, encode, random_batch, random_pair
from .engine.align import Alignment, align, score
from .engine.traceback import AnchoredReverseMismatch

__version__ = "0.3.0"


def sanitize(a, b, **kw):
    """Debug-mode structural check of the stripe kernel on (a, b) — the
    reference's DEBUG sanitizer analog (instrument.sanitize)."""
    from .instrument.sanitize import sanitize_stripe
    return sanitize_stripe(a, b, **kw)


__all__ = [
    "align", "score", "sanitize", "Alignment", "Scoring", "EngineConfig",
    "AnchoredReverseMismatch",
    "encode", "decode", "random_pair", "random_batch",
    "NONE", "UP", "LEFT", "DIAGONAL", "PATH",
    "BUILTIN_A", "BUILTIN_B", "BUILTIN_MAX_SCORE", "BUILTIN_MAX_POS",
    "BUILTIN_LAST_CELL",
]
