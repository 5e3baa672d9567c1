"""Pallas TPU stripe kernel — the performance path (placeholder this commit).

Lands next: row-stationary systolic stripe fill with rolling VMEM wavefront
buffers (the TPU-native re-design of rotated-cuda/sw-rotated-cuda-unified.cu's
three rolling diagonals, built for the 8x128 VPU instead of CUDA threads).
"""

from __future__ import annotations


def stripe_fill_supported(m: int, n: int, traceback: bool) -> bool:
    return False


def stripe_fill(*args, **kwargs):
    raise NotImplementedError("Pallas stripe kernel lands in a later commit")
