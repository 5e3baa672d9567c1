"""Checkpoint / resume for long mega-matrix pipeline runs.

The reference has no checkpointing (SURVEY.md §5 — its longest run is
~260 s). A 10^6 x 10^6 pipeline run is hours; its live state is tiny and
boundary-shaped, which the rolling-wavefront design makes natural: per
device, one bottom row (m/D + 1 ints), one incoming halo column (R + 1
ints), and the running best — O((m + n)/D) total. This module runs the
pipeline in host-stepped segments, snapshotting that carry to an .npz
between segments and resuming from any snapshot bit-exactly.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Scoring
from ..kernels.scan_fill import scan_fill
from .pipeline import PipelineResult


@dataclasses.dataclass
class ResumablePipeline:
    """Segmented mega-matrix pipeline with snapshot/restore.

    Usage::

        rp = ResumablePipeline(mesh, m, n, block_rows=4096)
        carry = rp.init()
        for seg in range(rp.num_segments):
            carry = rp.segment(a, b, carry, seg)
            rp.save(carry, seg, "ckpt.npz")          # crash-safe point
        # ... after a restart:
        carry, seg = rp.load("ckpt.npz")
        ...
        result = rp.finish(carry)
    """

    mesh: Mesh
    m: int
    n: int
    block_rows: int
    scoring: Scoring = Scoring()
    axis: str = "seq"
    stages_per_segment: int = 8

    def __post_init__(self):
        D = self.mesh.shape[self.axis]
        if self.m % D or self.n % self.block_rows:
            raise ValueError("m must divide by mesh size, n by block_rows")
        self.D = D
        self.mc = self.m // D
        self.R = self.block_rows
        self.nblocks = self.n // self.R
        self.stages = self.nblocks + D - 1
        self.num_segments = -(-self.stages // self.stages_per_segment)
        self._seg_fn = self._build_segment()

    # carry pytree: dict of (D, ...) arrays sharded over the mesh axis
    def _sharding(self):
        return NamedSharding(self.mesh, P(self.axis))

    def init(self) -> dict:
        D, mc, R = self.D, self.mc, self.R
        sh = self._sharding()
        z = lambda shape: jax.device_put(np.zeros(shape, np.int32), sh)
        return {
            "bottom": z((D, mc + 1)),
            "left": z((D, R + 1)),
            "bs": z((D,)), "bi": z((D,)), "bj": z((D,)), "last": z((D,)),
        }

    def _build_segment(self):
        mc, R, D = self.mc, self.R, self.D
        nblocks = self.nblocks
        scoring = self.scoring
        axis = self.axis
        perm = [(i, i + 1) for i in range(D - 1)]
        K = self.stages_per_segment

        def local(a_shard, b_full, bottom, left, bs, bi, bj, last, t0):
            d = lax.axis_index(axis)
            a_shard = a_shard[0]
            bottom, left = bottom[0], left[0]
            bs, bi, bj, last = bs[0], bi[0], bj[0], last[0]

            def stage(k, carry):
                bottom, left, bs, bi, bj, last = carry
                t = t0 + k
                r = t - d
                active = (r >= 0) & (r < nblocks)
                rc_i = jnp.clip(r, 0, nblocks - 1)
                b_block = lax.dynamic_slice(b_full, (rc_i * R,), (R,))
                out = scan_fill(a_shard, b_block, scoring=scoring,
                                top_row=bottom, left_col=left)
                gi = rc_i * R + out.max_i
                gj = d * mc + out.max_j
                has = active & (out.max_score > 0)
                upd = ((out.max_score > bs) & has) | (
                    (out.max_score == bs) & has &
                    ((gi < bi) | ((gi == bi) & (gj < bj))))
                bs = jnp.where(upd, out.max_score, bs)
                bi = jnp.where(upd, gi, bi)
                bj = jnp.where(upd, gj, bj)
                last = jnp.where(active & (rc_i == nblocks - 1) & (d == D - 1),
                                 out.bottom_row[mc], last)
                bottom = jnp.where(active, out.bottom_row, bottom)
                halo = jnp.where(active, out.right_col,
                                 jnp.zeros_like(out.right_col))
                left = lax.ppermute(halo, axis, perm) if perm else \
                    jnp.zeros_like(halo)
                return bottom, left, bs, bi, bj, last

            bottom, left, bs, bi, bj, last = lax.fori_loop(
                0, K, stage, (bottom, left, bs, bi, bj, last))
            exp = lambda x: x[None]
            return (exp(bottom), exp(left), exp(bs), exp(bi), exp(bj),
                    exp(last))

        pa = P(self.axis)
        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(pa, P(), pa, pa, pa, pa, pa, pa, P()),
            out_specs=(pa, pa, pa, pa, pa, pa),
            check_vma=False,
        )
        return jax.jit(fn)

    def segment(self, a_sharded, b_full, carry: dict, seg_idx: int) -> dict:
        t0 = jnp.int32(seg_idx * self.stages_per_segment)
        out = self._seg_fn(a_sharded, b_full, carry["bottom"], carry["left"],
                           carry["bs"], carry["bi"], carry["bj"],
                           carry["last"], t0)
        keys = ["bottom", "left", "bs", "bi", "bj", "last"]
        return dict(zip(keys, out))

    def save(self, carry: dict, seg_idx: int, path: str) -> None:
        np.savez(path, seg=seg_idx,
                 **{k: np.asarray(v) for k, v in carry.items()})

    def load(self, path: str) -> tuple[dict, int]:
        z = np.load(path)
        sh = self._sharding()
        carry = {k: jax.device_put(z[k], sh)
                 for k in ["bottom", "left", "bs", "bi", "bj", "last"]}
        return carry, int(z["seg"])

    def finish(self, carry: dict) -> PipelineResult:
        bs = np.asarray(carry["bs"])
        bi = np.asarray(carry["bi"])
        bj = np.asarray(carry["bj"])
        last = np.asarray(carry["last"])
        order = np.lexsort((bj, bi, -bs))
        k = order[0]
        if bs[k] <= 0:
            return PipelineResult(np.int32(0), np.int32(0), np.int32(0),
                                  np.int32(last[-1]))
        return PipelineResult(np.int32(bs[k]), np.int32(bi[k]),
                              np.int32(bj[k]), np.int32(last[-1]))

    # convenience: full run with optional checkpoint file
    def run(self, a_codes: np.ndarray, b_codes: np.ndarray,
            ckpt_path: Optional[str] = None,
            resume: bool = False) -> PipelineResult:
        sh = self._sharding()
        a_sh = jax.device_put(np.asarray(a_codes, np.int8)
                              .reshape(self.D, self.mc), sh)
        b_full = jnp.asarray(np.asarray(b_codes, np.int8))
        start = 0
        if resume and ckpt_path and Path(ckpt_path).exists():
            carry, seg = self.load(ckpt_path)
            start = seg + 1
        else:
            carry = self.init()
        for seg in range(start, self.num_segments):
            carry = self.segment(a_sh, b_full, carry, seg)
            if ckpt_path:
                self.save(carry, seg, ckpt_path)
        return self.finish(carry)
