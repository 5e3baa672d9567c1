"""Database search: a batch of short reads vs a long (sharded) reference.

The reference codebase aligns exactly one pair per process; this driver is
the production workload its design points at (BASELINE.json config 5: 1M
reads vs a sharded 100Mb reference on a multi-host slice):

* the reference sequence shards across the mesh axis, each shard extended
  by a read-length overlap halo so alignments crossing shard boundaries are
  not lost (an alignment of a read spans < qlen reference bases beyond any
  boundary);
* each device streams its shard through fixed-size windows (again halo-
  overlapped) and scores the whole replicated read batch against each
  window with the vmapped wavefront fill — reads sit in vector lanes, so
  one device step computes batch x window cells;
* per-read bests merge locally across windows in the scan carry, then
  across devices with elementwise pmax + deterministic winner-broadcast
  (lowest reference position wins ties), all over ICI/DCN collectives —
  no atomics, unlike the reference's omp critical / atomicCAS
  (omp_smithW.c:384-387, simple-cuda/cuda_global_mem_smithW.cu:246-260).

Multi-host: identical code; build the mesh over all hosts' devices after
`jax.distributed.initialize` (dist/mesh.py) and feed each host its
process-local shard of the reference via `jax.make_array_from_process_...`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import Scoring
from ..kernels.scan_fill import scan_fill


class SearchHits(NamedTuple):
    scores: jax.Array     # (B,) int32 best score per read
    ref_pos: jax.Array    # (B,) int32 global 0-based ref index of the
    #                       alignment end column (-1 if score 0)
    read_end: jax.Array   # (B,) int32 1-based padded row of the read end


def _window_scorer(scoring: Scoring, substitution=None):
    sub_table = None
    if substitution is not None:
        from ..core.substitution import embed_sentinels
        sub_table = jnp.asarray(embed_sentinels(np.asarray(substitution)))

    def one(query, window):
        out = scan_fill(window, query, scoring=scoring,
                        sub_table=sub_table)
        return out.max_score, out.max_i, out.max_j
    return jax.vmap(one, in_axes=(0, None))


def _searcher_plan(mesh: Optional[Mesh], qlen: int, window: int,
                   scoring: Scoring, plan: str, substitution=None) -> str:
    if plan != "auto":
        return plan
    from ..kernels.pallas_fill import _penalties_negative
    if mesh is not None:
        platform = mesh.devices.flat[0].platform
    else:
        from ..dispatch.plan import current_platform
        platform = current_platform()
    if substitution is not None:
        gaps_ok = (scoring.gap_open < 0 and scoring.gap_extend < 0
                   if scoring.is_affine else scoring.gap < 0)
    else:
        gaps_ok = not scoring.is_affine and _penalties_negative(scoring)
    if platform == "tpu" and gaps_ok and window >= 2:
        return "stripe"
    return "scan"


def make_searcher(mesh: Optional[Mesh], qlen: int, shard_len: int,
                  window: int = 32768, scoring: Scoring = Scoring(),
                  axis: str = "data", plan: str = "auto",
                  interpret: Optional[bool] = None, substitution=None):
    """Build a jitted searcher.

    queries: (B, qlen) int8 (pad reads with -3 sentinel), replicated.
    ref_sharded: (D, shard_len + qlen) int8 — each row is a device's shard
    plus a qlen halo from the next shard (build with `shard_reference`).
    Returns SearchHits with global reference positions.

    On TPU meshes the per-window scorer is the Pallas batch stripe kernel
    (reads packed in rows, reset masks between them — one kernel sweep per
    window for the whole batch); elsewhere the vmapped XLA scan.
    """
    ext = shard_len + qlen                 # shard + boundary halo
    step = window - qlen                   # window stride (qlen overlap)
    nwin = max(1, -(-max(1, ext - qlen) // step))
    plan = _searcher_plan(mesh, qlen, window, scoring, plan, substitution)
    if plan == "stripe":
        from ..kernels.pallas_fill import batch_score_fn
        _stripe_cache = {}

        def _stripe_fn(B):
            if B not in _stripe_cache:
                _stripe_cache[B] = batch_score_fn(
                    B, qlen, window, scoring=scoring, interpret=interpret,
                    substitution=substitution)
            return _stripe_cache[B]

        def prepare_reads(queries):
            # window-invariant read tiling, hoisted out of the window loop
            return _stripe_fn(queries.shape[0]).prepare(queries)

        def score_batch(prepared, win, B):
            return _stripe_fn(B).score_prepared(prepared, win)
    else:
        _scan_scorer = _window_scorer(scoring, substitution)

        def prepare_reads(queries):
            return queries

        def score_batch(prepared, win, B):
            return _scan_scorer(prepared, win)

    def local(queries, ref_shard, d):
        # ref_shard: (ext,) int8
        B = queries.shape[0]
        prepared = prepare_reads(queries)

        def scan_windows(w, carry):
            bs, bp, be = carry
            off = w * step
            off = jnp.minimum(off, ext - window)
            win = lax.dynamic_slice(ref_shard, (off,), (window,))
            s, qi, wj = score_batch(prepared, win, B)
            pos = d * shard_len + off + wj - 1       # global 0-based end col
            # prefer higher score; tie -> lower global position
            better = (s > bs) | ((s == bs) & (pos < bp) & (s > 0))
            bs = jnp.where(better, s, bs)
            bp = jnp.where(better, pos, bp)
            be = jnp.where(better, qi, be)
            return bs, bp, be

        init = (jnp.zeros((B,), jnp.int32),
                jnp.full((B,), 2**31 - 1, jnp.int32),
                jnp.zeros((B,), jnp.int32))
        bs, bp, be = lax.fori_loop(0, nwin, scan_windows, init)
        bp = jnp.where(bs > 0, bp, -1)
        return bs, bp, be

    if mesh is None:
        def run(queries, ref_sharded):
            return SearchHits(*local(queries, ref_sharded[0], 0))
        return jax.jit(run)

    def sharded(queries, ref_sharded):
        d = lax.axis_index(axis)
        bs, bp, be = local(queries, ref_sharded[0], d)
        # elementwise merge across devices: max score, then min position
        gbs = lax.pmax(bs, axis)
        cand = jnp.where((bs == gbs) & (gbs > 0), bp, jnp.int32(2**31 - 1))
        gbp = lax.pmin(cand, axis)
        mine = (bs == gbs) & (bp == gbp)
        gbe = lax.pmax(jnp.where(mine, be, 0), axis)
        gbp = jnp.where(gbs > 0, gbp, -1)
        return SearchHits(gbs, gbp, gbe)

    fn = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=SearchHits(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_reference(ref: np.ndarray, n_shards: int, qlen: int
                    ) -> tuple[np.ndarray, int]:
    """Split the reference into (D, shard_len + qlen) rows with halo overlap.
    Pads the tail with the -2 sentinel (never matches)."""
    L = len(ref)
    shard_len = -(-L // n_shards)
    ext = shard_len + qlen
    out = np.full((n_shards, ext), -2, np.int8)
    for d in range(n_shards):
        lo = d * shard_len
        hi = min(L, lo + ext)
        if lo < L:
            out[d, : hi - lo] = ref[lo:hi]
    return out, shard_len


def pad_queries(queries: list[np.ndarray], qlen: int) -> np.ndarray:
    """Stack variable-length reads into (B, qlen) with the -3 sentinel
    (distinct from the reference pad so padding never matches anything)."""
    B = len(queries)
    out = np.full((B, qlen), -3, np.int8)
    for i, q in enumerate(queries):
        ln = min(len(q), qlen)
        out[i, :ln] = q[:ln]
    return out


def search(queries, reference, mesh: Optional[Mesh] = None,
           window: int = 32768, scoring: Scoring = Scoring(),
           axis: str = "data", substitution=None) -> SearchHits:
    """Convenience one-shot search (builds shards + searcher).

    NOTE: builds a fresh jitted searcher every call — for repeated
    searches build one with `make_searcher` and reuse it (the jit cache
    then makes subsequent calls pure device time; see
    examples/read_mapping.py)."""
    queries = np.asarray(queries, np.int8)
    B, qlen = queries.shape
    D = mesh.shape[axis] if mesh is not None else 1
    shards, shard_len = shard_reference(np.asarray(reference, np.int8),
                                        D, qlen)
    window = min(window, shards.shape[1])
    fn = make_searcher(mesh, qlen, shard_len, window, scoring, axis,
                       substitution=substitution)
    return fn(jnp.asarray(queries), jnp.asarray(shards))
