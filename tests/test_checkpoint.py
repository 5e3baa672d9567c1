"""Checkpoint/resume: segmented pipeline must equal the monolithic one, and
a save/load round-trip mid-run must be bit-exact."""

import numpy as np
import pytest

from swtpu.core import oracle
from swtpu.core.encode import random_pair
from swtpu.dist.checkpoint import ResumablePipeline
from swtpu.dist.mesh import pipeline_mesh


@pytest.fixture(scope="module")
def mesh():
    return pipeline_mesh(8, platform="cpu")


def test_segmented_matches_oracle(mesh):
    m, n, R = 64, 64, 16
    a, b = random_pair(m, n, seed=3)
    ref = oracle.fill(a, b)
    rp = ResumablePipeline(mesh, m, n, block_rows=R, stages_per_segment=3)
    res = rp.run(a, b)
    assert int(res.max_score) == ref.max_score
    assert (int(res.max_i), int(res.max_j)) == ref.max_ij
    assert int(res.last_cell) == int(ref.H[-1, -1])


def test_save_load_roundtrip(mesh, tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    m, n, R = 64, 96, 16
    a, b = random_pair(m, n, seed=4)
    ref = oracle.fill(a, b)
    rp = ResumablePipeline(mesh, m, n, block_rows=R, stages_per_segment=2)
    sh = NamedSharding(mesh, P("seq"))
    a_sh = jax.device_put(a.reshape(8, m // 8), sh)
    b_full = np.asarray(b)

    import jax.numpy as jnp
    bj = jnp.asarray(b_full)
    carry = rp.init()
    mid = rp.num_segments // 2
    for seg in range(mid):
        carry = rp.segment(a_sh, bj, carry, seg)
    ck = tmp_path / "state.npz"
    rp.save(carry, mid - 1, str(ck))

    # fresh object (simulating a restart), resume and finish
    rp2 = ResumablePipeline(mesh, m, n, block_rows=R, stages_per_segment=2)
    carry2, seg = rp2.load(str(ck))
    assert seg == mid - 1
    for s in range(mid, rp2.num_segments):
        carry2 = rp2.segment(a_sh, bj, carry2, s)
    res = rp2.finish(carry2)
    assert int(res.max_score) == ref.max_score
    assert (int(res.max_i), int(res.max_j)) == ref.max_ij


def test_run_resume_flag(mesh, tmp_path):
    m, n, R = 64, 64, 16
    a, b = random_pair(m, n, seed=5)
    ref = oracle.fill(a, b)
    ck = str(tmp_path / "c.npz")
    rp = ResumablePipeline(mesh, m, n, block_rows=R, stages_per_segment=2)
    res1 = rp.run(a, b, ckpt_path=ck)
    # resume from the final checkpoint: re-running should still finish clean
    res2 = rp.run(a, b, ckpt_path=ck, resume=True)
    assert int(res1.max_score) == ref.max_score
    assert int(res2.max_score) in (ref.max_score, int(res1.max_score))
