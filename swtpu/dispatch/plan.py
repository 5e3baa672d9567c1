"""Adaptive execution-plan dispatch — the v7/v8 analog.

The reference picks serial / CPU-parallel / GPU per *diagonal* with fixed
thresholds (omp_smithW-v7-adaptive.cpp:106-107,303-397) or an Apollo-learned
policy (omp_smithW-v8-apollo.cpp:304-420). Under XLA the whole fill is one
compiled program, so the dispatch granularity is the *problem*, not the
diagonal: small problems run the scan plan (lower launch/compile overhead),
large single-chip problems run the Pallas stripe kernel, and huge ones go to
the multi-chip pipeline. Thresholds live in EngineConfig and can be re-fit by
``dispatch.autotune`` (the tuneCutoff.sh analog).
"""

from __future__ import annotations

import jax

from ..core.config import EngineConfig


def current_platform() -> str:
    """Platform computations actually land on (respects jax_default_device,
    which the tests use to pin virtual CPU devices — jax.default_backend()
    alone would still claim 'tpu' under the axon plugin)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


_policy_cache = {"loaded": False, "policy": None}


def _tuned_policy():
    """Lazily load the persisted autotune table (the Apollo analog): the
    SWTPU_TUNED_TABLE env var wins, else the default filenames in the
    working directory. Returns a Policy or None."""
    if not _policy_cache["loaded"]:
        _policy_cache["loaded"] = True
        import os
        from .autotune import Policy, load
        cands = [os.environ.get("SWTPU_TUNED_TABLE"),
                 "swtpu_tuned.json", "swtpu_tuned_v5e.json"]
        for c in cands:
            if c:
                table = load(c)
                if table:
                    _policy_cache["policy"] = Policy(table)
                    break
    return _policy_cache["policy"]


def choose_plan(m: int, n: int, config: EngineConfig = EngineConfig()) -> str:
    """Return 'scan' or 'stripe' for a single-pair problem of m cols, n rows.

    Measured-cost dispatch when a tuned table is available (autotune sweep
    persisted to disk — the v8/Apollo analog); size thresholds otherwise
    (the v7 analog)."""
    cells = m * n
    if current_platform() != "tpu":
        return "scan"
    pol = _tuned_policy()
    if pol is not None:
        return pol.choose(m, n).get("plan", "stripe")
    if cells <= config.scan_max_cells:
        return "scan"
    return "stripe"
