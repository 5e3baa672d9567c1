"""Test harness: force the CPU backend with 8 virtual devices so every
multi-chip path (shard_map batch, pipeline halo exchange) is exercised
without TPU hardware — a capability the reference lacks entirely (its only
environment detection is the GPU probe, hasGPU.cpp:17-30)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent jit cache: the test matrix compiles many distinct shapes; cache
# them across runs to keep the suite fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/swtpu-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The axon TPU plugin ignores JAX_PLATFORMS; force placement via the default
# device instead (jax.default_backend() still reports 'tpu', but all arrays
# and jit executions land on the virtual CPU devices).
import jax  # noqa: E402

jax.config.update("jax_default_device", "cpu")
