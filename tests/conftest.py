"""Test configuration: CPU backend with 8 virtual devices + f64 enabled.

Multi-chip behavior is tested the way the reference tests multi-node — by
just running multi-rank locally (SURVEY.md §4.1): we force the CPU platform
with 8 virtual XLA devices so sharded solves run a real 8-way SPMD program.
"""

import os

# NOTE: under the axon TPU plugin the JAX_PLATFORMS env var is ignored;
# JAX_PLATFORM_NAME + jax.config both work, so set both.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
