"""Test configuration: fake 8-device CPU mesh + float64.

The reference validates against GPflow/sklearn oracles in float64 on CPU
(ref: tests/test_localexperts.py:14 disables GPU). Here we additionally fake
an 8-device mesh so multi-chip sharding paths are exercised without TPU
hardware (SURVEY.md §4 tier 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms='axon,cpu' via
# jax.config.update, which overrides the env var — set it back before any
# backend initialization so tests never dial the TPU tunnel
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the L-BFGS while_loop graphs take ~30-60s to
# compile on CPU; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
