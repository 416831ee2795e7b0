"""gpsat_tpu — TPU-native local-expert optimal interpolation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of CPOMUCL/GPSat
(reference: /root/reference, see SURVEY.md): scalable interpolation of
scattered satellite observations with batches of local Gaussian-process
experts, executed as single jitted XLA programs vmapped over padded expert
tiles and sharded over a TPU mesh.

Layout
------
- ``gpsat_tpu.ops``      — kernels (Matern/RBF Gram), masked linear algebra,
                           bijective parameter transforms, Pallas kernels.
- ``gpsat_tpu.models``   — GP model zoo (GPR, SGPR, SVGP, VFF, ...) as pure
                           functional cores + a host-facing per-expert API
                           mirroring the reference ``BaseGPRModel`` contract
                           (ref: GPSat/models/base_model.py:17-448).
- ``gpsat_tpu.optim``    — batched L-BFGS / Adam drivers with per-expert
                           convergence flags.
- ``gpsat_tpu.parallel`` — expert tile padding/bucketing + mesh sharding.
- ``gpsat_tpu.data``     — selection DSL, readers, binning, results store.
- ``gpsat_tpu.experts``  — the orchestrator (ref: GPSat/local_experts.py).
- ``gpsat_tpu.postprocess`` — hyperparameter smoothing + prediction gluing.
"""

__version__ = "0.1.0"

import os as _os


def get_path(*sub_dirs: str) -> str:
    """Path under the installed package directory (ref: GPSat/__init__.py:13-15)."""
    return _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), *sub_dirs)


def get_config_path(*sub_dirs: str) -> str:
    """Path under <repo>/configs (ref: GPSat/__init__.py:23-25)."""
    return get_parent_path("configs", *sub_dirs)


def get_parent_path(*sub_dirs: str) -> str:
    """Path under the repository root (ref: GPSat/__init__.py helper)."""
    parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    return _os.path.join(parent, *sub_dirs)


def get_data_path(*sub_dirs: str) -> str:
    """Path under <repo>/data (ref: GPSat/__init__.py helper)."""
    return get_parent_path("data", *sub_dirs)


def enable_compilation_cache(cache_dir: str = None):
    """Turn on JAX's persistent compilation cache for the OI programs.

    The batched L-BFGS + predict program takes minutes to compile on TPU
    toolchains; with the cache every later process start reuses it. Called
    automatically on first LocalExpertOI.run (opt out:
    GPSAT_NO_COMPILE_CACHE=1). Directory: ``cache_dir`` argument,
    $GPSAT_CACHE_DIR, or ~/.cache/gpsat_tpu/jax.
    """
    import jax

    if _os.environ.get("GPSAT_NO_COMPILE_CACHE") == "1":
        return None
    if jax.config.jax_compilation_cache_dir:  # user already configured one
        return jax.config.jax_compilation_cache_dir
    cache_dir = cache_dir or _os.environ.get(
        "GPSAT_CACHE_DIR", _os.path.expanduser("~/.cache/gpsat_tpu/jax")
    )
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took a nontrivial compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir


def enable_x64():
    """Enable float64 in JAX (call before tracing; used by CLIs and tests).

    The reference stack (GPflow/TensorFlow) computes in float64
    (ref: GPSat/models/gpflow_models.py uses gpflow default_float()==f64).
    On TPU the default compute dtype is float32 with a jitter policy; use
    x64 on CPU for validation against the reference tolerances.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
