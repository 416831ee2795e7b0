"""f32 tiles must stay f32 with jax_enable_x64 on (mixed host modes).

Production TPU runs without x64, where any f64 constant silently demotes
— but the CPU test/polish environment enables x64, and there a single
dtype-less quadrature node or integer index promotes whole objectives to
f64 (and breaks dtype-invariant while_loop carries, see
tests/test_svgp.py::test_elbo_dtype_stable_under_x64). This locks every
batched core's objective AND predict to the input dtype.
"""

import numpy as np
import pytest


def _data(N=64, D=2, dtype=np.float32):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    return {
        "X": jnp.asarray(rng.uniform(-2, 2, (N, D)).astype(dtype)),
        "y": jnp.asarray(rng.normal(size=N).astype(dtype)),
        "mask": jnp.ones(N, dtype),
    }


def _cores():
    from gpsat_tpu.models.asvgp import make_asvgp_core
    from gpsat_tpu.models.functional import make_gpr_core
    from gpsat_tpu.models.sgpr import make_sgpr_core
    from gpsat_tpu.models.svgp import make_svgp_core
    from gpsat_tpu.models.vff import make_vff_core

    return {
        "gpr": make_gpr_core(),
        "sgpr": make_sgpr_core(num_inducing_points=16),
        "svgp_gauss": make_svgp_core(num_inducing_points=8),
        "svgp_bern": make_svgp_core(num_inducing_points=8, likelihood="Bernoulli"),
        "svgp_stut": make_svgp_core(num_inducing_points=8, likelihood="StudentT", solver="adam"),
        "vff": make_vff_core(num_inducing_features=6, domain_size=4.0),
        "asvgp_m12": make_asvgp_core(num_inducing_features=8, kernel="Matern12"),
        "asvgp_m32": make_asvgp_core(num_inducing_features=8, kernel="Matern32"),
        "asvgp_m52": make_asvgp_core(num_inducing_features=8, kernel="Matern52"),
    }


@pytest.mark.parametrize("name", list(_cores().keys()))
def test_core_dtype_stable_f32_under_x64(name):
    import jax.numpy as jnp

    core = _cores()[name]
    data = _data()
    D = 2
    cp = core.init_cparams(D, dtype=np.float32)
    if "inducing_points" in cp:
        cp["inducing_points"] = np.asarray(data["X"][:16][: cp["inducing_points"].shape[0]])
    if "knots" in cp:
        # the engine derives knots per tile (prepare_batch_init); the
        # default zeros are a degenerate grid, so set a covering one
        M = cp["knots"].shape[-1]
        cp["knots"] = np.tile(np.linspace(-2.5, 2.5, M, dtype=np.float32), (D, 1))
    up = core.inverse({k: jnp.asarray(v) for k, v in cp.items()})
    obj = core.objective(up, data)
    assert obj.dtype == jnp.float32, (name, obj.dtype)
    assert np.isfinite(float(obj)), name
    pred = core.predict(core.forward(up), data, data["X"])
    for k, v in pred.items():
        assert v.dtype == jnp.float32, (name, k, v.dtype)
