"""Basic GP regression tutorial (the reference's
docs/notebooks/gp_regression.ipynb as a runnable script): the BaseGPRModel
parameter API — get/set hyperparameters, predict from the prior, train,
predict from the posterior, score.

Run: python examples/tutorial_gp_regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.stats

import jax

jax.config.update("jax_platforms", "cpu")

import gpsat_tpu

gpsat_tpu.enable_x64()

from gpsat_tpu.models import get_model

sklearnGPRModel = get_model("sklearnGPRModel")  # registry alias, reference name


def main():
    rng = np.random.default_rng(0)
    N, L, noise_std = 30, 5.0, 0.05
    X_grid = np.linspace(-L, L, 100)
    X = rng.uniform(-L, L, N)
    f = np.cos
    y = f(X) + noise_std * rng.standard_normal(N)
    f_truth = f(X_grid)

    # --- the reflection-based parameter API (every param_names entry has
    # get_*/set_* methods, ref: base_model.py:270-277)
    gpr = sklearnGPRModel(coords=X, obs=y, kernel="RBF", verbose=False)
    print("param_names:", gpr.param_names)
    print(f"lengthscales: {gpr.get_lengthscales()}, kernel_variance: {gpr.get_kernel_variance()}")
    gpr.set_kernel_variance(1.5)
    gpr.set_likelihood_variance(noise_std**2)
    print(f"after set: kv={gpr.get_kernel_variance():.1f}, lv={gpr.get_likelihood_variance():.4f}")

    # --- prediction BEFORE training (prior-ish fit with initial params)
    pred = gpr.predict(X_grid[:, None])
    m, s = np.asarray(pred["f*"]).ravel(), np.sqrt(np.asarray(pred["f*_var"]).ravel())
    print(f"before training: MSE {np.mean((f_truth - m) ** 2):.4f}, "
          f"MLL {scipy.stats.norm.logpdf(f_truth, m, s).mean():.4f}")
    print(f"objective before = {gpr.get_objective_function_value():.4f}")

    # --- train and predict again
    ok = gpr.optimise_parameters()
    print(f"optimise success: {ok}")
    for k, v in gpr.get_parameters(*gpr.param_names).items():
        print(f"  {k} : {np.asarray(v).ravel()}")
    print(f"objective after = {gpr.get_objective_function_value():.4f}")

    pred = gpr.predict(X_grid[:, None])
    m, s = np.asarray(pred["f*"]).ravel(), np.sqrt(np.asarray(pred["f*_var"]).ravel())
    mse = np.mean((f_truth - m) ** 2)
    print(f"after training : MSE {mse:.4f}, MLL {scipy.stats.norm.logpdf(f_truth, m, s).mean():.4f}")
    assert ok and mse < 0.01, "tutorial regression: training did not improve the fit"


if __name__ == "__main__":
    main()
