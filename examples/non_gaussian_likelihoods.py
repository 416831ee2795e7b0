"""Non-Gaussian local experts: classification + counts via SVGP.

The reference exposes non-Gaussian SVGP likelihoods by string
(GPSat/models/gpflow_models.py:1083-1092) but ships no worked example.
This one runs two small local-expert sweeps on synthetic data:

- Bernoulli/probit: presence/absence observations (e.g. lead/floe
  classification) — predictions are latent-probit means; push through
  a normal CDF for probabilities.
- Poisson: count observations (e.g. floes per cell) with an exp link.

Both ride the default `solver='auto'` -> joint L-BFGS over
hyperparameters + the whitened q (see docs/architecture.md; 2-8x fewer
iterations than the reference's Adam at an equal-or-better ELBO).
`init_params={"solver": "adam"}` restores the reference's optimizer.

Run: python examples/non_gaussian_likelihoods.py   (CPU, ~1 min)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import numpy as np
import pandas as pd


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import gpsat_tpu

    gpsat_tpu.enable_x64()
    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.experts import LocalExpertOI

    rng = np.random.default_rng(7)
    n = 1200
    x = rng.uniform(-400_000, 400_000, size=(n, 2))
    f = np.sin(x[:, 0] / 8e4) * np.cos(x[:, 1] / 1e5)

    # presence/absence via a probit ground truth; counts via an exp link
    from scipy.stats import norm

    y_bern = (rng.uniform(0, 1, n) < norm.cdf(2.0 * f)).astype(float) * 2 - 1  # {-1, +1}
    y_pois = rng.poisson(np.exp(1.0 + f)).astype(float)

    experts = pd.DataFrame(
        {"x": [-2e5, 0.0, 2e5, -2e5, 0.0, 2e5], "y": [-1e5] * 3 + [1e5] * 3}
    )

    for likelihood, obs in [("Bernoulli", y_bern), ("Poisson", y_pois)]:
        df = pd.DataFrame({"x": x[:, 0], "y": x[:, 1], "obs": obs})
        oi = LocalExpertOI(
            expert_loc_config={"source": experts},
            data_config={
                "data_source": df,
                "obs_col": "obs",
                "coords_col": ["x", "y"],
                "local_select": [{"col": ["x", "y"], "comp": "<", "val": 3e5}],
            },
            model_config={
                "oi_model": "GPflowSVGPModel",
                "init_params": {
                    "coords_scale": [5e4, 5e4],
                    "num_inducing_points": 32,
                    "likelihood": likelihood,
                    # non-Gaussian obs are not de-meaned
                    "obs_mean": None,
                },
                "optim_kwargs": {"max_iter": 800},
            },
            pred_loc_config={"method": "expert_loc"},
        )
        store = os.path.join(tempfile.mkdtemp(), f"oi_{likelihood.lower()}.h5")
        oi.run(store_path=store)

        with TableStore(store, mode="r") as ts:
            rd = ts.select("run_details").reset_index()
            preds = ts.select("preds").reset_index()
        print(f"\n=== {likelihood} ===")
        print(rd[["num_obs", "optimise_success", "num_iter", "run_time"]].to_string(index=False))
        out = preds[["pred_loc_x", "pred_loc_y", "f*", "f*_var"]].copy()
        if likelihood == "Bernoulli":
            # latent-probit mean -> approximate presence probability
            out["p(presence)"] = norm.cdf(out["f*"] / np.sqrt(1.0 + preds["f*_var"]))
        else:
            out["E[count]"] = np.exp(out["f*"] + 0.5 * preds["f*_var"])
        print(out.round(3).to_string(index=False))


if __name__ == "__main__":
    main()
