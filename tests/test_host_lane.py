"""Host-serial model lane: any BaseGPRModel runs through LocalExpertOI.

The reference's OI loop accepts every registered model (it constructs one
model per expert, ref: GPSat/local_experts.py:1046-1101). The batched TPU
engine only covers models with functional cores (GPR/SGPR/SVGP); everything
else — sklearn, torch, KISS-GP, VFF, PurePythonGPR — must route through the
host-serial fallback lane and produce the same result tables.
"""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import LocalExpertOI


@pytest.fixture(scope="module")
def obs_df():
    rng = np.random.default_rng(7)
    n = 250
    x = rng.uniform(-3, 3, n)
    y = rng.uniform(-3, 3, n)
    obs = np.sin(x) * np.cos(y) + 0.05 * rng.normal(size=n)
    return pd.DataFrame({"x": x, "y": y, "obs": obs})


@pytest.fixture(scope="module")
def expert_df():
    return pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.0]})


def make_oi(obs_df, expert_df, model, init_params=None, optim_kwargs=None, **model_extra):
    return LocalExpertOI(
        expert_loc_config={"source": expert_df},
        data_config={
            "data_source": obs_df,
            "obs_col": "obs",
            "coords_col": ["x", "y"],
            "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}],
        },
        model_config={
            "oi_model": model,
            "init_params": init_params or {},
            "optim_kwargs": optim_kwargs or {},
            **model_extra,
        },
        pred_loc_config={"method": "expert_loc"},
    )


def run_and_read(oi, path):
    oi.run(store_path=path)
    with TableStore(path, mode="r") as s:
        preds = s.select("preds").reset_index().sort_values(["x", "y"])
        rd = s.select("run_details")
    return preds, rd


class TestHostLane:
    def test_purepython_matches_jax_gpr(self, obs_df, expert_df, tmp_path):
        # both optimize the same f64 LML -> identical optima/predictions
        gpr, _ = run_and_read(
            make_oi(obs_df, expert_df, "GPflowGPRModel", optim_kwargs={"max_iter": 200}),
            str(tmp_path / "gpr.h5"),
        )
        pnp, rd = run_and_read(
            make_oi(obs_df, expert_df, "PurePythonGPR"), str(tmp_path / "pnp.h5")
        )
        assert rd["optimise_success"].all()
        np.testing.assert_allclose(pnp["f*"].values, gpr["f*"].values, atol=1e-4)
        np.testing.assert_allclose(pnp["f*_var"].values, gpr["f*_var"].values, atol=1e-4)

    def test_sklearn_close_to_jax_gpr(self, obs_df, expert_df, tmp_path):
        gpr, _ = run_and_read(
            make_oi(obs_df, expert_df, "GPflowGPRModel", optim_kwargs={"max_iter": 200}),
            str(tmp_path / "gpr.h5"),
        )
        skl, rd = run_and_read(
            make_oi(obs_df, expert_df, "sklearnGPRModel", init_params={"noise_variance": 0.0025}),
            str(tmp_path / "skl.h5"),
        )
        assert rd["optimise_success"].all()
        np.testing.assert_allclose(skl["f*"].values, gpr["f*"].values, atol=5e-3)

    def test_torch_kiss_through_oi(self, obs_df, expert_df, tmp_path):
        preds, rd = run_and_read(
            make_oi(
                obs_df,
                expert_df,
                "GPyTorchKISSGPModel",
                init_params={"grid_size": 12},
                optim_kwargs={"n_iter": 30},
            ),
            str(tmp_path / "kiss.h5"),
        )
        assert rd["optimise_success"].all()
        assert np.isfinite(preds["f*"].values).all()
        # param tables store the model's reflection params
        with TableStore(str(tmp_path / "kiss.h5"), mode="r") as s:
            ls = s.select("lengthscales")
            assert len(ls) == 2 * 2  # 2 experts x 2 dims
            assert "smoothness" in s

    def test_host_restart_and_reload(self, obs_df, expert_df, tmp_path):
        path = str(tmp_path / "skl.h5")
        skl, rd = run_and_read(
            make_oi(obs_df, expert_df, "sklearnGPRModel", init_params={"noise_variance": 0.0025}),
            path,
        )
        # restart: nothing re-run
        oi2 = make_oi(obs_df, expert_df, "sklearnGPRModel", init_params={"noise_variance": 0.0025})
        oi2.run(store_path=path)
        with TableStore(path, mode="r") as s:
            assert len(s.select("run_details")) == len(rd)
        # predict-only with loaded params reproduces predictions exactly
        oi3 = make_oi(
            obs_df,
            expert_df,
            "sklearnGPRModel",
            init_params={"noise_variance": 0.0025},
            load_params={"file": path},
        )
        oi3.run(store_path=path, optimise=False, table_suffix="_R", skip_valid_checks_on=["model", "run_kwargs"])
        with TableStore(path, mode="r") as s:
            pr = s.select("preds_R").reset_index().sort_values(["x", "y"])
        np.testing.assert_allclose(pr["f*"].values, skl["f*"].values, rtol=1e-9)
