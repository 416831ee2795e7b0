"""Postprocessing tests: smoothing kernel, gluing, and the two-phase
smooth -> re-predict pipeline (ref workflow: postprocessing.py:96-380 then
LocalExpertOI.run(optimise=False, table_suffix='_SMOOTHED'))."""

import json

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import LocalExpertOI
from gpsat_tpu.postprocess import (
    SmoothingConfig,
    gaussian_2d_weight,
    glue_local_predictions_1d,
    glue_local_predictions_2d,
    smooth_hyperparameters,
)


class TestGaussian2dWeight:
    def test_matches_direct_loop(self):
        rng = np.random.default_rng(0)
        n = 40
        x = rng.normal(size=n)
        y = rng.normal(size=n)
        vals = rng.normal(size=n)
        l_x, l_y = 0.7, 1.3
        out = gaussian_2d_weight(x, y, x, y, l_x, l_y, vals)
        # direct reference computation
        expect = np.empty(n)
        for i in range(n):
            w = np.exp(-(((x - x[i]) / l_x) ** 2 + ((y - y[i]) / l_y) ** 2) / 2)
            expect[i] = np.sum(w * vals) / np.sum(w)
        np.testing.assert_allclose(out, expect, rtol=1e-12)

    def test_nan_handling(self):
        x = np.array([0.0, 1.0, 2.0])
        y = np.zeros(3)
        vals = np.array([1.0, np.nan, 3.0])
        out = gaussian_2d_weight(x, y, x, y, 1.0, 1.0, vals)
        assert np.isfinite(out).all()  # nan value is skipped, not propagated
        all_nan = gaussian_2d_weight(x, y, x, y, 1.0, 1.0, np.full(3, np.nan))
        assert np.isnan(all_nan).all()

    def test_constant_field_unchanged(self):
        x = np.linspace(0, 5, 20)
        y = np.linspace(0, 5, 20)
        out = gaussian_2d_weight(x, y, x, y, 2.0, 2.0, np.full(20, 7.0))
        np.testing.assert_allclose(out, 7.0, rtol=1e-12)


class TestGlue:
    def test_1d_two_experts(self):
        # two experts predicting at a shared location: result is the
        # normalized weighted mean
        df = pd.DataFrame(
            {
                "ploc": [0.5, 0.5],
                "xloc": [0.0, 1.0],
                "f": [1.0, 3.0],
            }
        )
        glued = glue_local_predictions_1d(df, "ploc", "xloc", "f", inference_radius=1.0, R=3)
        assert len(glued) == 1
        # symmetric distances -> plain mean
        np.testing.assert_allclose(glued["f"].values, [2.0])

    def test_2d_weights_favor_closer_expert(self):
        df = pd.DataFrame(
            {
                "px": [0.2, 0.2],
                "py": [0.0, 0.0],
                "ex": [0.0, 1.0],
                "ey": [0.0, 0.0],
                "f": [1.0, 3.0],
            }
        )
        glued = glue_local_predictions_2d(df, ["px", "py"], ["ex", "ey"], "f", inference_radius=1.0, R=3)
        assert len(glued) == 1
        assert glued["f"].iloc[0] < 2.0  # pulled toward the nearer expert's value


@pytest.mark.slow
class TestSmoothRepredict:
    def test_two_phase_pipeline(self, tmp_path):
        rng = np.random.default_rng(13)
        n = 600
        obs = pd.DataFrame({"x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n)})
        obs["obs"] = np.sin(obs.x) * np.cos(obs.y) + 0.1 * rng.normal(size=n)
        experts = pd.DataFrame({"x": [2.5, 7.5, 2.5, 7.5], "y": [2.5, 2.5, 7.5, 7.5]})
        store_path = str(tmp_path / "res.h5")

        def build():
            return LocalExpertOI(
                expert_loc_config={"source": experts},
                data_config={
                    "data_source": obs,
                    "obs_col": "obs",
                    "coords_col": ["x", "y"],
                    "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}],
                },
                model_config={
                    "oi_model": "GPflowGPRModel",
                    "init_params": {"noise_variance": 0.01},
                    "optim_kwargs": {"max_iter": 300},
                },
                pred_loc_config={"method": "expert_loc"},
            )

        build().run(store_path=store_path)

        cfg_path = smooth_hyperparameters(
            result_file=store_path,
            params_to_smooth=["lengthscales", "kernel_variance"],
            smooth_config_dict={
                "lengthscales": SmoothingConfig(l_x=10.0, l_y=10.0),
                "kernel_variance": SmoothingConfig(l_x=10.0, l_y=10.0, max=2.0),
            },
        )

        with TableStore(store_path, mode="r") as store:
            keys = store.keys()
            for t in ["lengthscales_SMOOTHED", "kernel_variance_SMOOTHED", "likelihood_variance_SMOOTHED"]:
                assert t in keys, f"{t} missing from {keys}"
            ls_raw = store.select("lengthscales").reset_index()
            ls_sm = store.select("lengthscales_SMOOTHED").reset_index()
            # smoothing with a large lengthscale pulls values toward the mean
            assert ls_sm["lengthscales"].std() <= ls_raw["lengthscales"].std() + 1e-12
            att = store.get_attrs("lengthscales_SMOOTHED")
            assert att["smooth_config"]["l_x"] == 10.0

        # phase 2: re-predict with smoothed params via the emitted config
        with open(cfg_path) as f:
            cfgs = json.load(f)
        cfg = cfgs[-1]
        assert cfg["run_kwargs"]["optimise"] is False
        assert cfg["model"]["load_params"]["table_suffix"] == "_SMOOTHED"

        oi2 = build()
        oi2.set_model(**{**cfg["model"], "oi_model": "GPflowGPRModel"})
        oi2.run(
            store_path=store_path,
            optimise=False,
            table_suffix="_SMOOTHED",
            skip_valid_checks_on=["model", "run_kwargs"],
        )
        with TableStore(store_path, mode="r") as store:
            preds_sm = store.select("preds_SMOOTHED")
            assert len(preds_sm) == 4
            assert np.isfinite(preds_sm["f*"]).all()
            rd = store.select("run_details_SMOOTHED").reset_index()
            assert (~rd["parameters_optimised"]).all()
