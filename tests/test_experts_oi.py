"""End-to-end LocalExpertOI sweep: run -> results tables -> restart -> re-predict.

The batched analogue of the reference's integration tier (SURVEY.md §4):
a small synthetic field, a 2x2 expert grid, full run() producing the
reference-schema tables, restart skipping, and a predict-only rerun with
load_params reproducing identical predictions.
"""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.data.store import TableStore
from gpsat_tpu.experts import LocalExpertOI, get_results_from_h5file


@pytest.fixture(scope="module")
def obs_df():
    rng = np.random.default_rng(11)
    n = 500
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    t = rng.integers(0, 3, n).astype(float)
    obs = np.sin(x) * np.cos(y) + 0.1 * rng.normal(size=n)
    return pd.DataFrame({"x": x, "y": y, "t": t, "obs": obs})


@pytest.fixture(scope="module")
def expert_df():
    return pd.DataFrame(
        {"x": [3.0, 3.0, 7.0, 7.0], "y": [3.0, 7.0, 3.0, 7.0], "t": [1.0, 1.0, 1.0, 1.0]}
    )


def make_oi(obs_df, expert_df, **model_extra):
    return LocalExpertOI(
        expert_loc_config={"source": expert_df},
        data_config={
            "data_source": obs_df,
            "obs_col": "obs",
            "coords_col": ["x", "y", "t"],
            "local_select": [
                {"col": ["x", "y"], "comp": "<", "val": 4.0},
                {"col": "t", "comp": "<=", "val": 1.0},
                {"col": "t", "comp": ">=", "val": -1.0},
            ],
        },
        model_config={
            "oi_model": "GPflowGPRModel",
            "init_params": {"kernel": "Matern32", "noise_variance": 0.01},
            "constraints": {"lengthscales": {"low": 0.1, "high": 20.0}},
            "optim_kwargs": {"max_iter": 300},
            **model_extra,
        },
        pred_loc_config={
            "method": "shift_arrays",
            "x": np.array([-0.5, 0.0, 0.5]),
            "y": np.array([0.0]),
        },
    )


class TestLocalExpertOI:
    def test_full_run_schema(self, obs_df, expert_df, tmp_path):
        store_path = str(tmp_path / "results.h5")
        oi = make_oi(obs_df, expert_df)
        oi.run(store_path=store_path)

        with TableStore(store_path, mode="r") as store:
            keys = store.keys()
            for t in ["oi_config", "expert_locs", "run_details", "preds", "lengthscales", "kernel_variance", "likelihood_variance"]:
                assert t in keys, f"table {t} missing; have {keys}"
            rd = store.select("run_details")
            assert len(rd) == 4
            assert rd.index.names == ["x", "y", "t"]
            assert rd["optimise_success"].all()
            assert (rd["num_obs"] > 0).all()
            preds = store.select("preds")
            assert len(preds) == 12  # 4 experts x 3 pred locations
            for c in ["f*", "f*_var", "y_var", "f_bar", "pred_loc_x", "pred_loc_y", "pred_loc_t", "_dim_0"]:
                assert c in preds.columns
            assert np.isfinite(preds["f*"]).all()
            ls = store.select("lengthscales")
            assert len(ls) == 12  # 4 experts x 3 dims
            assert set(ls["_dim_0"]) == {0, 1, 2}
            # constraint respected
            assert (ls["lengthscales"] > 0.1).all() and (ls["lengthscales"] < 20.0).all()

    def test_restart_skips_all(self, obs_df, expert_df, tmp_path, capsys):
        store_path = str(tmp_path / "results.h5")
        oi = make_oi(obs_df, expert_df)
        oi.run(store_path=store_path)
        n_before = len(TableStore(store_path, mode="r").select("run_details"))

        oi2 = make_oi(obs_df, expert_df)
        oi2.run(store_path=store_path)
        with TableStore(store_path, mode="r") as store:
            assert len(store.select("run_details")) == n_before  # nothing re-run

    def test_incompatible_config_raises(self, obs_df, expert_df, tmp_path):
        store_path = str(tmp_path / "results.h5")
        make_oi(obs_df, expert_df).run(store_path=store_path)
        oi2 = make_oi(obs_df, expert_df, init_params={"kernel": "Matern52", "noise_variance": 0.01})
        with pytest.raises(AssertionError, match="differs from the previously stored"):
            oi2.run(store_path=store_path)

    def test_predict_only_with_loaded_params(self, obs_df, expert_df, tmp_path):
        store_path = str(tmp_path / "results.h5")
        oi = make_oi(obs_df, expert_df)
        oi.run(store_path=store_path)
        with TableStore(store_path, mode="r") as store:
            preds1 = store.select("preds").reset_index()
            ls1 = store.select("lengthscales").reset_index()

        # second pass: load optimized params from the first store, no optimise,
        # write with table_suffix (the smoothing re-predict pattern,
        # ref: postprocessing.py:350-380)
        oi2 = make_oi(obs_df, expert_df, load_params={"file": store_path})
        oi2.run(store_path=store_path, optimise=False, table_suffix="_RELOAD", skip_valid_checks_on=["model"])
        with TableStore(store_path, mode="r") as store:
            preds2 = store.select("preds_RELOAD").reset_index()
            ls2 = store.select("lengthscales_RELOAD").reset_index()

        m1 = preds1.sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
        m2 = preds2.sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
        # params round-trip through the bijector inverse (u = inv(theta),
        # theta' = fwd(u) loses ~1e-12) and predict-only is a different XLA
        # program (different fusion/rounding), so preds agree to ~1e-8, not
        # bitwise; 1e-6 matches the oracle-test tolerance
        np.testing.assert_allclose(m2["f*"].values, m1["f*"].values, rtol=1e-6)
        np.testing.assert_allclose(m2["f*_var"].values, m1["f*_var"].values, rtol=1e-6)
        np.testing.assert_allclose(
            ls2.sort_values(["x", "y", "_dim_0"])["lengthscales"].values,
            ls1.sort_values(["x", "y", "_dim_0"])["lengthscales"].values,
            rtol=1e-12,
        )

    def test_nearest_warm_start(self, obs_df, expert_df, tmp_path):
        """load_params={"nearest": true}: experts with no exact coordinate
        match warm-start from the closest stored expert — the
        batch-compatible replacement for the reference's serial EMA warm
        start (ref: local_experts.py:1200-1217, divergence #2)."""
        p1 = str(tmp_path / "coarse.h5")
        make_oi(obs_df, expert_df).run(store_path=p1)
        with TableStore(p1, mode="r") as store:
            ls1 = store.select("lengthscales").reset_index()

        shifted = expert_df.copy()
        shifted["x"] = shifted["x"] + 0.3  # no exact matches
        p2 = str(tmp_path / "fine.h5")
        oi2 = make_oi(obs_df, shifted, load_params={"file": p1, "nearest": True})
        # predict-only: loaded params pass straight through to the tables
        oi2.run(store_path=p2, optimise=False, skip_valid_checks_on=["model"])
        with TableStore(p2, mode="r") as store:
            ls2 = store.select("lengthscales").reset_index()
            rd = store.select("run_details")
        assert len(rd) == len(expert_df)
        # every loaded value equals some stored neighbor's value
        np.testing.assert_allclose(
            np.sort(ls2["lengthscales"].values), np.sort(ls1["lengthscales"].values), rtol=1e-12
        )

    def test_results_reader(self, obs_df, expert_df, tmp_path):
        store_path = str(tmp_path / "results.h5")
        make_oi(obs_df, expert_df).run(store_path=store_path)
        dfs, configs = get_results_from_h5file(store_path)
        assert "preds" in dfs and "run_details" in dfs
        assert len(configs) >= 1
        assert configs[0]["model"]["oi_model"] == "GPflowGPRModel"

    def test_min_obs_skip_recorded(self, obs_df, tmp_path):
        # an expert in an empty corner: too few obs -> recorded as skipped
        far_experts = pd.DataFrame({"x": [3.0, 50.0], "y": [3.0, 50.0], "t": [1.0, 1.0]})
        store_path = str(tmp_path / "results.h5")
        oi = make_oi(obs_df, far_experts)
        oi.run(store_path=store_path, min_obs=3)
        with TableStore(store_path, mode="r") as store:
            rd = store.select("run_details").reset_index()
        assert len(rd) == 2
        skipped = rd[rd["x"] == 50.0]
        assert len(skipped) == 1
        assert not skipped["optimise_success"].iloc[0]
        assert np.isnan(skipped["objective_value"].iloc[0])


class TestReplacementModel:
    def test_data_poor_experts_use_replacement(self, obs_df, tmp_path):
        # two experts: one rich, one with few points (threshold routes it
        # to the replacement lane; ref: local_experts.py:1021-1035)
        experts = pd.DataFrame({"x": [3.0, 9.8], "y": [3.0, 9.8], "t": [1.0, 1.0]})
        store_path = str(tmp_path / "repl.h5")
        oi = make_oi(
            obs_df,
            experts,
            replacement_threshold=100,
            replacement_model="GPflowGPRModel",
            replacement_init_params={"kernel": "Matern12", "noise_variance": 0.01},
            replacement_optim_kwargs={"max_iter": 100},
        )
        oi.run(store_path=store_path, min_obs=3)
        with TableStore(store_path, mode="r") as store:
            rd = store.select("run_details").reset_index()
        assert len(rd) == 2
        rich = rd[rd["x"] == 3.0].iloc[0]
        poor = rd[rd["x"] == 9.8].iloc[0]
        assert rich["num_obs"] >= 100 and poor["num_obs"] < 100
        # both ran, the poor one under the replacement model name
        assert rich["model"].endswith("GPRModel")
        assert poor["model"].endswith("GPRModel")
        assert np.isfinite(rd["objective_value"]).all()


def test_json_expressible_mesh_specs():
    """run(mesh=2) / run(mesh='all') build the device mesh from JSON-friendly
    specs so config-driven runs can shard without Python objects."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.experts import LocalExpertOI

    rng = np.random.default_rng(0)
    n = 200
    df = pd.DataFrame({"x": rng.uniform(-3, 3, n), "y": rng.uniform(-3, 3, n)})
    df["obs"] = np.sin(df["x"]) + 0.05 * rng.normal(size=n)
    for spec in (2, "all"):
        oi = LocalExpertOI(
            expert_loc_config={"source": pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.5]})},
            data_config={"data_source": df, "obs_col": "obs", "coords_col": ["x", "y"],
                         "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
            model_config={"oi_model": "GPflowGPRModel", "optim_kwargs": {"max_iter": 500}},
            pred_loc_config={"method": "expert_loc"},
        )
        p = os.path.join(tempfile.mkdtemp(), "oi.h5")
        oi.run(store_path=p, mesh=spec)
        with TableStore(p, mode="r") as s:
            rd = s.select("run_details", set_index=False)
        assert rd["optimise_success"].all(), f"mesh={spec}: {rd}"


def test_config_id_ignores_run_kwargs(obs_df, expert_df, tmp_path):
    """Re-running with different run_kwargs (store_every, table_suffix)
    reuses the original config_id instead of minting a new one — matching
    is on the non-skip subset (VERDICT r2 #10)."""
    store_path = str(tmp_path / "results.h5")
    make_oi(obs_df, expert_df).run(store_path=store_path, store_every=10)
    # second run: only run_kwargs differ -> same config_id, no new row
    make_oi(obs_df, expert_df).run(store_path=store_path, store_every=3)
    with TableStore(store_path, mode="r") as store:
        cfg = store.select("oi_config", set_index=False)
        rd = store.select("run_details", set_index=False)
    assert len(cfg) == 1, f"expected one stored config, got {len(cfg)}"
    assert set(rd["config_id"]) == {0}


def test_num_iter_truthful(obs_df, expert_df, tmp_path):
    """run_details.num_iter records the actual iteration count on the
    batched lane and NaN (never a fabricated max_iter) for host models
    whose optimizer hides it (VERDICT r2 #9)."""
    store_path = str(tmp_path / "batched.h5")
    make_oi(obs_df, expert_df).run(store_path=store_path)
    with TableStore(store_path, mode="r") as store:
        rd = store.select("run_details", set_index=False)
    # real counts: positive, far below the 300 max_iter budget
    assert (rd["num_iter"] > 0).all()
    assert (rd["num_iter"] < 300).all()

    # sklearn host lane: iteration count not exposed -> NaN, not max_iter
    store2 = str(tmp_path / "host.h5")
    oi = make_oi(
        obs_df, expert_df,
        oi_model="sklearnGPRModel",
        init_params={"noise_variance": 0.01},
        constraints=None,
        optim_kwargs={},
    )
    oi.run(store_path=store2)
    with TableStore(store2, mode="r") as store:
        rd2 = store.select("run_details", set_index=False)
    assert rd2["num_iter"].isna().all()


def test_polish_through_orchestrator():
    """optim_kwargs={'polish': 'f64'}: the f64 tail runs after the batched
    pass and results land within 1e-5 of a pure f64 run (BASELINE north
    star), through the full OI surface."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.experts import LocalExpertOI

    rng = np.random.default_rng(3)
    n = 250
    df = pd.DataFrame({"x": rng.uniform(-3, 3, n), "y": rng.uniform(-3, 3, n)})
    df["obs"] = np.sin(df["x"]) * np.cos(df["y"]) + 0.05 * rng.normal(size=n)

    def run(opt_kwargs):
        oi = LocalExpertOI(
            expert_loc_config={"source": pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.5]})},
            data_config={"data_source": df, "obs_col": "obs", "coords_col": ["x", "y"],
                         "local_select": [{"col": ["x", "y"], "comp": "<", "val": 4.0}]},
            model_config={"oi_model": "GPflowGPRModel",
                          "init_params": {"noise_variance": 0.0025},
                          "optim_kwargs": opt_kwargs},
            pred_loc_config={"method": "expert_loc"},
        )
        p = os.path.join(tempfile.mkdtemp(), "oi.h5")
        oi.run(store_path=p)
        with TableStore(p, mode="r") as s:
            rd = s.select("run_details", set_index=False)
            pr = s.select("preds", set_index=False).sort_values(["x", "y"])
        assert rd["optimise_success"].all()
        return pr["f*"].values

    gold = run({"max_iter": 500})  # f64 zoom (conftest runs x64 CPU)
    polished = run({"max_iter": 500, "polish": "f64", "polish_max_iter": 150})
    np.testing.assert_allclose(polished, gold, atol=1e-5)
