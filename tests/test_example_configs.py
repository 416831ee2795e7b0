"""The annotated example configs in configs/ stay loadable and
schema-valid (the reference ships the same set as canonical documentation,
ref: configs/example_*.json; SURVEY.md §2.5)."""

import glob
import json
import os

import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _load(name):
    with open(os.path.join(CONFIG_DIR, name)) as f:
        return json.load(f)


class TestExampleConfigs:
    def test_all_parse_as_json(self):
        files = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
        assert len(files) >= 10
        for f in files:
            with open(f) as fh:
                json.load(fh)

    @pytest.mark.parametrize(
        "name",
        [
            "example_local_expert_oi.json",
            "example_local_expert_oi_reference_for_xval.json",
            "example_local_expert_oi_sgpr.json",
            "example_local_expert_oi_svgp.json",
            "example_local_expert_oi_vff.json",
        ],
    )
    def test_oi_configs_load_into_dataclasses(self, name):
        from gpsat_tpu.config import ExperimentConfig
        from gpsat_tpu.models import get_model

        cfg = _load(name)
        cfg.pop("comment", None)
        ec = ExperimentConfig.from_dict(cfg)
        get_model(ec.model_config.oi_model)  # registry resolves the model
        assert ec.data_config.obs_col == "z"
        # round-trip preserves the legacy field names
        d = ec.to_dict()
        assert set(d) >= {"data", "model", "locations", "pred_loc", "run_kwargs"}

    def test_registered_ops_used_by_configs_exist(self):
        from gpsat_tpu.utils.config_func import REGISTERED_FUNCS, _builtin_registry_init

        _builtin_registry_init()
        used = set()
        for f in glob.glob(os.path.join(CONFIG_DIR, "*.json")):
            blob = open(f).read()
            for name in REGISTERED_FUNCS:
                if f"@{name}" in blob:
                    used.add(name)
            # every "@op" mentioned must be registered
            import re

            for m in re.findall(r'"@([A-Za-z0-9_]+)"', blob):
                assert m in REGISTERED_FUNCS, f"config references unregistered op @{m} in {f}"

    def test_datetime_registry_ops(self):
        import numpy as np
        import pandas as pd

        from gpsat_tpu.utils.config_func import config_func

        df = pd.DataFrame({"date": ["2020-03-01", "2020-03-05"]})
        dt = config_func(func="@to_datetime", df=df, col_args="date")
        assert np.issubdtype(np.asarray(dt).dtype, np.datetime64)
        days = config_func(func="@days_since_epoch", df=df, col_args="date")
        assert float(days[1] - days[0]) == 4.0

    def test_xval_driver_config_matches_schema(self):
        cfg = _load("example_xval_reference_config.json")
        assert "ref_config_file" in cfg
        x = cfg["xval_config"]
        assert x["pred_loc"]["method"] == "from_source"
        assert "func" in x and "row_select_values" in x


@pytest.mark.parametrize(
    "name",
    [
        "example_local_expert_oi_sgpr.json",
        "example_local_expert_oi_svgp.json",
        "example_local_expert_oi_vff.json",
    ],
)
def test_model_family_configs_run_end_to_end(name, tmp_path):
    """The shipped SGPR/SVGP/VFF configs execute through run_from_config
    (sources swapped for synthetic data, budgets shrunk for CI)."""
    import numpy as np
    import pandas as pd

    from gpsat_tpu.data.store import TableStore
    from gpsat_tpu.local_expert_oi import run_from_config

    rng = np.random.default_rng(0)
    n = 400
    df = pd.DataFrame({
        "x": rng.uniform(-250_000, 250_000, n),
        "y": rng.uniform(-250_000, 250_000, n),
    })
    df["z"] = np.sin(df["x"] / 8e4) * np.cos(df["y"] / 1e5) + 0.05 * rng.normal(size=n)
    locs = pd.DataFrame({"x": [0.0, 100_000.0], "y": [0.0, 0.0]})

    cfg = _load(name)
    cfg.pop("comment", None)
    cfg["locations"] = {"source": locs}
    cfg["data"].update({"data_source": df})
    cfg["data"].pop("table", None)
    ip = cfg["model"]["init_params"]
    for k, small in [("num_inducing_points", 32), ("num_inducing_features", 6)]:
        if k in ip:
            ip[k] = small
    ok = cfg["model"].setdefault("optim_kwargs", {})
    ok["max_iter"] = min(int(ok.get("max_iter", 500)), 400)
    store = str(tmp_path / "res.h5")
    cfg["run_kwargs"].update({"store_path": store})

    run_from_config(cfg)
    with TableStore(store, mode="r") as s:
        rd = s.select("run_details", set_index=False)
        preds = s.select("preds", set_index=False)
    assert len(rd) == 2
    assert rd["optimise_success"].all()
    assert np.isfinite(preds["f*"]).all()
