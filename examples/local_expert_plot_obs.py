"""Review plot: expert locations over the observations each one selects.

Port of the reference example (ref: examples/local_expert_plot_obs.py,
driving GPSat.local_experts.LocalExpertOI.plot_locations_and_obs,
local_experts.py:1282-1463): build a LocalExpertOI from an OI JSON config
(or a built-in synthetic demo) and write a multi-panel review figure
showing, per expert, the locally-selected observations and the expert
location.

Usage:
    python -m examples.local_expert_plot_obs [oi_config.json] [out.png]

Without a config a synthetic field + 3x3 expert grid is used.
"""

import sys

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")


def demo_oi():
    from gpsat_tpu.experts import LocalExpertOI

    rng = np.random.default_rng(0)
    n = 4000
    x = rng.uniform(0, 30, n)
    y = rng.uniform(0, 30, n)
    obs = np.sin(x / 3.0) * np.cos(y / 4.0) + 0.1 * rng.normal(size=n)
    obs_df = pd.DataFrame({"x": x, "y": y, "obs": obs})
    gx, gy = np.meshgrid([5.0, 15.0, 25.0], [5.0, 15.0, 25.0])
    experts = pd.DataFrame({"x": gx.ravel(), "y": gy.ravel()})
    return LocalExpertOI(
        expert_loc_config={"source": experts},
        data_config={
            "data_source": obs_df,
            "obs_col": "obs",
            "coords_col": ["x", "y"],
            "local_select": [{"col": ["x", "y"], "comp": "<", "val": 6.0}],
        },
        model_config={"oi_model": "GPflowGPRModel"},
        pred_loc_config={"method": "expert_loc"},
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    out = "expert_locations_and_obs.png"
    if args and args[0].endswith(".json"):
        import json

        from gpsat_tpu.experts import LocalExpertOI
        from gpsat_tpu.utils.misc import nested_dict_literal_eval

        with open(args[0]) as f:
            cfg = nested_dict_literal_eval(json.load(f))
        oi = LocalExpertOI(
            expert_loc_config=cfg.get("locations", cfg.get("expert_loc_config")),
            data_config=cfg.get("data", cfg.get("data_config")),
            model_config=cfg.get("model", cfg.get("model_config")),
            pred_loc_config=cfg.get("pred_loc", cfg.get("pred_loc_config")),
        )
        if len(args) > 1:
            out = args[1]
    else:
        oi = demo_oi()
        if args:
            out = args[0]

    fig = oi.plot_locations_and_obs(image_file=out)
    n_panels = sum(len(ax.collections) > 0 for ax in fig.axes)
    print(f"wrote {out} ({n_panels} populated panels)")


if __name__ == "__main__":
    main()
