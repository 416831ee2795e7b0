"""Build an expert-location file from a regular EASE2 grid, keeping only
ocean cells (the reference's
examples/create_expert_location_file_from_arbitrary_grid_over_ocean.py).

The reference uses the optional global-land-mask package; when it is not
installed this example falls back to a had-obs mask derived from the
observations themselves (cells that ever saw data are, by construction,
ocean for satellite altimetry).

Run: python examples/expert_locations_over_ocean.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np
import pandas as pd

from gpsat_tpu.data.expert_locations import generate_local_expert_locations, get_masks_for_expert_loc
from gpsat_tpu.utils import EASE2toWGS84, grid_2d_flatten


def main():
    # regular 200 km grid over the EASE2 north-polar domain
    x_range = [-4_500_000.0, 4_500_000.0]
    y_range = [-4_500_000.0, 4_500_000.0]
    grid = grid_2d_flatten(x_range, y_range, grid_res=200_000)
    locs = pd.DataFrame({"x": grid[:, 0], "y": grid[:, 1]})
    locs["lon"], locs["lat"] = EASE2toWGS84(locs["x"].values, locs["y"].values)

    try:
        from global_land_mask import globe

        locs = locs.loc[globe.is_ocean(locs["lat"].values, locs["lon"].values)]
        how = "global-land-mask is_ocean"
    except ImportError:
        # fallback: keep grid cells that ever saw (synthetic) observations
        rng = np.random.default_rng(0)
        n = 20_000
        r = np.abs(rng.normal(0, 1.5e6, n))  # obs cluster around the pole
        th = rng.uniform(0, 2 * np.pi, n)
        obs = pd.DataFrame({"x": r * np.cos(th), "y": r * np.sin(th)})
        # snap to the grid's cell centers (cells start at x_range[0])
        snap = lambda v: np.floor((v - x_range[0]) / 200_000) * 200_000 + x_range[0] + 100_000  # noqa: E731
        obs["x"] = snap(obs["x"])
        obs["y"] = snap(obs["y"])
        obs["fb"] = rng.normal(0.2, 0.05, n)
        masks = get_masks_for_expert_loc(obs, el_masks=["had_obs"], obs_col="fb", dims=["x", "y"])
        locs = generate_local_expert_locations(
            {"x": np.unique(grid[:, 0]), "y": np.unique(grid[:, 1])},
            ref_data=obs, masks=masks, keep_cols=["x", "y"],
        )
        locs["lon"], locs["lat"] = EASE2toWGS84(locs["x"].values, locs["y"].values)
        how = "had-obs mask (global-land-mask not installed)"

    out = os.path.join(tempfile.mkdtemp(), "expert_locations.csv")
    locs.to_csv(out, index=False)
    print(f"{len(locs)} expert locations ({how}) -> {out}")
    assert len(locs) > 0
    return out


if __name__ == "__main__":
    main()
