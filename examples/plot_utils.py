"""Plotting tour over OI results (the reference's examples/plot_utils.py,
self-contained).

Runs a small OI sweep (reusing examples/local_expert_oi.py's config
builder), loads the results file with `get_results_from_h5file`, and
demonstrates the results-driven plotting helpers into a multi-page PDF:
predictions heatmap, xy scatter, histogram, hyperparameter panel grid,
and config-driven `plots_from_config`.

Ref: examples/plot_utils.py; GPSat/plot_utils.py:224-345,457-606.
Run: python examples/plot_utils.py [out.pdf]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install

import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd
from matplotlib.backends.backend_pdf import PdfPages

pd.set_option("display.max_columns", 200)


def main(out_pdf: str = None):
    import jax

    # CPU reference-parity (f64) mode by default; set GPSAT_EXAMPLE_PLATFORM=tpu
    # to run on an attached TPU (f32 production mode) instead.
    if os.environ.get("GPSAT_EXAMPLE_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        import gpsat_tpu

        gpsat_tpu.enable_x64()

    from examples.local_expert_oi import make_config
    from gpsat_tpu.experts import get_results_from_h5file
    from gpsat_tpu.local_expert_oi import run_from_config
    from gpsat_tpu.plot_utils import (
        plot_hist_from_results_data,
        plot_hyper_parameters,
        plot_pcolormesh_from_results_data,
        plot_xy_from_results_data,
        plots_from_config,
    )
    from gpsat_tpu.utils import cprint

    work = tempfile.mkdtemp(prefix="gpsat_plots_")
    config = make_config(work)
    run_from_config(dict(config))
    results_file = config["run_kwargs"]["store_path"]

    cprint("load results + expert-location merge", "BOLD")
    dfs, oi_configs = get_results_from_h5file(results_file)
    print(f"tables: {sorted(dfs.keys())}")

    out_pdf = out_pdf or os.path.join(work, "results_plots.pdf")
    with PdfPages(out_pdf) as pdf:
        # page 1: predictions heatmap + scatter + histogram
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        plot_pcolormesh_from_results_data(
            ax=axes[0], dfs=dfs, table="preds", val_col="f*", x_col="x", y_col="y", fig=fig
        )
        axes[0].set_title("predicted mean f*")
        plot_xy_from_results_data(ax=axes[1], dfs=dfs, table="preds", x_col="x", y_col="f*",
                                  plot_kwargs={"scatter": True, "title": "f* vs x"})
        plot_hist_from_results_data(ax=axes[2], dfs=dfs, table="preds", val_col="f*",
                                    plot_kwargs={"title": "f* histogram"})
        pdf.savefig(fig)
        plt.close(fig)

        # page 2: hyperparameter panels (one subplot per param dim)
        fig = plot_hyper_parameters(
            dfs,
            coords_col=["x", "y"],
            table_names=["lengthscales", "kernel_variance", "likelihood_variance"],
            plots_per_row=2,
            suptitle="hyperparameters",
        )
        pdf.savefig(fig)
        plt.close(fig)

        # page 3: declarative plots_from_config (the JSON-config idiom)
        plot_configs = [
            {"plot_type": "heatmap", "table": "preds", "val_col": "f*_var",
             "x_col": "x", "y_col": "y", "plot_kwargs": {"title": "f* variance"}},
            {"plot_type": "hist", "table": "run_details", "val_col": "run_time",
             "plot_kwargs": {"title": "per-expert run time"}},
        ]
        fig = plots_from_config(plot_configs, dfs, plots_per_row=2)
        pdf.savefig(fig)
        plt.close(fig)

    cprint(f"done; wrote {out_pdf}", "OKGREEN")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
