"""CLI + re-exports: hyperparameter smoothing (ref: GPSat/postprocessing.py:601-609).

Usage: python -m gpsat_tpu.postprocessing <config.json>

Config keys (reference-compatible): result_file, params_to_smooth,
smooth_config_dict, xy_dims, reference_table_suffix, table_suffix,
output_file, model_name, save_config_file.
"""

from gpsat_tpu.postprocess import (  # noqa: F401
    SmoothingConfig,
    gaussian_2d_weight,
    glue_local_predictions,
    glue_local_predictions_1d,
    glue_local_predictions_2d,
    smooth_hyperparameters,
)
from gpsat_tpu.utils.misc import cprint, get_config_from_sysargv


def main(config: dict = None):
    if config is None:
        config = get_config_from_sysargv()
    assert config is not None, "no config provided; usage: python -m gpsat_tpu.postprocessing <config.json>"
    config = dict(config)
    config.pop("comment", None)
    out_cfg = smooth_hyperparameters(**config)
    cprint(f"done; predict-only config: {out_cfg}", c="OKGREEN")
    return out_cfg


if __name__ == "__main__":
    main()
