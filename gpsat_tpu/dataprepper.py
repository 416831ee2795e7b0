"""DataPrep module alias (reference path: GPSat/dataprepper.py)."""

from gpsat_tpu.data.binning import bin_data, bin_data_by  # noqa: F401
from gpsat_tpu.dataloader import DataPrep  # noqa: F401
