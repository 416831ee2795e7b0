"""Legacy import path (ref: GPSat/prediction_locations.py exports
PredictionLocations). Implementation: data/prediction_locations.py
(batched C++ grid-hash radius filtering replaces the reference's numba
guvectorize kernel, prediction_locations.py:18-43)."""

from gpsat_tpu.data.prediction_locations import PredictionLocations  # noqa: F401

__all__ = ["PredictionLocations"]
