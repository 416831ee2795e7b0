"""Legacy import path (ref: GPSat/models/sklearn_models.py exports
sklearnGPRModel). Implementation: sklearn_model.py."""

from gpsat_tpu.models.sklearn_model import SklearnGPRModel as sklearnGPRModel  # noqa: F401

__all__ = ["sklearnGPRModel"]
