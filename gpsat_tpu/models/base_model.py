"""Legacy import path (ref: GPSat/models/base_model.py exports
BaseGPRModel). Implementation: base.py."""

from gpsat_tpu.models.base import BaseGPRModel  # noqa: F401

__all__ = ["BaseGPRModel"]
