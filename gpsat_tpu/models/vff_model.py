"""Legacy import path (ref: GPSat/models/vff_model.py exports
GPflowVFFModel). The TPU-native VFF lives in vff.py."""

from gpsat_tpu.models.vff import VFFModel as GPflowVFFModel  # noqa: F401

__all__ = ["GPflowVFFModel"]
