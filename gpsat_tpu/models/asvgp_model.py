"""Legacy import path (ref: GPSat/models/asvgp_model.py exports
GPflowASVGPModel). The TPU-native ASVGP lives in asvgp.py."""

from gpsat_tpu.models.asvgp import ASVGPModel as GPflowASVGPModel  # noqa: F401

__all__ = ["GPflowASVGPModel"]
