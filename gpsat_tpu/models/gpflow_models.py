"""Legacy import path: reference model classes by their GPSat module path
(ref: GPSat/models/gpflow_models.py exports GPflowGPRModel/SGPRModel/
SVGPModel). The TPU-native implementations live in gpr.py / sgpr.py /
svgp.py; these names are migration aliases."""

from gpsat_tpu.models.gpr import GPRModel as GPflowGPRModel  # noqa: F401
from gpsat_tpu.models.sgpr import SGPRModel as GPflowSGPRModel  # noqa: F401
from gpsat_tpu.models.svgp import SVGPModel as GPflowSVGPModel  # noqa: F401

__all__ = ["GPflowGPRModel", "GPflowSGPRModel", "GPflowSVGPModel"]
