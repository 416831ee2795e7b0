"""Legacy import path (ref: GPSat/models/multioutput/gpr.py exports
MultioutputGPR / MultioutputSVGP). The JAX implementations live in
core.py under the *Model names."""

from gpsat_tpu.models.multioutput.core import (  # noqa: F401
    MultioutputGPRModel,
    MultioutputGPRModel as MultioutputGPR,
    MultioutputSVGPModel,
    MultioutputSVGPModel as MultioutputSVGP,
)

__all__ = ["MultioutputGPR", "MultioutputSVGP", "MultioutputGPRModel", "MultioutputSVGPModel"]
