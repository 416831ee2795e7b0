"""Legacy import path (ref: GPSat/models/pure_python_gpr.py exports
PurePythonGPR, SGPkernel, Nystroem, SMLII_mod, GPR). Implementation:
pure_numpy_gpr.py."""

from gpsat_tpu.models.pure_numpy_gpr import (  # noqa: F401
    GPR,
    Nystroem,
    PureNumpyGPR as PurePythonGPR,
    SGPkernel,
    SMLII_mod,
)

__all__ = ["PurePythonGPR", "SGPkernel", "Nystroem", "SMLII_mod", "GPR"]
