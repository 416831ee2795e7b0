"""Legacy import path (ref: GPSat/models/gpytorch_models.py exports
GPyTorchGPRModel / GPyTorchKISSGPModel). Implementation: torch_gpr.py
(raw-torch same-math port; gpytorch absent from the image, so the
reference's raw ``ExactGPR`` gpytorch module has no standalone analogue —
the same math is inlined in TorchGPRModel)."""

from gpsat_tpu.models.torch_gpr import (  # noqa: F401
    TorchGPRModel as GPyTorchGPRModel,
    TorchKISSGPModel as GPyTorchKISSGPModel,
)

__all__ = ["GPyTorchGPRModel", "GPyTorchKISSGPModel"]
