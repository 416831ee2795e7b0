"""Model zoo registry (ref: GPSat/models/__init__.py:3-28).

Reference-name aliases are kept so existing GPSat configs
(``"oi_model": "GPflowGPRModel"`` etc.) resolve to the TPU-native models.
"""

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.models.gpr import GPRModel


def get_model(name: str):
    """Resolve a model class by name, accepting the reference's names
    (GPflowGPRModel, sklearnGPRModel, ...) as aliases
    (ref: GPSat/models/__init__.py:3-28 registry)."""
    from gpsat_tpu.models.asvgp import ASVGPModel
    from gpsat_tpu.models.pure_numpy_gpr import PureNumpyGPR
    from gpsat_tpu.models.sgpr import SGPRModel
    from gpsat_tpu.models.sklearn_model import SklearnGPRModel
    from gpsat_tpu.models.svgp import SVGPModel
    from gpsat_tpu.models.torch_gpr import TorchGPRModel, TorchKISSGPModel
    from gpsat_tpu.models.vff import VFFModel

    registry = {
        # native names
        "GPRModel": GPRModel,
        "SGPRModel": SGPRModel,
        "SVGPModel": SVGPModel,
        "VFFModel": VFFModel,
        "SklearnGPRModel": SklearnGPRModel,
        "ASVGPModel": ASVGPModel,
        "TorchGPRModel": TorchGPRModel,
        "TorchKISSGPModel": TorchKISSGPModel,
        "PureNumpyGPR": PureNumpyGPR,
        # reference-name aliases (GPSat/models/__init__.py:3-28)
        "GPflowGPRModel": GPRModel,
        "GPflowSGPRModel": SGPRModel,
        "GPflowSVGPModel": SVGPModel,
        "GPflowVFFModel": VFFModel,
        "sklearnGPRModel": SklearnGPRModel,
        "GPflowASVGPModel": ASVGPModel,
        "GPyTorchGPRModel": TorchGPRModel,
        "GPyTorchKISSGPModel": TorchKISSGPModel,
        "PurePythonGPR": PureNumpyGPR,
    }
    assert name in registry, f"model: {name} not in registry: {sorted(registry)}"
    return registry[name]


# Reference-name class aliases as module attributes, so
# ``from gpsat_tpu.models import GPflowGPRModel`` works like the reference's
# ``from GPSat.models.gpflow_models import GPflowGPRModel``; resolved lazily
# so importing the package stays light.
_CLASS_ALIASES = {
    "SGPRModel": ("gpsat_tpu.models.sgpr", "SGPRModel"),
    "SVGPModel": ("gpsat_tpu.models.svgp", "SVGPModel"),
    "VFFModel": ("gpsat_tpu.models.vff", "VFFModel"),
    "ASVGPModel": ("gpsat_tpu.models.asvgp", "ASVGPModel"),
    "SklearnGPRModel": ("gpsat_tpu.models.sklearn_model", "SklearnGPRModel"),
    "TorchGPRModel": ("gpsat_tpu.models.torch_gpr", "TorchGPRModel"),
    "TorchKISSGPModel": ("gpsat_tpu.models.torch_gpr", "TorchKISSGPModel"),
    "PureNumpyGPR": ("gpsat_tpu.models.pure_numpy_gpr", "PureNumpyGPR"),
    "GPflowGPRModel": ("gpsat_tpu.models.gpr", "GPRModel"),
    "GPflowSGPRModel": ("gpsat_tpu.models.sgpr", "SGPRModel"),
    "GPflowSVGPModel": ("gpsat_tpu.models.svgp", "SVGPModel"),
    "GPflowVFFModel": ("gpsat_tpu.models.vff", "VFFModel"),
    "GPflowASVGPModel": ("gpsat_tpu.models.asvgp", "ASVGPModel"),
    "sklearnGPRModel": ("gpsat_tpu.models.sklearn_model", "SklearnGPRModel"),
    "GPyTorchGPRModel": ("gpsat_tpu.models.torch_gpr", "TorchGPRModel"),
    "GPyTorchKISSGPModel": ("gpsat_tpu.models.torch_gpr", "TorchKISSGPModel"),
    "PurePythonGPR": ("gpsat_tpu.models.pure_numpy_gpr", "PureNumpyGPR"),
}


def __getattr__(name):
    try:
        mod_name, attr = _CLASS_ALIASES[name]
    except KeyError:
        raise AttributeError(f"module 'gpsat_tpu.models' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


__all__ = ["BaseGPRModel", "GPRModel", "get_model", *_CLASS_ALIASES]
