"""Drop-in ``GPSat`` compatibility package.

Reference users' scripts import ``GPSat.*`` (e.g.
``from GPSat.dataloader import DataLoader``,
``from GPSat.local_experts import LocalExpertOI``). This package makes
every such import resolve to the TPU-native implementation: a meta-path
finder aliases ``GPSat.<anything>`` to ``gpsat_tpu.<anything>`` at import
time, so the full module tree (models/, data facades, CLIs) is reachable
under both names and ``GPSat.foo is gpsat_tpu.foo``.

Only install this shim where the original GPSat is NOT installed — both
packages claim the ``GPSat`` name (that is the point).
"""

import importlib
import importlib.abc
import importlib.machinery
import importlib.util
import sys

import gpsat_tpu as _impl


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, target: str):
        self._target = target

    def create_module(self, spec):
        # import the real module and register it under the alias name too
        mod = importlib.import_module(self._target)
        sys.modules[spec.name] = mod
        # importlib overwrites module attrs (__spec__/__loader__) with the
        # alias spec after create_module; remember the real ones so
        # exec_module can restore them (tooling reads __spec__.name/origin)
        self._real_spec = getattr(mod, "__spec__", None)
        self._real_loader = getattr(mod, "__loader__", None)
        return mod

    def exec_module(self, module):
        # already executed under its real name; undo the attr clobbering
        if self._real_spec is not None:
            module.__spec__ = self._real_spec
        if self._real_loader is not None:
            module.__loader__ = self._real_loader


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname == "GPSat" or not fullname.startswith("GPSat."):
            return None
        real = "gpsat_tpu" + fullname[len("GPSat"):]
        try:
            real_spec = importlib.util.find_spec(real)
        except (ImportError, ValueError):
            return None
        if real_spec is None:
            return None
        return importlib.machinery.ModuleSpec(
            fullname,
            _AliasLoader(real),
            is_package=real_spec.submodule_search_locations is not None,
        )


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.append(_AliasFinder())

# `import GPSat; GPSat.utils...` style access: mirror the implementation
# package's attributes on this module
def __getattr__(name):
    return getattr(_impl, name)


def __dir__():
    return sorted(set(dir(_impl)) | set(globals()))


__version__ = _impl.__version__
