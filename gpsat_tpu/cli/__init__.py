"""Unified command dispatcher: ``python -m gpsat_tpu.cli <command> [...]``.

One entry point over the reference-compatible per-module CLIs (which remain
directly invocable as ``python -m gpsat_tpu.<command>``; ref CLI scripts:
GPSat/read_and_store.py, GPSat/bin_data.py, GPSat/local_expert_oi.py,
GPSat/postprocessing.py).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "read_and_store": ("gpsat_tpu.read_and_store", "raw flat/nc files -> observations table"),
    "bin_data": ("gpsat_tpu.bin_data", "bin observations onto a regular grid"),
    "local_expert_oi": ("gpsat_tpu.local_expert_oi", "run local-expert optimal interpolation"),
    "postprocessing": ("gpsat_tpu.postprocessing", "smooth hyperparameters / re-predict"),
    "xval": ("gpsat_tpu.xval", "cross-validation expansion + evaluation"),
    "prime_cache": ("gpsat_tpu.prime_cache", "AOT-compile canonical bucket shapes into the cache"),
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        lines = "\n".join(f"  {name:<18} {desc}" for name, (_, desc) in COMMANDS.items())
        print(f"usage: python -m gpsat_tpu.cli <command> [args]\n\ncommands:\n{lines}")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd!r}; run with --help for the list", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(COMMANDS[cmd][0])
    sys.argv = [f"gpsat_tpu.cli {cmd}"] + rest
    out = mod.main()
    return out if isinstance(out, int) else 0
