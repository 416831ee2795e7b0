"""Build the native host library: python -m gpsat_tpu.build_native."""

import os
import subprocess
import sys


def main() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "native", "src", "gpsat_native.cpp")
    out = os.path.join(here, "gpsat_tpu", "libgpsat_native.so")
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        src,
        "-o",
        out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built: {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
