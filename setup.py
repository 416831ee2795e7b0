"""Package setup; builds the native C++ host library as an extension.

The native kernels are plain C ABI (loaded via ctypes), so the Extension
is only a convenient build vehicle — absence of a compiled library
degrades gracefully to numpy/scipy fallbacks (gpsat_tpu/native.py).
"""

from setuptools import Extension, find_packages, setup

native = Extension(
    "gpsat_tpu._native_build_stub",
    sources=["native/src/gpsat_native.cpp"],
    extra_compile_args=["-O3", "-std=c++17", "-pthread"],
    optional=True,
)

setup(
    name="gpsat_tpu",
    version="0.1.0",
    description="TPU-native local-expert optimal interpolation (GPSat capabilities, JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "examples", "native")),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "optax",
        "numpy",
        "pandas",
        "scipy",
        "scikit-learn",
        "h5py",
        "matplotlib",
    ],
    ext_modules=[native],
)
