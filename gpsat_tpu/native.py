"""ctypes bindings for the C++ host kernels (native/src/gpsat_native.cpp).

Build with ``python -m gpsat_tpu.build_native`` (or the Makefile in
native/). Every entry point has a numpy fallback so the package works
without the compiled library; ``HAS_NATIVE`` reports which path is live.

The native kernels replace the reference's numba @guvectorize JIT kernels
(SURVEY.md §2.10) and the per-expert KDTree radius queries: a grid-hash
spatial index built once, queried for all experts in parallel.
"""

from __future__ import annotations

import ctypes
import os
from typing import List

import numpy as np

_LIB_NAME = "libgpsat_native.so"
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), _LIB_NAME),
    os.path.join(os.path.dirname(__file__), "..", "native", _LIB_NAME),
]

# ABI contract with native/src/gpsat_native.cpp (gpsat_abi_version). The
# .so is gitignored and built out-of-band, so a stale binary is a real
# possibility; calling it with these argtypes would pass shifted pointer
# arguments (v1 -> v2 added `inclusive` to gpsat_grid_index_query; v3
# added the lz4/unshuffle codec kernels). Mismatch or missing symbol =>
# treat the library as absent and use the numpy/scipy fallbacks, with a
# rebuild hint.
_ABI_VERSION = 4


def _load_checked(paths):
    for p in paths:
        if not os.path.exists(p):
            continue
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        try:
            lib.gpsat_abi_version.restype = ctypes.c_int64
            built = int(lib.gpsat_abi_version())
        except AttributeError:
            built = 1  # pre-versioning builds
        if built != _ABI_VERSION:
            import warnings

            warnings.warn(
                f"{p} has ABI v{built}, expected v{_ABI_VERSION} — using the "
                f"numpy/scipy fallbacks; rebuild with `python -m gpsat_tpu.build_native`"
            )
            continue
        return lib
    return None


_lib = _load_checked(_LIB_PATHS)

HAS_NATIVE = _lib is not None

if _lib is not None:
    _d = ctypes.POINTER(ctypes.c_double)
    _u8 = ctypes.POINTER(ctypes.c_uint8)
    _i64 = ctypes.POINTER(ctypes.c_int64)
    _lib.gpsat_max_dist_bool.argtypes = [_d, ctypes.c_int64, ctypes.c_int64, _d, ctypes.c_double, _u8]
    _lib.gpsat_gaussian_2d_weight.argtypes = [_d, _d, ctypes.c_int64, _d, _d, _d, ctypes.c_int64, ctypes.c_double, ctypes.c_double, _d]
    _lib.gpsat_inverse_softplus.argtypes = [_d, ctypes.c_int64, ctypes.c_double, _d]
    _lib.gpsat_inverse_sigmoid.argtypes = [_d, ctypes.c_int64, ctypes.c_double, ctypes.c_double, _d]
    _lib.gpsat_grid_index_build.argtypes = [_d, _d, ctypes.c_int64, ctypes.c_double]
    _lib.gpsat_grid_index_query.argtypes = [_d, _d, ctypes.c_int64, ctypes.c_double, ctypes.c_int, ctypes.c_int, _i64, _i64]
    _lib.gpsat_grid_index_free.argtypes = []
    _lib.gpsat_lz4_decompress.argtypes = [_u8, ctypes.c_int64, _u8, ctypes.c_int64]
    _lib.gpsat_lz4_decompress.restype = ctypes.c_int64
    _lib.gpsat_byte_unshuffle.argtypes = [_u8, ctypes.c_int64, ctypes.c_int64, _u8]
    _lib.gpsat_blosclz_decompress.argtypes = [_u8, ctypes.c_int64, _u8, ctypes.c_int64]
    _lib.gpsat_blosclz_decompress.restype = ctypes.c_int64


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def max_dist_bool(locs: np.ndarray, ref: np.ndarray, max_dist: float) -> np.ndarray:
    """Euclidean-ball mask over [n, d] rows (threaded native, numpy fallback)."""
    locs = np.ascontiguousarray(locs, dtype=np.float64)
    ref = np.ascontiguousarray(np.asarray(ref, dtype=np.float64).reshape(-1))
    if _lib is None:
        from gpsat_tpu.data.prediction_locations import max_dist_bool as np_fallback

        return np_fallback(locs, ref, max_dist)
    out = np.empty(locs.shape[0], dtype=np.uint8)
    _lib.gpsat_max_dist_bool(
        _dp(locs), locs.shape[0], locs.shape[1], _dp(ref), float(max_dist),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def gaussian_2d_weight(x0, y0, x, y, l_x: float, l_y: float, vals) -> np.ndarray:
    """NaN-aware Gaussian weighted mean (threaded native, jnp fallback)."""
    if _lib is None:
        from gpsat_tpu.postprocess import gaussian_2d_weight as jnp_fallback

        return jnp_fallback(x0, y0, x, y, l_x, l_y, vals)
    x0 = np.ascontiguousarray(x0, dtype=np.float64)
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    out = np.empty(len(x0), dtype=np.float64)
    _lib.gpsat_gaussian_2d_weight(
        _dp(x0), _dp(y0), len(x0), _dp(x), _dp(y), _dp(vals), len(x), float(l_x), float(l_y), _dp(out)
    )
    return out


def inverse_softplus(y, shift: float = 0.0) -> np.ndarray:
    y = np.ascontiguousarray(y, dtype=np.float64)
    if _lib is None:
        from gpsat_tpu.ops import transforms as T

        return np.asarray(T.inverse_softplus(y - 0.0 if shift == 0 else y - shift))
    out = np.empty(y.size, dtype=np.float64)
    _lib.gpsat_inverse_softplus(_dp(y), y.size, float(shift), _dp(out))
    return out.reshape(y.shape)


def inverse_sigmoid(y, low: float = 0.0, high: float = 1.0) -> np.ndarray:
    y = np.ascontiguousarray(y, dtype=np.float64)
    if _lib is None:
        from gpsat_tpu.ops import transforms as T

        return np.asarray(T.inverse_sigmoid_lh(y, low, high))
    out = np.empty(y.size, dtype=np.float64)
    _lib.gpsat_inverse_sigmoid(_dp(y), y.size, float(low), float(high), _dp(out))
    return out.reshape(y.shape)


def radius_query_all(
    coords_xy: np.ndarray, expert_xy: np.ndarray, radius: float, *, inclusive: bool = True
) -> List[np.ndarray]:
    """Per-expert index sets of points within radius (2-d).

    Grid-hash index built once + parallel per-expert queries; falls back
    to scipy cKDTree when the native library is absent.

    ``inclusive`` selects the boundary rule, which the reference is split
    on: True = d <= r (scipy ``query_ball_point``, the local-select
    convention, ref: dataloader.py:2437-2440); False = d < r (the
    ``_max_dist_bool`` prediction-location convention, ref:
    prediction_locations.py:18-43). Both backends honor it exactly.
    """
    coords_xy = np.ascontiguousarray(coords_xy, dtype=np.float64)
    expert_xy = np.ascontiguousarray(np.atleast_2d(expert_xy), dtype=np.float64)
    if _lib is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(coords_xy)
        out = []
        for e, ix in enumerate(tree.query_ball_point(expert_xy, radius)):
            ix = np.asarray(ix, dtype=np.int64)
            if not inclusive and len(ix):
                d2 = ((coords_xy[ix] - expert_xy[e]) ** 2).sum(axis=1)
                ix = ix[d2 < radius * radius]
            out.append(ix)
        return out

    x = np.ascontiguousarray(coords_xy[:, 0])
    y = np.ascontiguousarray(coords_xy[:, 1])
    ex = np.ascontiguousarray(expert_xy[:, 0])
    ey = np.ascontiguousarray(expert_xy[:, 1])
    E = len(ex)
    inc = 1 if inclusive else 0
    _lib.gpsat_grid_index_build(_dp(x), _dp(y), len(x), float(radius))
    counts = np.zeros(E, dtype=np.int64)
    _lib.gpsat_grid_index_query(
        _dp(ex), _dp(ey), E, float(radius), 0, inc,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), None,
    )
    offsets = np.zeros(E, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    total = int(counts.sum())
    flat = np.empty(total, dtype=np.int64)
    _lib.gpsat_grid_index_query(
        _dp(ex), _dp(ey), E, float(radius), 1, inc,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    _lib.gpsat_grid_index_free()
    return [flat[offsets[e] : offsets[e] + counts[e]] for e in range(E)]


def lz4_decompress(buf: bytes, dst_len: int) -> bytes:
    """LZ4 block decode (native C++; pure-Python fallback).

    The hot loop of the blosc frame decoder (data/blosc.py): zarr's
    default compressor is Blosc(cname='lz4'), so every chunk of a
    reference-era zarr store flows through here
    (ref: GPSat/dataloader.py:60-66).
    """
    if _lib is None:
        from gpsat_tpu.data.blosc import _lz4_decompress_py

        return _lz4_decompress_py(buf, dst_len)
    src = np.frombuffer(buf, dtype=np.uint8)
    dst = np.empty(dst_len, dtype=np.uint8)
    n = _lib.gpsat_lz4_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_len,
    )
    if n != dst_len:
        raise ValueError(f"corrupt lz4 block: decoded {n} of {dst_len} bytes")
    return dst.tobytes()


def blosclz_decompress(buf: bytes, dst_len: int) -> bytes:
    """blosclz stream decode (native C++; pure-Python fallback).

    blosclz is c-blosc's built-in default codec — PyTables-era HDF5 and
    older zarr stores carry it (ref: GPSat/dataloader.py:60-66 reads any
    such store through xarray/numcodecs).
    """
    if _lib is None:
        from gpsat_tpu.data.blosc import _blosclz_decompress_py

        return _blosclz_decompress_py(buf, dst_len)
    src = np.frombuffer(buf, dtype=np.uint8)
    dst = np.empty(dst_len, dtype=np.uint8)
    n = _lib.gpsat_blosclz_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_len,
    )
    if n != dst_len:
        raise ValueError(f"corrupt blosclz stream: decoded {n} of {dst_len} bytes")
    return dst.tobytes()


def byte_unshuffle(buf: bytes, typesize: int) -> bytes:
    """Inverse of blosc's byte-shuffle filter (native C++; numpy fallback)."""
    if typesize <= 1:
        return buf
    src = np.frombuffer(buf, dtype=np.uint8)
    if _lib is None:
        n = len(src) // typesize
        m = n * typesize
        out = np.empty_like(src)
        out[:m] = src[:m].reshape(typesize, n).T.reshape(-1)
        out[m:] = src[m:]
        return out.tobytes()
    dst = np.empty(len(src), dtype=np.uint8)
    _lib.gpsat_byte_unshuffle(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src), typesize,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dst.tobytes()
