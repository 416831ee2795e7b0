from gpsat_tpu.ops import kernels, linalg, transforms

__all__ = ["kernels", "linalg", "transforms"]
