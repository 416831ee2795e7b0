from gpsat_tpu.optim.lbfgs import minimize_lbfgs

__all__ = ["minimize_lbfgs"]
