"""Legacy import path (ref: GPSat/local_experts.py exports LocalExpertOI,
LocalExpertData and get_results_from_h5file). Implementation: experts.py
(the batched/sharded orchestrator replacing the reference's serial loop,
local_experts.py:930-1260)."""

from gpsat_tpu.experts import (  # noqa: F401
    LocalExpertData,
    LocalExpertOI,
    get_results_from_h5file,
)

__all__ = ["LocalExpertData", "LocalExpertOI", "get_results_from_h5file"]
