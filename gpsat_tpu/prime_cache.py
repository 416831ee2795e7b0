"""Ahead-of-time compile-cache priming for canonical bucket shapes.

The batched engine compiles one XLA program per (model, B, N, P) bucket
shape; on a fresh machine the first call per shape pays minutes of XLA
compilation (125s for the kernel-bench shape on one v5e, BENCH_r01). The
persistent compilation cache (auto-enabled by LocalExpertOI.run, see
gpsat_tpu.enable_compilation_cache) amortizes that across runs — this
module fills the cache UP FRONT so production runs never hit a cold
compile:

    python -m gpsat_tpu.prime_cache --model gpr --shapes 128x512x64,128x1024x64

Programs are compiled via jit(...).lower(ShapeDtypeStruct...).compile():
no data is materialized or transferred and nothing executes — only the
compile (and the persistent-cache write) happens. Batch sizes are rounded
up to the engine's power-of-two padding so the primed program is exactly
the one run_tile_batch requests.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Tuple

import numpy as np


def _core_for(model: str, on_tpu: bool, **model_kwargs):
    jitter = model_kwargs.pop("jitter", 1e-5 if on_tpu else 0.0)
    if model in ("gpr", "GPRModel", "GPflowGPRModel"):
        from gpsat_tpu.models.functional import make_gpr_core

        return make_gpr_core(jitter=jitter, **model_kwargs)
    if model in ("sgpr", "SGPRModel", "GPflowSGPRModel"):
        from gpsat_tpu.models.sgpr import make_sgpr_core

        return make_sgpr_core(jitter=jitter, **model_kwargs)
    if model in ("svgp", "SVGPModel", "GPflowSVGPModel"):
        from gpsat_tpu.models.svgp import make_svgp_core

        return make_svgp_core(jitter=jitter, **model_kwargs)
    if model in ("vff", "VFFModel", "GPflowVFFModel"):
        from gpsat_tpu.models.vff import make_vff_core

        return make_vff_core(**model_kwargs)
    if model in ("asvgp", "ASVGPModel", "GPflowASVGPModel"):
        from gpsat_tpu.models.asvgp import make_asvgp_core

        return make_asvgp_core(**model_kwargs)
    raise ValueError(f"unknown model: {model}")


def prime(
    shapes: Sequence[Tuple[int, int, int]],
    model: str = "gpr",
    *,
    D: int = 2,
    dtype=None,
    optim_kwargs: Optional[dict] = None,
    mesh=None,
    verbose: bool = True,
    **model_kwargs,
):
    """Compile the batched runner for each (B, N, P) bucket shape.

    Returns the per-shape compile seconds. Uses the same runner
    construction as LocalExpertOI (dtype-aware linesearch/tolerance
    defaults), so the cached executable is byte-identical to what a run
    would request.
    """
    import jax

    from gpsat_tpu import enable_compilation_cache
    from gpsat_tpu.parallel.engine import make_batched_adam_runner, make_batched_runner

    enable_compilation_cache()
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if dtype is None:
        dtype = np.float32 if on_tpu else np.float64
    optim_kwargs = dict(optim_kwargs or {})

    core = _core_for(model, on_tpu, **model_kwargs)
    if core.optimizer == "adam":
        runner = make_batched_adam_runner(
            core,
            fixed_params=tuple(core.default_fixed_params),
            max_iter=int(optim_kwargs.get("max_iter", 2000)),
            learning_rate=float(optim_kwargs.get("learning_rate", 1e-2)),
            check_every=int(optim_kwargs.get("check_every", 10)),
            persistence=int(optim_kwargs.get("persistence", 100)),
            mesh=mesh,
        )
    else:
        runner = make_batched_runner(
            core,
            fixed_params=tuple(core.default_fixed_params),
            max_iter=int(optim_kwargs.get("max_iter", 10_000)),
            linesearch=optim_kwargs.get("linesearch", None),
            max_linesearch_steps=int(optim_kwargs.get("max_linesearch_steps", 32)),
            mesh=mesh,
        )

    sds = lambda *shape: jax.ShapeDtypeStruct(shape, dtype)  # noqa: E731
    times = {}
    for B, N, P in shapes:
        # the engine pads B to a power of two (mesh-divisible); prime the
        # padded program the run will actually request
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        B_pad = max(n_dev, 1)
        while B_pad < B:
            B_pad *= 2
        B_pad = int(-(-B_pad // n_dev) * n_dev)

        defaults = core.init_cparams(D, dtype=dtype)
        uparams = {
            k: jax.ShapeDtypeStruct((B_pad,) + np.shape(v), dtype) for k, v in defaults.items()
        }
        t0 = time.perf_counter()
        runner.lower(
            sds(B_pad, N, D), sds(B_pad, N), sds(B_pad, N), sds(B_pad, P, D), uparams
        ).compile()
        dt = time.perf_counter() - t0
        times[(B, N, P)] = dt
        if verbose:
            print(f"primed {model} (B={B_pad}, N={N}, P={P}) in {dt:.1f}s")
    return times


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="gpr")
    ap.add_argument(
        "--shapes",
        default="128x512x64",
        help="comma-separated BxNxP bucket shapes, e.g. 128x512x64,128x1024x64",
    )
    ap.add_argument("--dims", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    # max_iter / linesearch / jitter are traced into the compiled program —
    # they must match the production run's optim_kwargs for the cache to hit
    ap.add_argument("--max-iter", type=int, default=10_000)
    ap.add_argument("--linesearch", default=None)
    ap.add_argument("--jitter", type=float, default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    shapes = [tuple(int(x) for x in s.split("x")) for s in args.shapes.split(",")]
    optim_kwargs = {"max_iter": args.max_iter}
    if args.linesearch:
        optim_kwargs["linesearch"] = args.linesearch
    model_kwargs = {} if args.jitter is None else {"jitter": args.jitter}
    total = sum(
        prime(shapes, model=args.model, D=args.dims, optim_kwargs=optim_kwargs, **model_kwargs).values()
    )
    print(f"cache primed: {len(shapes)} shape(s), {total:.1f}s total compile")


if __name__ == "__main__":
    main()
