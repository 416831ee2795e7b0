"""Same-session A/B of the recursive factor pair's (base, micro) at the
default bench shape (VERDICT r4 item 3 — the cross-expert block-packing
attack on the sequential diagonal chain).

Runs bench.main() once per config IN ONE PROCESS, so every number shares
one tunnel session and is directly comparable (tunnel wall for identical
work varies ~2.5x across sessions; see CLAUDE.md). Raising (base, micro)
cuts the diagonal chain from N/base base blocks x base/micro scan steps
(default 32x8 -> 64 sequential micro-steps at N=512) down to 16 at
(64, 32) — the factor-level sweep measured 40.5 ms vs 46.2 ms for the
pair alone (bench_factor.py --sweep); this measures what that buys
end-to-end against the full L-BFGS+predict program.

Usage: python bench_ab_chol.py [--configs 32x8,64x32,128x32]
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="32x8,64x32,64x16,128x32")
    ap.add_argument("--reps", type=int, default=2,
                    help="bench.main() calls per config (first also compiles)")
    args = ap.parse_args()

    import bench

    for cfg in args.configs.split(","):
        base, micro = cfg.split("x")
        os.environ["GPSAT_CHOL_BASE"] = base
        os.environ["GPSAT_CHOL_MICRO"] = micro
        for rep in range(args.reps):
            print(f'### chol base={base} micro={micro} rep={rep}', flush=True)
            bench.main()


if __name__ == "__main__":
    main()
