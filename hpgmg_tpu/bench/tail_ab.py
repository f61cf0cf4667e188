"""On-chip A/B for the fused coarse-ladder (tail) V-cycle kernels.

Runs the production benchmark protocol (bench/driver.py chained-solve
timing) with kernels/tail.py's TAIL_FUSE toggled, at the small/medium
grid sizes whose F-cycle is launch/op-count bound (docs/FLOOR128_r04.md).
The 512^3 point is included once to confirm the tail is neutral where
the solve is bandwidth-bound.

Usage:
    python -m hpgmg_tpu.bench.tail_ab            # 64/128/256 both arms
    python -m hpgmg_tpu.bench.tail_ab --n 128    # one size
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, nargs="*", default=[64, 128, 256])
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--bottom", default="direct")
    p.add_argument("--max-dim", type=int, default=None,
                   help="override TAIL_MAX_DIM (default 32): the largest "
                        "level dim fused into the tail kernels — 64 "
                        "pulls the level-64 V-subtree in-kernel too")
    p.add_argument("--one-launch", action="store_true",
                   help="the ON arm also fuses the DIRECT bottom "
                        "in-kernel (TAIL_ONE_LAUNCH: descent + bottom + "
                        "climb = ONE launch per V-subtree)")
    p.add_argument("--arms", default="both", choices=["both", "on", "off"],
                   help="which arms to run (degraded-tunnel batches: run "
                        "'on' only and compare against an OFF arm already "
                        "on record — each arm costs a fresh warmup compile "
                        "through the tunnel)")
    args = p.parse_args(argv)

    import hpgmg_tpu.kernels.tail as T

    if args.max_dim is not None:
        T.TAIL_MAX_DIM = args.max_dim
    if args.one_launch:
        T.TAIL_ONE_LAUNCH = True
    from hpgmg_tpu.bench.driver import run_benchmark
    from hpgmg_tpu.core.config import BottomSolver, Smoother, SolverConfig

    print(f"backend={jax.default_backend()} bottom={args.bottom}")
    cfg = SolverConfig(op="fv4", a=0.0, b=1.0, smoother=Smoother.GSRB,
                       bottom=BottomSolver(args.bottom),
                       min_coarse_dim=8, dtype=jnp.float32)
    arms = {"both": (False, True), "on": (True,), "off": (False,)}[args.arms]
    for n in args.n:
        for fuse in arms:
            old = T.TAIL_FUSE
            T.TAIL_FUSE = fuse
            try:
                r = run_benchmark(n, cfg, mesh=None,
                                  min_solve_seconds=args.seconds,
                                  dynamic_range=1, verbose=False)
            finally:
                T.TAIL_FUSE = old
            print(f"n={n:4d} tail={'ON ' if fuse else 'OFF'} "
                  f"{r.seconds_per_solve * 1e3:8.3f} ms/solve "
                  f"{r.dof_per_second:.3e} DOF/s "
                  f"rel_res={r.rel_residual:.2e}", flush=True)


if __name__ == "__main__":
    main()
