"""On-hardware whole-solve A/B over ladder-depth and fusion flags.

The small-grid (128^3) solve is launch/op-count dominated: the F-cycle
visits every level O(depth) times and the tail levels are pure overhead
once the bottom solve is exact. The reference caps its ladder the same
way (MAX_COARSE_DIM=11 lets an 11^3 box be the bottom,
finite-volume/source/mg.c:894-952); our DIRECT bottom turns any <=16^3
level into one MXU matvec, so the ladder depth is a free parameter to
sweep ON HARDWARE rather than guess.

Each variant is a full ``run_benchmark`` whole-solve measurement (chained
data-dependent F-cycles inside one jitted program — per-launch timing
lies through the axon tunnel), so the rel_res column doubles as the
identical-convergence check for the FUSED_RESTRICT arm.

Usage:  python -m hpgmg_tpu.bench.ladder_sweep --sizes 128 256
Decision feeds bench.py's min_coarse_dim and
kernels/restrict.py:FUSED_RESTRICT (docs/RESTRICT_r04.md).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[128])
    p.add_argument("--op", default="fv4")
    p.add_argument("--coarse", type=int, nargs="+", default=[8, 16])
    p.add_argument("--seconds", type=float, default=1.0,
                   help="timed-chain budget per variant")
    p.add_argument("--no-fres", action="store_true",
                   help="skip the FUSED_RESTRICT arms")
    p.add_argument("--bottom", default="direct",
                   help="bottom solver (DIRECT caps the bottom at 16^3; "
                        "pass bicgstab to truncate deeper — coarse=32/64 "
                        "isolates the sub-ladder's cost, FLOOR128 batch d)")
    args = p.parse_args(argv)

    import hpgmg_tpu.kernels.restrict as R
    from hpgmg_tpu.bench.driver import run_benchmark
    from hpgmg_tpu.core.config import BottomSolver, Smoother, SolverConfig

    print(f"backend={jax.default_backend()} op={args.op}")
    for n in args.sizes:
        for mc in args.coarse:
            for fused in ((False,) if args.no_fres else (False, True)):
                cfg = SolverConfig(op=args.op, a=0.0, b=1.0,
                                   smoother=Smoother.GSRB,
                                   bottom=BottomSolver(args.bottom),
                                   min_coarse_dim=mc, dtype=jnp.float32)
                old = (R.FUSED_RESTRICT, R.FUSED_RESTRICT_MAX_DIM)
                # the fused arm is ALL-levels fres (lift the dim gate so
                # the A/B keeps measuring the ungated variant)
                R.FUSED_RESTRICT = fused
                R.FUSED_RESTRICT_MAX_DIM = 1 << 30
                try:
                    res = run_benchmark(n, cfg, mesh=None,
                                        min_solve_seconds=args.seconds,
                                        verbose=False)
                finally:
                    R.FUSED_RESTRICT, R.FUSED_RESTRICT_MAX_DIM = old
                print(f"n={n:4d} coarse={mc:2d} fres={int(fused)}: "
                      f"{res.seconds_per_solve * 1e3:9.3f} ms/solve  "
                      f"{res.dof_per_second:.3e} DOF/s  "
                      f"rel_res={res.rel_residual:.3e}")


if __name__ == "__main__":
    main()
