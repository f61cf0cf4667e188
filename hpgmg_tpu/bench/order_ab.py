"""Richardson-order adjudication A/B (VERDICT r4 #3).

BENCH_r04 reported richardson_order 3.115 at 512^3 f32 where r3 measured
3.406; the only algorithmic deltas were the pooled reduce_window
restriction (ops/transfer.py:RESTRICT_POOL, >=256^3) and the fused
residual+restriction kernel (kernels/restrict.py:FUSED_RESTRICT,
<=128^3). This tool reruns the EXACT bench protocol (run_benchmark
dynamic_range=3: solves at h/2h/4h, mg.c:1113-1131 estimate) with each
flag toggled, so the order drop is attributed to a flag or to tunnel
noise. A f64 arm (BiCGStab bottom — TPU LU is f32-only) gives the
noise-free oracle at a smaller size.

Usage:
    python -m hpgmg_tpu.bench.order_ab --n 512          # f32 flag matrix
    python -m hpgmg_tpu.bench.order_ab --n 256 --f64    # noise-free arm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--f64", action="store_true",
                   help="one f64 XLA-path arm (order is rounding-free)")
    p.add_argument("--seconds", type=float, default=0.5,
                   help="timed-chain budget (order only needs the solves)")
    p.add_argument("--subset", default=None,
                   help="comma list of arm keys to run (default: all four; "
                        "'default,r3' is the decisive pair when the tunnel "
                        "budget is tight — each arm costs 3 cold warmup "
                        "compiles at n, n/2, n/4)")
    args = p.parse_args(argv)

    import hpgmg_tpu.kernels.restrict as R
    import hpgmg_tpu.ops.transfer as T
    from hpgmg_tpu.bench.driver import run_benchmark
    from hpgmg_tpu.core.config import BottomSolver, Smoother, SolverConfig

    print(f"backend={jax.default_backend()} n={args.n}")

    if args.f64:
        jax.config.update("jax_enable_x64", True)
        cfg = SolverConfig(op="fv4", a=0.0, b=1.0, smoother=Smoother.GSRB,
                           bottom=BottomSolver.BICGSTAB,
                           min_coarse_dim=8, dtype=jnp.float64)
        res = run_benchmark(args.n, cfg, mesh=None,
                            min_solve_seconds=args.seconds,
                            dynamic_range=3, verbose=False)
        print(f"f64 XLA arm: n={args.n} order={res.richardson_order:.3f} "
              f"rel_res={res.rel_residual:.3e}")
        return

    cfg = SolverConfig(op="fv4", a=0.0, b=1.0, smoother=Smoother.GSRB,
                       bottom=BottomSolver.DIRECT,
                       min_coarse_dim=8, dtype=jnp.float32)
    arms = [
        ("default", "default (pool>=256, fres<=128)", None),
        ("pool", "pool OFF", ("pool",)),
        ("fres", "fres OFF", ("fres",)),
        ("r3", "pool+fres OFF (r3 config)", ("pool", "fres")),
    ]
    if args.subset:
        keys = set(args.subset.split(","))
        arms = [a for a in arms if a[0] in keys]
    for _key, name, off in arms:
        old = (T.RESTRICT_POOL, R.FUSED_RESTRICT)
        if off:
            if "pool" in off:
                T.RESTRICT_POOL = False
            if "fres" in off:
                R.FUSED_RESTRICT = False
        try:
            res = run_benchmark(args.n, cfg, mesh=None,
                                min_solve_seconds=args.seconds,
                                dynamic_range=3, verbose=False)
        finally:
            T.RESTRICT_POOL, R.FUSED_RESTRICT = old
        print(f"{name:32s}: order={res.richardson_order:.3f} "
              f"rel_res={res.rel_residual:.3e} "
              f"{res.dof_per_second:.3e} DOF/s")


if __name__ == "__main__":
    main()
