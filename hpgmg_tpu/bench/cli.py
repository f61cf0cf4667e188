"""hpgmg-fv style benchmark CLI.

Usage (mirrors ``hpgmg-fv [log2_box_dim] [target_boxes]`` but sized
directly): ``python -m hpgmg_tpu.bench.cli --n 256 --op fv4``.

Protocol follows main()/bench_hpgmg (hpgmg-fv.c:103-386): build, warm up,
timed F-cycle solves at h, then (dynamic range) 2h and 4h solves feeding a
Richardson order estimate, a per-level timing table, and the DOF/s summary.
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax.numpy as jnp

from hpgmg_tpu.bench.driver import run_benchmark
from hpgmg_tpu.bench.timing import format_breakdown, measure_breakdown
from hpgmg_tpu.core.config import (BC, BottomSolver, CycleType, Smoother,
                                   SolverConfig)


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU HPGMG-FV benchmark")
    # reference-compatible positionals: hpgmg-fv [log2_box_dim]
    # [target_boxes_per_rank] (hpgmg-fv.c:152-205); the global cube is
    # box_dim * cbrt(boxes_per_device * n_devices), weak-scaling style
    p.add_argument("log2_box_dim", nargs="?", type=int, default=None)
    p.add_argument("target_boxes", nargs="?", type=int, default=None)
    p.add_argument("--n", type=int, default=128, help="fine grid dim (n^3)")
    p.add_argument("--op", default="fv4",
                   choices=["fv7pt", "fv2", "fv4", "27pt"])
    p.add_argument("--smoother", default="gsrb",
                   choices=[s.value for s in Smoother])
    p.add_argument("--bottom", default="bicgstab",
                   choices=[s.value for s in BottomSolver])
    p.add_argument("--cycle", default="F", choices=["V", "F"])
    p.add_argument("--bc", default="dirichlet",
                   choices=["dirichlet", "periodic"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--dynamic-range", type=int, default=3,
                   help="solve at h, 2h, 4h for Richardson (DYNAMIC_RANGE)")
    p.add_argument("--problem", default=None,
                   choices=["fv", "p4", "p6", "sine"],
                   help="problem setup override (default: fv for fv2/fv4, "
                        "p6 otherwise — local.mk:4-11)")
    p.add_argument("--test-error", action="store_true",
                   help="TEST_ERROR mode (hpgmg-fv.c:317-348): report "
                        "error vs the analytic solution at h/2h/4h "
                        "instead of DOF/s (needs a pointwise --problem)")
    p.add_argument("--driver", default=None,
                   choices=["fmg2", "fmg2dd", "mgpcg"],
                   help="run the iterated-F-cycle (FMGSolve2, "
                        "mg.c:1348-1495), its compensated double-f32 "
                        "variant (fmg2dd: f32 kernels + exact two-sum "
                        "fine iterate, breaks the ~5e-4 f32 floor), or "
                        "MG-preconditioned-CG (MGPCG, mg.c:1500-1607) "
                        "and print the convergence history instead of "
                        "the DOF/s benchmark")
    p.add_argument("--min-seconds", type=float, default=1.0)
    p.add_argument("--timing-table", action="store_true",
                   help="print the per-level x per-op breakdown "
                        "(standalone upper bounds)")
    p.add_argument("--solve-timing-table", action="store_true",
                   help="print MGPrintTiming-style per-level times "
                        "accumulated inside one actual (eager) solve")
    args = p.parse_args(argv)

    if args.dtype == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)
    cfg = SolverConfig(
        op=args.op,
        a=0.0,
        b=1.0,
        bc=BC(args.bc),
        smoother=Smoother(args.smoother),
        bottom=BottomSolver(args.bottom),
        cycle=CycleType(args.cycle),
        dtype=jnp.dtype(args.dtype),
    )
    if args.log2_box_dim is not None:
        import jax

        boxes = args.target_boxes or 8
        total_boxes = boxes * len(jax.devices())
        per_axis = max(1, round(total_boxes ** (1.0 / 3.0)))
        args.n = (2 ** args.log2_box_dim) * per_axis
        print(f"  reference-style sizing: box_dim=2^{args.log2_box_dim}, "
              f"{boxes} boxes/device x {len(jax.devices())} devices "
              f"-> n={args.n}")

    print(f"  op={args.op} smoother={args.smoother} bottom={args.bottom} "
          f"n={args.n} dtype={args.dtype}")
    if args.driver:
        import time

        from hpgmg_tpu.bench.driver import _build
        from hpgmg_tpu.ops.base import get_suite
        from hpgmg_tpu.solve.mg import fmg_solve2, fmg_solve2_dd, mgpcg

        hier, f = _build(args.n, cfg, problem=args.problem)
        op = get_suite(cfg.op)
        if args.driver == "fmg2":
            run = lambda: fmg_solve2(op, hier, f, cfg, verbose=True)
        elif args.driver == "fmg2dd":
            run = lambda: fmg_solve2_dd(op, hier, f, cfg, verbose=True)[1:]
        else:
            run = lambda: mgpcg(op, hier, f, cfg, verbose=True)
        _, history = run()      # warmup/compile pass
        t0 = time.perf_counter()
        _, history = run()
        dt = time.perf_counter() - t0
        print(f"  {args.driver}: {len(history)} iterations, "
              f"rel_res={history[-1]:.3e}, {dt:.4f} s "
              f"({args.n ** 3 / dt:.3e} DOF/s incl. dispatch)")
        return 0
    if args.test_error:
        from hpgmg_tpu.bench.driver import run_test_error

        problem = args.problem or ("p6" if args.op in ("fv7pt", "27pt")
                                   else "sine")
        print(f"  TEST_ERROR mode, problem={problem}")
        run_test_error(args.n, cfg, problem=problem,
                       levels=min(3, args.dynamic_range))
        return 0
    res = run_benchmark(args.n, cfg, dynamic_range=args.dynamic_range,
                        min_solve_seconds=args.min_seconds)
    print(f"  DOF/s == {res.dof_per_second:.3e}")
    if res.richardson_order is not None:
        print(f"  Richardson order == {res.richardson_order:.3f}")

    if args.timing_table:
        from hpgmg_tpu.bench.driver import _build

        hier, _ = _build(args.n, cfg)
        rows = measure_breakdown(hier, cfg)
        print(format_breakdown(rows))
    if args.solve_timing_table:
        from hpgmg_tpu.bench.driver import _build
        from hpgmg_tpu.bench.timing import fmg_timing_table

        hier, f = _build(args.n, cfg)
        _, table = fmg_timing_table(hier, cfg, f)
        print(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
