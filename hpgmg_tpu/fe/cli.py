"""FE action CLI (the ``hpgmg-fe <action>`` analog, fefas.c:28-73).

Actions: fmg (RunFMG), mgv (RunMGV: V-cycles only), sample (RunSample).

    python -m hpgmg_tpu.fe.cli fmg -M 8,16,24 -op_type poisson2 -mg_monitor
    python -m hpgmg_tpu.fe.cli sample -op_type poisson2 -local 50,10000
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU HPGMG-FE driver")
    p.add_argument("action", choices=["fmg", "mgv", "sample",
                                      "test-kspsolve"])
    p.add_argument("-M", default="8,8,8", help="global elements per axis")
    p.add_argument("-op_type", default="poisson2",
                   choices=["poisson1", "poisson2", "poisson2affine"])
    p.add_argument("-poisson_solution", default="sine",
                   choices=["sine", "hump", "wave"])
    p.add_argument("-smooth", default="2,3", help="pre,post smooths")
    p.add_argument("-mg_eig_target", default="1.4,0.4",
                   help="max,min Chebyshev eigenvalue targets (fmg.c:91-94)")
    p.add_argument("-solve_type", default="fmg", choices=["fmg", "ksp"],
                   help="sampler solve path (sampler.c:151-154)")
    p.add_argument("-ksp_type", default="chebyshev",
                   choices=["chebyshev", "cg"])
    p.add_argument("-ksp_rtol", type=float, default=1e-5)
    p.add_argument("-ksp_chebyshev_eigenvalues", default="0.2,2")
    p.add_argument("-mg_monitor", action="store_true")
    p.add_argument("-coord_distort", type=float, default=0.0)
    p.add_argument("-add_quad_pts", type=int, default=0)
    p.add_argument("-local", default="50,10000",
                   help="sampler min,max local elements")
    p.add_argument("-maxsamples", type=int, default=8)
    p.add_argument("-repeat", type=int, default=3)
    p.add_argument("-mintime", type=float, default=0.1)
    p.add_argument("-dtype", default="float64",
                   choices=["float32", "float64"])
    p.add_argument("-cycles", type=int, default=5, help="mgv cycle count")
    args = p.parse_args(argv)

    from hpgmg_tpu.fe.fas import (build_fe_levels, diagnostics, fas_vcycle,
                                  run_fmg, run_ksp)
    from hpgmg_tpu.fe.grid import FEGrid
    from hpgmg_tpu.fe.op import get_fe_op
    from hpgmg_tpu.fe.sampler import run_sample

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    op = get_fe_op(args.op_type)
    dtype = jnp.dtype(args.dtype)
    pre, post = (int(s) for s in args.smooth.split(","))

    if args.action == "sample":
        local = tuple(int(s) for s in args.local.split(","))
        run_sample(op, degree=op.degree, local=local,
                   maxsamples=args.maxsamples, repeat=args.repeat,
                   mintime=args.mintime, dtype=dtype)
        return 0

    M = tuple(int(s) for s in args.M.split(","))
    mmax = max(M)
    L = tuple(m / mmax for m in M)
    grid = FEGrid(M=M, degree=op.degree, L=L, addquadpts=args.add_quad_pts)

    emax, emin = (float(s) for s in args.mg_eig_target.split(","))

    if args.action == "fmg":
        run_fmg(grid, op, args.poisson_solution, dtype=dtype,
                distort=args.coord_distort, pre=pre, post=post,
                monitor=True, eig=(emin, emax))
        return 0

    if args.action == "test-kspsolve":
        ce1, ce2 = (float(s) for s in
                    args.ksp_chebyshev_eigenvalues.split(","))
        run_ksp(grid, op, args.poisson_solution, dtype=dtype,
                ksp_type=args.ksp_type, rtol=args.ksp_rtol,
                eig=(min(ce1, ce2), max(ce1, ce2)))
        return 0

    # mgv: RunMGV (fmg.c:336-419) — V-cycles from a zero guess
    levels = build_fe_levels(grid, op, dtype, args.coord_distort)
    f = jax.jit(lambda L0: op.forcing(L0.grid, L0.coords,
                                      args.poisson_solution))(levels[0])
    solve_v = jax.jit(
        lambda levels, b, u: fas_vcycle(op, levels, 0, b, u, pre, post,
                                        (emin, emax)))
    u = jnp.zeros(grid.nodes, dtype)
    for _ in range(args.cycles):
        u = solve_v(levels, f, u)
        r2, emax, el2 = [float(x) for x in diagnostics(
            op, levels[0], f, u, args.poisson_solution)]
        print(f"V({pre},{post}) Q{grid.degree} "
              f"G[{M[0]:5d}{M[1]:5d}{M[2]:5d}] e_max {emax:8.2e} "
              f"e_L2 {el2:8.2e} r_2 {r2:8.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
