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
    p = argparse.ArgumentParser(
        description="TPU HPGMG-FE driver",
        epilog="The remaining fefas-test.c bodies (test-fetransfer, "
               "test-op, test-opdiagonal, test-sampler) run as pytest "
               "goldens: tests/test_fe.py, tests/test_fe_sampler.py, "
               "tests/test_reference_golden.py.")
    p.add_argument("action", choices=["fmg", "mgv", "sample",
                                      "test-kspsolve", "test-grid",
                                      "test-fespace", "test-feinject"])
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

    if args.action == "test-grid":
        # TestGrid (fefas-test.c:95-109) / GridView: print the coarsening
        # ladder. The reference prints per-rank element ranges; under
        # GSPMD decomposition the per-chip ranges are the mesh sharding,
        # so print the ladder + the sharding each level would get.
        g = grid
        lev = 0
        while True:
            print(f"Level {lev}: M [{g.M[0]} {g.M[1]} {g.M[2]}]  "
                  f"nodes [{g.nodes[0]} {g.nodes[1]} {g.nodes[2]}]  "
                  f"neq {g.neq}")
            if not g.can_coarsen():
                break
            g = g.coarsen()
            lev += 1
        return 0

    if args.action == "test-fespace":
        # TestFESpace (fefas-test.c:110-141): fill the global vector with
        # its own global numbering, move global->local, print. The global
        # array IS the function space here (no halo copies to check), so
        # print the numbering with node coordinates.
        from hpgmg_tpu.fe.fas import build_fe_levels

        levels = build_fe_levels(grid, op, dtype)
        L0 = levels[0]
        nx, ny, nz = grid.nodes
        g = jnp.arange(nx * ny * nz, dtype=dtype).reshape(nx, ny, nz)
        c = L0.coords
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    print(f"u[{int(g[i, j, k]):3d}] at "
                          f"{float(c[0, i, j, k]):5.2f} "
                          f"{float(c[1, i, j, k]):5.2f} "
                          f"{float(c[2, i, j, k]):5.2f}")
        return 0

    if args.action == "test-feinject":
        # TestFEInject (fefas-test.c:210-268): u = 1e6 x + 1e3 y + z on the
        # fine nodes; inject (state restriction Rhat) to the coarse grid;
        # print coarse values with coordinates — injected values encode
        # their coordinates, making misrouted injection visible.
        from hpgmg_tpu.fe.fas import build_fe_levels

        levels = build_fe_levels(grid, op, dtype)
        L0 = levels[0]
        c = L0.coords
        u = 1e6 * c[0] + 1e3 * c[1] + c[2]
        if not grid.can_coarsen():
            print("grid cannot coarsen; nothing to inject")
            return 0
        gc = grid.coarsen()
        uc = grid.inject(u)
        cc = build_fe_levels(gc, op, dtype)[0].coords
        nx, ny, nz = gc.nodes
        idx = 0
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    print(f"coarse u[{idx:2d}] = {float(uc[i, j, k]):10.1f} "
                          f"at {float(cc[0, i, j, k]):4.1f} "
                          f"{float(cc[1, i, j, k]):4.1f} "
                          f"{float(cc[2, i, j, k]):4.1f}")
                    idx += 1
        return 0

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
