"""Benchmark driver (hpgmg-fv.c analog).

Protocol mirrors bench_hpgmg (hpgmg-fv.c:50-99): build, warm up (compile),
then run timed solves and report DOF/s = n^3 * solves / seconds. The
reference also solves at 2h and 4h for Richardson analysis
(DYNAMIC_RANGE=3, hpgmg-fv.c:320-329); ``run_benchmark`` exposes that too.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.parallel.mesh import active_mesh, shard_hierarchy, shard_array
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.solve.mg import fmg_solve, richardson_error


@dataclasses.dataclass
class BenchResult:
    n: int
    dof: int
    seconds_per_solve: float
    dof_per_second: float
    num_solves: int
    rel_residual: float
    richardson_order: Optional[float] = None


def _build_problem(n: int, cfg: SolverConfig, problem: Optional[str] = None):
    """Problem setup: the fv2/fv4 suites default to the cell-averaged
    sin^7 benchmark problem (problem.fv.c, wired by local.mk:4-11); the
    pointwise suites to problem.p6. ``problem`` overrides with any of the
    reference's pointwise initializers (p4/p6/sine — all carry an analytic
    u for the TEST_ERROR mode, hpgmg-fv.c:317-348)."""
    from hpgmg_tpu.core.config import BC

    periodic = cfg.bc == BC.PERIODIC
    if problem is None:
        problem = "fv" if cfg.op in ("fv2", "fv4") else "p6"
    if problem == "fv":
        from hpgmg_tpu.problems.fv import init_problem_fv

        return init_problem_fv(n, dtype=cfg.dtype, periodic=periodic)
    if problem == "sine":
        from hpgmg_tpu.problems.sine import init_problem_sine

        # the sine products satisfy both BC families as-is (problem.sine.c)
        return init_problem_sine(n, dtype=cfg.dtype, a=cfg.a, b=cfg.b,
                                 helmholtz=cfg.helmholtz)
    if problem == "p4":
        from hpgmg_tpu.problems.p4 import init_problem_p4

        return init_problem_p4(n, dtype=cfg.dtype, periodic=periodic,
                               a=cfg.a, b=cfg.b, helmholtz=cfg.helmholtz)
    assert problem == "p6", problem
    return init_problem_p6(n, dtype=cfg.dtype, periodic=periodic, a=cfg.a,
                           b=cfg.b, helmholtz=cfg.helmholtz)


def _build(n: int, cfg: SolverConfig, mesh=None,
           problem: Optional[str] = None):
    prob = _build_problem(n, cfg, problem)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    f = prob.f
    if mesh is not None:
        hier = shard_hierarchy(mesh, hier, cfg)
        f = shard_array(mesh, f)
    else:
        # drop solve-dead fields (XLA beta views, l1inv, dinv on Pallas
        # GSRB levels) — at 512^3 this reclaims ~2.6 GB of HBM
        from hpgmg_tpu.core.hierarchy import slim_hierarchy

        hier = slim_hierarchy(hier, cfg)
    return hier, f


def run_test_error(n: int, cfg: SolverConfig, problem: str = "p6",
                   levels: int = 3, verbose: bool = True):
    """TEST_ERROR mode (hpgmg-fv.c:317-348): instead of the DOF/s
    benchmark, solve at h, 2h, 4h with a pointwise problem that carries an
    analytic solution (problem.p4/p6/sine) and report the error against it
    plus the observed convergence order between resolutions. Returns
    [(n, max_err, l2_err), ...] fine-to-coarse."""
    from hpgmg_tpu.core import blas

    op = get_suite(cfg.op)
    rows = []
    for lev in range(levels):
        nl = n >> lev
        prob = _build_problem(nl, cfg, problem)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        u, _, _ = jax.jit(lambda h_, f_: fmg_solve(op, h_, f_, cfg))(
            hier, prob.f)
        e = u - prob.u_true
        max_err = float(blas.norm(e))
        l2_err = float(jnp.sqrt(blas.mean(e * e)))
        rows.append((nl, max_err, l2_err))
        if verbose:
            print(f"  h={1.0 / nl:.6e}  {nl}^3  "
                  f"error_max={max_err:.6e}  error_L2={l2_err:.6e}")
    if verbose and len(rows) >= 2:
        import math

        orders = [math.log2(rows[i + 1][1] / rows[i][1])
                  for i in range(len(rows) - 1)]
        print("  observed order (max-norm): "
              + ", ".join(f"{o:.2f}" for o in orders))
    return rows


def run_benchmark(n: int, cfg: SolverConfig, mesh=None,
                  min_solve_seconds: float = 1.0, max_solves: int = 100,
                  dynamic_range: int = 1, verbose: bool = True,
                  problem: Optional[str] = None) -> BenchResult:
    op = get_suite(cfg.op)
    hier, f = _build(n, cfg, mesh, problem)

    from hpgmg_tpu.core.config import CycleType
    from hpgmg_tpu.solve.mg import mg_solve_fixed

    def one_solve(hier, f):
        """One benchmark solve: an F-cycle (USE_FCYCLES, the default), or
        the MGSolve analog under --cycle V — enough V-cycles at ~1 digit
        of residual reduction each to reach the reference's rtol=1e-10
        regime (the reference's 2048^3 V-cycle run used 11, README)."""
        if cfg.cycle == CycleType.V:
            u, rels = mg_solve_fixed(op, hier, f, cfg, num_cycles=11)
            return u, rels[-1], jnp.ones((), f.dtype)
        return fmg_solve(op, hier, f, cfg)

    with active_mesh(mesh):
        # hier is a traced argument (closure constants become XLA literals
        # and wreck compile time)
        solve = jax.jit(one_solve)
        # warmup & compile (the reference's untimed warmup pass, hpgmg-fv.c:63)
        u, norm_r, norm_f = solve(hier, f)
        _ = float(norm_r)  # host transfer = reliable sync (axon
        # block_until_ready latency is noisy through the tunnel)

        # Timed measurement: run `num` data-dependent F-cycles inside ONE
        # jitted program — a single launch amortizes tunnel/dispatch
        # latency and the serial dependency prevents overlap/DCE. The trip
        # count is a *traced* scalar so the calibration chain and the timed
        # chain share one compiled program.
        @jax.jit
        def chained(hier, f, num):
            def body(i, carry):
                dep, _ = carry
                _, nr, _ = one_solve(hier, f + dep)
                return (0.0 * nr, nr)

            _, nr = jax.lax.fori_loop(0, num, body,
                                      (jnp.zeros((), f.dtype),
                                       jnp.zeros((), f.dtype)))
            return nr

        def timed(num: int) -> float:
            t0 = time.perf_counter()
            _ = float(chained(hier, f, num))
            return time.perf_counter() - t0

        _ = float(chained(hier, f, 1))  # compile + warm
        # Calibrate timePerSolve with a short chain, then size the timed
        # chain to the time budget (bench_hpgmg, hpgmg-fv.c:63-99).
        cal = max(1, min(4, max_solves))
        t_cal = timed(cal)
        per_solve_est = t_cal / cal
        num = int(max(1, min(max_solves,
                             round(min_solve_seconds / per_solve_est))))
        elapsed = timed(num)

    per_solve = elapsed / num
    dof = n ** 3
    rel = float(norm_r) / float(norm_f)

    order = None
    if dynamic_range >= 3:
        # Richardson: solve at 2h and 4h, compare restrictions (mg.c:1113)
        sols = [u]
        for k in (2, 4):
            hk, fk = _build(n // k, cfg, mesh, problem)
            with active_mesh(mesh):
                uk, _, _ = jax.jit(
                    lambda hk, f: fmg_solve(op, hk, f, cfg))(hk, fk)
            sols.append(uk)
        _, order_arr = richardson_error(op, *sols)
        order = float(order_arr)

    res = BenchResult(n=n, dof=dof, seconds_per_solve=per_solve,
                      dof_per_second=dof / per_solve, num_solves=num,
                      rel_residual=rel, richardson_order=order)
    if verbose:
        print(f"  {cfg.op} F-cycle: {n}^3 grid, {num} solves, "
              f"{per_solve:.4f} s/solve, {res.dof_per_second:.3e} DOF/s, "
              f"rel_res={rel:.3e}"
              + (f", order={order:.2f}" if order is not None else ""))
    return res
