"""FAS full multigrid for the FE path.

Rebuild of finite-element/fmg.c. Per level the smoother is a fixed-interval
preconditioned Chebyshev (KSPCHEBYSHEV + PCJACOBI with eigenvalue targets
[0.4, 1.4] of D^{-1}A — fmg.c:92-120; no eigen-estimation), the coarsest
level runs Jacobi-preconditioned CG (rtol 1e-10, <=20 iterations,
fmg.c:112-115,246-252). The V-cycle is the FAS form

    Ac uc = R (bf - Af uf) + Ac (Rhat uf)       (fmg.c:234-237)

with Rhat = injection and R = P^T. The reference's shrinking communicator
(idle ranks pass NULL vectors, grid.c:208-220) maps to coarse levels being
replicated across the mesh — the same agglomeration mechanism as the FV
path.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.op import FEOp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FELevel:
    grid: FEGrid = dataclasses.field(metadata=dict(static=True))
    coords: jax.Array  # (3, Nx, Ny, Nz)
    dinv: jax.Array  # 1/diag(A) with 1 on constrained nodes
    # metric: either (K, wdxdet) full or (kdiag, wdxdet) affine
    metric_a: jax.Array
    metric_w: jax.Array


def build_fe_levels(grid: FEGrid, op: FEOp, dtype=jnp.float64,
                    distort: float = 0.0, jit: bool = True) -> List[FELevel]:
    """Build the level ladder fine -> coarse (MGCreate + DMFECoarsen chain
    + MGSetUpPC diag extraction, fmg.c:82-171)."""
    grids = [grid]
    while grids[-1].can_coarsen():
        grids.append(grids[-1].coarsen())

    def build_one(g: FEGrid) -> FELevel:
        coords = g.node_coords(dtype, distort)
        metric = op.make_metric(g, coords, dtype)
        diag = op.diagonal(g, coords, dtype, metric=metric)
        return FELevel(grid=g, coords=coords, dinv=1.0 / diag,
                       metric_a=metric[0], metric_w=metric[1])

    if jit:
        return [jax.jit(lambda g=g: build_one(g))() for g in grids]
    return [build_one(g) for g in grids]


def _apply(op: FEOp, L: FELevel, u):
    return op.apply(L.grid, L.coords, u, metric=(L.metric_a, L.metric_w))


def chebyshev(op: FEOp, L: FELevel, b, x, iters: int,
              emin: float = 0.4, emax: float = 1.4):
    """Fixed-interval Jacobi-preconditioned Chebyshev (the KSPCHEBYSHEV
    configuration of fmg.c:107-120), three-term recurrence as in the FV
    smoother (chebyshev.c:90-94) with theta/delta from [emin, emax]."""
    theta = 0.5 * (emax + emin)
    delta = 0.5 * (emax - emin)
    sigma = theta / delta
    rho = 1.0 / sigma
    c1, c2 = [0.0], [1.0 / theta]
    for _ in range(1, iters):
        rho_prev = rho
        rho = 1.0 / (2.0 * sigma - rho_prev)
        c1.append(rho * rho_prev)
        c2.append(rho * 2.0 / delta)

    x_prev = x
    for s in range(iters):
        r = b - _apply(op, L, x)
        x_next = x + c1[s] * (x - x_prev) + c2[s] * L.dinv * r
        x_prev, x = x, x_next
    return x


class _CGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rtz: jax.Array
    j: jax.Array
    done: jax.Array


def _cg_loop(op: FEOp, L: FELevel, b, x, max_iters: int,
             rtol: float) -> _CGState:
    """Jacobi-preconditioned CG with nonzero initial guess (coarsest-level
    KSP, fmg.c:112-118). Convergence uses the natural norm sqrt(r'z)
    relative to the natural norm of the RHS, sqrt(b'Bb) — PETSc
    KSPConvergedDefault compares against the norm of b (UIRNorm unset),
    so a warm-started solve whose incoming residual is already small
    terminates immediately instead of grinding out a full rtol reduction
    of an ever-shrinking initial residual."""
    r = b - _apply(op, L, x)
    z = L.dinv * r
    rtz = jnp.sum(r * z)
    target = rtol * jnp.sqrt(jnp.abs(jnp.sum(b * (L.dinv * b))))

    def cond(s: _CGState):
        return (s.j < max_iters) & ~s.done

    def body(s: _CGState):
        ap = _apply(op, L, s.p)
        pap = jnp.sum(s.p * ap)
        alpha = jnp.where(pap == 0.0, 0.0, s.rtz / pap)  # guard breakdown
        x1 = s.x + alpha * s.p
        r1 = s.r - alpha * ap
        z1 = L.dinv * r1
        rtz1 = jnp.sum(r1 * z1)
        done = (pap == 0.0) | (jnp.sqrt(jnp.abs(rtz1)) < target)
        beta = jnp.where(s.rtz == 0.0, 0.0, rtz1 / s.rtz)
        return _CGState(x=x1, r=r1, p=z1 + beta * s.p, rtz=rtz1, j=s.j + 1,
                        done=done)

    st = _CGState(x=x, r=r, p=z, rtz=rtz, j=jnp.array(0, jnp.int32),
                  done=(rtz == 0.0) | (jnp.sqrt(jnp.abs(rtz)) < target))
    return lax.while_loop(cond, body, st)


def cg(op: FEOp, L: FELevel, b, x, max_iters: int = 20, rtol: float = 1e-10):
    return _cg_loop(op, L, b, x, max_iters, rtol).x


def cg_info(op: FEOp, L: FELevel, b, x, max_iters: int = 20,
            rtol: float = 1e-10):
    """(x, iterations, converged) — for callers that report PETSc-style
    convergence reasons (run_ksp)."""
    st = _cg_loop(op, L, b, x, max_iters, rtol)
    return st.x, st.j, st.done


def fas_vcycle(op: FEOp, levels: List[FELevel], lev: int, b, u,
               pre: int = 2, post: int = 3,
               eig: Tuple[float, float] = (0.4, 1.4)):
    """FAS V-cycle (MGVCycle, fmg.c:238-303). ``eig`` is the Chebyshev
    target interval (emin, emax) of the Jacobi-preconditioned operator —
    the -mg_eig_target option (fmg.c:91-94, default [0.4, 1.4])."""
    L = levels[lev]
    if lev == len(levels) - 1:
        # PETSc KSPCG default maxits is 10000 (fmg.c sets only rtol=1e-10);
        # exact arithmetic terminates in neq steps, so cap there (plus
        # rounding slack) instead of spinning when 1e-10 is unreachable
        return cg(op, L, b, u, max_iters=min(400, 2 * L.grid.neq + 10))

    u = chebyshev(op, L, b, u, pre, emin=eig[0], emax=eig[1])
    v = b - _apply(op, L, u)
    Lc = levels[lev + 1]
    uc = Lc.grid.zero_boundaries(L.grid.inject(u))  # Rhat u
    vc = _apply(op, Lc, uc) + L.grid.restrict(Lc.grid, v)
    vc = Lc.grid.zero_boundaries(vc)
    yc = uc
    uc = fas_vcycle(op, levels, lev + 1, vc, uc, pre, post, eig)
    u = u + L.grid.interpolate(Lc.grid, uc - yc)
    u = chebyshev(op, L, b, u, post, emin=eig[0], emax=eig[1])
    return u


def fas_fcycle(op: FEOp, levels: List[FELevel], lev: int, b,
               pre: int = 2, post: int = 3,
               eig: Tuple[float, float] = (0.4, 1.4)):
    """FAS full multigrid (MGFCycle, fmg.c:305-334): restrict the forcing
    down, coarsest solve, then interpolate + V-cycle per level."""
    L = levels[lev]
    if lev == len(levels) - 1:
        u = jnp.zeros(L.grid.nodes, b.dtype)
        return cg(op, L, b, u, max_iters=min(400, 2 * L.grid.neq + 10))

    Lc = levels[lev + 1]
    bc = Lc.grid.zero_boundaries(L.grid.restrict(Lc.grid, b))
    uc = fas_fcycle(op, levels, lev + 1, bc, pre, post, eig)
    u = L.grid.interpolate(Lc.grid, uc)
    return fas_vcycle(op, levels, lev, b, u, pre, post, eig)


def diagnostics(op: FEOp, L: FELevel, b, u, solution: str):
    """(r_2/||b||_2, e_max, e_L2) — MGRecordDiagnostics (fmg.c:198-232)."""
    r = b - _apply(op, L, u)
    rnorm = jnp.sqrt(jnp.sum(r * r))
    bnorm = jnp.sqrt(jnp.sum(b * b))
    e_max, e_l2 = op.integrate_norms(L.grid, L.coords, u, solution)
    return rnorm / bnorm, e_max, e_l2


def _rate(coarse: float, fine: float) -> float:
    """ConvergenceRate (fmg.c:173-178)."""
    import math

    eps = 1e3 * 2.22e-16
    if coarse < eps and fine > eps:
        return 0.0
    if coarse == 0 or fine == 0:
        return 0.0
    return math.log2(coarse / fine)


def nodal_diagnostics(op: FEOp, L: FELevel, b, u, solution: str):
    """(|e|_2/|u0|_2, |r|_2/|f|_2) in plain nodal 2-norms against the
    pointwise analytic solution at the nodes — exactly what RunFMG prints
    and the reference goldens assert (fmg.c:455-467, t220-fmg.sh:8-22)."""
    u0 = op.solution_nodes(L.grid, L.coords, solution)
    e = u - u0
    r = b - _apply(op, L, u)
    rel_e = jnp.sqrt(jnp.sum(e * e)) / jnp.sqrt(jnp.sum(u0 * u0))
    rel_r = jnp.sqrt(jnp.sum(r * r)) / jnp.sqrt(jnp.sum(b * b))
    return rel_e, rel_r


def run_fmg(grid: FEGrid, op: FEOp, solution: str = "sine",
            dtype=jnp.float64, distort: float = 0.0, pre: int = 2,
            post: int = 3, num_vcycles: int = 2, monitor: bool = True,
            eig: Tuple[float, float] = (0.4, 1.4)):
    """RunFMG (fmg.c:421-480): one F-cycle then trailing V-cycles, printing
    the reference's golden-matched table
    ``F(3,3)  0: |e|_2/|u|_2 ...  |r|_2/|f|_2 ...`` (fmg.c:467) plus the
    MGRecordDiagnostics quadrature-norm line under ``monitor``."""
    levels = build_fe_levels(grid, op, dtype, distort)
    f = jax.jit(lambda L: op.forcing(L.grid, L.coords, solution))(levels[0])

    solve_f = jax.jit(
        lambda levels, b: fas_fcycle(op, levels, 0, b, pre, post, eig))
    solve_v = jax.jit(
        lambda levels, b, u: fas_vcycle(op, levels, 0, b, u, pre, post, eig))
    diag = jax.jit(lambda L, b, u: diagnostics(op, L, b, u, solution))
    ndiag = jax.jit(lambda L, b, u: nodal_diagnostics(op, L, b, u, solution))

    results = []
    u = None
    for i in range(1 + num_vcycles):
        kind = "F" if i == 0 else "V"
        u = solve_f(levels, f) if i == 0 else solve_v(levels, f, u)
        rel_e, rel_r = (float(x) for x in ndiag(levels[0], f, u))
        r2, emax, el2 = (float(x) for x in diag(levels[0], f, u))
        print(f"{kind}({pre},{post}) {i:2d}: |e|_2/|u|_2 {rel_e:8.2e}  "
              f"|r|_2/|f|_2 {rel_r:8.2e}")
        results.append((kind, dict(rel_e=rel_e, rel_r=rel_r, r2=r2,
                                   e_max=emax, e_L2=el2)))

    if monitor:
        g = grid
        for kind, s in results:
            print(f"{kind}({pre},{post}) Q{grid.degree} "
                  f"G[{g.M[0]:5d}{g.M[1]:5d}{g.M[2]:5d}] "
                  f"e_max {s['e_max']:8.2e} e_L2 {s['e_L2']:8.2e} "
                  f"r_2 {s['r2']:8.2e}")
    return u, levels, f, results


class _ChebKSPState(NamedTuple):
    x: jax.Array
    x_prev: jax.Array
    r: jax.Array
    rho: jax.Array
    rnorm: jax.Array
    j: jax.Array


def ksp_chebyshev(op: FEOp, L: FELevel, b, rtol: float = 1e-5,
                  max_iters: int = 10000,
                  eig: Tuple[float, float] = (0.2, 2.0)):
    """Standalone Jacobi-preconditioned Chebyshev KSP on one grid — the
    ``-ksp_type chebyshev -pc_type jacobi`` configuration of
    t120-poissonksp.sh. Left preconditioning with the PETSc-default
    PRECONDITIONED norm: converged when ||B r||_2 < rtol * ||B b||_2
    (zero initial guess). Returns (x, iterations)."""
    emin, emax = eig
    theta = 0.5 * (emax + emin)
    delta = 0.5 * (emax - emin)
    sigma = theta / delta

    def prec_norm(r):
        z = L.dinv * r
        return jnp.sqrt(jnp.sum(z * z))

    norm_b = prec_norm(b)
    x0 = jnp.zeros(L.grid.nodes, b.dtype)

    def cond(s: _ChebKSPState):
        return (s.j < max_iters) & (s.rnorm > rtol * norm_b)

    def body(s: _ChebKSPState):
        # continuing 3-term recurrence (chebyshev.c:90-94 / KSPChebyshev):
        # first step has rho=0 so the history term vanishes. The residual
        # rides in the carry, so each iteration costs ONE operator apply —
        # r_next computed here is exactly the r the next step would have
        # recomputed at the top.
        rho_next = 1.0 / (2.0 * sigma - s.rho)
        c1 = jnp.where(s.j == 0, 0.0, rho_next * s.rho)
        c2 = jnp.where(s.j == 0, 1.0 / theta, rho_next * 2.0 / delta)
        x_next = s.x + c1 * (s.x - s.x_prev) + c2 * L.dinv * s.r
        r_next = b - _apply(op, L, x_next)
        return _ChebKSPState(x=x_next, x_prev=s.x, r=r_next, rho=rho_next,
                             rnorm=prec_norm(r_next), j=s.j + 1)

    # rho carries rho_{j-1}; seeding with sigma makes the first computed
    # rho equal rho_0 = 1/sigma (the c1/c2 ladder of chebyshev());
    # r0 = b because x0 = 0
    st = _ChebKSPState(x=x0, x_prev=x0, r=b,
                       rho=jnp.asarray(sigma, b.dtype),
                       rnorm=prec_norm(b), j=jnp.array(0, jnp.int32))
    st = lax.while_loop(cond, body, st)
    return st.x, st.j


def run_ksp(grid: FEGrid, op: FEOp, solution: str = "sine",
            dtype=jnp.float64, ksp_type: str = "chebyshev",
            rtol: float = 1e-5, eig: Tuple[float, float] = (0.2, 2.0),
            monitor: bool = True):
    """TestKSPSolve (fefas-test.c:531-577) / the sampler's -solve_type ksp:
    a standalone Krylov solve on the *fine* grid only (no multigrid),
    cross-checking the FAS path. Prints |v-u|_2/|u|_2 like the reference."""
    levels = build_fe_levels(grid, op, dtype)[:1]
    L = levels[0]
    f = jax.jit(lambda L: op.forcing(L.grid, L.coords, solution))(L)
    u0 = jax.jit(lambda L: op.solution_nodes(L.grid, L.coords, solution))(L)
    max_iters = 10000
    if ksp_type == "chebyshev":
        v, its = jax.jit(lambda L, f: ksp_chebyshev(
            op, L, f, rtol=rtol, max_iters=max_iters, eig=eig))(L, f)
        converged = int(its) < max_iters
    elif ksp_type == "cg":
        v, its, conv = jax.jit(lambda L, f: cg_info(
            op, L, f, jnp.zeros_like(f), max_iters=max_iters,
            rtol=rtol))(L, f)
        converged = bool(conv)
    else:
        raise ValueError(f"unknown ksp_type {ksp_type!r}")
    err = float(jnp.sqrt(jnp.sum((v - u0) ** 2))
                / jnp.sqrt(jnp.sum(u0 * u0)))
    if monitor:
        # PETSc KSPConvergedReasonView strings: CONVERGED_RTOL when the
        # tolerance was met before the cap, DIVERGED_ITS otherwise
        reason = ("converged due to CONVERGED_RTOL" if converged
                  else "did not converge due to DIVERGED_ITS")
        print(f"Linear solve {reason} iterations {int(its)}")
        print(f"|v-u|_2/|u|_2 = {err:g}")
    return v, int(its), err
