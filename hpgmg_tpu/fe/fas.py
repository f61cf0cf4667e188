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


def cg(op: FEOp, L: FELevel, b, x, max_iters: int = 20, rtol: float = 1e-10):
    """Jacobi-preconditioned CG with nonzero initial guess (coarsest-level
    KSP, fmg.c:112-118)."""
    r = b - _apply(op, L, x)
    norm_b = jnp.sqrt(jnp.sum(b * b))
    z = L.dinv * r
    rtz = jnp.sum(r * z)

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
        # natural norm convergence (KSP_NORM_NATURAL): sqrt(r'z)
        done = (pap == 0.0) | (jnp.sqrt(jnp.abs(rtz1)) < rtol * norm_b)
        beta = jnp.where(s.rtz == 0.0, 0.0, rtz1 / s.rtz)
        return _CGState(x=x1, r=r1, p=z1 + beta * s.p, rtz=rtz1, j=s.j + 1,
                        done=done)

    st = _CGState(x=x, r=r, p=z, rtz=rtz, j=jnp.array(0, jnp.int32),
                  done=(jnp.sqrt(jnp.abs(rtz)) < rtol * norm_b))
    st = lax.while_loop(cond, body, st)
    return st.x


def fas_vcycle(op: FEOp, levels: List[FELevel], lev: int, b, u,
               pre: int = 2, post: int = 3):
    """FAS V-cycle (MGVCycle, fmg.c:238-303)."""
    L = levels[lev]
    if lev == len(levels) - 1:
        return cg(op, L, b, u, max_iters=20)

    u = chebyshev(op, L, b, u, pre)
    v = b - _apply(op, L, u)
    Lc = levels[lev + 1]
    uc = Lc.grid.zero_boundaries(L.grid.inject(u))  # Rhat u
    vc = _apply(op, Lc, uc) + L.grid.restrict(Lc.grid, v)
    vc = Lc.grid.zero_boundaries(vc)
    yc = uc
    uc = fas_vcycle(op, levels, lev + 1, vc, uc, pre, post)
    u = u + L.grid.interpolate(Lc.grid, uc - yc)
    u = chebyshev(op, L, b, u, post)
    return u


def fas_fcycle(op: FEOp, levels: List[FELevel], lev: int, b,
               pre: int = 2, post: int = 3):
    """FAS full multigrid (MGFCycle, fmg.c:305-334): restrict the forcing
    down, coarsest solve, then interpolate + V-cycle per level."""
    L = levels[lev]
    if lev == len(levels) - 1:
        u = jnp.zeros(L.grid.nodes, b.dtype)
        return cg(op, L, b, u, max_iters=20)

    Lc = levels[lev + 1]
    bc = Lc.grid.zero_boundaries(L.grid.restrict(Lc.grid, b))
    uc = fas_fcycle(op, levels, lev + 1, bc, pre, post)
    u = L.grid.interpolate(Lc.grid, uc)
    return fas_vcycle(op, levels, lev, b, u, pre, post)


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


def run_fmg(grid: FEGrid, op: FEOp, solution: str = "sine",
            dtype=jnp.float64, distort: float = 0.0, pre: int = 2,
            post: int = 3, num_vcycles: int = 2, monitor: bool = True):
    """RunFMG (fmg.c:421-480): one F-cycle then trailing V-cycles, printing
    the per-level convergence table the reference tests golden-match."""
    levels = build_fe_levels(grid, op, dtype, distort)
    f = jax.jit(lambda L: op.forcing(L.grid, L.coords, solution))(levels[0])

    solve_f = jax.jit(lambda levels, b: fas_fcycle(op, levels, 0, b, pre, post))
    solve_v = jax.jit(
        lambda levels, b, u: fas_vcycle(op, levels, 0, b, u, pre, post))
    diag = jax.jit(lambda L, b, u: diagnostics(op, L, b, u, solution))

    results = []
    u = solve_f(levels, f)
    stats = [float(x) for x in diag(levels[0], f, u)]
    results.append(("F", stats))
    hist = [stats]
    for _ in range(num_vcycles):
        u = solve_v(levels, f, u)
        stats = [float(x) for x in diag(levels[0], f, u)]
        results.append(("V", stats))
        hist.append(stats)

    if monitor:
        g = grid
        for kind, (r2, emax, el2) in results:
            label = f"{kind}({pre},{post})"
            print(f"{label} Q{grid.degree} G[{g.M[0]:5d}{g.M[1]:5d}{g.M[2]:5d}] "
                  f"e_max {emax:8.2e} e_L2 {el2:8.2e} r_2 {r2:8.2e}")
    return u, levels, f, results
