"""Coarse-grid (bottom) Krylov solvers.

Rebuilds of the reference ``solvers/bicgstab.c`` and ``solvers/cg.c`` as
``lax.while_loop`` programs: the convergence test and the six breakdown
checks ride in the loop carry, exactly mirroring the reference's
``BiCGStabFailed`` / ``BiCGStabConverged`` flags (bicgstab.c:28-29). All
dot products are jnp reductions — on a sharded coarse level XLA emits one
all-reduce each, and on the (default) replicated coarse level they are
free of communication, which is the reference's per-level
subcommunicator trick (mg.c:979-997) by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from hpgmg_tpu.core import blas
from hpgmg_tpu.core.config import BottomSolver, SolverConfig
from hpgmg_tpu.core.level import Level


def bottom_solve(op, level: Level, x, rhs, cfg: SolverConfig,
                 must_subtract_mean: bool = False):
    """Dispatch (IterativeSolver, solvers.c:17-88). ``must_subtract_mean``
    projects out the constant null space of the periodic pure-Poisson
    operator after every residual update (bicgstab.c:32-35,58-61,81-84)."""
    if cfg.bottom == BottomSolver.DIRECT:
        assert level.bottom_ainv is not None, \
            "DIRECT bottom requires build_hierarchy to precompute the inverse"
        r = rhs
        if must_subtract_mean:
            r = r - blas.mean(r, cfg.reduce_dtype)
        out = (level.bottom_ainv @ r.ravel()).reshape(level.shape)
        if must_subtract_mean:
            out = out - blas.mean(out, cfg.reduce_dtype)
        return out
    if cfg.bottom == BottomSolver.BICGSTAB:
        return bicgstab(op, level, x, rhs, cfg, must_subtract_mean)
    if cfg.bottom == BottomSolver.CG:
        return cg(op, level, x, rhs, cfg, must_subtract_mean)
    if cfg.bottom == BottomSolver.CABICGSTAB:
        from hpgmg_tpu.solve.ca_krylov import cabicgstab

        return cabicgstab(op, level, x, rhs, cfg, must_subtract_mean)
    if cfg.bottom == BottomSolver.CACG:
        from hpgmg_tpu.solve.ca_krylov import cacg

        return cacg(op, level, x, rhs, cfg, must_subtract_mean)
    if cfg.bottom == BottomSolver.SMOOTH:
        return smooth_until_converged(op, level, x, rhs, cfg,
                                      must_subtract_mean)
    raise ValueError(f"unknown bottom solver {cfg.bottom}")


def _subtract_mean(u, enabled: bool, reduce_dtype):
    if not enabled:
        return u
    return u - blas.mean(u, reduce_dtype)


class _BiCGStabState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    r_dot_r0: jax.Array
    j: jax.Array
    failed: jax.Array
    converged: jax.Array


def bicgstab(op, level: Level, x, rhs, cfg: SolverConfig,
             must_subtract_mean: bool = False):
    """Diagonally-preconditioned BiCGStab (Saad Alg 7.7; bicgstab.c:14-97)."""
    rd = cfg.reduce_dtype
    r0 = op.residual(level, x, rhs, cfg)
    r0 = _subtract_mean(r0, must_subtract_mean, rd)
    r = r0
    p = r0
    r_dot_r0 = blas.dot(r, r0, rd)
    norm_r0 = blas.norm(r0)
    target = cfg.bottom_rtol * norm_r0
    converged0 = (r_dot_r0 == 0.0) | (norm_r0 == 0.0)

    def cond(s: _BiCGStabState):
        return (s.j < cfg.bottom_max_iters) & (~s.failed) & (~s.converged)

    def body(s: _BiCGStabState):
        q = level.dinv * s.p  # diagonal preconditioner (bicgstab.c:46)
        ap = op.apply_op(level, q, cfg)
        ap_dot_r0 = blas.dot(ap, r0, rd)
        # pivot breakdown: reference breaks BEFORE updating x (bicgstab.c:52-54)
        alpha = s.r_dot_r0 / ap_dot_r0
        # ~isfinite, not isinf: in f32 a converged residual gives 0/0=NaN
        # (the reference runs f64 where BiCGStabFailed only sees inf)
        fail_pivot = (ap_dot_r0 == 0.0) | ~jnp.isfinite(alpha)

        x1 = s.x + alpha * q
        t = s.r - alpha * ap  # intermediate residual "s" in the reference
        t = _subtract_mean(t, must_subtract_mean, rd)
        norm_t = blas.norm(t)
        conv_half = (norm_t == 0.0) | (norm_t < target)

        th = level.dinv * t
        at = op.apply_op(level, th, cfg)
        at_dot_at = blas.dot(at, at, rd)
        at_dot_t = blas.dot(at, t, rd)
        conv_half |= at_dot_at == 0.0  # bicgstab.c:74
        omega = at_dot_t / at_dot_at
        # stabilization breakdown: break after x1 but before x2 (bicgstab.c:76-77)
        fail_omega = (omega == 0.0) | ~jnp.isfinite(omega)

        x2 = x1 + omega * th
        r2 = t - omega * at
        r2 = _subtract_mean(r2, must_subtract_mean, rd)
        norm_r2 = blas.norm(r2)
        conv_full = (norm_r2 == 0.0) | (norm_r2 < target)
        r_dot_r0_new = blas.dot(r2, r0, rd)
        beta = (r_dot_r0_new / s.r_dot_r0) * (alpha / omega)
        # Lanczos breakdown / non-finite beta: break after x2 (bicgstab.c:90-92)
        fail_late = (r_dot_r0_new == 0.0) | ~jnp.isfinite(beta)
        p2 = r2 + beta * (s.p - omega * ap)

        # select the solution the reference would exit with on each break path
        keep_half = conv_half | fail_omega
        x_out = jnp.where(fail_pivot, s.x, jnp.where(keep_half, x1, x2))
        return _BiCGStabState(
            x=x_out,
            r=jnp.where(keep_half | fail_pivot, t, r2),
            p=jnp.where(keep_half | fail_pivot, s.p, p2),
            r_dot_r0=jnp.where(keep_half | fail_pivot, s.r_dot_r0, r_dot_r0_new),
            j=s.j + 1,
            failed=fail_pivot | fail_omega | fail_late,
            converged=conv_half | conv_full,
        )

    init = _BiCGStabState(
        x=x, r=r, p=p, r_dot_r0=r_dot_r0,
        j=jnp.array(0, jnp.int32),
        failed=jnp.array(False),
        converged=converged0,
    )
    out = lax.while_loop(cond, body, init)
    return out.x


class _CGState(NamedTuple):
    x: jax.Array
    r: jax.Array
    p: jax.Array
    rtz: jax.Array
    j: jax.Array
    done: jax.Array


def cg(op, level: Level, x, rhs, cfg: SolverConfig,
       must_subtract_mean: bool = False):
    """Diagonally-preconditioned CG (solvers/cg.c)."""
    rd = cfg.reduce_dtype
    r = op.residual(level, x, rhs, cfg)
    r = _subtract_mean(r, must_subtract_mean, rd)
    norm_r0 = blas.norm(r)
    target = cfg.bottom_rtol * norm_r0
    z = level.dinv * r
    p = z
    rtz = blas.dot(r, z, rd)

    def cond(s: _CGState):
        return (s.j < cfg.bottom_max_iters) & (~s.done)

    def body(s: _CGState):
        ap = op.apply_op(level, s.p, cfg)
        pap = blas.dot(s.p, ap, rd)
        alpha = s.rtz / pap
        # breakdown (0/0 -> NaN alpha in f32 once converged): keep the
        # pre-update iterate, like the reference's break-before-update
        ok = (pap != 0.0) & jnp.isfinite(alpha)
        x1 = jnp.where(ok, s.x + alpha * s.p, s.x)
        r1 = jnp.where(ok, s.r - alpha * ap, s.r)
        r1 = _subtract_mean(r1, must_subtract_mean, rd)
        nr = blas.norm(r1)
        done = ~ok | (nr < target) | (nr == 0.0)
        z1 = level.dinv * r1
        rtz1 = blas.dot(r1, z1, rd)
        beta = rtz1 / s.rtz
        p1 = z1 + beta * s.p
        return _CGState(x=x1, r=r1, p=p1, rtz=rtz1, j=s.j + 1, done=done)

    init = _CGState(x=x, r=r, p=p, rtz=rtz, j=jnp.array(0, jnp.int32),
                    done=(norm_r0 == 0.0))
    out = lax.while_loop(cond, body, init)
    return out.x


def smooth_until_converged(op, level: Level, x, rhs, cfg: SolverConfig,
                           must_subtract_mean: bool = False):
    """Fallback bottom solve (solvers.c:17-88 `#else` branch): smooth until
    ||r|| <= bottom_rtol * ||r0||, capped at bottom_max_iters smooths so the
    traced while_loop always terminates."""
    from hpgmg_tpu.solve.smoothers import smooth

    rd = cfg.reduce_dtype
    r0 = op.residual(level, x, rhs, cfg)
    r0 = _subtract_mean(r0, must_subtract_mean, rd)
    target = cfg.bottom_rtol * blas.norm(r0)

    def cond(carry):
        x, norm_r, j = carry
        return (j < cfg.bottom_max_iters) & (norm_r > target)

    def body(carry):
        x, _, j = carry
        x = smooth(op, level, x, rhs, cfg)
        r = op.residual(level, x, rhs, cfg)
        r = _subtract_mean(r, must_subtract_mean, rd)
        return (x, blas.norm(r), j + 1)

    x, _, _ = lax.while_loop(
        cond, body, (x, blas.norm(r0), jnp.array(0, jnp.int32)))
    return x
