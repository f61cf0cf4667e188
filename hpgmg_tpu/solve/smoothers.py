"""Smoothers: GSRB, Chebyshev, weighted Jacobi, L1-Jacobi, SymGS.

Rebuilds of the reference operators/{gsrb,chebyshev,jacobi}.c and
operators.test/{l1jacobi,symgs}.c as pure functions. The reference
ping-pongs between x and VECTOR_TEMP to avoid intra-sweep races; in
functional JAX every sweep is out-of-place by construction, so the
ping-pong is simply variable rebinding.

GSRB uses the GSRB_FP masked-update formulation (gsrb.c:78-87): branch-free
``x + mask * Dinv * (rhs - Ax)`` — the natural VPU idiom. Every sweep
refreshes ghosts (fused into apply_op).

Sweeps run under ``lax.fori_loop`` — consecutive sweeps are data-dependent
whole-array passes, so rolling the loop costs no fusion while keeping the
traced program (and compile time) small.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from hpgmg_tpu.core.config import Smoother, SolverConfig
from hpgmg_tpu.core.level import Level, rb_mask


def smooth(op, level: Level, x, rhs, cfg: SolverConfig):
    kind = cfg.smoother
    if kind == Smoother.GSRB:
        return gsrb(op, level, x, rhs, cfg)
    if kind == Smoother.CHEBYSHEV:
        return chebyshev(op, level, x, rhs, cfg)
    if kind == Smoother.JACOBI:
        return jacobi(op, level, x, rhs, cfg)
    if kind == Smoother.L1JACOBI:
        return l1_jacobi(op, level, x, rhs, cfg)
    if kind == Smoother.SYMGS:
        return symgs(op, level, x, rhs, cfg)
    raise ValueError(f"unknown smoother {kind}")


def gsrb(op, level: Level, x, rhs, cfg: SolverConfig):
    """2*num_smooths red/black half-sweeps (gsrb.c:24-132, GSRB_FP flavor).

    Sweep s updates cells with (i+j+k) % 2 == s % 2 (gsrb.c:55 with global
    coordinates, so color000 == s & 1).
    """
    fused = getattr(op, "gsrb_sweep", None)
    nsweeps = 2 * cfg.resolved_num_smooths(op)
    if fused is not None:
        out = fused(level, x, rhs, cfg, nsweeps)
        if out is not NotImplemented:
            return out

    def sweep(s, x):
        ax = op.apply_op(level, x, cfg)
        mask = rb_mask(level.dim, s, x.dtype)
        return x + mask * level.dinv * (rhs - ax)

    return lax.fori_loop(0, nsweeps, sweep, x)


def jacobi(op, level: Level, x, rhs, cfg: SolverConfig,
           weight: float = 2.0 / 3.0):
    """Weighted Jacobi, omega = 2/3 (jacobi.c:14)."""
    def sweep(_, x):
        ax = op.apply_op(level, x, cfg)
        return x + weight * level.dinv * (rhs - ax)

    return lax.fori_loop(0, cfg.resolved_num_smooths(op), sweep, x)


def l1_jacobi(op, level: Level, x, rhs, cfg: SolverConfig):
    """L1-Jacobi: unweighted Jacobi with the L1 row-sum diagonal
    (operators.test/l1jacobi.c; weights from Baker et al. eq 6.5)."""
    def sweep(_, x):
        ax = op.apply_op(level, x, cfg)
        return x + level.l1inv * (rhs - ax)

    return lax.fori_loop(0, cfg.resolved_num_smooths(op), sweep, x)


def symgs(op, level: Level, x, rhs, cfg: SolverConfig):
    """Symmetric red-black GS: forward (R,B) then backward (B,R) half-sweeps
    per smooth (operators.test/symgs.c)."""
    parities = jnp.array([0, 1, 1, 0], jnp.int32)

    def sweep(s, x):
        ax = op.apply_op(level, x, cfg)
        mask = rb_mask(level.dim, parities[s % 4], x.dtype)
        return x + mask * level.dinv * (rhs - ax)

    return lax.fori_loop(0, 4 * cfg.resolved_num_smooths(op), sweep, x)


def chebyshev(op, level: Level, x, rhs, cfg: SolverConfig):
    """Degree-d Chebyshev polynomial smoother (chebyshev.c:8-100).

    Spectral ellipse [0.125*beta, beta] with beta the Gershgorin bound on
    the dominant eigenvalue of D^{-1}A (chebyshev.c:22-28). Three-term
    recurrence x_{n+1} = x_n + c1*(x_n - x_{n-1}) + c2*Dinv*(rhs - A x_n).
    lambda_max is a traced scalar, so the c1/c2 ladder is traced arithmetic.
    """
    degree = cfg.resolved_chebyshev_degree(op)
    num = cfg.resolved_num_smooths(op)
    assert (degree * num) % 2 == 0, "CHEBYSHEV_DEGREE*NUM_SMOOTHS must be even"

    beta = 1.0 * level.lambda_max
    alpha = 0.125 * beta
    theta = 0.5 * (beta + alpha)
    delta = 0.5 * (beta - alpha)
    sigma = theta / delta
    rho = 1.0 / sigma
    c1 = [jnp.zeros_like(rho)]  # c1[0] = 0: first step has no history term
    c2 = [1.0 / theta]
    for _ in range(1, degree):
        rho_prev = rho
        rho = 1.0 / (2.0 * sigma - rho_prev)
        c1.append(rho * rho_prev)
        c2.append(rho * 2.0 / delta)
    c1 = jnp.stack(c1)
    c2 = jnp.stack(c2)

    def sweep(s, carry):
        x_prev, x = carry
        ax = op.apply_op(level, x, cfg)
        x_next = x + c1[s % degree] * (x - x_prev) \
            + c2[s % degree] * level.dinv * (rhs - ax)
        return (x, x_next)

    # c1[0] == 0, so the initial "history" value is never used
    _, x = lax.fori_loop(0, degree * num, sweep, (x, x))
    return x
