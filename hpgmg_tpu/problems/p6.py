"""Pointwise manufactured problem with an analytic solution.

Rebuild of the reference ``operators/problem.p6.c`` (used by the 7pt suite):

* u(x,y,z) = X(x) Y(y) Z(z) with X(w) = 2w^6 - 6w^5 + 5w^4 - w^2 (+1/21 for
  periodic so integrals vanish) — continuous through u'''' so both
  Dirichlet and periodic BCs are exactly satisfied (problem.p6.c:39-75).
* beta(x,y,z) = c1 + c2*tanh(c3*(r - 0.25)), a sharp spherical transition
  from 1 to 10 about the domain center (problem.p6.c:6-35).
* f = a*alpha*u - b*(grad beta . grad u + beta*laplacian(u)) evaluated
  pointwise at cell centers (problem.p6.c:119-121); 2nd-order consistent
  with the 7pt discretization.

Everything is evaluated on the fly with broadcast meshgrids — the analytic
setup is embarrassingly parallel and shards trivially.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _poly_u(w):
    """X(w), X'(w), X''(w) for the degree-6 polynomial (problem.p6.c:58-67)."""
    u = 2.0 * w**6 - 6.0 * w**5 + 5.0 * w**4 - w**2
    du = 12.0 * w**5 - 30.0 * w**4 + 20.0 * w**3 - 2.0 * w
    ddu = 60.0 * w**4 - 120.0 * w**3 + 60.0 * w**2 - 2.0
    return u, du, ddu


def evaluate_u(x, y, z, periodic: bool):
    """u and its first/second partials (problem.p6.c:39-75)."""
    shift = 1.0 / 21.0 if periodic else 0.0
    X, Xx, Xxx = _poly_u(x)
    Y, Yy, Yyy = _poly_u(y)
    Z, Zz, Zzz = _poly_u(z)
    X, Y, Z = X + shift, Y + shift, Z + shift
    u = X * Y * Z
    ux, uy, uz = Xx * Y * Z, X * Yy * Z, X * Y * Zz
    uxx, uyy, uzz = Xxx * Y * Z, X * Yyy * Z, X * Y * Zzz
    return u, ux, uy, uz, uxx, uyy, uzz


def evaluate_beta(x, y, z):
    """beta and its gradient (problem.p6.c:6-35)."""
    bmin, bmax, c3 = 1.0, 10.0, 10.0
    c2 = (bmax - bmin) / 2.0
    c1 = (bmax + bmin) / 2.0
    dx, dy, dz = x - 0.5, y - 0.5, z - 0.5
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    t = jnp.tanh(c3 * (r - 0.25))
    b = c1 + c2 * t
    # d/dx tanh(c3 (r - 1/4)) = c3 (1 - t^2) * x/r
    sech2 = 1.0 - t * t
    inv_r = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-300), 0.0)
    bx = c2 * c3 * dx * inv_r * sech2
    by = c2 * c3 * dy * inv_r * sech2
    bz = c2 * c3 * dz * inv_r * sech2
    return b, bx, by, bz


def _centers(n: int, h: float, dtype, nface: bool, axis: int):
    """1D coordinate rows: cell centers h*(i+0.5), i in 0..n-1 (or 0..n for
    the face-including row)."""
    count = n + 1 if nface else n
    c = (jnp.arange(count, dtype=dtype) + 0.5) * h
    shape = [1, 1, 1]
    shape[axis] = count
    return c.reshape(shape)


class ProblemP6(NamedTuple):
    beta_i: jax.Array  # (n+1, n, n)
    beta_j: jax.Array
    beta_k: jax.Array
    alpha: jax.Array  # (n, n, n)
    f: jax.Array  # (n, n, n) rhs
    u_true: jax.Array  # (n, n, n) analytic solution at cell centers


def init_problem_p6(n: int, dtype=jnp.float64, periodic: bool = False,
                    a: float = 1.0, b: float = 1.0, helmholtz: bool = False,
                    h: Optional[float] = None) -> ProblemP6:
    """Initialize coefficients, rhs and the analytic solution at resolution n.

    Matches initialize_problem (problem.p6.c:79-135): beta_i is evaluated at
    (x - h/2, y, z) etc., i.e. at face centers. Traced into one program
    (eager execution dispatches dozens of tiny kernels).
    """
    return _init_pointwise(evaluate_u, n, dtype, periodic, a, b, helmholtz,
                           1.0 / n if h is None else h)


def _init_pointwise(eval_u, n, dtype, periodic, a, b, helmholtz,
                    h) -> ProblemP6:
    """Shared pointwise initializer: ``eval_u`` supplies the manufactured
    solution (p6 degree-6, p4 quartic — problems/p4.py); beta and the
    face/cell evaluation protocol are common to both reference problems."""
    return jax.jit(_init_problem_pw,
                   static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
        eval_u, n, jnp.dtype(dtype).name, periodic, a, b, helmholtz, h)


def _init_problem_pw(eval_u, n, dtype, periodic, a, b, helmholtz,
                     h) -> ProblemP6:
    dtype = jnp.dtype(dtype)
    xc = _centers(n, h, dtype, False, 0)
    yc = _centers(n, h, dtype, False, 1)
    zc = _centers(n, h, dtype, False, 2)
    xf = _centers(n, h, dtype, True, 0) - 0.5 * h  # i-face x-coords: h*i
    yf = _centers(n, h, dtype, True, 1) - 0.5 * h
    zf = _centers(n, h, dtype, True, 2) - 0.5 * h

    beta_i, _, _, _ = evaluate_beta(
        jnp.broadcast_to(xf, (n + 1, 1, 1)), yc, zc)
    beta_i = jnp.broadcast_to(beta_i, (n + 1, n, n))
    beta_j, _, _, _ = evaluate_beta(xc, yf, zc)
    beta_j = jnp.broadcast_to(beta_j, (n, n + 1, n))
    beta_k, _, _, _ = evaluate_beta(xc, yc, zf)
    beta_k = jnp.broadcast_to(beta_k, (n, n, n + 1))

    bcc, bx, by, bz = evaluate_beta(xc, yc, zc)
    u, ux, uy, uz, uxx, uyy, uzz = eval_u(xc, yc, zc, periodic)
    alpha = jnp.ones((n, n, n), dtype)
    au = a * alpha * u if helmholtz else jnp.zeros((n, n, n), dtype)
    f = au - b * ((bx * ux + by * uy + bz * uz) + bcc * (uxx + uyy + uzz))
    f = jnp.broadcast_to(f, (n, n, n)).astype(dtype)
    u_true = jnp.broadcast_to(u, (n, n, n)).astype(dtype)
    return ProblemP6(beta_i=beta_i.astype(dtype), beta_j=beta_j.astype(dtype),
                     beta_k=beta_k.astype(dtype), alpha=alpha, f=f,
                     u_true=u_true)
