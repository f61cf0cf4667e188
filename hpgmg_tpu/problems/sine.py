"""Smooth sine manufactured problem (reference operators/problem.sine.c).

u = sin^13(2 pi x)... products at two frequencies (2pi and 6pi), the same
tanh beta as problem.p6, pointwise cell-centered initialization with
analytic U available (enables TEST_ERROR-style error checks).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hpgmg_tpu.problems.p6 import evaluate_beta


def evaluate_u_sine(x, y, z):
    """u and derivatives: sum of sin^p products at c1=2pi and c2=6pi
    (problem.sine.c:42-70), p = 13."""
    p = 13.0
    u = ux = uy = uz = uxx = uyy = uzz = 0.0
    for c in (2.0 * jnp.pi, 6.0 * jnp.pi):
        sx, sy, sz = jnp.sin(c * x), jnp.sin(c * y), jnp.sin(c * z)
        cx, cy, cz = jnp.cos(c * x), jnp.cos(c * y), jnp.cos(c * z)
        u = u + sx**p * sy**p * sz**p
        ux = ux + c * p * cx * sx**(p - 1) * sy**p * sz**p
        uy = uy + c * p * cy * sy**(p - 1) * sx**p * sz**p
        uz = uz + c * p * cz * sz**(p - 1) * sx**p * sy**p
        uxx = uxx + c * c * p * ((p - 1) * sx**(p - 2) * cx * cx - sx**p) \
            * sy**p * sz**p
        uyy = uyy + c * c * p * ((p - 1) * sy**(p - 2) * cy * cy - sy**p) \
            * sx**p * sz**p
        uzz = uzz + c * c * p * ((p - 1) * sz**(p - 2) * cz * cz - sz**p) \
            * sx**p * sy**p
    return u, ux, uy, uz, uxx, uyy, uzz


class ProblemSine(NamedTuple):
    beta_i: jax.Array
    beta_j: jax.Array
    beta_k: jax.Array
    alpha: jax.Array
    f: jax.Array
    u_true: jax.Array


def init_problem_sine(n: int, dtype=jnp.float64, a: float = 0.0,
                      b: float = 1.0, helmholtz: bool = False,
                      h: Optional[float] = None) -> ProblemSine:
    """Pointwise initialization (problem.sine.c:74-115): same anatomy as
    problem.p6 with the sine solution."""
    if h is None:
        h = 1.0 / n
    return jax.jit(_init, static_argnums=(0, 1, 2, 3, 4, 5))(
        n, jnp.dtype(dtype).name, a, b, helmholtz, h)


def _init(n, dtype, a, b, helmholtz, h):
    dtype = jnp.dtype(dtype)

    def centers(count, axis, offset=0.5):
        c = (jnp.arange(count, dtype=dtype) + offset) * h
        shape = [1, 1, 1]
        shape[axis] = count
        return c.reshape(shape)

    xc, yc, zc = centers(n, 0), centers(n, 1), centers(n, 2)
    xf = centers(n + 1, 0, 0.0)
    yf = centers(n + 1, 1, 0.0)
    zf = centers(n + 1, 2, 0.0)

    beta_i, _, _, _ = evaluate_beta(xf, yc, zc)
    beta_j, _, _, _ = evaluate_beta(xc, yf, zc)
    beta_k, _, _, _ = evaluate_beta(xc, yc, zf)
    bcc, bx, by, bz = evaluate_beta(xc, yc, zc)
    u, ux, uy, uz, uxx, uyy, uzz = evaluate_u_sine(xc, yc, zc)
    alpha = jnp.ones((n, n, n), dtype)
    au = a * alpha * u if helmholtz else 0.0
    f = au - b * ((bx * ux + by * uy + bz * uz) + bcc * (uxx + uyy + uzz))
    return ProblemSine(
        beta_i=jnp.broadcast_to(beta_i, (n + 1, n, n)).astype(dtype),
        beta_j=jnp.broadcast_to(beta_j, (n, n + 1, n)).astype(dtype),
        beta_k=jnp.broadcast_to(beta_k, (n, n, n + 1)).astype(dtype),
        alpha=alpha,
        f=jnp.broadcast_to(f, (n, n, n)).astype(dtype),
        u_true=jnp.broadcast_to(u, (n, n, n)).astype(dtype))
