"""Pointwise manufactured problem with a quartic analytic solution.

Rebuild of the reference ``operators/problem.p4.c``:

* u(x,y,z) = X(x) Y(y) Z(z) with X(w) = w^4 - 2w^3 + w^2 (-1/30 shift for
  periodic so integrals vanish) — continuous through u'' so Dirichlet and
  periodic BCs are satisfied (problem.p4.c:39-75).
* beta identical to problem.p6 (same evaluateBeta body, problem.p4.c:6-35).
* f = a*alpha*u - b*(grad beta . grad u + beta*laplacian(u)) evaluated
  pointwise at cell centers (problem.p4.c:112-114); 4th-order-accurate
  pointwise initialization — the reference pairs it with TEST_ERROR runs.

The grid/face evaluation protocol is shared with problems/p6.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from hpgmg_tpu.problems.p6 import ProblemP6, _init_pointwise


def _poly_u4(w):
    """X(w), X'(w), X''(w) for the degree-4 polynomial (problem.p4.c:48-58)."""
    u = w**4 - 2.0 * w**3 + w**2
    du = 4.0 * w**3 - 6.0 * w**2 + 2.0 * w
    ddu = 12.0 * w**2 - 12.0 * w + 2.0
    return u, du, ddu


def evaluate_u(x, y, z, periodic: bool):
    """u and its first/second partials (problem.p4.c:39-66)."""
    shift = -1.0 / 30.0 if periodic else 0.0
    X, Xx, Xxx = _poly_u4(x)
    Y, Yy, Yyy = _poly_u4(y)
    Z, Zz, Zzz = _poly_u4(z)
    X, Y, Z = X + shift, Y + shift, Z + shift
    u = X * Y * Z
    ux, uy, uz = Xx * Y * Z, X * Yy * Z, X * Y * Zz
    uxx, uyy, uzz = Xxx * Y * Z, X * Yyy * Z, X * Y * Zzz
    return u, ux, uy, uz, uxx, uyy, uzz


def init_problem_p4(n: int, dtype=jnp.float64, periodic: bool = False,
                    a: float = 1.0, b: float = 1.0, helmholtz: bool = False,
                    h: Optional[float] = None) -> ProblemP6:
    """Initialize coefficients, rhs and the analytic solution at resolution
    n (initialize_problem, problem.p4.c:69-135 — identical protocol to p6
    with the quartic u)."""
    return _init_pointwise(evaluate_u, n, dtype, periodic, a, b, helmholtz,
                           1.0 / n if h is None else h)
