"""Cell-averaged benchmark problem (reference operators/problem.fv.c).

Used by the fv2/fv4 suites (the official benchmark problem):

* beta = 1 + 0.25 * sin(2 pi x) sin(2 pi y) sin(2 pi z), evaluated at face
  centers with the (h^2/24) * (tangential second derivatives) correction
  converting face-point values to face averages (problem.fv.c:9-26).
* F = sin^7(2 pi x) sin^7(2 pi y) sin^7(2 pi z) with the full
  (h^2/24) * laplacian correction converting cell-centered values to cell
  averages (problem.fv.c:29-87).

No analytic solution ships with this problem — correctness is established
by Richardson analysis across resolutions (mg.c:1113, hpgmg-fv.c:351-366).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _beta(x, y, z, h, corr_axes):
    """Face-averaged beta (problem.fv.c:9-26); corr_axes selects which
    (h^2/24)*d2B/daxis^2 corrections to add (the two tangential axes)."""
    b, a = 0.25, 2.0 * jnp.pi
    sx, sy, sz = jnp.sin(a * x), jnp.sin(a * y), jnp.sin(a * z)
    B = 1.0 + b * sx * sy * sz
    # every pure second derivative of the product is -a^2 * (the product)
    d2 = -a * a * b * sx * sy * sz
    return B + (h * h / 24.0) * d2 * len(corr_axes)


def _forcing(x, y, z, h):
    """Cell-averaged F = sin^7 products + (h^2/24) Laplacian correction
    (problem.fv.c:72-87)."""
    a, p = 2.0 * jnp.pi, 7.0
    sx, sy, sz = jnp.sin(a * x), jnp.sin(a * y), jnp.sin(a * z)
    cx, cy, cz = jnp.cos(a * x), jnp.cos(a * y), jnp.cos(a * z)
    F = sx**p * sy**p * sz**p
    base = -a * a * p * F
    fxx = base + a * a * p * (p - 1.0) * sx**(p - 2.0) * sy**p * sz**p * cx * cx
    fyy = base + a * a * p * (p - 1.0) * sx**p * sy**(p - 2.0) * sz**p * cy * cy
    fzz = base + a * a * p * (p - 1.0) * sx**p * sy**p * sz**(p - 2.0) * cz * cz
    return F + (h * h / 24.0) * (fxx + fyy + fzz)


class ProblemFV(NamedTuple):
    beta_i: jax.Array
    beta_j: jax.Array
    beta_k: jax.Array
    alpha: jax.Array
    f: jax.Array


def init_problem_fv(n: int, dtype=jnp.float64, h: Optional[float] = None,
                    periodic: bool = False) -> ProblemFV:
    """Traced into one program (see problem.fv.c:90-143 for the reference
    loop this replaces).

    ``periodic``: the USE_PERIODIC_BC variant — same beta/F fields (sin^7
    products are periodic on [0,1]^3), but any nonzero discrete mean of F
    is removed so the rhs is orthogonal to the constant null space
    (hpgmg-fv.c:296-302 shift_vector)."""
    if h is None:
        h = 1.0 / n
    return jax.jit(_init_problem_fv, static_argnums=(0, 1, 2, 3))(
        n, jnp.dtype(dtype).name, h, periodic)


def _init_problem_fv(n, dtype, h, periodic=False) -> ProblemFV:
    dtype = jnp.dtype(dtype)

    def centers(count, axis, offset=0.5):
        c = (jnp.arange(count, dtype=dtype) + offset) * h
        shape = [1, 1, 1]
        shape[axis] = count
        return c.reshape(shape)

    xc, yc, zc = centers(n, 0), centers(n, 1), centers(n, 2)
    xf, yf, zf = centers(n + 1, 0, 0.0), centers(n + 1, 1, 0.0), centers(n + 1, 2, 0.0)

    beta_i = jnp.broadcast_to(_beta(xf, yc, zc, h, (1, 2)), (n + 1, n, n))
    beta_j = jnp.broadcast_to(_beta(xc, yf, zc, h, (0, 2)), (n, n + 1, n))
    beta_k = jnp.broadcast_to(_beta(xc, yc, zf, h, (0, 1)), (n, n, n + 1))
    f = jnp.broadcast_to(_forcing(xc, yc, zc, h), (n, n, n))
    if periodic:
        f = f - jnp.mean(f)
    alpha = jnp.ones((n, n, n), dtype)
    return ProblemFV(beta_i=beta_i.astype(dtype), beta_j=beta_j.astype(dtype),
                     beta_k=beta_k.astype(dtype), alpha=alpha,
                     f=f.astype(dtype))
