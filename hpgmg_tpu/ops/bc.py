"""Ghost-zone materialization: boundary conditions + (implicit) exchange.

The reference stores ghost cells and replays precompiled blockCopy programs
to fill them — MPI exchange first (exchange_boundary.c), then boundary
stencils (boundary_fd.c / boundary_fv.c). Here a level is one global array:
"exchange" is the identity (XLA's SPMD partitioner inserts halo collectives
when the array is sharded), and BCs become functional padding.

Homogeneous Dirichlet, cell-centered linear (apply_BCs_p1,
boundary_fd.c:6-92): the ghost value mirrors the interior value with a sign
flip so the face value interpolates to zero. Applying an odd reflection
axis-by-axis reproduces the reference's fused face/edge/corner table
(faces -1, edges +1, corners -1 — boundary_fd.c:27-29) because each
boundary-crossing axis contributes one factor of -1.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from hpgmg_tpu.core.config import BC


def _reflect_odd_axis(x, axis: int, radius: int):
    """Pad one axis with cell-centered odd reflection: ghost_{-1-m} = -x_m."""
    n = x.shape[axis]
    lo = -jnp.flip(lax.slice_in_dim(x, 0, radius, axis=axis), axis=axis)
    hi = -jnp.flip(lax.slice_in_dim(x, n - radius, n, axis=axis), axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _wrap_axis(x, axis: int, radius: int):
    n = x.shape[axis]
    lo = lax.slice_in_dim(x, n - radius, n, axis=axis)
    hi = lax.slice_in_dim(x, 0, radius, axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def ghost_fill_linear(x, bc: BC, radius: int = 1):
    """Fill ``radius`` ghost layers around a cell-centered field.

    Equivalent to exchange_boundary + apply_BCs_p1 in the reference.
    Returns an array padded by ``radius`` on every side.
    """
    pad = _wrap_axis if bc == BC.PERIODIC else _reflect_odd_axis
    for axis in range(3):
        x = pad(x, axis, radius)
    return x


def ghost_fill_periodic(x, radius: int = 1):
    for axis in range(3):
        x = _wrap_axis(x, axis, radius)
    return x


def _quadratic_fd_axis(x, axis: int, radius: int):
    """apply_BCs_p2 1D stencil: ghost = -2*x1 + (1/3)*x2
    (boundary_fd.c:130-143); deeper ghosts zeroed."""
    n = x.shape[axis]
    x1_lo = lax.slice_in_dim(x, 0, 1, axis=axis)
    x2_lo = lax.slice_in_dim(x, 1, 2, axis=axis)
    x1_hi = lax.slice_in_dim(x, n - 1, n, axis=axis)
    x2_hi = lax.slice_in_dim(x, n - 2, n - 1, axis=axis)
    g_lo = -2.0 * x1_lo + (1.0 / 3.0) * x2_lo
    g_hi = -2.0 * x1_hi + (1.0 / 3.0) * x2_hi
    zero = jnp.zeros_like(g_lo)
    lo = [zero] * (radius - 1) + [g_lo]
    hi = [g_hi] + [zero] * (radius - 1)
    return jnp.concatenate(lo + [x] + hi, axis=axis)


def ghost_fill_quadratic_fd(x, bc: BC, radius: int = 1):
    """Cell-centered quadratic Dirichlet ghosts (apply_BCs_p2,
    boundary_fd.c:93+). Edge/corner values arise as the tensor product of
    the 1D stencil via sequential per-axis application (matching the
    reference's 4pt/8pt edge/corner tables at boundary_fd.c:144-199)."""
    if bc == BC.PERIODIC:
        return ghost_fill_periodic(x, radius)
    if min(x.shape) < 2:
        return ghost_fill_linear(x, bc, radius)
    for axis in range(3):
        x = _quadratic_fd_axis(x, axis, radius)
    return x
