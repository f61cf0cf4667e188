"""Higher-order interpolations: v2, v4 (volume-averaged), p2 (cell-centered).

Rebuilds of the reference ``operators/interpolation_{v2,v4,p2}.c``. Each
driver in the reference first fills the coarse ghosts with its matching BC
(interpolation_v2.c:211-212 uses apply_BCs_v2; interpolation_v4.c:277-278
uses apply_BCs_v4; p2 pairs with apply_BCs_p2), then applies a separable
1D stencil per axis (the reference's "tensor product symmetry" fast path,
interpolation_v4.c:161-168). Mirror-symmetric child pairs:

* v2: 3-tap (1/8, 1, -1/8) — interpolation_v2.c:55-57
* p2: 3-tap (5/32, 30/32, -3/32) — interpolation_p2.c:91-93
* v4: 5-tap (-3/128, 22/128, 1, -22/128, 3/128) — interpolation_v4.c:47-56

All are registered into :mod:`hpgmg_tpu.ops.transfer`. Like the base
transfers, each interpolation (with its BC ghost synthesis folded in) is a
separable linear operator applied as three per-axis matrix einsums on the
MXU (see ops/transfer.py docstring for why the interleave formulation is
TPU-hostile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import BC
from hpgmg_tpu.ops.bc import _quadratic_fd_axis
from hpgmg_tpu.ops.bc_fv import _extend_axis_v2, _extend_axis_v4
from hpgmg_tpu.ops import transfer
from hpgmg_tpu.ops.transfer import interp_matrix, sep_apply


def _interp_axis_3tap(x: jax.Array, axis: int, w_back: float, w_c: float,
                      w_fwd: float) -> jax.Array:
    """even child of coarse cell I: w_back*c[I-1] + w_c*c[I] + w_fwd*c[I+1];
    odd child mirrored. ``x`` is ghost-padded by 1 on ``axis``."""
    lo = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 2, axis=axis)
    mid = jax.lax.slice_in_dim(x, 1, x.shape[axis] - 1, axis=axis)
    hi = jax.lax.slice_in_dim(x, 2, x.shape[axis], axis=axis)
    even = w_back * lo + w_c * mid + w_fwd * hi
    odd = w_fwd * lo + w_c * mid + w_back * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(mid.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _interp_axis_5tap(x: jax.Array, axis: int, w2: float, w1: float) -> jax.Array:
    """even child: w2*c[I-2] + w1*c[I-1] + c[I] - w1*c[I+1] - w2*c[I+2];
    odd child mirrored. ``x`` is ghost-padded by 2 on ``axis``."""
    n = x.shape[axis]
    v = [jax.lax.slice_in_dim(x, s, n - 4 + s, axis=axis) for s in range(5)]
    even = w2 * v[0] + w1 * v[1] + v[2] - w1 * v[3] - w2 * v[4]
    odd = -w2 * v[0] - w1 * v[1] + v[2] + w1 * v[3] + w2 * v[4]
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(v[2].shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _sep_interp(xc, prescale_f, xf, bc, extend, radius, tap):
    Ws = [interp_matrix(xc.shape[a], xc.dtype, bc, extend, radius, tap)
          for a in range(3)]
    up = sep_apply(*Ws, xc)
    return prescale_f * xf + up if prescale_f != 0.0 else up


def interp_v2(xc, prescale_f: float, xf, bc: BC):
    """Volume-averaged quadratic (interpolation_v2.c + apply_BCs_v2)."""
    def tap(x, axis):
        return _interp_axis_3tap(x, axis, 1.0 / 8.0, 1.0, -1.0 / 8.0)

    return _sep_interp(xc, prescale_f, xf, bc, _extend_axis_v2, 1, tap)


def interp_p2(xc, prescale_f: float, xf, bc: BC):
    """Cell-centered piecewise-quadratic (interpolation_p2.c + apply_BCs_p2)."""
    def tap(x, axis):
        return _interp_axis_3tap(x, axis, 5.0 / 32.0, 30.0 / 32.0, -3.0 / 32.0)

    return _sep_interp(xc, prescale_f, xf, bc, _quadratic_fd_axis, 1, tap)


def interp_v4(xc, prescale_f: float, xf, bc: BC):
    """Volume-averaged quartic (interpolation_v4.c + apply_BCs_v4)."""
    def tap(x, axis):
        return _interp_axis_5tap(x, axis, -3.0 / 128.0, 22.0 / 128.0)

    return _sep_interp(xc, prescale_f, xf, bc, _extend_axis_v4, 2, tap)


transfer._INTERP.setdefault("v2", interp_v2)
transfer._INTERP.setdefault("p2", interp_p2)
transfer._INTERP.setdefault("v4", interp_v4)
