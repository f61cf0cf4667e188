"""Inter-level transfer kernels: restriction and interpolation.

Rebuild of the reference ``operators/restriction.c`` and
``operators/interpolation_*.c``. The reference drives each transfer through
a precompiled pack/local/unpack MPI program (mg.c:38-841); here levels are
global arrays so every transfer is a pure linear operator — XLA handles any
cross-device movement when the fine and coarse levels have different
shardings (the box-agglomeration analog, SURVEY.md §7.6).

**TPU representation.** Every transfer (including its boundary-condition
ghost synthesis, which is linear in the interior values) is a separable
tensor product of 1D linear operators, so each one is applied as THREE
einsums with per-axis weight matrices — batched matmuls that run on the
MXU. The naive interleave/reshape formulation runs at ~3 GB/s on TPU (the
2-way interleave on the lane axis forces pathological relayouts); the
matrix form runs at matmul speed. The matrices are built at trace time by
applying the *same* 1D extender+tap helpers to an identity, so the
operator is exactly the reference's stencil (+BC) by construction.

All interpolators take ``prescale_f``: fine = prescale_f * fine + P(coarse),
so the same kernel overwrites (F-cycle, prescale 0) or accumulates
(V-cycle correction, prescale 1) exactly like the reference
(interpolation_p1.c:54-56).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax import lax

from hpgmg_tpu.core.config import BC
from hpgmg_tpu.ops.bc import _reflect_odd_axis, _wrap_axis

# f32 einsum on the MXU defaults to bf16 passes; transfers feed residual
# ladders so keep full f32/f64 accuracy.
_PRECISION = lax.Precision.HIGHEST


def sep_apply(Wi: jax.Array, Wj: jax.Array, Wk: jax.Array,
              x: jax.Array) -> jax.Array:
    """Apply the separable operator Wi (x) Wj (x) Wk to a 3D field as three
    MXU einsums."""
    x = jnp.einsum("ai,ijk->ajk", Wi, x, precision=_PRECISION)
    x = jnp.einsum("bj,ajk->abk", Wj, x, precision=_PRECISION)
    return jnp.einsum("ck,abk->abc", Wk, x, precision=_PRECISION)


# ---------------------------------------------------------------------------
# restriction (restriction.c:6-94)
# ---------------------------------------------------------------------------

RESTRICT_CELL = "cell"
RESTRICT_FACE_I = "face_i"
RESTRICT_FACE_J = "face_j"
RESTRICT_FACE_K = "face_k"


def _restrict_matrix(m2: int, dtype) -> jax.Array:
    """(m2/2, m2) pairwise-average matrix: one axis of the 8->1 cell
    average."""
    return 0.5 * jnp.repeat(jnp.eye(m2 // 2, dtype=dtype), 2, axis=1)


# TPU pooling-emitter restriction: lax.reduce_window(2,2,2 stride 2) beats
# the three-einsum form at >=256^3 on-chip (0.77x at 256, 0.72x at 512;
# the einsum wins at 128 — docs/RESTRICT_r04.md) because the pooled form
# streams the fine array ONCE with no (n/2,n,n) HBM intermediates. Window
# == stride, so GSPMD needs no halo under sharding. The flag exists for
# the A/B tool (bench/restrict_sweep.py) and parity tests.
RESTRICT_POOL = True
RESTRICT_POOL_MIN_DIM = 256


def _use_pool_restrict(xf: jax.Array) -> bool:
    if not RESTRICT_POOL:
        return False
    if min(xf.shape) < RESTRICT_POOL_MIN_DIM or any(s % 2 for s in xf.shape):
        return False
    if jnp.dtype(xf.dtype).itemsize > 4:
        return False  # keep f64 verification runs on the proven einsums
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probe failure
        return False


def restrict_pool(xf: jax.Array) -> jax.Array:
    """restrict_cell as one 2x2x2 stride-2 mean via reduce_window."""
    s = lax.reduce_window(xf, jnp.zeros((), xf.dtype), lax.add,
                          (2, 2, 2), (2, 2, 2), "VALID")
    return s * jnp.asarray(0.125, xf.dtype)


def restrict_cell(xf: jax.Array) -> jax.Array:
    """Piecewise-constant 8->1 cell average (restriction_pc_block, x0.125)."""
    if _use_pool_restrict(xf):
        return restrict_pool(xf)
    Ws = [_restrict_matrix(xf.shape[a], xf.dtype) for a in range(3)]
    return sep_apply(*Ws, xf)


def _restrict_face(bf: jax.Array, axis: int) -> jax.Array:
    """Face-centered 4->1 average (x0.25): coarse face (I,J,K) averages the
    four fine faces lying on the same plane (even index along ``axis``)."""
    # bring `axis` to the front, average the two transverse axes pairwise
    b = jnp.moveaxis(bf, axis, 0)
    nfaces = b.shape[0]  # 2m+1 fine faces -> m+1 coarse
    m1, m2 = b.shape[1] // 2, b.shape[2] // 2
    b = b[::2].reshape(nfaces // 2 + 1, m1, 2, m2, 2).mean(axis=(2, 4))
    return jnp.moveaxis(b, 0, axis)


def restrict_face_i(bf):
    return _restrict_face(bf, 0)


def restrict_face_j(bf):
    return _restrict_face(bf, 1)


def restrict_face_k(bf):
    return _restrict_face(bf, 2)


# ---------------------------------------------------------------------------
# interpolation (interpolation_p0.c / interpolation_p1.c / _v2 / _v4)
# ---------------------------------------------------------------------------

def _interp_axis_2tap(x: jax.Array, axis: int, w_c: float, w_n: float) -> jax.Array:
    """Separable 1D upsample: even child = w_c*c[I] + w_n*c[I-1],
    odd child = w_c*c[I] + w_n*c[I+1]. ``x`` is ghost-padded by 1 on ``axis``."""
    lo = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 2, axis=axis)
    mid = jax.lax.slice_in_dim(x, 1, x.shape[axis] - 1, axis=axis)
    hi = jax.lax.slice_in_dim(x, 2, x.shape[axis], axis=axis)
    even = w_c * mid + w_n * lo
    odd = w_c * mid + w_n * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(mid.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def interp_matrix(m: int, dtype, bc: BC, extend, radius: int,
                  tap) -> jax.Array:
    """(2m, m) one-axis interpolation matrix: columns are the responses of
    extend-then-tap to the coarse basis vectors. ``extend(x, axis, radius)``
    synthesizes the BC ghosts (or ``_wrap_axis`` for periodic); ``tap``
    applies the child stencil along axis 0."""
    eye = jnp.eye(m, dtype=dtype)
    ext = _wrap_axis if bc == BC.PERIODIC else extend
    return tap(ext(eye, 0, radius), 0)


def interp_p0(xc: jax.Array, prescale_f: float, xf: jax.Array, bc: BC) -> jax.Array:
    """Piecewise-constant injection: every fine cell copies its coarse parent."""
    Ws = [jnp.repeat(jnp.eye(xc.shape[a], dtype=xc.dtype), 2, axis=0)
          for a in range(3)]
    up = sep_apply(*Ws, xc)
    return prescale_f * xf + up if prescale_f != 0.0 else up


def interp_p1(xc: jax.Array, prescale_f: float, xf: jax.Array, bc: BC) -> jax.Array:
    """Trilinear interpolation (interpolation_p1.c:42-62).

    The reference's 8-point weights {27,9,3,1}/64 are the tensor product of
    the 1D pair (3/4, 1/4) where even children look backward and odd
    children look forward (+ apply_BCs_p1 odd reflection at the boundary,
    interpolation_p1.c:71-72) — a separable operator, applied as three MXU
    matmuls.
    """
    def tap(x, axis):
        return _interp_axis_2tap(x, axis, 0.75, 0.25)

    Ws = [interp_matrix(xc.shape[a], xc.dtype, bc, _reflect_odd_axis, 1, tap)
          for a in range(3)]
    up = sep_apply(*Ws, xc)
    return prescale_f * xf + up if prescale_f != 0.0 else up


_INTERP: Dict[str, Callable] = {
    "p0": interp_p0,
    "p1": interp_p1,
}


def get_interpolation(name: str) -> Callable:
    from hpgmg_tpu.ops import transfer_fv  # registers v2/v4/p2 variants

    if name not in _INTERP:
        raise ValueError(f"unknown interpolation {name!r}; have {sorted(_INTERP)}")
    return _INTERP[name]
