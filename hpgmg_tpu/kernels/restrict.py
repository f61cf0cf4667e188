"""Pallas cell-restriction kernel: the 8->1 average as one streaming pass.

Rebuild of ``operators/restriction.c:6-94`` (restriction_pc_block) on its
TPU cost model. The XLA path (ops/transfer.py:restrict_cell) expresses the
separable pairwise average as three dense per-axis einsums at
Precision.HIGHEST — numerically exact, but FLOP-heavy at the fine level
(the first einsum alone is 2*(n/2)*n^3 MACs at 6 bf16 passes) and it
round-trips two full-size intermediates through HBM. This kernel does the
i (leading dim) and k (lane) halvings in ONE pass over the fine array:

- i: a free leading-axis reshape + add (no relayout: the trailing
  (sublane, lane) tile is untouched),
- k: a small (n, n/2) matmul on the otherwise-idle MXU (a strided lane
  slice would be the 3 GB/s relayout death documented in CLAUDE.md),

writing an (n/2, n, n/2) intermediate (1/4 the fine size). The remaining
j (sublane) halving is the CHEAPEST of the three original einsums at 4x
smaller data and stays on the XLA/MXU path outside the kernel.

The same in-kernel halving is reused by the fused residual+restriction
mode of the fv4 stencil kernel (kernels/stencils.py, mode='fres'), which
additionally skips materializing the fine-level residual at all — the
V-cycle always computes restrict(residual(...)) back-to-back
(operators/residual.c:9-51 feeding restriction.c:104, mg.c:1135).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import hpgmg_tpu.kernels.stencils as _s

# Default ON for levels up to 128^3 after the on-chip A/B
# (docs/RESTRICT_r04.md): whole-solve fres wins ~5% at 128^3
# (3.67e8 vs 3.49e8 DOF/s, ladder_sweep) where the fine residual
# round-trip is launch/op-count bound; at >=256^3 the HBM-bound regime
# belongs to the pooled reduce_window restriction
# (ops/transfer.py:RESTRICT_POOL — pair leg 14.6 ms vs fres 15.3 ms at
# 512^3), so larger fine levels stay on residual+pool. Gates both the
# standalone kernel dispatch and the fused fv4 'fres' mode; tests and
# bench/ladder_sweep force it via the module attrs.
FUSED_RESTRICT = True
FUSED_RESTRICT_MAX_DIM = 128

_VMEM_BUDGET_RESTRICT = 48 * 2 ** 20


def restrict_matrix_k(n: int, dtype, scale: float) -> jax.Array:
    """(n, n/2) pairwise-sum matrix with entries ``scale`` (the lane-axis
    halving as an MXU matmul; rows 2c and 2c+1 feed coarse column c)."""
    m = np.zeros((n, n // 2), np.float64)
    c = np.arange(n // 2)
    m[2 * c, c] = scale
    m[2 * c + 1, c] = scale
    return jnp.asarray(m, dtype=dtype)


def restrict_halve_ik(x, rk):
    """Halve the leading (i) and lane (k) axes of a (bi, bj, n) tile value:
    plain i-pair sums (weights folded into ``rk``) + the lane matmul."""
    bi, bj, n = x.shape
    x = x.reshape(bi // 2, 2, bj, n)
    x2 = x[:, 0] + x[:, 1]
    out = jnp.dot(x2.reshape((bi // 2) * bj, n), rk,
                  precision=lax.Precision.HIGHEST,
                  preferred_element_type=x.dtype)
    return out.reshape(bi // 2, bj, n // 2)


def _restrict_kernel(x_ref, rk_ref, o_ref):
    o_ref[...] = restrict_halve_ik(x_ref[...], rk_ref[...])


def tile_shape_restrict(n: int):
    """(bi, bj) for the plain restriction grid: no halo windows, so prefer
    the largest full-lane block under the VMEM budget. bi even (the i
    halving pairs rows), bj a multiple of 8 dividing n."""
    best = None
    for bj in (128, 64, 32, 16, 8):
        if n % bj:
            continue
        for bi in (64, 32, 16, 8, 4, 2):
            if n % bi or bi % 2:
                continue
            ln = -(-n // 128) * 128
            # double-buffered in window + out + the rk operand
            vmem = 4 * (2 * bi * bj * ln + bi * bj * ln // 2 + n * n // 2)
            if vmem > _VMEM_BUDGET_RESTRICT:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def restrict_ik_pallas(x) -> jax.Array:
    """(n, n, n) -> (n/2, n, n/2): i+k halvings fused in one kernel pass
    (weights 0.25 = the i and k halves of the 1/8 cell average)."""
    n = x.shape[0]
    bi, bj = tile_shape_restrict(n)
    rk = restrict_matrix_k(n, x.dtype, 0.25)
    return pl.pallas_call(
        _restrict_kernel,
        grid=(n // bi, n // bj),
        in_specs=[
            pl.BlockSpec((bi, bj, n), lambda ti, tj: (ti, tj, 0)),
            pl.BlockSpec((n, n // 2), lambda ti, tj: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bi // 2, bj, n // 2),
                               lambda ti, tj: (ti, tj, 0)),
        out_shape=jax.ShapeDtypeStruct((n // 2, n, n // 2), x.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(x, rk)


def restrict_j_einsum(t) -> jax.Array:
    """The remaining sublane halving of the (n/2, n, n/2) intermediate:
    one MXU einsum at quarter data (weight 0.5 completes the 1/8)."""
    from hpgmg_tpu.ops.transfer import _restrict_matrix

    wj = _restrict_matrix(t.shape[1], t.dtype)
    return jnp.einsum("bj,ajk->abk", wj, t,
                      precision=lax.Precision.HIGHEST)


def use_pallas_restrict(cfg, level) -> bool:
    """Dispatch gate for the kernel restriction on ``level`` (the FINE
    level being restricted): single-chip arrays, supported size/dtype.
    BC-independent (restriction reads no ghosts)."""
    if not FUSED_RESTRICT or getattr(cfg, "kernels", "auto") == "xla":
        return False
    if getattr(level, "ksharded", False):
        return False
    n = level.dim
    if n < _s._AUTO_MIN_DIM or n % 2 or n > FUSED_RESTRICT_MAX_DIM:
        return False
    if tile_shape_restrict(n) is None:
        return False
    if _s.INTERPRET:
        return True
    if jnp.dtype(level.dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def restrict_cell_auto(t, fast: bool) -> jax.Array:
    """restrict_cell with a static fast-path switch (the caller evaluates
    ``use_pallas_restrict`` once per level at trace time)."""
    from hpgmg_tpu.ops.transfer import restrict_cell

    if fast:
        return restrict_j_einsum(restrict_ik_pallas(t))
    return restrict_cell(t)
