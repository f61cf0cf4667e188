"""Pallas TPU kernels for the hot FV stencils.

Why: XLA fuses the 73-flop fv4 stencil into one loop but re-reads the
ghost-padded solution from HBM once per shifted use (~36x) — measured
~120 GB/s effective vs ~750 GB/s streaming on this chip. The Pallas kernel
stages each input tile in VMEM once and does all shifted reads on-chip,
which is exactly the reference's cache-blocking strategy (its OpenMP tile
loop, operators.fv4.c:33) rebuilt for the TPU memory hierarchy.

Phase-1 design:
* the solution arrives ghost-filled (the separable quartic BC pass stays
  in XLA — one cheap streaming op);
* grid tiles (BI, BJ, full-k row); halo windows via ``pl.Element`` block
  dims (overlapping reads, auto-pipelined);
* one kernel body shared by apply / residual / GSRB (mode is static);
* red-black parity masks from broadcasted iota + the tile's global offset
  (the GSRB_FP trick, gsrb.c:78-87, computed on the VPU for free).

The kernels require tile-divisible dims and an unsharded single-device
array; everything else falls back to the XLA path (use_pallas()).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level

# flip in tests to run kernels on CPU via the Pallas interpreter
INTERPRET = False

_MIN_DIM = 32  # below this the XLA path is faster (tiles would be tiny)
_MAX_DIM = 128  # VMEM budget: slabs carry full (n+4)^2 tails (see _fv4_call)


def _tile_sizes(n: int):
    """i-slab height: small enough that 4 double-buffered windows with
    (n+4)-wide lane tails fit in ~14MB of VMEM."""
    # budget: 4 double-buffered halo windows + io blocks + Mosaic's
    # stack-allocated stencil temporaries must fit 16MB VMEM (measured:
    # BI=8 at n=128 wants 22.5MB)
    for bi in (4, 2):
        if n % bi == 0 and (bi + 4) * (n + 8) * _round_lanes(n + 4) * 4 * 8 \
                <= 11 * 2 ** 20 * 2:
            return bi
    return None


def _round_lanes(k: int) -> int:
    return -(-k // 128) * 128


def use_pallas(cfg: SolverConfig, level: Level, x) -> bool:
    """Opt-in Pallas path (cfg.kernels == "pallas"): TPU backend, level in
    the supported size band, tile-divisible dim.

    Measured on this chip the phase-1 windowed kernel matches but does not
    beat XLA's fused stencil (the pl.Element halo windows re-read (BI+4)/BI
    of the solution and the ghost fill still materializes), so "auto"
    currently selects XLA; the kernel stays as the base for the phase-2
    sliding-window/BC-in-kernel design.
    """
    if getattr(cfg, "kernels", "auto") != "pallas" and not INTERPRET:
        return False
    if cfg.helmholtz:
        return False  # alpha term not in the kernel yet
    if not (_MIN_DIM <= level.dim <= _MAX_DIM) or _tile_sizes(level.dim) is None:
        return False
    if INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _fv4_kernel(xg_ref, bi_ref, bj_ref, bk_ref, rhs_ref, dinv_ref, out_ref,
                *, n, BI, mode, parity, b_h2inv):
    """Shared fv4 stencil body on VMEM i-slabs (full j/k tails).

    mode: 'apply' -> Ax; 'residual' -> rhs - Ax;
          'gsrb' -> x + mask(parity) * dinv * (rhs - Ax)
    """
    from hpgmg_tpu.ops.fv4 import stencil_ax

    def sh(di=0, dj=0, dk=0):
        return xg_ref[2 + di:2 + di + BI, 2 + dj:2 + dj + n,
                      2 + dk:2 + dk + n]

    def bi(f, dj=0, dk=0):
        return bi_ref[f:f + BI, 1 + dj:1 + dj + n, 1 + dk:1 + dk + n]

    def bj(f, di=0, dk=0):
        return bj_ref[1 + di:1 + di + BI, f:f + n, 1 + dk:1 + dk + n]

    def bk(f, di=0, dj=0):
        return bk_ref[1 + di:1 + di + BI, 1 + dj:1 + dj + n, f:f + n]

    ax = -b_h2inv * stencil_ax(sh, bi, bj, bk)

    if mode == "apply":
        out_ref[:] = ax
        return
    if mode == "residual":
        out_ref[:] = rhs_ref[:] - ax
        return

    # GSRB masked update; global parity from the slab's grid position
    # ((i+j+k+parity) & 1 == 0 updates -- gsrb.c:55 in global coordinates)
    i0 = pl.program_id(0) * BI
    ii = lax.broadcasted_iota(jnp.int32, (BI, n, n), 0) + i0
    jj = lax.broadcasted_iota(jnp.int32, (BI, n, n), 1)
    kk = lax.broadcasted_iota(jnp.int32, (BI, n, n), 2)
    mask = (((ii + jj + kk + parity) & 1) == 0).astype(out_ref.dtype)
    out_ref[:] = sh() + mask * dinv_ref[:] * (rhs_ref[:] - ax)


def _fv4_call(level: Level, xg, rhs, dinv, cfg: SolverConfig, mode: str,
              parity: int = 0):
    n = level.dim
    BI = _tile_sizes(n)
    dtype = xg.dtype
    zeros = jnp.zeros(level.shape, dtype)
    rhs = zeros if rhs is None else rhs
    dinv = zeros if dinv is None else dinv

    kernel = functools.partial(
        _fv4_kernel, n=n, BI=BI, mode=mode, parity=parity,
        b_h2inv=cfg.b * level.h2inv)

    # i-slab windows: the leading dim uses overlapping pl.Element windows
    # (halo +-2); the trailing two dims of every block equal the respective
    # array dims, satisfying the Mosaic (8,128) tiling constraint.
    out = pl.pallas_call(
        kernel,
        grid=(n // BI,),
        in_specs=[
            pl.BlockSpec((pl.Element(BI + 4), pl.Element(n + 4),
                          pl.Element(n + 4)), lambda i: (i * BI, 0, 0)),
            pl.BlockSpec((pl.Element(BI + 1), pl.Element(n + 2),
                          pl.Element(n + 2)), lambda i: (i * BI, 0, 0)),
            pl.BlockSpec((pl.Element(BI + 2), pl.Element(n + 1),
                          pl.Element(n + 2)), lambda i: (i * BI, 0, 0)),
            pl.BlockSpec((pl.Element(BI + 2), pl.Element(n + 2),
                          pl.Element(n + 1)), lambda i: (i * BI, 0, 0)),
            pl.BlockSpec((BI, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BI, n, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BI, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(level.shape, dtype),
        interpret=INTERPRET,
    )(xg, level.beta_i, level.beta_j, level.beta_k, rhs, dinv)
    return out


def fv4_apply_pallas(level: Level, x, cfg: SolverConfig):
    from hpgmg_tpu.ops.bc_fv import ghost_fill_fv

    xg = ghost_fill_fv(x, cfg.bc, order=4, radius=2)
    ax = _fv4_call(level, xg, None, None, cfg, "apply")
    if cfg.helmholtz:
        ax = cfg.a * level.alpha * x + ax
    return ax


def fv4_residual_pallas(level: Level, x, rhs, cfg: SolverConfig):
    from hpgmg_tpu.ops.bc_fv import ghost_fill_fv

    xg = ghost_fill_fv(x, cfg.bc, order=4, radius=2)
    return _fv4_call(level, xg, rhs, None, cfg, "residual")


def fv4_gsrb_sweep_pallas(level: Level, x, rhs, cfg: SolverConfig,
                          parity: int):
    """One GSRB half-sweep: ghost fill (XLA) + fused stencil/mask/update."""
    from hpgmg_tpu.ops.bc_fv import ghost_fill_fv

    xg = ghost_fill_fv(x, cfg.bc, order=4, radius=2)
    return _fv4_call(level, xg, rhs, level.dinv, cfg, "gsrb", parity)
