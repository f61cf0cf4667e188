"""Pallas TPU kernels for the radius-1 operator suites (fv7pt, fv2, 27pt).

The three 2nd-order suites share one radius-1 stencil shape: a 7-point
variable-coefficient flux stencil (operators.7pt.c:52-76 = operators.fv2.c
:55-92 — same stencil, different BCs/rebuild) or the dense 27-point
constant-coefficient Mehrstellen stencil (operators.27pt.c:48-92). Their
XLA paths materialize a (n+2)^3 ghost-extended solution per application
(ops/bc.py / ops/bc_fv.py), which costs a full extra read+write of the
solution plus lane padding (n+2 lanes round up to the next multiple of
128: 2x wasted bytes at 128^3, 1.25x at 512^3).

This file is the radius-1 analog of the fv4 kernel family
(kernels/stencils.py, phase-3 design) and reuses its proven machinery:

* 2D (i, j) tile grid; k (lanes) spans the level.
* **Masked in-kernel ghost synthesis** (measured faster than pre-extended
  operands at every size for fv4 — docs/MXU_JDIFF.md): the Dirichlet
  ghost is a 2-tap function of the rows nearest the face, with per-suite
  taps ``g = t1*x1 + t2*x2``:
    - fv7pt: linear odd reflection  t = (-1, 0)       (boundary_fd.c:6-92)
    - fv2:   quadratic volume-avg   t = (-5/2, 1/2)   (boundary_fv.c:101)
    - 27pt:  quadratic cell-center  t = (-2, 1/3)     (boundary_fd.c:130)
  applied separably i -> j -> k exactly like the XLA ghost fills (the
  tensor-product edge/corner values the 27pt stencil reads arise from the
  sequential per-axis application).
* **Lane-aligned coefficient views** for the variable-beta suites: the
  radius-1 flux needs NO tangential coefficient ghosts (every face it
  reads is in-domain), so ``kbi`` is beta_i as-is (n+1, n, n), ``kbj``
  pads the j (sublane) face axis n+1 -> n+8 so fixed 8-aligned windows
  cover it, and the k faces split into low-face cube + top plane
  (``kbk``/``kbk_top``) to keep the lane dim exactly n.
* **GSRB_FP parity pre-folding**: the red/black mask rides in which
  ``kdinv`` field is passed (gsrb.c:78-87 done at MGBuild time).

Two input modes, mirroring the fv4 family:

* **masked** (default, Dirichlet single-chip): clamped halo windows +
  in-kernel ghost synthesis with first/last-tile masks.
* **ext** (``r1_call_ext``): the i/j ghosts arrive PRE-filled in the
  array itself — a (ni+2, nj+16, nk) layout with the live extended j
  rows at fixed offset [7, nj+9) — so no masks are needed. Serves (a)
  the distributed path (parallel/shard_kernels.py: radius-1 ppermute
  halos + BC fills under shard_map, exchange_boundary.c:12-117 composed
  with the radius-1 smoothers) and (b) single-chip periodic BCs (wrap
  ghosts live on the opposite domain face, outside any masked window;
  XLA materializes the wrap once, the k-axis wraps in-kernel).

Unsupported here (XLA fallback): dims not tileable below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.kernels import stencils as _s
from hpgmg_tpu.kernels.stencils import _lane_shift

# 27pt weights (operators.27pt.c:48-92)
_C0 = -128.0 / 30.0
_C1 = 14.0 / 30.0
_C2 = 3.0 / 30.0
_C3 = 1.0 / 30.0


def _vmem_bytes_r1(n: int, bi: int, bj: int, var7: bool) -> int:
    """Rough f32 VMEM footprint of one (bi, bj) tile (see stencils.py)."""
    ln = -(-n // 128) * 128
    win = (bi + 2) * (bj + 16) * ln + 3 * bi * bj * ln
    if var7:
        win += (bi + 1) * bj * ln + bi * (bj + 8) * ln + bi * bj * ln
    tmp = 6 * (bi + 2) * (bj + 2) * ln
    return 4 * (2 * win + tmp)


def tile_shape_r1(n: int, var7: bool = True):
    """(bi, bj) for the radius-1 2D tile grid. Same constraints as the fv4
    ``tile_shape``: bj a multiple of 8 dividing n with >= 2 tiles and an
    n >= bj+16 window; bi any divisor with >= 2 tiles; prefer the largest
    tile under the VMEM budget, ties toward wider bj (measured faster)."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if n % bj or n // bj < 2 or n < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if n % bi or n // bi < 2:
                continue
            if _vmem_bytes_r1(n, bi, bj, var7) > _s._VMEM_BUDGET:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def tile_shape_r1_local(ni: int, nj: int, nk: int, var7: bool = True):
    """(bi, bj) for a PER-SHARD (ni, nj, nk) block in ext mode: no
    >= 2-tile minimum or bj+16 window bound (the first/last-tile masks
    are gone — ghosts are pre-filled), only divisibility + the sublane
    multiple-of-8 rule + the VMEM budget."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if bj > nj or nj % bj:
            continue
        for bi in (64, 32, 16, 8, 4):
            if bi > ni or ni % bi:
                continue
            if _vmem_bytes_r1(nk, bi, bj, var7) > _s._VMEM_BUDGET:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def tile_shape_slab_r1(ni: int, nj: int, nk: int, var7: bool = True):
    """(bi, bj) for the slab-operand radius-1 kernel on a local
    (ni, nj, nk) block (the distributed fast path): masked-style clamped
    windows need >= 2 tiles per axis (distinct first/last blend cases)
    and nj >= bj+16 / ni >= bi+2 so the clamped window fits; VMEM like
    the masked kernel (slabs are thin)."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if nj % bj or nj // bj < 2 or nj < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if ni % bi or ni // bi < 2 or ni < bi + 2:
                continue
            if _vmem_bytes_r1(nk, bi, bj, var7) > _s._VMEM_BUDGET:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


# Fused red+black double-sweep kernel (one launch + one operand stream
# per FULL GSRB sweep instead of two): the red update is computed on a
# +1 ring in-kernel, its Dirichlet ghosts re-synthesized, and the black
# update consumes it from VMEM. The radius-1 kernels are partially
# HBM-bound (unlike fv4's VPU-bound hot loop, docs/GSRB_VPU.md), so
# halving the beta/rhs/dinv streams is the lever; the VPU cost grows
# only by the ring area (~(bi+2)(bj+2)/(bi*bj)) because all operand
# halos are baked into pre-padded build-time views (Level.k2) — no
# alignment blends. A/B-able via bench/kernel_sweep.py --gsrb2.
# On-hardware A/B (2026-08-18, TPU v5 lite; docs/GSRB2_r03.md): wins
# for the HBM-leaning variable-coefficient suites (fv7pt 0.93x@128
# 0.80x@256 vs masked half-sweeps; fv2 1.01x@128 0.82x@256) but LOSES
# for the op-count-bound constant-coefficient 27pt (1.07x@128
# 1.03x@256) — hence default ON for var7 only; whole-solve parity on
# the chip is exact (bench/ab_test.py: rel_res identical to XLA).
GSRB2 = True
# the 27pt kernel is VPU-op-bound (docs/GSRB_VPU.md): the double
# sweep's ring recompute costs more than its stream cut saves there
GSRB2_VAR7_ONLY = True
# build-time capacity guard: the k2 views add ~3.4 n^3 f32 fields for
# the var7 suites (1 for 27pt)
GSRB2_MAX_DIM = 512


def _vmem_bytes_gsrb2(n: int, bi: int, bj: int, var7: bool) -> int:
    """Rough f32 VMEM footprint of one gsrb2 (bi, bj) tile."""
    ln = -(-n // 128) * 128
    win = (bi + 4) * (bj + 16) * ln + 2 * bi * bj * ln
    win += (2 + (4 if var7 else 0)) * (bi + 3) * (bj + 16) * ln
    tmp = 10 * (bi + 4) * (bj + 4) * ln
    return 4 * (2 * win + tmp)


def tile_shape_gsrb2(n: int, var7: bool = True):
    """(bi, bj) for the fused double-sweep kernel: masked-window
    constraints (>= 2 tiles, n >= bj+16 / bi+4) under its own VMEM
    model (more resident operands than the half-sweep kernel)."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if n % bj or n // bj < 2 or n < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if n % bi or n // bi < 2 or n < bi + 4:
                continue
            if _vmem_bytes_gsrb2(n, bi, bj, var7) > _s._VMEM_BUDGET:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def gsrb2_eligible(cfg: SolverConfig, dim: int, var7: bool) -> bool:
    """Build-time gate for attaching the k2 views (masked Dirichlet
    single-chip only: a periodic double sweep would need the OPPOSITE
    domain face's red iterate for the wrap ghost — it lives in another
    tile, so the fusion cannot be local; periodic GSRB keeps
    per-half-sweep exchanges)."""
    return (GSRB2 and dim <= GSRB2_MAX_DIM and cfg.bc == BC.DIRICHLET
            and (var7 or not GSRB2_VAR7_ONLY)
            and r1_views_eligible(cfg, dim, var7)
            and tile_shape_gsrb2(dim, var7) is not None)


def tile_shape_slab2_r1(ni: int, nj: int, nk: int, var7: bool = True):
    """(bi, bj) for the DISTRIBUTED double-sweep kernel on a local
    (ni, nj, nk) block (slab2: 2-deep halo slabs + masked radius-2
    windows): >= 2 tiles per axis, ni >= bi+4 / nj >= bj+16 window
    bounds, gsrb2 VMEM model."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if nj % bj or nj // bj < 2 or nj < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if ni % bi or ni // bi < 2 or ni < bi + 4:
                continue
            if _vmem_bytes_gsrb2(nk, bi, bj, var7) > _s._VMEM_BUDGET:
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def use_pallas_r1(cfg: SolverConfig, level: Level) -> bool:
    """Select the radius-1 Pallas path: kernel views attached by the
    suite's rebuild_operator (``level.kernel_suite`` set), Dirichlet
    (masked mode) or periodic (ext mode), supported size, TPU backend
    (or interpreter in tests)."""
    if getattr(cfg, "kernels", "auto") == "xla":
        return False
    if cfg.bc not in (BC.DIRICHLET, BC.PERIODIC):
        return False
    suite = getattr(level, "kernel_suite", None)
    if suite not in ("var7", "27pt"):
        return False
    if getattr(level, "ksharded", False):
        return False
    if cfg.helmholtz and suite == "var7" and level.alpha is None:
        return False
    if level.dim < _s._MIN_DIM:
        return False
    n, var7 = level.dim, suite == "var7"
    ts = (tile_shape_r1_local(n, n, n, var7) if cfg.bc == BC.PERIODIC
          else tile_shape_r1(n, var7))
    if ts is None:
        return False
    if (getattr(cfg, "kernels", "auto") != "pallas"
            and level.dim < _s._AUTO_MIN_DIM):
        return False
    if _s.INTERPRET:
        return True  # the interpreter handles 64-bit (CPU parity tests)
    if jnp.dtype(level.dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types (f64 verification runs)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def r1_views_eligible(cfg: SolverConfig, dim: int, var7: bool) -> bool:
    """Build-time gate for attaching radius-1 kernel views."""
    if cfg.kernels == "xla" or dim < _s._MIN_DIM:
        return False
    if cfg.bc == BC.PERIODIC:
        return tile_shape_r1_local(dim, dim, dim, var7) is not None
    return (cfg.bc == BC.DIRICHLET
            and tile_shape_r1(dim, var7) is not None)


def r1_beta_views(beta_i, beta_j, beta_k):
    """Kernel-layout views of the UNEXTENDED face coefficients (the
    radius-1 flux reads no out-of-domain faces):

    kbi (n+1, n, n): natural layout (i is the unconstrained leading axis)
    kbj (n, n+8, n): j face axis padded n+1 -> n+8 so the (bj+8)-row
        window at 8-aligned offset tj*bj stays in bounds on the last tile
    kbk (n, n, n) + kbk_top (n, n, 1): low k-faces + top plane (a lane dim
        of n+1 would pad ~2x; high face of cell k = low face of cell k+1,
        one in-kernel lane shift)
    """
    n = beta_i.shape[1]
    kbj = jnp.pad(beta_j, ((0, 0), (0, 7), (0, 0)))
    kbk = beta_k[:, :, :-1]
    kbk_top = beta_k[:, :, -1:]
    assert kbj.shape == (n, n + 8, n)
    return beta_i, kbj, kbk, kbk_top


# ---------------------------------------------------------------------------
# in-kernel radius-1 boundary extension
# ---------------------------------------------------------------------------

def _ghost_row(w, axis: int, lo: bool, taps):
    t1, t2 = taps
    m = w.shape[axis]
    i1, i2 = (0, 1) if lo else (m - 1, m - 2)
    g = t1 * lax.slice_in_dim(w, i1, i1 + 1, axis=axis)
    if t2:
        g = g + t2 * lax.slice_in_dim(w, i2, i2 + 1, axis=axis)
    return g


def _ext_tile_axis_r1(w, b: int, t, nt: int, axis: int, pad: int, taps):
    """Radius-1 analog of stencils._ext_tile_axis: turn a clamped halo
    window (b + 2*pad rows along ``axis``) into the boundary-extended tile
    (b + 2 rows). Interior tiles slice out the +-1 halo; first/last tiles
    synthesize the domain-edge ghost with the 2-tap Dirichlet formula.
    Candidates combine with exact 0/1 scalar masks (Mosaic cannot legalize
    the scalar-predicate vector selects a lax.switch lowers to)."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    first = jnp.concatenate([_ghost_row(w, axis, True, taps),
                             sl(0, b + 1)], axis)
    m = b + 2 * pad
    last = jnp.concatenate([sl(m - (b + 1), m),
                            _ghost_row(w, axis, False, taps)], axis)
    mid = sl(pad - 1, pad + b + 1)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _slab_tile_axis_r1(w, glo, ghi, b: int, t, nt: int, axis: int,
                       pad: int):
    """``_ext_tile_axis_r1`` with the 1-deep edge ghosts arriving as slab
    OPERANDS (neighbor halos or precomputed BC fills — the distributed
    slab path, stencils._slab_tile_axis analog) instead of being
    synthesized from the window. ``glo``/``ghi`` are 1 row along
    ``axis``, window-aligned on the other dims."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    first = jnp.concatenate([glo, sl(0, b + 1)], axis)
    m = b + 2 * pad
    last = jnp.concatenate([sl(m - (b + 1), m), ghi], axis)
    mid = sl(pad - 1, pad + b + 1)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _lane_ghosts(xe, taps):
    """1-column k (lane) Dirichlet ghosts of an extended tile; the k axis
    spans the level so every tile holds both domain faces."""
    t1, t2 = taps
    n = xe.shape[-1]
    glo = t1 * xe[..., 0:1]
    ghi = t1 * xe[..., n - 1:n]
    if t2:
        glo = glo + t2 * xe[..., 1:2]
        ghi = ghi + t2 * xe[..., n - 2:n - 1]
    return glo, ghi


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _r1_kernel(*refs, n, bi, bj, nti, ntj, mode, suite, taps, b_h2inv,
               a_alpha, const_a, ext=False, kperiodic=False, slab=False):
    """Shared radius-1 stencil body on a (bi, bj, n) tile.

    mode: 'apply' -> Ax; 'residual' -> rhs - Ax;
          'gsrb' -> x + kdinv[parity] * (rhs - Ax)
    suite: 'var7' (7-point variable-beta flux — fv7pt/fv2) or '27pt'
    a_alpha: var7 Helmholtz coefficient (adds a*alpha*x, alpha operand)
    const_a: 27pt's constant a*x term (operators.27pt.c:92, no operand)
    ext: the solution window is PRE-extended (sharded / periodic paths:
         radius-1 i/j ghosts — neighbor halos, BC fills, or wraps —
         arrive in the array itself at fixed j offset 7), so no in-kernel
         boundary synthesis or tile masks; only the k (lane) ghosts are
         still synthesized (the k axis is unsharded).
    kperiodic: the k-axis ghosts wrap (periodic BC): lane ghosts are the
         opposite domain face's columns instead of the Dirichlet taps.
    """
    xw_ref = refs[0]
    k = 1
    ilo_ref = ihi_ref = jlo_ref = jhi_ref = None
    if slab:
        ilo_ref, ihi_ref, jlo_ref, jhi_ref = refs[1:5]
        k = 5
    bi_ref = bj_ref = bk_ref = bktop_ref = None
    if suite == "var7":
        bi_ref, bj_ref, bk_ref, bktop_ref = refs[k:k + 4]
        k += 4
    rhs_ref = dinv_ref = alpha_ref = None
    if a_alpha:
        alpha_ref = refs[k]
        k += 1
    if mode != "apply":
        rhs_ref = refs[k]
        k += 1
    if mode == "gsrb":
        dinv_ref = refs[k]
        k += 1
    rk_ref = None
    if mode == "fres":
        rk_ref = refs[k]
        k += 1
    out_ref = refs[k]

    ti = pl.program_id(0)
    tj = pl.program_id(1)

    if slab:
        # masked-style windows over the UNEXTENDED local block; the
        # 1-deep edge ghosts (neighbor halos / BC fills) ride as 4 slab
        # operands (fv4 slab-mode analog, stencils._fv4_kernel)
        xi = _slab_tile_axis_r1(xw_ref[...], ilo_ref[...], ihi_ref[...],
                                bi, ti, nti, 0, 1)
        xe = _slab_tile_axis_r1(xi, jlo_ref[:, 0:1, :],
                                jhi_ref[:, 0:1, :],
                                bj, tj, ntj, 1, 8)       # (bi+2, bj+2, n)
    elif ext:
        # window rows [ti*bi, ti*bi+bi+2) x [tj*bj, tj*bj+bj+16) of the
        # (ni+2, nj+16, n) pre-extended array; the tile's extended j rows
        # sit at in-window offset [7, bj+9) by the storage layout
        xe = xw_ref[0:bi + 2, 7:bj + 9, :]               # (bi+2, bj+2, n)
    else:
        # separable boundary extension, same axis order as the XLA ghost
        # fills: i (from interior), then j (reads the i-ghost rows,
        # producing the tensor-product edge values the 27pt stencil reads)
        xi = _ext_tile_axis_r1(xw_ref[...], bi, ti, nti, 0, 1, taps)
        xe = _ext_tile_axis_r1(xi, bj, tj, ntj, 1, 8, taps)

    def lane_ghosts(arr):
        # k spans the level, so the wrap ghosts (periodic) / Dirichlet
        # taps both come from in-tile columns
        if kperiodic:
            return arr[..., n - 1:n], arr[..., 0:1]
        return _lane_ghosts(arr, taps)

    c = xe[1:1 + bi, 1:1 + bj, :]

    if suite == "var7":
        glo, ghi = lane_ghosts(c)
        xm_k = _lane_shift(c, glo, ghi, -1)
        xp_k = _lane_shift(c, glo, ghi, 1)
        ebi = bi_ref[...]                      # (bi+1, bj, n)
        ebj = bj_ref[:, 0:bj + 1, :]           # (bi, bj+1, n)
        ebk = bk_ref[...]                      # (bi, bj, n) low faces
        ebk_hi = _lane_shift(ebk, None, bktop_ref[...], 1)
        lap = (
            ebi[1:] * (xe[2:2 + bi, 1:1 + bj, :] - c)
            + ebi[:bi] * (xe[0:bi, 1:1 + bj, :] - c)
            + ebj[:, 1:, :] * (xe[1:1 + bi, 2:2 + bj, :] - c)
            + ebj[:, :bj, :] * (xe[1:1 + bi, 0:bj, :] - c)
            + ebk_hi * (xp_k - c)
            + ebk * (xm_k - c)
        )
        ax = -b_h2inv * lap
        if a_alpha:
            ax = ax + a_alpha * alpha_ref[...] * c
    else:  # dense 27pt, constant coefficient
        glo, ghi = lane_ghosts(xe)
        xkm = _lane_shift(xe, glo, ghi, -1)
        xkp = _lane_shift(xe, glo, ghi, 1)

        def p(a, di, dj):
            return a[1 + di:1 + di + bi, 1 + dj:1 + dj + bj, :]

        face = edge = corner = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for src, dk in ((xkm, -1), (xe, 0), (xkp, 1)):
                    m = abs(di) + abs(dj) + abs(dk)
                    if m == 0:
                        continue
                    t = p(src, di, dj)
                    if m == 1:
                        face = t if face is None else face + t
                    elif m == 2:
                        edge = t if edge is None else edge + t
                    else:
                        corner = t if corner is None else corner + t
        lap = _C0 * c + _C1 * face + _C2 * edge + _C3 * corner
        ax = const_a * c - b_h2inv * lap

    if mode == "apply":
        out_ref[...] = ax
        return
    if mode == "residual":
        out_ref[...] = rhs_ref[...] - ax
        return
    if mode == "fres":
        # fused restriction of the residual (kernels/restrict.py): i+k
        # halved in-kernel, j halved outside at 1/4 data
        from hpgmg_tpu.kernels.restrict import restrict_halve_ik

        out_ref[...] = restrict_halve_ik(rhs_ref[...] - ax, rk_ref[...])
        return
    out_ref[...] = c + dinv_ref[...] * (rhs_ref[...] - ax)


def _view_specs_and_args(level_or_views, var7, bi, bj, nk, bmap):
    """The coefficient-view BlockSpecs shared by masked and ext modes
    (the per-shard view layouts equal the single-chip ones with local
    dims — r1_beta_views / build_sharded_views_r1)."""
    E = pl.Element
    if not var7:
        return [], []
    kbi, kbj, kbk, kbk_top = level_or_views
    specs = [
        pl.BlockSpec((E(bi + 1), E(bj), E(nk)), bmap),
        pl.BlockSpec((E(bi), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi), E(bj), E(nk)), bmap),
        pl.BlockSpec((E(bi), E(bj), E(1)), bmap),
    ]
    return specs, [kbi, kbj, kbk, kbk_top]


def r1_call_ext(x_ext, kbi, kbj, kbk, kbk_top, rhs, dinv, mode: str,
                b_h2inv, suite: str, taps_key: str, kperiodic: bool = False,
                a_alpha: float = 0.0, const_a: float = 0.0, alpha=None):
    """Pallas call on ONE pre-extended block (the shard_map body of the
    distributed radius-1 path, and the single-chip periodic path).

    x_ext: (ni+2, nj+16, nk) — i-extended by 1, j-extended rows stored at
    [7, nj+9) of the padded j axis (ghosts = neighbor halos, BC fills, or
    periodic wraps); kbi (ni+1, nj, nk) / kbj (ni, nj+8, nk) / kbk +
    kbk_top: kernel-layout coefficient views for the var7 suites;
    rhs/dinv/alpha: (ni, nj, nk) or None per mode.
    """
    ni, nj, nk = x_ext.shape[0] - 2, x_ext.shape[1] - 16, x_ext.shape[2]
    var7 = suite == "var7"
    ts = tile_shape_r1_local(ni, nj, nk, var7)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    kernel = functools.partial(
        _r1_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        suite=suite, taps=_TAPS[taps_key], b_h2inv=b_h2inv,
        a_alpha=a_alpha, const_a=const_a, ext=True, kperiodic=kperiodic)

    E = pl.Element

    def xmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    in_specs = [pl.BlockSpec((E(bi + 2), E(bj + 16), E(nk)), xmap)]
    args = [x_ext]
    vspecs, vargs = _view_specs_and_args((kbi, kbj, kbk, kbk_top), var7,
                                         bi, bj, nk, xmap)
    in_specs += vspecs
    args += vargs
    tile_spec = pl.BlockSpec((bi, bj, nk), lambda ti, tj: (ti, tj, 0))
    if a_alpha:
        in_specs.append(tile_spec)
        args.append(alpha)
    if mode != "apply":
        in_specs.append(tile_spec)
        args.append(rhs)
    if mode == "gsrb":
        in_specs.append(tile_spec)
        args.append(dinv)

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((ni, nj, nk), x_ext.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(*args)


def r1_call_slab(x, islab_lo, islab_hi, jslab_lo, jslab_hi,
                 kbi, kbj, kbk, kbk_top, rhs, dinv, mode: str,
                 b_h2inv, suite: str, taps_key: str,
                 kperiodic: bool = False, a_alpha: float = 0.0,
                 const_a: float = 0.0, alpha=None):
    """Pallas call on ONE shard's UNEXTENDED block with the 1-deep edge
    ghosts as 4 thin slab operands (the distributed radius-1 slab fast
    path, parallel/shard_kernels.py — fv4_call_slab analog): no
    (ni+2, nj+16) array materialization per application.

    x: (ni, nj, nk); islab_lo/hi: (1, nj, nk); jslab_lo/hi: (ni+2, 8, nk)
    with the 1 live row leading (the i-extended j-face strips, so corner
    ghosts arrive transitively); kbi/kbj/kbk/kbk_top: per-shard
    kernel-layout views (r1_beta_views / build_sharded_views_r1 layout);
    rhs/dinv/alpha: (ni, nj, nk) or None per mode.
    """
    ni, nj, nk = x.shape
    var7 = suite == "var7"
    ts = tile_shape_slab_r1(ni, nj, nk, var7)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    kernel = functools.partial(
        _r1_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        suite=suite, taps=_TAPS[taps_key], b_h2inv=b_h2inv,
        a_alpha=a_alpha, const_a=const_a, slab=True, kperiodic=kperiodic)

    E = pl.Element

    def xmap(ti, tj):
        # sublane (j) window offsets must be PROVABLY x8 for Mosaic:
        # clip in units of 8 and scale after (stencils.py xmap)
        return (jnp.clip(ti * bi - 1, 0, ni - bi - 2),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (nj - bj - 16) // 8),
                0)

    def imap(ti, tj):  # i slabs: window-aligned j offsets only
        return (0, xmap(ti, tj)[1], 0)

    def jmap(ti, tj):
        # j slabs: the slab's leading axis is the i-EXTENDED axis (row r
        # is cell r-1), so offset ti*bi covers the tile's extended rows
        # [ti*bi-1, ti*bi+bi+1) for first/interior/last alike
        return (ti * bi, 0, 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    in_specs = [
        pl.BlockSpec((E(bi + 2), E(bj + 16), E(nk)), xmap),
        pl.BlockSpec((E(1), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(1), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(bi + 2), E(8), E(nk)), jmap),
        pl.BlockSpec((E(bi + 2), E(8), E(nk)), jmap),
    ]
    args = [x, islab_lo, islab_hi, jslab_lo, jslab_hi]
    vspecs, vargs = _view_specs_and_args((kbi, kbj, kbk, kbk_top), var7,
                                         bi, bj, nk, bmap)
    in_specs += vspecs
    args += vargs
    tile_spec = pl.BlockSpec((bi, bj, nk), lambda ti, tj: (ti, tj, 0))
    if a_alpha:
        in_specs.append(tile_spec)
        args.append(alpha)
    if mode != "apply":
        in_specs.append(tile_spec)
        args.append(rhs)
    if mode == "gsrb":
        in_specs.append(tile_spec)
        args.append(dinv)

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((ni, nj, nk), x.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(*args)


def single_chip_slabs_r1(x, bc: BC, taps_key: str):
    """BC-fill slabs for driving the slab kernel on one whole-domain
    block (tests + single-chip A/Bs): i slabs from the 2-tap Dirichlet
    ghost or wrap; j slabs from the i-EXTENDED thin strips so corners
    match the i-then-j ghost-fill order — all thin ops, no n^3
    materialization (stencils.single_chip_slabs analog)."""
    taps = _TAPS[taps_key]
    n_i, n_j = x.shape[0], x.shape[1]
    if bc == BC.PERIODIC:
        ilo, ihi = x[n_i - 1:, :, :], x[:1, :, :]
    else:
        ilo = _ghost_row(x, 0, True, taps)
        ihi = _ghost_row(x, 0, False, taps)

    def strip(j0, j1):
        return jnp.concatenate(
            [ilo[:, j0:j1], x[:, j0:j1], ihi[:, j0:j1]], axis=0)

    if bc == BC.PERIODIC:
        jlo, jhi = strip(n_j - 1, n_j), strip(0, 1)
    else:
        jlo = _ghost_row(strip(0, 2), 1, True, taps)
        jhi = _ghost_row(strip(n_j - 2, n_j), 1, False, taps)
    pad8 = lambda a: jnp.pad(a, ((0, 0), (0, 7), (0, 0)))  # noqa: E731
    return ilo, ihi, pad8(jlo), pad8(jhi)


# ---------------------------------------------------------------------------
# fused red+black double sweep (GSRB2)
# ---------------------------------------------------------------------------

def pad_rhs_gsrb2(rhs):
    """(n, n, n) -> (n+2, n+16, n) zero-padded rhs with live rows at
    [1, n+1) x [8, n+8) — the k2-view layout; built once per smooth()
    call and amortized over its sweeps."""
    return jnp.pad(rhs, ((1, 1), (8, 8), (0, 0)))


def r1_gsrb2_views(beta_i, beta_j, beta_k, kdinv0, alpha=None):
    """Pre-padded operand views for the double-sweep kernel, ordered
    (k2d0, k2alpha, k2bi, k2bj, k2bk, k2bk_top). One exact halo ring is
    baked in (zeros — every padded value is either masked out by the
    parity-folded kdinv0 or overwritten by in-kernel ghost synthesis)
    so window offsets are plain (ti*bi, tj*bj): no alignment blends.
    ``beta_i`` None selects the 27pt layout (no beta operands)."""
    n = kdinv0.shape[1]

    def pad3(a, i0, i1):
        # j axis -> exactly n+16 (8 left; 8 or 7 right for cell/face dims)
        return jnp.pad(a, ((i0, i1), (8, n + 8 - a.shape[1]), (0, 0)))

    k2d0 = pad3(kdinv0, 1, 1)
    k2a = pad3(alpha, 1, 1) if alpha is not None else None
    if beta_i is None:
        return (k2d0, k2a, None, None, None, None)
    k2bi = pad3(beta_i, 1, 2)
    k2bj = pad3(beta_j, 1, 1)
    k2bk = pad3(beta_k[:, :, :-1], 1, 1)
    k2top = pad3(beta_k[:, :, -1:], 1, 1)
    return (k2d0, k2a, k2bi, k2bj, k2bk, k2top)


def _ext2_tile_axis_r1(w, b: int, t, nt: int, axis: int, pad: int, taps):
    """Radius-2 variant of ``_ext_tile_axis_r1``: rows [-2, b+2) of the
    boundary-extended tile from a clamped (b + 2*pad)-row window. The
    row beyond the domain ghost (-2 / b+1 at boundary tiles) duplicates
    the ghost — it is only read by stencil applications at ghost
    positions, whose results are discarded."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    m = b + 2 * pad
    glo = _ghost_row(w, axis, True, taps)
    ghi = _ghost_row(w, axis, False, taps)
    first = jnp.concatenate([glo, glo, sl(0, b + 2)], axis)
    mid = sl(pad - 2, pad + b + 2)
    last = jnp.concatenate([sl(m - (b + 2), m), ghi, ghi], axis)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _fix_ghost_axis_r1(xr, b: int, t, nt: int, axis: int, taps,
                       lo=1.0, hi=1.0):
    """Replace the +-1 ring rows of the red-updated extended tile with
    the 2-tap Dirichlet ghosts of the UPDATED interior (what a separate
    ghost-fill pass would produce before the black half-sweep); interior
    tiles keep their in-tile-updated neighbor rows. ``lo``/``hi`` scale
    the first/last-tile masks — the distributed slab2 mode passes
    is-domain-edge flags so shard-interior edges keep the exchanged
    neighbor red values instead."""
    t1, t2 = taps

    def sl(lo_, hi_):
        return lax.slice_in_dim(xr, lo_, hi_, axis=axis)

    g_lo = t1 * sl(1, 2)
    g_hi = t1 * sl(b, b + 1)
    if t2:
        g_lo = g_lo + t2 * sl(2, 3)
        g_hi = g_hi + t2 * sl(b - 1, b)
    first = jnp.concatenate([g_lo, sl(1, b + 2)], axis)
    last = jnp.concatenate([sl(0, b + 1), g_hi], axis)
    mf = (t == 0).astype(xr.dtype) * lo
    ml = (t == nt - 1).astype(xr.dtype) * hi
    return mf * first + (1.0 - mf - ml) * xr + ml * last


def _slab2_tile_axis_r1(w, glo, ghi, b: int, t, nt: int, axis: int,
                        pad: int):
    """``_ext2_tile_axis_r1`` with the 2-deep edge ghosts arriving as
    slab OPERANDS (2-deep neighbor halos, or BC ghost + duplicate at
    domain edges — the distributed slab2 path). ``glo``/``ghi`` are 2
    rows along ``axis`` ordered [far, near] / [near, far]."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    m = b + 2 * pad
    first = jnp.concatenate([glo, sl(0, b + 2)], axis)
    mid = sl(pad - 2, pad + b + 2)
    last = jnp.concatenate([sl(m - (b + 2), m), ghi], axis)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _r1_gsrb2_kernel(*refs, n, bi, bj, nti, ntj, suite, taps, b_h2inv,
                     a_alpha, const_a, slab=False):
    """One FULL GSRB sweep (red then black) on a (bi, bj, n) tile.

    Red: computed on the +1 ring (cells [-1, bi+1) x [-1, bj+1)) from a
    radius-2 masked x window; ring operand values come from the
    pre-padded k2 views (offset-exact windows, garbage-free zeros where
    out of domain). Ghosts of the red iterate are re-synthesized
    in-kernel (i then j, the suites' tensor-product fill order), then
    the black update runs on the interior with the center slices of the
    SAME resident operands — betas/rhs stream from HBM once per full
    sweep instead of twice.

    slab: the distributed variant — the 2-deep x edge ghosts arrive as
    4 slab operands (neighbor halos via ppermute or BC fills) plus an
    ``eflags`` (1, 8, n) operand of is-domain-edge floats
    [lo_i, hi_i, lo_j, hi_j, ...] that gates the mid-sweep ghost
    re-synthesis: at shard-interior edges the exchanged ring rows ARE
    the neighbor's red values and must be kept."""
    xw_ref = refs[0]
    k = 1
    ilo_ref = ihi_ref = jlo_ref = jhi_ref = ef_ref = None
    if slab:
        ilo_ref, ihi_ref, jlo_ref, jhi_ref, ef_ref = refs[1:6]
        k = 6
    b2i_ref = b2j_ref = b2k_ref = b2top_ref = None
    if suite == "var7":
        b2i_ref, b2j_ref, b2k_ref, b2top_ref = refs[k:k + 4]
        k += 4
    a2_ref = None
    if a_alpha:
        a2_ref = refs[k]
        k += 1
    rhs2_ref, d0_ref, d1_ref, out_ref = refs[k:k + 4]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    if slab:
        xi = _slab2_tile_axis_r1(xw_ref[...], ilo_ref[...], ihi_ref[...],
                                 bi, ti, nti, 0, 2)
        xE = _slab2_tile_axis_r1(xi, jlo_ref[:, 0:2, :],
                                 jhi_ref[:, 0:2, :],
                                 bj, tj, ntj, 1, 8)     # (bi+4, bj+4, n)
        ef = ef_ref[...]                   # (1, 8, n), lane-replicated
        lo_i, hi_i = ef[:, 0:1, :], ef[:, 1:2, :]
        lo_j, hi_j = ef[:, 2:3, :], ef[:, 3:4, :]
    else:
        xi = _ext2_tile_axis_r1(xw_ref[...], bi, ti, nti, 0, 2, taps)
        xE = _ext2_tile_axis_r1(xi, bj, tj, ntj, 1, 8, taps)
        lo_i = hi_i = lo_j = hi_j = 1.0

    rhs2 = rhs2_ref[...][:, 7:bj + 9, :]
    d0 = d0_ref[...][:, 7:bj + 9, :]
    a2 = a2_ref[...][:, 7:bj + 9, :] if a_alpha else None

    if suite == "var7":
        ebi = b2i_ref[...][:, 7:bj + 9, :]        # faces [-1, bi+2)
        ebj = b2j_ref[...][:, 7:bj + 10, :]       # faces [-1, bj+2)
        ebk = b2k_ref[...][:, 7:bj + 9, :]
        etop = b2top_ref[...][:, 7:bj + 9, :]

        def ax_on(xE_, ebi_, ebj_, ebk_, etop_, a_, mi, mj):
            c = xE_[1:1 + mi, 1:1 + mj, :]
            glo, ghi = _lane_ghosts(c, taps)
            xm = _lane_shift(c, glo, ghi, -1)
            xp = _lane_shift(c, glo, ghi, 1)
            ek_hi = _lane_shift(ebk_, None, etop_, 1)
            lap = (ebi_[1:] * (xE_[2:2 + mi, 1:1 + mj, :] - c)
                   + ebi_[:mi] * (xE_[0:mi, 1:1 + mj, :] - c)
                   + ebj_[:, 1:, :] * (xE_[1:1 + mi, 2:2 + mj, :] - c)
                   + ebj_[:, :mj, :] * (xE_[1:1 + mi, 0:mj, :] - c)
                   + ek_hi * (xp - c) + ebk_ * (xm - c))
            ax = -b_h2inv * lap
            if a_ is not None:
                ax = ax + a_alpha * a_ * c
            return c, ax

        c1, ax1 = ax_on(xE, ebi, ebj, ebk, etop, a2, bi + 2, bj + 2)
        xr = c1 + d0 * (rhs2 - ax1)
        xr = _fix_ghost_axis_r1(xr, bi, ti, nti, 0, taps, lo_i, hi_i)
        xr = _fix_ghost_axis_r1(xr, bj, tj, ntj, 1, taps, lo_j, hi_j)
        c2, ax2 = ax_on(
            xr, ebi[1:bi + 2, 1:bj + 1, :], ebj[1:bi + 1, 1:bj + 2, :],
            ebk[1:bi + 1, 1:bj + 1, :], etop[1:bi + 1, 1:bj + 1, :],
            None if a2 is None else a2[1:bi + 1, 1:bj + 1, :], bi, bj)
    else:
        def ax_on27(xE_, mi, mj):
            glo, ghi = _lane_ghosts(xE_, taps)
            xkm = _lane_shift(xE_, glo, ghi, -1)
            xkp = _lane_shift(xE_, glo, ghi, 1)
            c = xE_[1:1 + mi, 1:1 + mj, :]

            def p(a, di, dj):
                return a[1 + di:1 + di + mi, 1 + dj:1 + dj + mj, :]

            face = edge = corner = None
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    for src, dk in ((xkm, -1), (xE_, 0), (xkp, 1)):
                        m = abs(di) + abs(dj) + abs(dk)
                        if m == 0:
                            continue
                        t_ = p(src, di, dj)
                        if m == 1:
                            face = t_ if face is None else face + t_
                        elif m == 2:
                            edge = t_ if edge is None else edge + t_
                        else:
                            corner = t_ if corner is None else corner + t_
            lap = _C0 * c + _C1 * face + _C2 * edge + _C3 * corner
            return c, const_a * c - b_h2inv * lap

        c1, ax1 = ax_on27(xE, bi + 2, bj + 2)
        xr = c1 + d0 * (rhs2 - ax1)
        xr = _fix_ghost_axis_r1(xr, bi, ti, nti, 0, taps, lo_i, hi_i)
        xr = _fix_ghost_axis_r1(xr, bj, tj, ntj, 1, taps, lo_j, hi_j)
        c2, ax2 = ax_on27(xr, bi, bj)

    out_ref[...] = c2 + d1_ref[...] * (rhs2[1:bi + 1, 1:bj + 1, :] - ax2)


def r1_gsrb2_pallas(level: Level, x, rhse, cfg: SolverConfig,
                    taps_key: str):
    """One fused red+black GSRB sweep in a single kernel launch.
    ``rhse`` is the pre-padded rhs (``pad_rhs_gsrb2``); the remaining
    ring operands ride in ``level.k2`` (build-time views)."""
    n = level.dim
    suite = level.kernel_suite
    var7 = suite == "var7"
    taps = _TAPS[taps_key]
    a_alpha = (cfg.a if cfg.helmholtz else 0.0) if var7 else 0.0
    const_a = cfg.a if not var7 else 0.0
    k2d0, k2a, k2bi, k2bj, k2bk, k2top = level.k2
    bi, bj = tile_shape_gsrb2(n, var7)
    nti, ntj = n // bi, n // bj
    kernel = functools.partial(
        _r1_gsrb2_kernel, n=n, bi=bi, bj=bj, nti=nti, ntj=ntj,
        suite=suite, taps=taps, b_h2inv=cfg.b * level.h2inv,
        a_alpha=a_alpha, const_a=const_a)
    E = pl.Element

    def xmap(ti, tj):
        # sublane (j) window offsets must be PROVABLY x8 for Mosaic
        return (jnp.clip(ti * bi - 2, 0, n - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (n - bj - 16) // 8), 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    ring_spec = pl.BlockSpec((E(bi + 2), E(bj + 16), E(n)), bmap)
    in_specs = [pl.BlockSpec((E(bi + 4), E(bj + 16), E(n)), xmap)]
    args = [x]
    if var7:
        in_specs += [
            pl.BlockSpec((E(bi + 3), E(bj + 16), E(n)), bmap),
            ring_spec, ring_spec,
            pl.BlockSpec((E(bi + 2), E(bj + 16), E(1)), bmap),
        ]
        args += [k2bi, k2bj, k2bk, k2top]
    if a_alpha:
        in_specs.append(ring_spec)
        args.append(k2a)
    tile_spec = pl.BlockSpec((bi, bj, n), lambda ti, tj: (ti, tj, 0))
    in_specs += [ring_spec, ring_spec, tile_spec]
    args += [rhse, k2d0, level.kdinv[1]]
    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct(level.shape, x.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(*args)


def r1_gsrb2_call_slab(x, islab_lo, islab_hi, jslab_lo, jslab_hi, eflags,
                       k2, kdinv1, rhs2, b_h2inv, suite: str,
                       taps_key: str, a_alpha: float = 0.0,
                       const_a: float = 0.0):
    """Distributed double-sweep launch on ONE shard's block (the
    shard_map body of the slab2 path): one 2-deep slab exchange + one
    kernel launch per FULL GSRB sweep — half the messages and launches
    of the half-sweep schedule.

    x: (ni, nj, nk); islab_lo/hi: (2, nj, nk) [far, near]/[near, far];
    jslab_lo/hi: (ni+4, 8, nk) i-extended 2-deep strips (corner ghosts
    transitive); eflags: (1, 8, nk) is-domain-edge floats gating the
    mid-sweep ghost re-synthesis; k2: the PER-SHARD pre-padded ring
    views (parallel/shard_kernels.py build_sharded_k2_r1 layout);
    rhs2: (ni+2, nj+16, nk) ring-exchanged padded rhs.
    """
    ni, nj, nk = x.shape
    var7 = suite == "var7"
    ts = tile_shape_slab2_r1(ni, nj, nk, var7)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    k2d0, k2a, k2bi, k2bj, k2bk, k2top = k2
    kernel = functools.partial(
        _r1_gsrb2_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj,
        suite=suite, taps=_TAPS[taps_key], b_h2inv=b_h2inv,
        a_alpha=a_alpha, const_a=const_a, slab=True)
    E = pl.Element

    def xmap(ti, tj):
        return (jnp.clip(ti * bi - 2, 0, ni - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (nj - bj - 16) // 8),
                0)

    def imap(ti, tj):  # i slabs: window-aligned j offsets only
        return (0, xmap(ti, tj)[1], 0)

    def jmap(ti, tj):
        # j slabs: leading axis is the i-EXTENDED-by-2 axis (row r is
        # cell r-2), so offset ti*bi covers the tile's extended rows
        # [ti*bi-2, ti*bi+bi+2) for first/interior/last alike
        return (ti * bi, 0, 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    ring_spec = pl.BlockSpec((E(bi + 2), E(bj + 16), E(nk)), bmap)
    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(nk)), xmap),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap),
        pl.BlockSpec((E(1), E(8), E(nk)), lambda ti, tj: (0, 0, 0)),
    ]
    args = [x, islab_lo, islab_hi, jslab_lo, jslab_hi, eflags]
    if var7:
        in_specs += [
            pl.BlockSpec((E(bi + 3), E(bj + 16), E(nk)), bmap),
            ring_spec, ring_spec,
            pl.BlockSpec((E(bi + 2), E(bj + 16), E(1)), bmap),
        ]
        args += [k2bi, k2bj, k2bk, k2top]
    if a_alpha:
        in_specs.append(ring_spec)
        args.append(k2a)
    tile_spec = pl.BlockSpec((bi, bj, nk), lambda ti, tj: (ti, tj, 0))
    in_specs += [ring_spec, ring_spec, tile_spec]
    args += [rhs2, k2d0, kdinv1]
    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((ni, nj, nk), x.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(*args)


def _r1_call(level: Level, x, rhs, dinv, cfg: SolverConfig, mode: str,
             taps_key: str):
    n = level.dim
    suite = level.kernel_suite
    taps = _TAPS[taps_key]
    var7 = suite == "var7"
    a_alpha = (cfg.a if cfg.helmholtz else 0.0) if var7 else 0.0
    const_a = cfg.a if not var7 else 0.0

    if cfg.bc == BC.PERIODIC:
        # wrap ghosts live on the opposite domain face, outside any masked
        # window — XLA materializes the i/j wrap once (fused pad), the
        # k-axis wraps in-kernel
        xe = jnp.pad(jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="wrap"),
                     ((0, 0), (7, 7), (0, 0)))
        return r1_call_ext(xe, level.kbi, level.kbj, level.kbk,
                           level.kbk_top, rhs, dinv, mode,
                           cfg.b * level.h2inv, suite, taps_key,
                           kperiodic=True, a_alpha=a_alpha,
                           const_a=const_a, alpha=level.alpha)

    bi, bj = tile_shape_r1(n, var7)
    nti, ntj = n // bi, n // bj
    kernel = functools.partial(
        _r1_kernel, n=n, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        suite=suite, taps=taps, b_h2inv=cfg.b * level.h2inv,
        a_alpha=a_alpha, const_a=const_a)

    E = pl.Element

    def xmap(ti, tj):
        # sublane (j) window offsets must be PROVABLY x8 for Mosaic:
        # clip in units of 8 and scale after (stencils.py xmap)
        return (jnp.clip(ti * bi - 1, 0, n - bi - 2),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (n - bj - 16) // 8), 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    in_specs = [pl.BlockSpec((E(bi + 2), E(bj + 16), E(n)), xmap)]
    args = [x]
    vspecs, vargs = _view_specs_and_args(
        (level.kbi, level.kbj, level.kbk, level.kbk_top), var7, bi, bj, n,
        bmap)
    in_specs += vspecs
    args += vargs
    tile_spec = pl.BlockSpec((bi, bj, n), lambda ti, tj: (ti, tj, 0))
    if a_alpha:
        in_specs.append(tile_spec)
        args.append(level.alpha)
    if mode != "apply":
        in_specs.append(tile_spec)
        args.append(rhs)
    if mode == "gsrb":
        in_specs.append(tile_spec)
        args.append(dinv)
    out_spec, out_shape = tile_spec, level.shape
    if mode == "fres":
        from hpgmg_tpu.kernels.restrict import restrict_matrix_k

        in_specs.append(pl.BlockSpec((n, n // 2), lambda ti, tj: (0, 0)))
        args.append(restrict_matrix_k(n, x.dtype, 0.25))
        out_spec = pl.BlockSpec((bi // 2, bj, n // 2),
                                lambda ti, tj: (ti, tj, 0))
        out_shape = (n // 2, n, n // 2)

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        compiler_params=None if _s.INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_s._VMEM_LIMIT),
        interpret=_s.INTERPRET,
    )(*args)


# Dirichlet ghost taps g = t1*x1 + t2*x2 per BC family (module docstring)
_TAPS = {
    "p1": (-1.0, 0.0),
    "v2": (-2.5, 0.5),
    "27pt": (-2.0, 1.0 / 3.0),
}


def r1_apply_pallas(level: Level, x, cfg: SolverConfig, taps_key: str):
    return _r1_call(level, x, None, None, cfg, "apply", taps_key)


def r1_residual_pallas(level: Level, x, rhs, cfg: SolverConfig,
                       taps_key: str):
    return _r1_call(level, x, rhs, None, cfg, "residual", taps_key)


def r1_gsrb_sweep_pallas(level: Level, x, rhs, cfg: SolverConfig,
                         parity: int, taps_key: str):
    """One GSRB half-sweep, ghost fill fused into the stencil kernel."""
    return _r1_call(level, x, rhs, level.kdinv[parity & 1], cfg, "gsrb",
                    taps_key)


def r1_restrict_residual_pallas(level: Level, x, rhs, cfg: SolverConfig,
                                taps_key: str):
    """Fused restrict(residual(...)) — masked Dirichlet path only (the
    mixin gates periodic/sharded to the unfused pair). See
    stencils.fv4_restrict_residual_pallas."""
    from hpgmg_tpu.kernels.restrict import restrict_j_einsum

    return restrict_j_einsum(_r1_call(level, x, rhs, None, cfg, "fres",
                                      taps_key))
