"""Pallas TPU kernels for the hot fv4 stencils (phase 3: 2D tiled grid).

Why: the XLA path materializes a ghost-extended solution per stencil
application (``ghost_fill_fv``) and reads coefficient arrays whose trailing
extent is n+1/n+2 — on TPU a >128 lane row pads to the next multiple of
128, so at n=128 every extended array streams ~2x its useful bytes, and
the ghost fill itself costs a full extra read+write of the solution.

Phase-3 design (supersedes the phase-1 windowed and phase-2 1D-slab
kernels — see git history):

* **No ghost materialization.** The solution arrives unpadded (n,n,n); the
  separable quartic Dirichlet extension (apply_BCs_v4,
  boundary_fv.c:262-569) is computed on-VMEM from the tile's halo window.
* **2D tile grid over (i, j).** The 1D i-slab variant kept the full
  (j, k) plane resident, which exceeds VMEM for n >= 256 (the phase-2
  kernel refused those sizes and fell back to XLA, which degrades ~2x per
  DOF at 256^3). Tiling j as well caps VMEM at O(bi*bj*n) so every size
  from 32^3 up can run in-kernel (auto-selected from 64^3 up), and shrinks the halo-recompute overhead
  at 128^3 from ~2.0x to ~1.56x.
  - i is the leading (unconstrained) axis: windows are (bi+4) rows with
    edge-clamped ``pl.Element`` offsets, a 3-case scalar-mask switch
    synthesizes the physical-boundary ghosts.
  - j is the sublane axis: block dims must be multiples of 8, so the
    window is (bj+8) rows (halo 4 >= the needed 2) at clamped offsets,
    with the same 3-case switch; bj itself is a multiple of 8 so the
    output block is legal.
  - k (lanes) spans the level; shifted reads concatenate 1-2 ghost
    columns instead of materializing an (n+4)-lane array.
* **Lane-aligned, j-padded coefficients.** ``rebuild_operator`` stores
  kernel-layout views whose trailing (lane) dim is exactly n, and whose
  j (sublane) dim is padded to n+16 with the live rows at a +4/+3 offset
  so each (bj+8)-row window covers the tile's tangential ghosts at a
  FIXED in-window offset (no traced slicing): ``kbi`` (n+1, n+8, n),
  ``kbj`` (n+2, n+8, n), ``kbk`` (n+2, n+8, n) + 1-plane top cap (the
  n+1 face axis in lanes would pad 2x; the high face of cell k is the
  low face of cell k+1 — one in-kernel lane shift). Only the k (lane)
  tangential ghosts of kbi/kbj are rebuilt in-kernel (the quintic
  extrapolation of extrapolate_betas, boundary_fv.c:651).
* One kernel body shared by apply / residual / GSRB (mode is static; the
  red/black parity enters through which pre-masked ``kdinv`` field is
  passed — the GSRB_FP trick, gsrb.c:78-87, folded at MGBuild time).

Helmholtz runs in-kernel too: ``a*alpha[ijk]*x`` (operators.fv4.c:87-91)
rides as one extra cell-centered operand stream (near-free: the kernel is
VPU-op-bound, not HBM-bound — docs/GSRB_VPU.md), in every mode including
GSRB2 and the sharded ext/slab paths.

Unsupported here (XLA fallback): dims not tileable as below, non-fv4
suites (those have their own radius-1 kernel family, stencils_r1.py).
Periodic BCs run through the pre-extended ``ext``/local layout
(tile_shape_local) rather than the masked Dirichlet window path.
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

# flip in tests to run kernels on CPU via the Pallas interpreter
INTERPRET = False

_MIN_DIM = 32
# Below 64^3 the XLA fused path wins on real hardware: a Pallas launch
# costs ~30 us while the whole 32^3 XLA half-sweep is ~8 us (measured
# v5e). "auto" applies this floor; kernels="pallas" forces the kernel.
_AUTO_MIN_DIM = 64
# Budget for the _vmem_bytes estimate. Mosaic's DEFAULT vmem limit is
# well below the hardware's; the pallas_call raises it via
# CompilerParams(vmem_limit_bytes) and measured v5e sweeps pick their
# fastest tilings under a 28MB estimate with ties broken
# toward larger bj: (32,64) at 128^3 (242 us half-sweep), (16,64) at
# 256^3 (1647 us) — bigger estimates compile but run slower (less
# double-buffering headroom).
_VMEM_BUDGET = 28 * 2 ** 20
# At 512^3 the wider (8,128) tile wins 5% over (8,64) (9.9 vs 10.5 ms
# measured half-sweep) but its estimate is ~56 MB — a separate budget
# so the tuned small-size picks ((32,64)@128, (16,64)@256) are
# untouched. (16,128)/(32,64) at 512 (~105 MB est) crash the Mosaic
# compile helper; the 60 MB budget excludes them.
_VMEM_BUDGET_512 = 60 * 2 ** 20
_VMEM_LIMIT = 100 * 2 ** 20


def _vmem_bytes(n: int, bi: int, bj: int, prediff: bool = False) -> int:
    """Rough f32 VMEM footprint of one (bi, bj) tile: double-buffered
    windows + the dominant temporaries. Lanes (last dim) round to 128."""
    ln = -(-n // 128) * 128
    wj = bj + 16
    ncoef = 9 if prediff else 3  # + 6 prediff windows when enabled
    win = ((bi + 4) * wj * ln                  # x halo window
           + ncoef * (bi + 2) * (bj + 8) * ln  # kbi/kbj/kbk (+ prediff)
           + 3 * bi * bj * ln)                 # rhs + dinv + out
    tmp = (bi + 4) * (bj + 8) * ln + 8 * bi * bj * ln
    return 4 * (2 * win + tmp)


def _budget(prediff: bool, n: int = 0) -> int:
    if prediff:
        return _VMEM_BUDGET_PREDIFF
    return _VMEM_BUDGET_512 if n >= 512 else _VMEM_BUDGET


def tile_shape(n: int, prediff=None):
    """(bi, bj) for the 2D tile grid: bj must be a multiple of 8 dividing
    n with >= 2 tiles (the edge-case switches need distinct first/last
    tiles); bi is any divisor with >= 2 tiles. Prefer the largest tile
    that fits VMEM (less halo recompute)."""
    if prediff is None:
        prediff = prediff_active(n)
    best = None
    for bj in (128, 64, 48, 32, 24, 16, 8):
        if n % bj or n // bj < 2 or n < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if n % bi or n // bi < 2:
                continue
            if _vmem_bytes(n, bi, bj, prediff) > _budget(prediff, n):
                continue
            # larger bj (sublane extent) wins ties: measured faster at
            # equal area (1647 vs 2015 us for (16,64) vs (32,32) at 256;
            # (8,128) vs (16,64) at 512)
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def use_pallas(cfg: SolverConfig, level: Level, x=None) -> bool:
    """Select the Pallas path: TPU backend (or interpreter in tests),
    Dirichlet or periodic Poisson, kernel-layout coefficients present,
    supported size. ``cfg.kernels``: "auto" (default; on for TPU),
    "pallas" (force), "xla" (off)."""
    if getattr(cfg, "kernels", "auto") == "xla":
        return False
    if cfg.bc not in (BC.DIRICHLET, BC.PERIODIC):
        return False
    if cfg.helmholtz and getattr(level, "alpha", None) is None:
        return False  # the a*alpha*u term needs the alpha operand
    if getattr(level, "kbi", None) is None:
        return False
    if getattr(level, "kernel_suite", None) is not None:
        return False  # the views are radius-1 layouts (stencils_r1.py)
    if getattr(level, "ksharded", False):
        # per-shard stacked views: only the distributed path
        # (parallel/shard_kernels.py) can read them
        return False
    if level.dim < _MIN_DIM:
        return False
    n = level.dim
    pdiff = getattr(level, "kgd", None) is not None
    ts = (tile_shape_local(n, n, n, pdiff)
          if cfg.bc == BC.PERIODIC or SINGLE_EXT
          else tile_shape(n, pdiff))
    if ts is None:
        return False
    if (getattr(cfg, "kernels", "auto") != "pallas"
            and level.dim < _AUTO_MIN_DIM):
        return False
    if INTERPRET:
        return True  # the interpreter handles 64-bit (CPU parity tests)
    if jnp.dtype(level.dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types (f64 verification runs)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def kernel_views_eligible(cfg: SolverConfig, dim: int) -> bool:
    """Build-time gate for attaching the kernel coefficient views
    (rebuild_operator): BC + size supported by some Pallas path."""
    if cfg.kernels == "xla" or dim < _MIN_DIM:
        return False
    pdiff = prediff_active(dim)
    if cfg.bc == BC.DIRICHLET:
        return (tile_shape(dim, pdiff) is not None if not SINGLE_EXT
                else tile_shape_local(dim, dim, dim, pdiff) is not None)
    if cfg.bc == BC.PERIODIC:
        return tile_shape_local(dim, dim, dim, pdiff) is not None
    return False


# ---------------------------------------------------------------------------
# in-kernel boundary extensions
# ---------------------------------------------------------------------------

def _v4_ghost_pair(w, axis: int, lo: bool):
    """(g_near, g_far) quartic volume-averaged Dirichlet ghosts from the 4
    cells nearest the boundary (boundary_fv.c:334-341)."""
    m = w.shape[axis]
    idx = (0, 1, 2, 3) if lo else (m - 1, m - 2, m - 3, m - 4)
    x1, x2, x3, x4 = (lax.slice_in_dim(w, i, i + 1, axis=axis) for i in idx)
    c = 1.0 / 12.0
    g1 = c * (-77.0 * x1 + 43.0 * x2 - 17.0 * x3 + 3.0 * x4)
    g2 = c * (-505.0 * x1 + 335.0 * x2 - 145.0 * x3 + 27.0 * x4)
    return g1, g2


def _quintic_ghost(w, axis: int, lo: bool):
    """1-deep quintic extrapolation ghost for face coefficients
    (extrapolate_betas, boundary_fv.c:651; domains here are always >= 5)."""
    m = w.shape[axis]
    idx = range(5) if lo else [m - 1 - i for i in range(5)]
    c0, c1, c2, c3, c4 = (lax.slice_in_dim(w, i, i + 1, axis=axis)
                          for i in idx)
    return 5.0 * c0 - 10.0 * c1 + 10.0 * c2 - 5.0 * c3 + c4


def _ext_tile_axis(w, b: int, t, nt: int, axis: int, pad: int):
    """Turn a clamped halo window (b + 2*pad rows along ``axis``) into the
    boundary-extended tile (b + 4 rows): interior tiles already hold
    [t*b - pad, t*b + b + pad) and just slice out the +-2 halo; first/last
    tiles hold the domain edge and the two ghost rows are synthesized with
    the v4 formulas. ``t`` is the traced tile index; the three candidates
    are combined with exact 0/1 scalar masks because Mosaic cannot
    legalize the scalar-predicate vector selects a lax.switch lowers to."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    g1l, g2l = _v4_ghost_pair(w, axis, lo=True)
    first = jnp.concatenate([g2l, g1l, sl(0, b + 2)], axis)
    g1h, g2h = _v4_ghost_pair(w, axis, lo=False)
    m = b + 2 * pad
    last = jnp.concatenate([sl(m - (b + 2), m), g1h, g2h], axis)
    mid = sl(pad - 2, pad + b + 2)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _slab_tile_axis(w, glo, ghi, b: int, t, nt: int, axis: int, pad: int):
    """``_ext_tile_axis`` with the 2-deep edge ghosts arriving as slab
    OPERANDS (neighbor halos or precomputed BC fills — the distributed
    slab path) instead of being synthesized from the window. ``glo`` /
    ``ghi`` are 2 rows along ``axis`` ordered [far, near] / [near, far],
    window-aligned on the other dims."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    first = jnp.concatenate([glo, sl(0, b + 2)], axis)
    m = b + 2 * pad
    last = jnp.concatenate([sl(m - (b + 2), m), ghi], axis)
    mid = sl(pad - 2, pad + b + 2)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


# A/B flag: lower the multi-lane-tile rotate in _lane_shift through the
# pltpu.roll primitive instead of jnp.roll (kernel_sweep --roll-prim).
ROLL_PRIM = False


def _lane_shift(core, glo, ghi, dk: int):
    """Shifted lane read: ``core`` has exactly n lanes; ``glo``/``ghi`` are
    the 1-2 boundary ghost columns ordered [far, near] / [near, far].

    Implemented as a lane rotate + per-ghost-column masked selects (the
    ghost column lane-broadcasts against an iota mask) — every value stays
    at exactly n lanes, and unlike a lane-dim concatenate this lowers for
    multi-lane-tile rows too (Mosaic rejects n>128 lane concats with
    'offset mismatch on non-concat dimension')."""
    n = core.shape[-1]
    if dk == 0:
        return core
    if n <= 128:
        # single lane tile: the concat form lowers fine and is ~15% faster
        if dk < 0:
            g = lax.slice_in_dim(glo, glo.shape[-1] + dk, glo.shape[-1],
                                 axis=-1)
            return jnp.concatenate(
                [g, lax.slice_in_dim(core, 0, n + dk, axis=-1)], axis=-1)
        g = lax.slice_in_dim(ghi, 0, dk, axis=-1)
        return jnp.concatenate(
            [lax.slice_in_dim(core, dk, n, axis=-1), g], axis=-1)
    if ROLL_PRIM and not INTERPRET:
        # pltpu.roll wants a non-negative shift: roll by -dk == n - dk
        rolled = pltpu.roll(core, (-dk) % n, axis=core.ndim - 1)
    else:
        rolled = jnp.roll(core, -dk, axis=-1)
    idx = lax.broadcasted_iota(jnp.int32, core.shape, core.ndim - 1)
    out = rolled
    if dk > 0:
        for c in range(dk):  # lanes n-dk+c take ghi column c
            col = lax.slice_in_dim(ghi, c, c + 1, axis=-1)
            out = jnp.where(idx == n - dk + c, col, out)
    else:
        for c in range(-dk):  # lanes c take glo columns [dk:] in order
            col = lax.slice_in_dim(glo, glo.shape[-1] + dk + c,
                                   glo.shape[-1] + dk + c + 1, axis=-1)
            out = jnp.where(idx == c, col, out)
    return out


# ---------------------------------------------------------------------------
# flux-form stencil
# ---------------------------------------------------------------------------

# Experiment flag (VERDICT r2 item 3): compute the j-axis (sublane)
# slice-differences as banded matmuls on the MXU instead of VPU
# roll+subtract passes — the GSRB kernel is VPU-bound with the MXU idle.
# Measured on v5e (bench/kernel_sweep.py --mxu): see docs/MXU_JDIFF.md.
MXU_JDIFF = False

# Timing-probe flag (NOT numerically correct): drop the mixed-derivative
# G fluxes (and the shared central-difference fields feeding them) from
# the fv4 kernel to measure how run time scales with VPU op count —
# the ALU-boundedness probe behind the parity-packing decision
# (bench/kernel_sweep.py --probe-main-only; see docs/DESIGN.md).
PROBE_MAIN_ONLY = False

# Precompute the sweep-invariant mixed-flux operands at MGBuild time
# (kernel_beta_prediff): the 6 tangential central differences of the face
# coefficients — recomputed from the beta windows every half-sweep today
# (6 subs + 4 lane-shift passes + the 4 quintic lane-ghost builds) — plus
# the 0.25 factor folded in (a power of two: bitwise-neutral). Trades 6
# extra n^3 operand streams for pure VPU op count, the binding
# constraint (docs/GSRB_VPU.md). Measured (kernel_sweep --prediff):
# 0.72x at 128^3, 0.98x at 256^3, but 1.29x at 512^3 — at 512 the
# kernel nears HBM saturation and 6 extra streams cost ~3.9 ms/sweep —
# hence the size cap. Costs 6 n^3 fields of HBM per capped level.
PREDIFF = True
PREDIFF_MAX_DIM = 256
# the 9-window prediff estimate needs more headroom to keep the measured
# best tiles ((32,64)@128, (16,64)@256)
_VMEM_BUDGET_PREDIFF = 48 * 2 ** 20


# Smoother-only bf16 coefficient streams (A/B via kernel_sweep --bf16c).
# At 512^3 the GSRB kernel nears HBM saturation (the PREDIFF 1.29x
# result) and the coefficient operands — 3 beta views + kdinv, ~4 of
# the ~7.2 n^3 f32 streams per half-sweep — are pure bandwidth: storing
# bf16 copies (Level.kb16) halves them. ONLY the smoother reads them:
# apply/residual keep the f32 views because they set the discretization
# accuracy, while a smoother with an O(2^-9)-perturbed operator is
# still a smoother (the true-A residual + coarse correction drive
# convergence — verified by the whole-solve A/B before enabling).
BF16C = False
BF16C_MIN_DIM = 512


def bf16c_active(dim: int, dtype=None) -> bool:
    """Build-time gate for attaching the bf16 smoother views: flag on,
    size in the HBM-bound regime, f32 solve (bf16-vs-f64 mixing is a
    verification-mode nonsense), and a tile whose sublane extent meets
    the bf16 granularity (16)."""
    if not BF16C or dim < BF16C_MIN_DIM:
        return False
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    ts = tile_shape(dim, prediff_active(dim))
    return ts is not None and ts[1] % 16 == 0


def kernel_views_bf16(kbi, kbj, kbk, kbk_top, kdinv, kgd=None):
    """bf16 copies of the GSRB coefficient operands, j-padded n+8 ->
    n+16 so the (bj+16)-row windows (bf16 sublane granularity 16, vs 8
    for f32) stay in bounds on the last tile; live-row lead offsets are
    unchanged, so the in-kernel slices are identical to the f32 path.
    kdinv keeps its (n, n, n) block layout. Ordered
    (kbi, kbj, kbk, kbk_top, kdinv0, kdinv1[, kgd x8])."""
    def rp(a):
        return jnp.pad(a, ((0, 0), (0, 8), (0, 0))).astype(jnp.bfloat16)

    out = [rp(kbi), rp(kbj), rp(kbk), rp(kbk_top),
           kdinv[0].astype(jnp.bfloat16), kdinv[1].astype(jnp.bfloat16)]
    if kgd is not None:
        out += [rp(g) for g in kgd]
    return tuple(out)


def prediff_active(dim: int) -> bool:
    """Build/call-consistent gate for the prediff variant at this size."""
    return PREDIFF and dim <= PREDIFF_MAX_DIM


def _jdiff_dot(X, out_j: int, taps):
    """Banded j-difference via MXU: returns D @ X per leading row, where
    D[(out_j, X.shape[1])] has D[r, r+off] = coef for (off, coef) in taps.
    X is (rows, in_j, n); result (rows, out_j, n)."""
    dtype = X.dtype
    in_j = X.shape[1]
    r = lax.broadcasted_iota(jnp.int32, (out_j, in_j), 0)
    c = lax.broadcasted_iota(jnp.int32, (out_j, in_j), 1)
    D = jnp.zeros((out_j, in_j), dtype)
    for off, coef in taps:
        D = D + coef * (c == r + off).astype(dtype)
    rows = [jnp.dot(D, X[i], preferred_element_type=dtype)
            for i in range(X.shape[0])]
    return jnp.stack(rows, axis=0)

def _flux_ax(xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
             ebk, ebk_top, b: int, J: int, pd=None):
    """fv4 A(u) in telescoping flux form (the reference's flux formulation,
    operators.flux.c / operators/gsrb.flux.c): per face
    ``TF = beta_f*(15*d1 - dbig) + 0.25*(G_t1 + G_t2)`` with
    ``d1 = u_hi - u_lo``, ``dbig = u_hihi - u_lolo`` and mixed-derivative
    flux ``G_t = (beta_f(t+1) - beta_f(t-1)) * (d1(t+1) - d1(t-1))``; each
    cell's contribution is ``TF(face+1) - TF(face)``. Algebraically equal
    to ops/fv4.py:stencil_ax (each interior face flux is shared by its two
    cells).

    The mixed fluxes are built from the three *central-difference fields*
    ``cd_a = u(a+1) - u(a-1)`` computed once and shared: for a face along
    axis ``a`` with tangential ``t``, ``d1(t+1) - d1(t-1) = cd_t(m) -
    cd_t(m-1)`` — one subtraction (and the axis-i G diffs ride the free
    leading axis). Measured on v5e the naive per-axis G evaluation cost
    ~2x the whole main term; this form roughly halves the kernel's VPU
    work, which (not HBM) is the binding constraint.

    Index conventions: ``xj`` is the (b+4, J+4, n) i/j-extended tile with
    k ghost columns ``xglo``/``xghi`` ([far, near] / [near, far]); ext
    index = local cell + 2. Face m along an axis sits between cells m-1
    and m. ``b``/``J`` are the tile's i/j extents; lanes are the full
    level. Returns main + 0.25*mixed (caller applies TWELFTH and
    -b*h2inv), matching stencil_ax's grouping.
    """
    def sl(a, i0, i1, j0, j1):
        return lax.slice(a, (i0, j0, 0), (i1, j1, a.shape[2]))

    q = 0.25
    n = xj.shape[2]

    if PROBE_MAIN_ONLY:
        return _flux_ax_main_only(xj, xglo, xghi, ebi, ebj, ebk, ebk_top,
                                  b, J)

    # central-difference fields (ext index = cell + 2)
    # cdi[r, j, k] = x(i+1) - x(i-1) at i = r,  i in [0, b),  j in [-1, J]
    cdi = sl(xj, 3, b + 3, 1, J + 3) - sl(xj, 1, b + 1, 1, J + 3)
    cdi_glo = (sl(xglo, 3, b + 3, 1, J + 3)
               - sl(xglo, 1, b + 1, 1, J + 3))[..., 1:]
    cdi_ghi = (sl(xghi, 3, b + 3, 1, J + 3)
               - sl(xghi, 1, b + 1, 1, J + 3))[..., :1]
    # cdj[r, j, k] = x(j+1) - x(j-1),  i in [-1, b],  j in [0, J)
    if MXU_JDIFF:
        cdj = _jdiff_dot(sl(xj, 1, b + 3, 0, J + 4), J,
                         [(3, 1.0), (1, -1.0)])
    else:
        cdj = sl(xj, 1, b + 3, 3, J + 3) - sl(xj, 1, b + 3, 1, J + 1)
    cdj_glo = (sl(xglo, 1, b + 3, 3, J + 3)
               - sl(xglo, 1, b + 3, 1, J + 1))[..., 1:]
    cdj_ghi = (sl(xghi, 1, b + 3, 3, J + 3)
               - sl(xghi, 1, b + 3, 1, J + 1))[..., :1]
    # cdk = x(k+1) - x(k-1),  i in [-1, b],  j in [-1, J]
    xt = sl(xj, 1, b + 3, 1, J + 3)
    cdk = (_lane_shift(xt, sl(xglo, 1, b + 3, 1, J + 3),
                       sl(xghi, 1, b + 3, 1, J + 3), 1)
           - _lane_shift(xt, sl(xglo, 1, b + 3, 1, J + 3),
                         sl(xghi, 1, b + 3, 1, J + 3), -1))

    # ---- i faces: m in [0, b+1) between cells m-1, m ----
    d1 = sl(xj, 2, b + 3, 2, J + 2) - sl(xj, 1, b + 2, 2, J + 2)
    dbig = sl(xj, 3, b + 4, 2, J + 2) - sl(xj, 0, b + 1, 2, J + 2)
    bc = ebi[:, 1:J + 1, :]
    # G diffs across the face ride the free leading axis: cd_t(m)-cd_t(m-1)
    if pd is not None:
        # prediff: the tangential beta differences (x0.25) arrive as
        # operands — pure VPU-op savings (see PREDIFF above)
        gj = pd[0] * (cdj[1:] - cdj[:-1])
        gk = pd[1] * (cdk[1:, 1:J + 1] - cdk[:-1, 1:J + 1])
        tf = bc * (15.0 * d1 - dbig) + (gj + gk)            # (b+1, J, n)
    else:
        gj = (ebi[:, 2:, :] - ebi[:, :-2, :]) * (cdj[1:] - cdj[:-1])
        gk = ((_lane_shift(bc, bi_glo[:, 1:J + 1], bi_ghi[:, 1:J + 1], 1)
               - _lane_shift(bc, bi_glo[:, 1:J + 1], bi_ghi[:, 1:J + 1], -1))
              * (cdk[1:, 1:J + 1] - cdk[:-1, 1:J + 1]))
        tf = bc * (15.0 * d1 - dbig) + q * (gj + gk)        # (b+1, J, n)
    ax = tf[1:] - tf[:-1]

    # ---- j faces: m in [0, J+1) ----
    if MXU_JDIFF:
        xjc = sl(xj, 2, b + 2, 0, J + 4)
        d1 = _jdiff_dot(xjc, J + 1, [(2, 1.0), (1, -1.0)])
        dbig = _jdiff_dot(xjc, J + 1, [(3, 1.0), (0, -1.0)])
    else:
        d1 = sl(xj, 2, b + 2, 2, J + 3) - sl(xj, 2, b + 2, 1, J + 2)
        dbig = sl(xj, 2, b + 2, 3, J + 4) - sl(xj, 2, b + 2, 0, J + 1)
    bc = ebj[1:b + 1]
    if pd is not None:
        gi = pd[2] * (cdi[:, 1:, :] - cdi[:, :-1, :])
        gk = pd[3] * (cdk[1:b + 1, 1:] - cdk[1:b + 1, :-1])
        tf = bc * (15.0 * d1 - dbig) + (gi + gk)            # (b, J+1, n)
    else:
        gi = (ebj[2:] - ebj[:-2]) * (cdi[:, 1:, :] - cdi[:, :-1, :])
        gk = ((_lane_shift(bc, bj_glo[1:b + 1], bj_ghi[1:b + 1], 1)
               - _lane_shift(bc, bj_glo[1:b + 1], bj_ghi[1:b + 1], -1))
              * (cdk[1:b + 1, 1:] - cdk[1:b + 1, :-1]))
        tf = bc * (15.0 * d1 - dbig) + q * (gi + gk)        # (b, J+1, n)
    if MXU_JDIFF:
        ax = ax + _jdiff_dot(tf, J, [(1, 1.0), (0, -1.0)])
    else:
        ax = ax + tf[:, 1:, :] - tf[:, :-1, :]

    # ---- k faces: m in [0, n) in lanes + the top face plane ----
    xcc = sl(xj, 2, b + 2, 2, J + 2)                        # (b, J, n)
    gloc = sl(xglo, 2, b + 2, 2, J + 2)
    ghic = sl(xghi, 2, b + 2, 2, J + 2)
    d1 = xcc - _lane_shift(xcc, gloc, ghic, -1)
    d1_top = ghic[..., :1] - xcc[..., n - 1:]
    dbig = (_lane_shift(xcc, gloc, ghic, 1)
            - _lane_shift(xcc, gloc, ghic, -2))
    dbig_top = ghic[..., 1:] - xcc[..., n - 2:n - 1]
    bc = ebk[1:b + 1, 1:J + 1, :]
    cdic = cdi[:, 1:J + 1, :]
    cdjc = cdj[1:b + 1]
    cdi_m1 = _lane_shift(cdic, cdi_glo[:, 1:J + 1], cdi_ghi[:, 1:J + 1], -1)
    cdj_m1 = _lane_shift(cdjc, cdj_glo[1:b + 1], cdj_ghi[1:b + 1], -1)
    if pd is not None:
        gi = pd[4] * (cdic - cdi_m1)
        gj = pd[5] * (cdjc - cdj_m1)
        tf = bc * (15.0 * d1 - dbig) + (gi + gj)            # (b, J, n)
        gi_t = pd[6] * (cdi_ghi[:, 1:J + 1] - cdic[..., n - 1:])
        gj_t = pd[7] * (cdj_ghi[1:b + 1] - cdjc[..., n - 1:])
        tf_top = (ebk_top[1:b + 1, 1:J + 1]
                  * (15.0 * d1_top - dbig_top) + (gi_t + gj_t))
    else:
        gi = (ebk[2:, 1:J + 1] - ebk[:-2, 1:J + 1]) * (cdic - cdi_m1)
        gj = (ebk[1:b + 1, 2:] - ebk[1:b + 1, :-2]) * (cdjc - cdj_m1)
        tf = bc * (15.0 * d1 - dbig) + q * (gi + gj)        # (b, J, n)
        gi_t = ((ebk_top[2:, 1:J + 1] - ebk_top[:-2, 1:J + 1])
                * (cdi_ghi[:, 1:J + 1] - cdic[..., n - 1:]))
        gj_t = ((ebk_top[1:b + 1, 2:] - ebk_top[1:b + 1, :-2])
                * (cdj_ghi[1:b + 1] - cdjc[..., n - 1:]))
        tf_top = (ebk_top[1:b + 1, 1:J + 1]
                  * (15.0 * d1_top - dbig_top) + q * (gi_t + gj_t))
    ax = ax + _lane_shift(tf, None, tf_top, 1) - tf
    return ax


def _flux_ax_main_only(xj, xglo, xghi, ebi, ebj, ebk, ebk_top, b, J):
    """PROBE_MAIN_ONLY body: the main telescoping fluxes only (no mixed
    G terms, no central-difference fields). Timing probe, wrong answers."""
    def sl(a, i0, i1, j0, j1):
        return lax.slice(a, (i0, j0, 0), (i1, j1, a.shape[2]))

    n = xj.shape[2]
    d1 = sl(xj, 2, b + 3, 2, J + 2) - sl(xj, 1, b + 2, 2, J + 2)
    dbig = sl(xj, 3, b + 4, 2, J + 2) - sl(xj, 0, b + 1, 2, J + 2)
    tf = ebi[:, 1:J + 1, :] * (15.0 * d1 - dbig)
    ax = tf[1:] - tf[:-1]

    d1 = sl(xj, 2, b + 2, 2, J + 3) - sl(xj, 2, b + 2, 1, J + 2)
    dbig = sl(xj, 2, b + 2, 3, J + 4) - sl(xj, 2, b + 2, 0, J + 1)
    tf = ebj[1:b + 1] * (15.0 * d1 - dbig)
    ax = ax + tf[:, 1:, :] - tf[:, :-1, :]

    xcc = sl(xj, 2, b + 2, 2, J + 2)
    gloc = sl(xglo, 2, b + 2, 2, J + 2)
    ghic = sl(xghi, 2, b + 2, 2, J + 2)
    d1 = xcc - _lane_shift(xcc, gloc, ghic, -1)
    d1_top = ghic[..., :1] - xcc[..., n - 1:]
    dbig = (_lane_shift(xcc, gloc, ghic, 1)
            - _lane_shift(xcc, gloc, ghic, -2))
    dbig_top = ghic[..., 1:] - xcc[..., n - 2:n - 1]
    tf = ebk[1:b + 1, 1:J + 1, :] * (15.0 * d1 - dbig)
    tf_top = ebk_top[1:b + 1, 1:J + 1] * (15.0 * d1_top - dbig_top)
    ax = ax + _lane_shift(tf, None, tf_top, 1) - tf
    return ax


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _edge_tile_coords(t, nti: int, ntj: int):
    """(ti, tj) of the t-th EDGE tile in the static enumeration used by
    the comm-overlap boundary pass: the ti=0 row, the ti=nti-1 row, then
    the tj=0 and tj=ntj-1 columns minus the corners already covered
    (2*ntj + 2*(nti-2) tiles total). Traced-arithmetic only, so the same
    function serves BlockSpec index maps and the kernel body."""
    in_top = t < ntj
    in_bot = t < 2 * ntj
    in_left = t < 2 * ntj + (nti - 2)
    ti = jnp.where(in_top, 0,
                   jnp.where(in_bot, nti - 1,
                             jnp.where(in_left, t - 2 * ntj + 1,
                                       t - 2 * ntj - (nti - 2) + 1)))
    tj = jnp.where(in_top, t,
                   jnp.where(in_bot, t - ntj,
                             jnp.where(in_left, 0, ntj - 1)))
    return ti, tj


def _fv4_kernel(*refs, n, bi, bj, nti, ntj, mode, b_h2inv, ext=False,
                kperiodic=False, a_alpha=0.0, prediff=False, slab=False,
                cbf16=False, edge1d=False, alias_lead=False):
    """Shared fv4 stencil body on a (bi, bj, n) tile.

    mode: 'apply' -> Ax; 'residual' -> rhs - Ax;
          'gsrb' -> x + kdinv[parity] * (rhs - Ax)

    a_alpha: Helmholtz coefficient ``a``; nonzero adds ``a*alpha*x`` with
    an extra cell-centered ``alpha`` operand (operators.fv4.c:87 u-term).

    ext: the solution window is PRE-extended (the sharded path and the
    periodic single-chip path: radius-2 i/j ghosts — neighbor halos, BC
    fills, or periodic wraps — arrive in the array itself, stored j-padded
    with the live extended rows at fixed offset 6), so no in-kernel
    boundary synthesis or first/last-tile masks are needed; only the k
    (lane) ghosts are still synthesized (the k axis is unsharded).

    kperiodic: the k-axis ghosts wrap (periodic BC, boundary_fv.c periodic
    path): solution lane ghosts are the opposite face's columns and the
    face-coefficient lane ghosts wrap instead of quintic extrapolation.

    edge1d: the grid is the 1D edge-tile enumeration of
    _edge_tile_coords (the comm-overlap BOUNDARY pass). alias_lead:
    refs[0] is the interior pass's output aliased into this call's
    output (input_output_aliases) — ignored by the body; tiles not
    visited by the edge grid keep their interior-pass values.
    """
    if alias_lead:
        refs = refs[1:]
    xw_ref = refs[0]
    k = 1
    ilo_ref = ihi_ref = jlo_ref = jhi_ref = None
    if slab:
        ilo_ref, ihi_ref, jlo_ref, jhi_ref = refs[1:5]
        k = 5
    bi_ref, bj_ref, bk_ref, bktop_ref = refs[k:k + 4]
    k += 4
    pd_refs = None
    if prediff:
        pd_refs = refs[k:k + 8]
        k += 8
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

    if edge1d:
        ti, tj = _edge_tile_coords(pl.program_id(0), nti, ntj)
    else:
        ti = pl.program_id(0)
        tj = pl.program_id(1)

    if slab:
        # masked-style windows over the UNEXTENDED local block; the 2-deep
        # edge ghosts (neighbor halos / BC fills) ride as 4 slab operands
        xi = _slab_tile_axis(xw_ref[...], ilo_ref[...], ihi_ref[...],
                             bi, ti, nti, 0, 2)
        xj = _slab_tile_axis(xi, jlo_ref[:, 0:2, :], jhi_ref[:, 0:2, :],
                             bj, tj, ntj, 1, 8)          # (bi+4, bj+4, n)
    elif ext:
        # window rows [ti*bi, ti*bi+bi+4) x [tj*bj, tj*bj+bj+16) of the
        # (ni+4, nj+16, n) pre-extended array; the tile's extended j rows
        # sit at in-window offset [6, bj+10) by the storage layout
        xj = xw_ref[0:bi + 4, 6:bj + 10, :]              # (bi+4, bj+4, n)
    else:
        # separable boundary extension, same axis order as ghost_fill_fv:
        # i (from interior), then j (reads i-ghosts), then k (reads both)
        xi = _ext_tile_axis(xw_ref[...], bi, ti, nti, 0, 2)
        xj = _ext_tile_axis(xi, bj, tj, ntj, 1, 8)       # (bi+4, bj+4, n)
    if kperiodic:
        xglo = xj[..., n - 2:]                 # wrap: lanes n-2, n-1
        xghi = xj[..., :2]                     # wrap: lanes 0, 1
    else:
        k1lo, k2lo = _v4_ghost_pair(xj, 2, lo=True)
        k1hi, k2hi = _v4_ghost_pair(xj, 2, lo=False)
        xglo = jnp.concatenate([k2lo, k1lo], axis=-1)
        xghi = jnp.concatenate([k1hi, k2hi], axis=-1)

    # face coefficients: i/j tangential ghosts are baked into the j-padded
    # storage at fixed in-window offsets (see kernel_beta_views); only the
    # lane (k) ghosts of kbi/kbj are rebuilt here. Under BF16C (cbf16)
    # the operands arrive as bf16 streams and are widened to the compute
    # dtype right after the window slice (same lead offsets — the bf16
    # views are just j-padded 8 rows further).
    cvt = (lambda v: v.astype(xj.dtype)) if cbf16 else (lambda v: v)
    ebi = cvt(bi_ref[:, 3:bj + 5, :])       # (bi+1, bj+2, n)
    ebj = cvt(bj_ref[:, 4:bj + 5, :])       # (bi+2, bj+1, n)
    ebk = cvt(bk_ref[:, 3:bj + 5, :])       # (bi+2, bj+2, n)
    ebk_top = cvt(bktop_ref[:, 3:bj + 5, :])
    pd = None
    if prediff:
        # the tangential beta differences arrive precomputed (kgd); the
        # beta lane ghosts they were built from are baked in at MGBuild
        bi_glo = bi_ghi = bj_glo = bj_ghi = None
        pd = (cvt(pd_refs[0][:, 4:bj + 4, :]), cvt(pd_refs[1][:, 4:bj + 4, :]),
              cvt(pd_refs[2][:, 4:bj + 5, :]), cvt(pd_refs[3][:, 4:bj + 5, :]),
              cvt(pd_refs[4][:, 4:bj + 4, :]), cvt(pd_refs[5][:, 4:bj + 4, :]),
              cvt(pd_refs[6][:, 4:bj + 4, :]), cvt(pd_refs[7][:, 4:bj + 4, :]))
    elif kperiodic:
        bi_glo = ebi[..., n - 1:]
        bi_ghi = ebi[..., :1]
        bj_glo = ebj[..., n - 1:]
        bj_ghi = ebj[..., :1]
    else:
        bi_glo = _quintic_ghost(ebi, 2, lo=True)
        bi_ghi = _quintic_ghost(ebi, 2, lo=False)
        bj_glo = _quintic_ghost(ebj, 2, lo=True)
        bj_ghi = _quintic_ghost(ebj, 2, lo=False)

    ax = (-b_h2inv / 12.0) * _flux_ax(
        xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
        ebk, ebk_top, bi, bj, pd=pd)
    if a_alpha:
        ax = ax + a_alpha * alpha_ref[...] * xj[2:2 + bi, 2:2 + bj, :]

    if mode == "apply":
        out_ref[...] = ax
        return
    if mode == "residual":
        out_ref[...] = rhs_ref[...] - ax
        return
    if mode == "fres":
        # fused restriction (restriction.c:104 fed by residual.c:9-51):
        # halve i (free leading-dim pair sum) and k (lane matmul on the
        # idle MXU) in-kernel; the j halving runs outside at 1/4 data
        # (kernels/restrict.py)
        from hpgmg_tpu.kernels.restrict import restrict_halve_ik

        out_ref[...] = restrict_halve_ik(rhs_ref[...] - ax, rk_ref[...])
        return

    # GSRB masked update: the red/black mask is pre-folded into the
    # per-parity dinv field (kdinv, zeros at non-updated cells) — the
    # GSRB_FP trick (gsrb.c:78-87) moved to MGBuild time, saving ~5 VPU
    # passes of in-kernel iota/mask work per half-sweep
    xc = xj[2:2 + bi, 2:2 + bj, :]
    dinv = dinv_ref[...].astype(xj.dtype) if cbf16 else dinv_ref[...]
    out_ref[...] = xc + dinv * (rhs_ref[...] - ax)


def _prediff_specs(bi: int, bj: int, n: int, bmap, jpad: int = 8,
                   ring: int = 0):
    """BlockSpecs for the 8 kgd operands (kernel_beta_prediff order):
    i-face diffs ride the (bi+1)-row face window, j/k-face diffs the
    bi-row cell window; all share the aligned (bj+jpad) sublane window
    (jpad = 8 for the f32 views, 16 for the bf16 BF16C views).
    ``ring=4`` selects the GSRB2_FV4 +2-ring windows (the i ring rides
    the +2 i-pad of the views; the caller's bmap must then NOT add the
    +2 live offset)."""
    E = pl.Element
    fspec = pl.BlockSpec((E(bi + 1 + ring), E(bj + jpad), E(n)), bmap)
    cspec = pl.BlockSpec((E(bi + ring), E(bj + jpad), E(n)), bmap)
    tspec = pl.BlockSpec((E(bi + ring), E(bj + jpad), E(1)), bmap)
    return [fspec, fspec, cspec, cspec, cspec, cspec, tspec, tspec]


def _fv4_call(level: Level, x, rhs, dinv, cfg: SolverConfig, mode: str):
    n = level.dim
    prediff = getattr(level, "kgd", None) is not None
    bi, bj = tile_shape(n, prediff)
    nti, ntj = n // bi, n // bj
    # note: parity enters only through which kdinv field rides in `dinv` —
    # both half-sweeps share ONE compiled kernel
    a_alpha = cfg.a if cfg.helmholtz else 0.0
    kb16 = getattr(level, "kb16", None)
    use16 = mode == "gsrb" and kb16 is not None
    kernel = functools.partial(
        _fv4_kernel, n=n, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        b_h2inv=cfg.b * level.h2inv, a_alpha=a_alpha, prediff=prediff,
        cbf16=use16)

    E = pl.Element

    def xmap(ti, tj):
        # j (sublane) window offsets must be PROVABLY multiples of 8 for
        # Mosaic, and its divisibility analysis cannot see through clamp —
        # so clip in units of 8 and scale after (i, the untiled leading
        # axis, can clamp at cell granularity)
        return (jnp.clip(ti * bi - 2, 0, n - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (n - bj - 16) // 8), 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    def bmap2(ti, tj):
        # the beta views are i-padded by 2 (kernel_beta_views) so the
        # GSRB2 ring windows are offset-exact; the half-sweep windows
        # read the live rows at +2
        return (ti * bi + 2, tj * bj, 0)

    # x needs the full +-2 halo inside an 8-aligned window (bj+16 rows);
    # the betas only need their +-1 tangential ghosts, which the n+8
    # padded storage serves at fixed offsets from a (bj+8)-row window.
    # BF16C smoother streams ride n+16-padded bf16 views through
    # (bj+16)-row windows (bf16 sublane granularity 16), same offsets.
    jp = 16 if use16 else 8
    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(n)), xmap),
        pl.BlockSpec((E(bi + 1), E(bj + jp), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + jp), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + jp), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + jp), E(1)), bmap2),
    ]
    args = [x] + (list(kb16[0:4]) if use16
                  else [level.kbi, level.kbj, level.kbk, level.kbk_top])
    if prediff:
        if use16:
            assert len(kb16) >= 14, "kb16 built without the kgd entries"
        in_specs += _prediff_specs(bi, bj, n, bmap2, jp)
        args += list(kb16[6:14]) if use16 else list(level.kgd)
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
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# sub-tiled masked kernel (SUBTILE)
# ---------------------------------------------------------------------------

# The masked kernel's HBM traffic is set by the window-overlap factor
# (bi+4)(bj+16)/(bi*bj) for x and (bi+2)(bj+8)/(bi*bj) per coefficient:
# at the VMEM-capped (8, 128) tile at 512^3 the x window re-fetches
# 2.25x. What caps the tile size is NOT the streamed windows but the
# stencil TEMPORARIES (ext blends, cd fields, face fluxes), which the
# plain kernel materializes at full-tile extent: (16, 128)@512 needs
# ~124 MB scoped vmem and hangs/errors the Mosaic compile.
#
# The sub-tiled variant decouples the two: the (bi, bj) tile is streamed
# ONCE per launch (one big window fetch), but the stencil body runs in
# an unrolled Python loop over si-row sub-tiles along i — the UNTILED
# leading axis, so every sub-tile slice is a static leading-axis slice —
# keeping all temporaries (si+4)-row-sized. (32, 64)@512 then fits:
# x overlap 1.56x instead of 2.25x, coefficient overlap 1.34x instead
# of 1.86x, ~20% fewer bytes per half-sweep at identical arithmetic.
# A/B via bench/kernel_sweep.py --subtile; masked Dirichlet
# single-chip only (the ext/slab paths have no first/last-tile masks
# and different VMEM anatomy).
SUBTILE = False
SUBTILE_SI = 8
_VMEM_BUDGET_SUBTILE = 88 * 2 ** 20


def _vmem_bytes_subtile(n: int, bi: int, bj: int, si: int,
                        prediff: bool = False) -> int:
    """f32 VMEM estimate for one sub-tiled (bi, bj) tile: the same
    double-buffered windows as ``_vmem_bytes`` plus SUB-tile-sized
    temporaries (the whole point of the variant)."""
    ln = -(-n // 128) * 128
    ncoef = 9 if prediff else 3
    win = ((bi + 4) * (bj + 16) * ln
           + ncoef * (bi + 2) * (bj + 8) * ln
           + 3 * bi * bj * ln)
    tmp = (4 * (si + 4) * (bj + 16) * ln      # window-slice blend + ext
           + 10 * (si + 4) * (bj + 8) * ln)   # cd fields / fluxes
    return 4 * (2 * win + tmp)


def tile_shape_subtile(n: int, prediff=None, si: int = None):
    """(bi, bj) for the sub-tiled masked kernel: minimize streamed window
    bytes per cell under the subtile VMEM budget. Same grid constraints
    as ``tile_shape`` plus bi % si == 0."""
    if prediff is None:
        prediff = prediff_active(n)
    if si is None:
        si = SUBTILE_SI
    ncoef = 9 if prediff else 3
    best = None
    for bj in (128, 64, 48, 32, 24, 16, 8):
        if n % bj or n // bj < 2 or n < bj + 16:
            continue
        for bi in (64, 48, 32, 24, 16, 8):
            if n % bi or n // bi < 2 or bi % si:
                continue
            if _vmem_bytes_subtile(n, bi, bj, si, prediff) \
                    > _VMEM_BUDGET_SUBTILE:
                continue
            bytes_per_cell = ((bi + 4) * (bj + 16)
                              + ncoef * (bi + 2) * (bj + 8)
                              + 3 * bi * bj) / float(bi * bj)
            key = (-bytes_per_cell, bj, bi)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def _fv4_kernel_subtile(*refs, n, bi, bj, si, nti, ntj, mode, b_h2inv,
                        a_alpha=0.0, prediff=False):
    """Sub-tiled masked fv4 stencil body (see the SUBTILE note above).

    Streams the same operand windows as ``_fv4_kernel`` at (bi, bj),
    then computes si rows at a time: for sub-tile ``s`` covering local
    cells [s*si, s*si+si) the window rows it needs are
    [s*si - 2 - clip, ...) where clip is the xmap clamp (+2 on the first
    tile, -2 on the last) — three STATIC candidate slices blended with
    the same first/last-tile 0/1 masks ``_ext_tile_axis`` uses, so no
    dynamic slicing at all. Each sub-tile is then an independent run of
    the standard masked pipeline (i/j boundary extension with a VIRTUAL
    tile index ti*nsub+s over nti*nsub, k ghosts, ``_flux_ax``) with
    (si+4)-row temporaries."""
    xw_ref = refs[0]
    k = 1
    bi_ref, bj_ref, bk_ref, bktop_ref = refs[k:k + 4]
    k += 4
    pd_refs = None
    if prediff:
        pd_refs = refs[k:k + 8]
        k += 8
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
    out_ref = refs[k]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    xw = xw_ref[...]
    mf = (ti == 0).astype(xw.dtype)         # window clamped +2
    ml = (ti == nti - 1).astype(xw.dtype)   # window clamped -2
    nsub = bi // si
    ntv = nti * nsub

    # full-tile coefficient windows (j slices as in _fv4_kernel); rows
    # are sub-sliced per sub-tile below — alignment-agnostic: a window
    # whose rows serve cells [0, bi) serves sub-tile s at [s*si, ...)
    # with the extent shrunk by bi - si.
    ebi_t = bi_ref[...][:, 3:bj + 5, :]       # (bi+1, bj+2, n)
    ebj_t = bj_ref[...][:, 4:bj + 5, :]       # (bi+2, bj+1, n)
    ebk_t = bk_ref[...][:, 3:bj + 5, :]       # (bi+2, bj+2, n)
    ebktop_t = bktop_ref[...][:, 3:bj + 5, :]
    pd_t = None
    if prediff:
        pd_t = (pd_refs[0][...][:, 4:bj + 4, :],
                pd_refs[1][...][:, 4:bj + 4, :],
                pd_refs[2][...][:, 4:bj + 5, :],
                pd_refs[3][...][:, 4:bj + 5, :],
                pd_refs[4][...][:, 4:bj + 4, :],
                pd_refs[5][...][:, 4:bj + 4, :],
                pd_refs[6][...][:, 4:bj + 4, :],
                pd_refs[7][...][:, 4:bj + 4, :])

    for s in range(nsub):
        c0 = s * si
        # window rows for this sub-tile: interior tiles at c0, first
        # tile at c0-2 (clamped 0), last at c0+2 (clamped bi-si)
        w_mid = xw[c0:c0 + si + 4]
        w_first = xw[max(c0 - 2, 0):max(c0 - 2, 0) + si + 4]
        w_last = xw[min(c0 + 2, bi - si):min(c0 + 2, bi - si) + si + 4]
        ws = mf * w_first + (1.0 - mf - ml) * w_mid + ml * w_last
        tv = ti * nsub + s
        xi = _ext_tile_axis(ws, si, tv, ntv, 0, 2)
        xj = _ext_tile_axis(xi, bj, tj, ntj, 1, 8)   # (si+4, bj+4, n)
        k1lo, k2lo = _v4_ghost_pair(xj, 2, lo=True)
        k1hi, k2hi = _v4_ghost_pair(xj, 2, lo=False)
        xglo = jnp.concatenate([k2lo, k1lo], axis=-1)
        xghi = jnp.concatenate([k1hi, k2hi], axis=-1)

        ebi = ebi_t[c0:c0 + si + 1]
        ebj = ebj_t[c0:c0 + si + 2]
        ebk = ebk_t[c0:c0 + si + 2]
        ebk_top = ebktop_t[c0:c0 + si + 2]
        pd = None
        if prediff:
            bi_glo = bi_ghi = bj_glo = bj_ghi = None
            pd = (pd_t[0][c0:c0 + si + 1], pd_t[1][c0:c0 + si + 1],
                  pd_t[2][c0:c0 + si], pd_t[3][c0:c0 + si],
                  pd_t[4][c0:c0 + si], pd_t[5][c0:c0 + si],
                  pd_t[6][c0:c0 + si], pd_t[7][c0:c0 + si])
        else:
            bi_glo = _quintic_ghost(ebi, 2, lo=True)
            bi_ghi = _quintic_ghost(ebi, 2, lo=False)
            bj_glo = _quintic_ghost(ebj, 2, lo=True)
            bj_ghi = _quintic_ghost(ebj, 2, lo=False)

        ax = (-b_h2inv / 12.0) * _flux_ax(
            xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
            ebk, ebk_top, si, bj, pd=pd)
        if a_alpha:
            ax = ax + (a_alpha * alpha_ref[c0:c0 + si]
                       * xj[2:2 + si, 2:2 + bj, :])
        if mode == "apply":
            out_ref[c0:c0 + si] = ax
        elif mode == "residual":
            out_ref[c0:c0 + si] = rhs_ref[c0:c0 + si] - ax
        else:
            cc = xj[2:2 + si, 2:2 + bj, :]
            out_ref[c0:c0 + si] = cc + dinv_ref[c0:c0 + si] * (
                rhs_ref[c0:c0 + si] - ax)


def _fv4_call_subtile(level: Level, x, rhs, dinv, cfg: SolverConfig,
                      mode: str):
    """Launch the sub-tiled masked kernel (same operand plumbing as
    ``_fv4_call`` minus the BF16C path)."""
    n = level.dim
    prediff = getattr(level, "kgd", None) is not None
    bi, bj = tile_shape_subtile(n, prediff)
    si = SUBTILE_SI
    nti, ntj = n // bi, n // bj
    a_alpha = cfg.a if cfg.helmholtz else 0.0
    kernel = functools.partial(
        _fv4_kernel_subtile, n=n, bi=bi, bj=bj, si=si, nti=nti, ntj=ntj,
        mode=mode, b_h2inv=cfg.b * level.h2inv, a_alpha=a_alpha,
        prediff=prediff)

    E = pl.Element

    def xmap(ti, tj):
        return (jnp.clip(ti * bi - 2, 0, n - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (n - bj - 16) // 8), 0)

    def bmap2(ti, tj):
        return (ti * bi + 2, tj * bj, 0)

    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(n)), xmap),
        pl.BlockSpec((E(bi + 1), E(bj + 8), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(n)), bmap2),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(1)), bmap2),
    ]
    args = [x, level.kbi, level.kbj, level.kbk, level.kbk_top]
    if prediff:
        in_specs += _prediff_specs(bi, bj, n, bmap2)
        args += list(level.kgd)
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

    return pl.pallas_call(
        kernel,
        grid=(nti, ntj),
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct(level.shape, x.dtype),
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(*args)


def tile_shape_local(ni: int, nj: int, nk: int, prediff: bool = False):
    """(bi, bj) for a PER-SHARD (ni, nj, nk) block in ext mode. Looser than
    ``tile_shape``: no >= 2-tile minimum (the first/last-tile masks are
    gone — ghosts are pre-filled), only divisibility + the sublane
    multiple-of-8 rule + the VMEM budget."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if bj > nj or nj % bj:
            continue
        for bi in (64, 32, 16, 8, 4):
            if bi > ni or ni % bi:
                continue
            if _vmem_bytes(nk, bi, bj, prediff) > _budget(prediff):
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def fv4_call_ext(x_ext, kbi, kbj, kbk, kbk_top, rhs, dinv, mode: str,
                 b_h2inv: float, kperiodic: bool = False,
                 a_alpha: float = 0.0, alpha=None, kgd=None,
                 ipad: int = 0):
    """Pallas call on ONE shard's pre-extended block (the shard_map body of
    the distributed fast path, parallel/shard_kernels.py).

    x_ext: (ni+4, nj+16, nk) — i-extended by 2, j-extended rows stored at
    [6, nj+10) of the padded j axis (ghosts = neighbor halos or BC fills);
    kbi (ni+1, nj+8, nk) / kbj (ni+2, nj+8, nk) / kbk + kbk_top: per-shard
    kernel-layout coefficient views (build_sharded_views layout; the
    single-chip caller passes the i-padded kernel_beta_views with
    ``ipad=2``); rhs/dinv: (ni, nj, nk) or None per mode.
    """
    ni, nj, nk = x_ext.shape[0] - 4, x_ext.shape[1] - 16, x_ext.shape[2]
    ts = tile_shape_local(ni, nj, nk, kgd is not None)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    kernel = functools.partial(
        _fv4_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        b_h2inv=b_h2inv, ext=True, kperiodic=kperiodic, a_alpha=a_alpha,
        prediff=kgd is not None)

    E = pl.Element

    def xmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    def bmap(ti, tj):
        return (ti * bi + ipad, tj * bj, 0)

    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(nk)), xmap),
        pl.BlockSpec((E(bi + 1), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(1)), bmap),
    ]
    args = [x_ext, kbi, kbj, kbk, kbk_top]
    if kgd is not None:
        # single-chip callers pass the i-padded global kgd (ipad=2);
        # sharded callers pass unpadded per-shard cuts (ipad=0)
        in_specs += _prediff_specs(bi, bj, nk, bmap)
        args += list(kgd)
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
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(*args)


def tile_shape_slab(ni: int, nj: int, nk: int, prediff: bool = False):
    """(bi, bj) for the slab-operand kernel on a local (ni, nj, nk) block:
    the masked-style clamped windows need >= 2 tiles per axis (distinct
    first/last blend cases) and nj >= bj+16 / ni >= bi+4 so the clamped
    window fits; VMEM like the masked kernel (slabs are thin)."""
    best = None
    for bj in (64, 48, 32, 24, 16, 8):
        if nj % bj or nj // bj < 2 or nj < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if ni % bi or ni // bi < 2 or ni < bi + 4:
                continue
            if _vmem_bytes(nk, bi, bj, prediff) > _budget(prediff):
                continue
            key = (bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def fv4_call_slab(x, islab_lo, islab_hi, jslab_lo, jslab_hi,
                  kbi, kbj, kbk, kbk_top, rhs, dinv, mode: str,
                  b_h2inv: float, kperiodic: bool = False,
                  a_alpha: float = 0.0, alpha=None, kgd=None,
                  ipad: int = 0):
    """Pallas call on ONE shard's UNEXTENDED block with the 2-deep edge
    ghosts as 4 thin slab operands (the distributed slab fast path,
    parallel/shard_kernels.py). Runs the masked-kernel window structure —
    no pre-extended array materialization, no ext-mode window overhead
    (ext measured 1.48x the masked kernel at 512 lanes).

    x: (ni, nj, nk); islab_lo/hi: (2, nj, nk) rows [far, near]/[near,
    far]; jslab_lo/hi: (ni+4, 8, nk) with the 2 live rows leading (the
    i-extended j-face strips, so corner ghosts arrive transitively);
    kbi/kbj/kbk/kbk_top: per-shard kernel-layout views (same layout as
    the ext path / build_sharded_views; single-chip callers pass the
    i-padded global kernel_beta_views with ``ipad=2``); rhs/dinv:
    (ni, nj, nk) or None.
    """
    ni, nj, nk = x.shape
    ts = tile_shape_slab(ni, nj, nk, kgd is not None)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    kernel = functools.partial(
        _fv4_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        b_h2inv=b_h2inv, kperiodic=kperiodic, a_alpha=a_alpha, slab=True,
        prediff=kgd is not None)

    E = pl.Element

    def xmap(ti, tj):
        return (jnp.clip(ti * bi - 2, 0, ni - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (nj - bj - 16) // 8), 0)

    def imap(ti, tj):  # i slabs: window-aligned j offsets only
        return (0, xmap(ti, tj)[1], 0)

    def jmap(ti, tj):
        # j slabs: the slab's leading axis is the i-EXTENDED axis (row r
        # is cell r-2), so offset ti*bi covers the tile's extended rows
        # [ti*bi-2, ti*bi+bi+2) for first/interior/last alike
        return (ti * bi, 0, 0)

    def bmap(ti, tj):
        return (ti * bi + ipad, tj * bj, 0)

    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(nk)), xmap),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap),
        pl.BlockSpec((E(bi + 1), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(1)), bmap),
    ]
    args = [x, islab_lo, islab_hi, jslab_lo, jslab_hi,
            kbi, kbj, kbk, kbk_top]
    if kgd is not None:
        in_specs += _prediff_specs(bi, bj, nk, bmap)
        args += list(kgd)
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
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(*args)


def overlap_grid_shape(ni: int, nj: int, nk: int, prediff: bool = False):
    """(nti, ntj) if the comm-overlap two-pass split applies to a local
    (ni, nj, nk) block: the slab tiling must exist with >= 3 tiles per
    axis (pass 1 needs a non-empty interior grid; with 2 tiles every
    tile is an edge tile and the plain slab call is the right shape)."""
    ts = tile_shape_slab(ni, nj, nk, prediff)
    if ts is None:
        return None
    nti, ntj = ni // ts[0], nj // ts[1]
    return (nti, ntj) if nti >= 3 and ntj >= 3 else None


def fv4_call_overlap(x, islab_lo, islab_hi, jslab_lo, jslab_hi,
                     kbi, kbj, kbk, kbk_top, rhs, dinv, mode: str,
                     b_h2inv: float, kperiodic: bool = False,
                     a_alpha: float = 0.0, alpha=None, kgd=None,
                     ipad: int = 0):
    """Comm-overlap split of ``fv4_call_slab`` (the reference overlaps
    local block copies with the in-flight MPI sends and ships overlap
    kernel variants: exchange_boundary.c:48-56,
    operators.test/exchange_boundary_overlap.c).

    Pass 1 (INTERIOR) computes every fully-interior tile from the LOCAL
    block only — it takes none of the 4 slab operands, so it carries no
    data dependency on the halo ppermutes and XLA's latency-hiding
    scheduler is free to run it while the collective-permutes are in
    flight. Pass 2 (BOUNDARY) computes the 2*ntj + 2*(nti-2) edge tiles
    through the ordinary slab-mode kernel on a 1D edge-tile grid,
    writing into pass 1's buffer via ``input_output_aliases`` (tiles the
    edge grid never visits keep their interior-pass values — no
    assembly copy). Same operands and results as ``fv4_call_slab``;
    requires ``overlap_grid_shape(...) is not None``.
    """
    assert mode in ("apply", "residual", "gsrb"), mode
    ni, nj, nk = x.shape
    ts = tile_shape_slab(ni, nj, nk, kgd is not None)
    assert ts is not None, (ni, nj, nk)
    bi, bj = ts
    nti, ntj = ni // bi, nj // bj
    assert nti >= 3 and ntj >= 3, (nti, ntj)
    E = pl.Element

    def extra_operands(tile_map):
        specs, args = [], []
        tile_spec = pl.BlockSpec((bi, bj, nk), tile_map)
        if a_alpha:
            specs.append(tile_spec)
            args.append(alpha)
        if mode != "apply":
            specs.append(tile_spec)
            args.append(rhs)
        if mode == "gsrb":
            specs.append(tile_spec)
            args.append(dinv)
        return specs, args

    cp = None if INTERPRET else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)

    # ---- pass 1: interior tiles, local-block operands only ------------
    # ext-mode body: the (bi+4, bj+16) window at interior offsets holds
    # the full +-2 halo inside the local block, and ext's fixed [6,
    # bj+10) live-row slice is exactly the interior-window arithmetic —
    # no first/last masks, no ghost synthesis except the unsharded lanes.
    kern_i = functools.partial(
        _fv4_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        b_h2inv=b_h2inv, ext=True, kperiodic=kperiodic, a_alpha=a_alpha,
        prediff=kgd is not None)

    def xmap_i(ti, tj):
        return (ti * bi + bi - 2, 8 * ((tj + 1) * (bj // 8) - 1), 0)

    def bmap_i(ti, tj):
        return ((ti + 1) * bi + ipad, (tj + 1) * bj, 0)

    def tmap_i(ti, tj):
        return (ti + 1, tj + 1, 0)

    in_specs = [
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(nk)), xmap_i),
        pl.BlockSpec((E(bi + 1), E(bj + 8), E(nk)), bmap_i),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap_i),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap_i),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(1)), bmap_i),
    ]
    args = [x, kbi, kbj, kbk, kbk_top]
    if kgd is not None:
        in_specs += _prediff_specs(bi, bj, nk, bmap_i)
        args += list(kgd)
    especs, eargs = extra_operands(tmap_i)
    y = pl.pallas_call(
        kern_i, grid=(nti - 2, ntj - 2),
        in_specs=in_specs + especs,
        out_specs=pl.BlockSpec((bi, bj, nk), tmap_i),
        out_shape=jax.ShapeDtypeStruct((ni, nj, nk), x.dtype),
        compiler_params=cp, interpret=INTERPRET)(*(args + eargs))

    # ---- pass 2: edge tiles, slab-mode kernel on the 1D edge grid -----
    kern_e = functools.partial(
        _fv4_kernel, n=nk, bi=bi, bj=bj, nti=nti, ntj=ntj, mode=mode,
        b_h2inv=b_h2inv, kperiodic=kperiodic, a_alpha=a_alpha, slab=True,
        prediff=kgd is not None, edge1d=True, alias_lead=True)

    def xmap_e(t):
        ti, tj = _edge_tile_coords(t, nti, ntj)
        return (jnp.clip(ti * bi - 2, 0, ni - bi - 4),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (nj - bj - 16) // 8), 0)

    def imap_e(t):
        return (0, xmap_e(t)[1], 0)

    def jmap_e(t):
        return (_edge_tile_coords(t, nti, ntj)[0] * bi, 0, 0)

    def bmap_e(t):
        ti, tj = _edge_tile_coords(t, nti, ntj)
        return (ti * bi + ipad, tj * bj, 0)

    def tmap_e(t):
        ti, tj = _edge_tile_coords(t, nti, ntj)
        return (ti, tj, 0)

    in_specs2 = [
        pl.BlockSpec((bi, bj, nk), tmap_e),          # aliased pass-1 out
        pl.BlockSpec((E(bi + 4), E(bj + 16), E(nk)), xmap_e),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap_e),
        pl.BlockSpec((E(2), E(bj + 16), E(nk)), imap_e),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap_e),
        pl.BlockSpec((E(bi + 4), E(8), E(nk)), jmap_e),
        pl.BlockSpec((E(bi + 1), E(bj + 8), E(nk)), bmap_e),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap_e),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(nk)), bmap_e),
        pl.BlockSpec((E(bi + 2), E(bj + 8), E(1)), bmap_e),
    ]
    args2 = [y, x, islab_lo, islab_hi, jslab_lo, jslab_hi,
             kbi, kbj, kbk, kbk_top]
    if kgd is not None:
        in_specs2 += _prediff_specs(bi, bj, nk, bmap_e)
        args2 += list(kgd)
    especs2, eargs2 = extra_operands(tmap_e)
    n_edge = 2 * ntj + 2 * (nti - 2)
    return pl.pallas_call(
        kern_e, grid=(n_edge,),
        in_specs=in_specs2 + especs2,
        out_specs=pl.BlockSpec((bi, bj, nk), tmap_e),
        out_shape=jax.ShapeDtypeStruct((ni, nj, nk), x.dtype),
        input_output_aliases={0: 0},
        compiler_params=cp, interpret=INTERPRET)(*(args2 + eargs2))


def single_chip_slabs(x, bc: BC):
    """BC-fill slabs for driving the slab kernel on one whole-domain
    block (tests + the kernel_sweep A/B): i slabs from the quartic
    Dirichlet fill or wrap; j slabs from the i-EXTENDED thin strips so
    corners match the i-then-j apply_BCs_v4 order — all thin ops, no
    n^3 materialization."""
    n = x.shape[0]
    if bc == BC.PERIODIC:
        ilo, ihi = x[n - 2:, :, :], x[:2, :, :]
    else:
        g1, g2 = _v4_ghost_pair(x, 0, lo=True)
        ilo = jnp.concatenate([g2, g1], axis=0)
        g1, g2 = _v4_ghost_pair(x, 0, lo=False)
        ihi = jnp.concatenate([g1, g2], axis=0)

    def strip(j0, j1):
        return jnp.concatenate(
            [ilo[:, j0:j1], x[:, j0:j1], ihi[:, j0:j1]], axis=0)

    nj = x.shape[1]
    if bc == BC.PERIODIC:
        jlo, jhi = strip(nj - 2, nj), strip(0, 2)
    else:
        g1, g2 = _v4_ghost_pair(strip(0, 4), 1, lo=True)
        jlo = jnp.concatenate([g2, g1], axis=1)
        g1, g2 = _v4_ghost_pair(strip(nj - 4, nj), 1, lo=False)
        jhi = jnp.concatenate([g1, g2], axis=1)
    pad8 = lambda a: jnp.pad(a, ((0, 0), (0, 6), (0, 0)))  # noqa: E731
    return ilo, ihi, pad8(jlo), pad8(jhi)


def _extend_ij_single(x, bc: BC):
    """Single-chip i/j extension into the ext-mode layout (n+4, n+16, n):
    periodic wrap, or the separable quartic Dirichlet fill (i from
    interior, then j reading the i-ghosts)."""
    if bc == BC.PERIODIC:
        xe = jnp.pad(x, ((2, 2), (2, 2), (0, 0)), mode="wrap")
    else:
        from hpgmg_tpu.ops.bc_fv import _extend_axis_v4

        xe = _extend_axis_v4(_extend_axis_v4(x, 0, 2), 1, 2)
    return jnp.pad(xe, ((0, 0), (6, 6), (0, 0)))


def _fv4_call_single_ext(level: Level, x, rhs, dinv, cfg: SolverConfig,
                         mode: str):
    """Single-chip launch through the ext-mode kernel: ghosts are
    materialized by XLA outside the kernel (one fused pad+fill pass) —
    required for periodic BCs (wrap ghosts live on the opposite domain
    face, outside any local window) and available as an A/B alternative
    for Dirichlet."""
    xe = _extend_ij_single(x, cfg.bc)
    return fv4_call_ext(xe, level.kbi, level.kbj, level.kbk, level.kbk_top,
                        rhs, dinv, mode, cfg.b * level.h2inv,
                        kperiodic=cfg.bc == BC.PERIODIC,
                        a_alpha=cfg.a if cfg.helmholtz else 0.0,
                        alpha=level.alpha, kgd=getattr(level, "kgd", None),
                        ipad=2)


# Dirichlet single-chip A/B switch: masked in-kernel ghost synthesis
# (default) vs pre-extended ext-mode. Periodic always uses ext mode.
SINGLE_EXT = False


def _single_call(level: Level, x, rhs, dinv, cfg: SolverConfig, mode: str):
    if cfg.bc == BC.PERIODIC or SINGLE_EXT:
        return _fv4_call_single_ext(level, x, rhs, dinv, cfg, mode)
    if (SUBTILE and getattr(level, "kb16", None) is None
            and tile_shape_subtile(
                level.dim, getattr(level, "kgd", None) is not None)
            is not None):
        return _fv4_call_subtile(level, x, rhs, dinv, cfg, mode)
    return _fv4_call(level, x, rhs, dinv, cfg, mode)


def fv4_apply_pallas(level: Level, x, cfg: SolverConfig):
    return _single_call(level, x, None, None, cfg, "apply")


def fv4_residual_pallas(level: Level, x, rhs, cfg: SolverConfig):
    return _single_call(level, x, rhs, None, cfg, "residual")


def fv4_restrict_residual_pallas(level: Level, x, rhs, cfg: SolverConfig):
    """Fused restrict(residual(...)): the stencil kernel halves i and k
    in-kernel (mode='fres', never materializing the fine residual), the
    remaining j halving is one einsum at 1/4 data (kernels/restrict.py).
    Masked Dirichlet path only (the suite gates periodic/SINGLE_EXT/
    sharded to the unfused pair). Matches restriction.c:104 applied to
    residual.c:9-51's output."""
    from hpgmg_tpu.kernels.restrict import restrict_j_einsum

    return restrict_j_einsum(_fv4_call(level, x, rhs, None, cfg, "fres"))


def fv4_gsrb_sweep_pallas(level: Level, x, rhs, cfg: SolverConfig,
                          parity: int):
    """One GSRB half-sweep, boundary fill fused into the stencil kernel.
    With the BF16C smoother views attached (Level.kb16, masked Dirichlet
    mode only) the parity-folded dinv rides as the bf16 copy."""
    kb16 = getattr(level, "kb16", None)
    if kb16 is not None and not (cfg.bc == BC.PERIODIC or SINGLE_EXT):
        return _fv4_call(level, x, rhs, kb16[4 + (parity & 1)], cfg, "gsrb")
    return _single_call(level, x, rhs, level.kdinv[parity & 1], cfg, "gsrb")


# ---------------------------------------------------------------------------
# kernel-layout coefficient views (stored on Level by rebuild_operator)
# ---------------------------------------------------------------------------

def kernel_beta_views(beta_i_ext, beta_j_ext, beta_k_ext):
    """Slice the tangentially-extended face coefficients into the
    lane-aligned, j-padded kernel layout (trailing dim exactly n; j dim
    padded to n+8 so a (bj+8)-row window at offset tj*bj covers the tile's
    tangential ghost rows at a fixed in-window offset). The i (leading)
    axis is additionally zero-padded by 2 rows each side (~4 MB at 512^3)
    so the SAME views serve both the half-sweep kernel (windows at
    ``ti*bi + 2``) and the fused double-sweep kernel (GSRB2_FV4: ring
    windows at ``ti*bi`` — i is the unconstrained leading axis, so both
    offsets are Element-exact with no alignment blends):

    kbi (n+5, n+8, n): i-faces 0..n at i-pad offset +2; live j-rows
        (ghost -1 .. n) at pad offset +3 (half-sweep window rows
        [3, bj+5)); k-ghosts dropped (rebuilt in-kernel)
    kbj (n+6, n+8, n): i-cells -1..n at i-pad +2; j-faces (0..n) at pad
        offset +4 (rows [4, bj+5))
    kbk (n+6, n+8, n) + kbk_top (n+6, n+8, 1): k-faces — the face axis in
        lanes would pad n+1 -> 2x, so store the low faces plus the single
        top plane; the high face of cell k is the low face of cell k+1
        (one in-kernel lane shift)

    The zero i-pad rows are only read by the double sweep's ring flux
    computations at out-of-domain positions, whose results are discarded
    (overwritten by the mid-sweep ghost re-synthesis).
    """
    n = beta_i_ext.shape[1] - 2  # domain cells per axis

    def padj(a, lead):
        pad_hi = (n + 8) - lead - a.shape[1]
        return jnp.pad(a, ((2, 2), (lead, pad_hi), (0, 0)))

    kbi = padj(beta_i_ext[:, :, 1:-1], 3)          # j rows: -1 .. n
    kbj = padj(beta_j_ext[:, :, 1:-1], 4)          # j faces: 0 .. n
    kbk = padj(beta_k_ext[:, :, :-1], 3)
    kbk_top = padj(beta_k_ext[:, :, -1:], 3)
    return kbi, kbj, kbk, kbk_top


# ---------------------------------------------------------------------------
# fused red+black double sweep for fv4 (GSRB2_FV4)
# ---------------------------------------------------------------------------

# Radius-2 extension of the radius-1 double-sweep design
# (kernels/stencils_r1.py GSRB2; VERDICT r3 item 1): ONE kernel launch +
# ONE operand stream per FULL GSRB sweep instead of two. The red update
# is computed on a +2 ring (cells [-2, bi+2) x [-2, bj+2)) from a
# radius-4 masked x window, its quartic Dirichlet ghosts re-synthesized
# in-kernel (apply_BCs_v4 between the half-sweeps, gsrb.c:30-31), and
# the black update consumes the red iterate from VMEM. Per full sweep
# this streams ~8.7 n^3 f32 instead of ~14.4 (two half-sweeps at ~7.2
# each — see BF16C notes); the VPU cost grows by the ring recompute
# factor (bi+4)(bj+4)/(bi*bj), so tile selection maximizes the
# effective-interior fraction instead of raw area. Ring operand halos:
# the i (leading) axis ring is served by the 2-row zero i-pad baked
# into kernel_beta_views; the j ring rides the existing n+8 j-padding
# (window [tj*bj, tj*bj+bj+8) covers j-cells [tj*bj-4, tj*bj+bj+4) with
# zeros where out of domain — read only at discarded ring positions).
# Masked Dirichlet single-chip only (a periodic wrap ghost needs the
# opposite domain face's red iterate — not local to any tile).
# Default ON for dims <= 256 after the on-chip A/B (docs/GSRB2_FV4_r04.md,
# us per half-sweep-equivalent vs the masked half-sweep kernel):
#   n=128: gsrb2 0.93x; gsrb2+PREDIFF 231.0 us vs prediff-only 245.8
#          (0.71x vs masked 323.9 combined);
#   n=256: gsrb2 alone 1.02x, but gsrb2+PREDIFF 1440.0 us vs prediff-only
#          1804.3 = 0.79x vs masked 1818.8 — the stream halving and the
#          prediff op reduction compose superadditively;
#   n=512: gsrb2 1.10x SLOWER (60 MB budget; 1.12x at 85 MB) — the ring
#          recompute + ghost re-synthesis ops dominate in the big-tile
#          HBM-bound regime, so the cap matches PREDIFF_MAX_DIM.
# Whole-solve parity on chip: docs/AB_r04.txt (pallas-gsrb2 == xla).
GSRB2_FV4 = True
GSRB2_FV4_MAX_DIM = 256


def _vmem_bytes_gsrb2_fv4(n: int, bi: int, bj: int,
                          prediff: bool = False) -> int:
    """Rough f32 VMEM footprint of one fused-double-sweep (bi, bj) tile:
    double-buffered windows + the dominant ring-sized temporaries."""
    ln = -(-n // 128) * 128
    ncoef = 9 if prediff else 3
    win = ((bi + 8) * (bj + 16) * ln           # x radius-4 window
           + ncoef * (bi + 6) * (bj + 8) * ln  # beta(+prediff) ring wins
           + 2 * (bi + 4) * (bj + 16) * ln     # rhs2 + d0
           + 2 * bi * bj * ln)                 # d1 + out
    tmp = (bi + 8) * (bj + 16) * ln + 10 * (bi + 4) * (bj + 4) * ln
    return 4 * (2 * win + tmp)


def tile_shape_gsrb2_fv4(n: int, prediff=None):
    """(bi, bj) for the fv4 double-sweep kernel. Masked-window
    constraints (>= 2 tiles per axis, n >= bi+8 / bj+16) under the
    gsrb2 VMEM model. Unlike the half-sweep ``tile_shape`` the primary
    key is the effective-interior fraction bi*bj/((bi+4)(bj+4)) — the
    red pass recomputes the +2 ring, so a squarer tile beats a wide one
    at equal area (e.g. (16,32) ring factor 1.41 vs (8,64)'s 1.59)."""
    if prediff is None:
        prediff = prediff_active(n)
    best = None
    for bj in (128, 64, 48, 32, 24, 16, 8):
        if n % bj or n // bj < 2 or n < bj + 16:
            continue
        for bi in (64, 32, 16, 8, 4):
            if n % bi or n // bi < 2 or n < bi + 8:
                continue
            if (_vmem_bytes_gsrb2_fv4(n, bi, bj, prediff)
                    > _budget(prediff, n)):
                continue
            key = (bi * bj / float((bi + 4) * (bj + 4)), bi * bj, bj)
            if best is None or key > best[0]:
                best = (key, (bi, bj))
    return best[1] if best else None


def gsrb2_fv4_eligible(cfg: SolverConfig, dim: int) -> bool:
    """Build-time gate for attaching the fv4 double-sweep operands
    (``Level.k2``): masked Dirichlet single-chip only. The double sweep
    consumes the prediff operands too when they are attached
    (prediff_active), so the tile check matches that configuration."""
    return (GSRB2_FV4 and dim <= GSRB2_FV4_MAX_DIM
            and cfg.bc == BC.DIRICHLET and not SINGLE_EXT
            and kernel_views_eligible(cfg, dim)
            and tile_shape_gsrb2_fv4(dim) is not None)


def pad_rhs_gsrb2_fv4(rhs):
    """(n, n, n) -> (n+4, n+16, n) zero-padded rhs with live rows at
    [2, n+2) x [8, n+8): ring windows at (ti*bi, tj*bj) are offset-exact.
    Built once per smooth() call and amortized over its sweeps."""
    return jnp.pad(rhs, ((2, 2), (8, 8), (0, 0)))


def fv4_gsrb2_views(kdinv0, alpha=None):
    """Pre-padded double-sweep operands (``Level.k2``, fv4 layout),
    ordered (k2d0, k2alpha, None, None, None, None) for arity parity
    with the radius-1 tuple. Only the red-parity dinv (and alpha under
    Helmholtz) need ring copies — the beta ring windows read the i-padded
    ``kbi/kbj/kbk`` views directly (kernel_beta_views). The baked ring
    is zeros: a zero d0 makes the red update a no-op at out-of-domain
    ring cells, whose values the mid-sweep ghost fix overwrites anyway."""
    pad3 = lambda a: jnp.pad(a, ((2, 2), (8, 8), (0, 0)))  # noqa: E731
    return (pad3(kdinv0), pad3(alpha) if alpha is not None else None,
            None, None, None, None)


def _ext4_tile_axis(w, b: int, t, nt: int, axis: int, pad: int):
    """Radius-4 variant of ``_ext_tile_axis``: rows [-4, b+4) of the
    boundary-extended tile from a clamped (b + 2*pad)-row window. At
    boundary tiles rows -1/-2 (b/b+1) are the real quartic ghosts and
    the two rows beyond duplicate the far ghost — they are only read by
    red stencil applications at ghost positions, whose results are
    discarded (overwritten by ``_fix_ghost_axis_v4``)."""
    def sl(lo, hi):
        return lax.slice_in_dim(w, lo, hi, axis=axis)

    m = b + 2 * pad
    g1l, g2l = _v4_ghost_pair(w, axis, lo=True)
    first = jnp.concatenate([g2l, g2l, g2l, g1l, sl(0, b + 4)], axis)
    g1h, g2h = _v4_ghost_pair(w, axis, lo=False)
    last = jnp.concatenate([sl(m - (b + 4), m), g1h, g2h, g2h, g2h], axis)
    mid = sl(pad - 4, pad + b + 4)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * mid + ml * last


def _fix_ghost_axis_v4(xr, b: int, t, nt: int, axis: int,
                       lo=1.0, hi=1.0):
    """Replace the +-2 ring rows of the red-updated extended tile with
    the quartic Dirichlet ghost pair of the UPDATED interior (what the
    apply_BCs_v4 pass between half-sweeps produces); interior tiles keep
    their in-tile-updated neighbor rows. ``lo``/``hi`` scale the
    first/last-tile masks (the future distributed slab2 mode passes
    is-domain-edge flags)."""
    def sl(lo_, hi_):
        return lax.slice_in_dim(xr, lo_, hi_, axis=axis)

    g1l, g2l = _v4_ghost_pair(sl(2, 6), axis, lo=True)
    g1h, g2h = _v4_ghost_pair(sl(b - 2, b + 2), axis, lo=False)
    first = jnp.concatenate([g2l, g1l, sl(2, b + 4)], axis)
    last = jnp.concatenate([sl(0, b + 2), g1h, g2h], axis)
    mf = (t == 0).astype(xr.dtype) * lo
    ml = (t == nt - 1).astype(xr.dtype) * hi
    return mf * first + (1.0 - mf - ml) * xr + ml * last


def _fv4_gsrb2_kernel(*refs, n, bi, bj, nti, ntj, b_h2inv, a_alpha=0.0,
                      prediff=False):
    """One FULL fv4 GSRB sweep (red then black) on a (bi, bj, n) tile.

    Red: ``_flux_ax`` on the +2-ring region (b=bi+4) from the radius-4
    masked window; ring beta windows come from the i-padded
    kernel_beta_views (j ring from the n+8 j-padding). Quartic ghosts of
    the red iterate are re-synthesized in-kernel (i then j then the k
    lane pair — the separable apply_BCs_v4 order), then the black update
    runs on the interior with center slices of the SAME resident
    operands: betas/rhs stream from HBM once per full sweep instead of
    twice (gsrb.c:24-41's per-half-sweep exchange+BC anatomy halved).
    With ``prediff`` the 8 kgd ring windows ride along (i ring from
    their +2 i-pad) and both passes use the precomputed mixed-flux
    operands."""
    xw_ref = refs[0]
    bi_ref, bj_ref, bk_ref, bktop_ref = refs[1:5]
    k = 5
    pd_refs = None
    if prediff:
        pd_refs = refs[k:k + 8]
        k += 8
    a2_ref = None
    if a_alpha:
        a2_ref = refs[k]
        k += 1
    rhs2_ref, d0_ref, d1_ref, out_ref = refs[k:k + 4]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    xi = _ext4_tile_axis(xw_ref[...], bi, ti, nti, 0, 4)
    xj = _ext4_tile_axis(xi, bj, tj, ntj, 1, 8)       # (bi+8, bj+8, n)
    k1lo, k2lo = _v4_ghost_pair(xj, 2, lo=True)
    k1hi, k2hi = _v4_ghost_pair(xj, 2, lo=False)
    xglo = jnp.concatenate([k2lo, k1lo], axis=-1)
    xghi = jnp.concatenate([k1hi, k2hi], axis=-1)

    bE, JE = bi + 4, bj + 4
    # ring coefficient windows: i rows are exact by the +2 i-pad of the
    # views; j rows [-3, bj+3) sit at fixed in-window offsets of the
    # (bj+8)-row window at tj*bj (cells/faces lead 4 within n+8 padding)
    ebi = bi_ref[...][:, 1:bj + 7, :]        # (bi+5, bj+6, n)
    ebj = bj_ref[...][:, 2:bj + 7, :]        # (bi+6, bj+5, n)
    ebk = bk_ref[...][:, 1:bj + 7, :]        # (bi+6, bj+6, n)
    etop = bktop_ref[...][:, 1:bj + 7, :]
    if prediff:
        bi_glo = bi_ghi = bj_glo = bj_ghi = None
        # ring windows of the 8 kgd operands (kernel_beta_prediff order;
        # j slices per the lead-4 layout, i ring from the +2 i-pad)
        pd1 = (pd_refs[0][...][:, 2:bj + 6, :],   # dij (bi+5, bj+4, n)
               pd_refs[1][...][:, 2:bj + 6, :],   # dik
               pd_refs[2][...][:, 2:bj + 7, :],   # dji (bi+4, bj+5, n)
               pd_refs[3][...][:, 2:bj + 7, :],   # djk
               pd_refs[4][...][:, 2:bj + 6, :],   # dki (bi+4, bj+4, n)
               pd_refs[5][...][:, 2:bj + 6, :],   # dkj
               pd_refs[6][...][:, 2:bj + 6, :],   # dki_top (.., 1)
               pd_refs[7][...][:, 2:bj + 6, :])   # dkj_top
    else:
        pd1 = None
        bi_glo = _quintic_ghost(ebi, 2, lo=True)
        bi_ghi = _quintic_ghost(ebi, 2, lo=False)
        bj_glo = _quintic_ghost(ebj, 2, lo=True)
        bj_ghi = _quintic_ghost(ebj, 2, lo=False)

    rhs2 = rhs2_ref[...][:, 6:bj + 10, :]    # (bi+4, bj+4, n)
    d0 = d0_ref[...][:, 6:bj + 10, :]
    a2 = a2_ref[...][:, 6:bj + 10, :] if a_alpha else None

    ax1 = (-b_h2inv / 12.0) * _flux_ax(
        xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
        ebk, etop, bE, JE, pd=pd1)
    c1 = xj[2:2 + bE, 2:2 + JE, :]
    if a_alpha:
        ax1 = ax1 + a_alpha * a2 * c1
    xr = c1 + d0 * (rhs2 - ax1)
    xr = _fix_ghost_axis_v4(xr, bi, ti, nti, 0)
    xr = _fix_ghost_axis_v4(xr, bj, tj, ntj, 1)

    # black pass: xr IS the (bi+4, bj+4, n) extended window
    k1lo, k2lo = _v4_ghost_pair(xr, 2, lo=True)
    k1hi, k2hi = _v4_ghost_pair(xr, 2, lo=False)
    xglo2 = jnp.concatenate([k2lo, k1lo], axis=-1)
    xghi2 = jnp.concatenate([k1hi, k2hi], axis=-1)
    pd2 = None
    if prediff:
        pd2 = (pd1[0][2:bi + 3, 2:bj + 2, :],   # (bi+1, bj, n)
               pd1[1][2:bi + 3, 2:bj + 2, :],
               pd1[2][2:bi + 2, 2:bj + 3, :],   # (bi, bj+1, n)
               pd1[3][2:bi + 2, 2:bj + 3, :],
               pd1[4][2:bi + 2, 2:bj + 2, :],   # (bi, bj, n)
               pd1[5][2:bi + 2, 2:bj + 2, :],
               pd1[6][2:bi + 2, 2:bj + 2, :],
               pd1[7][2:bi + 2, 2:bj + 2, :])
    ax2 = (-b_h2inv / 12.0) * _flux_ax(
        xr, xglo2, xghi2,
        ebi[2:bi + 3, 2:bj + 4, :],
        None if prediff else bi_glo[2:bi + 3, 2:bj + 4, :],
        None if prediff else bi_ghi[2:bi + 3, 2:bj + 4, :],
        ebj[2:bi + 4, 2:bj + 3, :],
        None if prediff else bj_glo[2:bi + 4, 2:bj + 3, :],
        None if prediff else bj_ghi[2:bi + 4, 2:bj + 3, :],
        ebk[2:bi + 4, 2:bj + 4, :], etop[2:bi + 4, 2:bj + 4, :], bi, bj,
        pd=pd2)
    cc = xr[2:2 + bi, 2:2 + bj, :]
    if a_alpha:
        ax2 = ax2 + a_alpha * a2[2:2 + bi, 2:2 + bj, :] * cc
    out_ref[...] = cc + d1_ref[...] * (rhs2[2:2 + bi, 2:2 + bj, :] - ax2)


def fv4_gsrb2_pallas(level: Level, x, rhse, cfg: SolverConfig):
    """One fused red+black fv4 GSRB sweep in a single kernel launch.
    ``rhse`` is the pre-padded rhs (``pad_rhs_gsrb2_fv4``); the ring
    dinv (and alpha) ride in ``level.k2``; the beta ring windows read
    the i-padded ``kbi/kbj/kbk`` views shared with the half-sweep
    kernel."""
    n = level.dim
    prediff = getattr(level, "kgd", None) is not None
    bi, bj = tile_shape_gsrb2_fv4(n, prediff)
    nti, ntj = n // bi, n // bj
    a_alpha = cfg.a if cfg.helmholtz else 0.0
    k2d0, k2a = level.k2[0], level.k2[1]
    kernel = functools.partial(
        _fv4_gsrb2_kernel, n=n, bi=bi, bj=bj, nti=nti, ntj=ntj,
        b_h2inv=cfg.b * level.h2inv, a_alpha=a_alpha, prediff=prediff)
    E = pl.Element

    def xmap(ti, tj):
        # sublane (j) window offsets must be PROVABLY x8 for Mosaic
        return (jnp.clip(ti * bi - 4, 0, n - bi - 8),
                8 * jnp.clip(tj * (bj // 8) - 1, 0, (n - bj - 16) // 8), 0)

    def bmap(ti, tj):
        return (ti * bi, tj * bj, 0)

    ring_spec = pl.BlockSpec((E(bi + 4), E(bj + 16), E(n)), bmap)
    in_specs = [
        pl.BlockSpec((E(bi + 8), E(bj + 16), E(n)), xmap),
        pl.BlockSpec((E(bi + 5), E(bj + 8), E(n)), bmap),
        pl.BlockSpec((E(bi + 6), E(bj + 8), E(n)), bmap),
        pl.BlockSpec((E(bi + 6), E(bj + 8), E(n)), bmap),
        pl.BlockSpec((E(bi + 6), E(bj + 8), E(1)), bmap),
    ]
    args = [x, level.kbi, level.kbj, level.kbk, level.kbk_top]
    if prediff:
        in_specs += _prediff_specs(bi, bj, n, bmap, ring=4)
        args += list(level.kgd)
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
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(*args)


def kernel_beta_prediff(beta_i_ext, beta_j_ext, beta_k_ext):
    """Precompute the mixed-flux operands (Level.kgd; see PREDIFF): for
    each face the two tangential central differences of its coefficient,
    times the 0.25 mixed-flux factor (a power of two — folding it is
    bitwise-neutral). The tangential ghosts baked into beta_*_ext
    (extrapolate_betas quintic, or periodic wrap) supply the boundary
    values, so no lane-ghost synthesis is needed at sweep time.

    Layouts mirror kernel_beta_views (trailing dim exactly n, j dim
    padded to n+8, i leading axis zero-padded by 2 each side so the
    GSRB2_FV4 ring windows are offset-exact; the half-sweep kernel reads
    the live rows at ``ti*bi + 2``) with the live j rows at lead offset
    +4 (cells 0..n-1, or j-faces 0..n for dji/djk):

    dij/dik (n+5, n+8, n): i-face coefficient j-/k-differences
    dji/djk (n+4, n+8, n): j-face (face axis in sublanes) i-/k-diffs
    dki/dkj (n+4, n+8, n) + dki_top/dkj_top (n+4, n+8, 1): k-face (low
        faces + top plane, like kbk) i-/j-diffs
    """
    n = beta_i_ext.shape[1] - 2
    q = 0.25

    def padj(a, lead=4):
        pad_hi = (n + 8) - lead - a.shape[1]
        return jnp.pad(a, ((2, 2), (lead, pad_hi), (0, 0)))

    dij = padj(q * (beta_i_ext[:, 2:, 1:-1] - beta_i_ext[:, :-2, 1:-1]))
    dik = padj(q * (beta_i_ext[:, 1:-1, 2:] - beta_i_ext[:, 1:-1, :-2]))
    dji = padj(q * (beta_j_ext[2:, :, 1:-1] - beta_j_ext[:-2, :, 1:-1]))
    djk = padj(q * (beta_j_ext[1:-1, :, 2:] - beta_j_ext[1:-1, :, :-2]))
    dki_f = q * (beta_k_ext[2:, 1:-1, :] - beta_k_ext[:-2, 1:-1, :])
    dkj_f = q * (beta_k_ext[1:-1, 2:, :] - beta_k_ext[1:-1, :-2, :])
    return (dij, dik, dji, djk, padj(dki_f[:, :, :-1]),
            padj(dkj_f[:, :, :-1]), padj(dki_f[:, :, -1:]),
            padj(dkj_f[:, :, -1:]))
