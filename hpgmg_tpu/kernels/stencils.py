"""Pallas TPU kernels for the hot fv4 stencils (phase 2: in-kernel BCs).

Why: the XLA path materializes a ghost-extended solution per stencil
application (``ghost_fill_fv``) and reads coefficient arrays whose trailing
extent is n+1/n+2 — on TPU a >128 lane row pads to the next multiple of
128, so at n=128 every extended array streams ~2x its useful bytes, and
the ghost fill itself costs a full extra read+write of the solution.
Measured: ~150us ghost fill + ~170us stencil per GSRB half-sweep at 128^3
vs ~90us speed-of-light.

Phase-2 design (replaces the phase-1 windowed kernel, which only matched
XLA — see git history):

* **No ghost materialization.** The solution arrives unpadded (n,n,n); the
  separable quartic Dirichlet extension (apply_BCs_v4,
  boundary_fv.c:262-569) is computed on-VMEM from the slab's halo window.
* **Lane-aligned coefficients.** ``rebuild_operator`` stores kernel-layout
  views whose trailing (lane) dim is exactly n: ``kbi`` (n+1, n+2, n) and
  ``kbj`` (n+2, n+1, n) keep their tangential ghosts in the leading/sublane
  axes (free / 8-sublane-rounded), ``kbk`` stores the low k-faces
  (n+2, n+2, n) plus a 1-plane top cap (the n+1 face axis in lanes would
  pad 2x; the high face of cell k is the low face of cell k+1 — one
  in-kernel lane shift).
  Only the k (lane) tangential ghost of kbi/kbj is rebuilt in-kernel (the
  quintic extrapolation of extrapolate_betas, boundary_fv.c:651).
* **1D slab grid over i** (the leading axis — the only one Mosaic lets us
  window at halo granularity; the last two block dims must be 8/128
  multiples or span the array). j/k span the level. Halo windows are
  all-``pl.Element`` BlockSpecs with edge-clamped offsets; a 3-case switch
  synthesizes the physical-boundary i-ghosts, and the j/k ghosts are built
  for the full slab. k-shifted reads concatenate 1-2 ghost columns instead
  of materializing an (n+4)-lane array (which would pad to the next 128
  multiple).
* One kernel body shared by apply / residual / GSRB (mode + red/black
  parity are static; the parity mask is the GSRB_FP trick, gsrb.c:78-87,
  from broadcasted iota + the slab's global offset).

Unsupported here (XLA fallback): periodic BCs (ghosts need the opposite
domain face — not in a local window), Helmholtz alpha term, dims outside
the [32, ~256] VMEM-feasible band, non-fv4 suites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level

# flip in tests to run kernels on CPU via the Pallas interpreter
INTERPRET = False

_MIN_DIM = 32
# Budget for the _vmem_bytes estimate. Empirical (v5e, n=128): the b=8
# slab estimates 12.7MB and Mosaic OOMs; b=4 estimates 7.1MB and fits —
# Mosaic's stack temporaries for the 21 shifted stencil reads are large.
_VMEM_BUDGET = 11 * 2 ** 20


def _sub8(r: int) -> int:
    return -(-r // 8) * 8


def _vmem_bytes(n: int, b: int) -> int:
    """Rough f32 VMEM footprint: double-buffered windows + the dominant
    temporaries (extended solution slab and ~6 live stencil values).
    Lanes (last dim) round up to 128, sublanes to 8 — a 64^3 level pays 2x
    on every buffer."""
    ln = -(-n // 128) * 128
    win = ((b + 4) * n * ln                    # x halo window
           + (b + 1) * _sub8(n + 2) * ln       # kbi
           + (b + 2) * _sub8(n + 1) * ln       # kbj
           + (b + 2) * _sub8(n + 2) * ln       # kbk (+ tiny top plane)
           + 3 * b * n * ln)                   # rhs + dinv + out
    tmp = (b + 4) * _sub8(n + 4) * ln + 6 * b * n * ln
    return 4 * (2 * win + tmp)


def slab_rows(n: int):
    """i-slab height: the tallest divisor slab with >= 2 slabs (the
    edge-case switch needs distinct first/last slabs) that fits VMEM.
    Taller slabs amortize the +-2 halo re-read."""
    for b in (32, 16, 8, 4, 2):
        if n % b == 0 and n // b >= 2 and _vmem_bytes(n, b) <= _VMEM_BUDGET:
            return b
    return None


def use_pallas(cfg: SolverConfig, level: Level, x=None) -> bool:
    """Select the Pallas path: TPU backend (or interpreter in tests),
    Dirichlet Poisson, kernel-layout coefficients present, supported size.
    ``cfg.kernels``: "auto" (default; on for TPU), "pallas" (force),
    "xla" (off)."""
    if getattr(cfg, "kernels", "auto") == "xla":
        return False
    if cfg.helmholtz or cfg.bc != BC.DIRICHLET:
        return False
    if getattr(level, "kbi", None) is None:
        return False
    if level.dim < _MIN_DIM or slab_rows(level.dim) is None:
        return False
    if INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
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


def _ext_slab_axis(w, b: int, t, nt: int):
    """Turn a clamped i-halo window (b+4 rows) into the boundary-extended
    slab: interior windows already hold [t*b-2, t*b+b+2); first/last
    windows hold the domain edge and the two ghost rows are synthesized
    with the v4 formulas. ``t`` is the traced slab index; the three
    candidates are combined with exact 0/1 scalar masks because Mosaic
    cannot legalize the scalar-predicate vector selects a lax.switch
    lowers to."""
    g1l, g2l = _v4_ghost_pair(w, 0, lo=True)
    first = jnp.concatenate(
        [g2l, g1l, lax.slice_in_dim(w, 0, b + 2, axis=0)], 0)
    g1h, g2h = _v4_ghost_pair(w, 0, lo=False)
    last = jnp.concatenate(
        [lax.slice_in_dim(w, 2, b + 4, axis=0), g1h, g2h], 0)
    mf = (t == 0).astype(w.dtype)
    ml = (t == nt - 1).astype(w.dtype)
    return mf * first + (1.0 - mf - ml) * w + ml * last


def _lane_shift(core, glo, ghi, dk: int):
    """Shifted lane read: ``core`` has exactly n lanes; ``glo``/``ghi`` are
    the 1-2 boundary ghost columns ordered [far, near] / [near, far].
    Concatenating columns keeps every value at <= n lanes (no pad)."""
    n = core.shape[-1]
    if dk == 0:
        return core
    if dk < 0:
        g = lax.slice_in_dim(glo, glo.shape[-1] + dk, glo.shape[-1], axis=-1)
        return jnp.concatenate([g, lax.slice_in_dim(core, 0, n + dk, axis=-1)],
                               axis=-1)
    g = lax.slice_in_dim(ghi, 0, dk, axis=-1)
    return jnp.concatenate([lax.slice_in_dim(core, dk, n, axis=-1), g],
                           axis=-1)


# ---------------------------------------------------------------------------
# flux-form stencil
# ---------------------------------------------------------------------------

def _flux_ax(xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
             ebk, ebk_top, b: int, n: int):
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

    Index conventions: ``xj`` is the (b+4, n+4, n) i/j-extended slab with
    k ghost columns ``xglo``/``xghi`` ([far, near] / [near, far]); ext
    index = local cell + 2. Face m along an axis sits between cells m-1
    and m. Returns main + 0.25*mixed (caller applies TWELFTH and
    -b*h2inv), matching stencil_ax's grouping.
    """
    def sl(a, i0, i1, j0, j1):
        return lax.slice(a, (i0, j0, 0), (i1, j1, a.shape[2]))

    q = 0.25

    # central-difference fields (ext index = cell + 2)
    # cdi[r, j, k] = x(i+1) - x(i-1) at i = r,  i in [0, b),  j in [-1, n]
    cdi = sl(xj, 3, b + 3, 1, n + 3) - sl(xj, 1, b + 1, 1, n + 3)
    cdi_glo = (sl(xglo, 3, b + 3, 1, n + 3)
               - sl(xglo, 1, b + 1, 1, n + 3))[..., 1:]
    cdi_ghi = (sl(xghi, 3, b + 3, 1, n + 3)
               - sl(xghi, 1, b + 1, 1, n + 3))[..., :1]
    # cdj[r, j, k] = x(j+1) - x(j-1),  i in [-1, b],  j in [0, n)
    cdj = sl(xj, 1, b + 3, 3, n + 3) - sl(xj, 1, b + 3, 1, n + 1)
    cdj_glo = (sl(xglo, 1, b + 3, 3, n + 3)
               - sl(xglo, 1, b + 3, 1, n + 1))[..., 1:]
    cdj_ghi = (sl(xghi, 1, b + 3, 3, n + 3)
               - sl(xghi, 1, b + 3, 1, n + 1))[..., :1]
    # cdk = x(k+1) - x(k-1),  i in [-1, b],  j in [-1, n]
    xt = sl(xj, 1, b + 3, 1, n + 3)
    cdk = (_lane_shift(xt, sl(xglo, 1, b + 3, 1, n + 3),
                       sl(xghi, 1, b + 3, 1, n + 3), 1)
           - _lane_shift(xt, sl(xglo, 1, b + 3, 1, n + 3),
                         sl(xghi, 1, b + 3, 1, n + 3), -1))

    # ---- i faces: m in [0, b+1) between cells m-1, m ----
    d1 = sl(xj, 2, b + 3, 2, n + 2) - sl(xj, 1, b + 2, 2, n + 2)
    dbig = sl(xj, 3, b + 4, 2, n + 2) - sl(xj, 0, b + 1, 2, n + 2)
    bc = ebi[:, 1:n + 1, :]
    # G diffs across the face ride the free leading axis: cd_t(m)-cd_t(m-1)
    gj = (ebi[:, 2:, :] - ebi[:, :-2, :]) * (cdj[1:] - cdj[:-1])
    gk = ((_lane_shift(bc, bi_glo[:, 1:n + 1], bi_ghi[:, 1:n + 1], 1)
           - _lane_shift(bc, bi_glo[:, 1:n + 1], bi_ghi[:, 1:n + 1], -1))
          * (cdk[1:, 1:n + 1] - cdk[:-1, 1:n + 1]))
    tf = bc * (15.0 * d1 - dbig) + q * (gj + gk)            # (b+1, n, n)
    ax = tf[1:] - tf[:-1]

    # ---- j faces: m in [0, n+1) ----
    d1 = sl(xj, 2, b + 2, 2, n + 3) - sl(xj, 2, b + 2, 1, n + 2)
    dbig = sl(xj, 2, b + 2, 3, n + 4) - sl(xj, 2, b + 2, 0, n + 1)
    bc = ebj[1:b + 1]
    gi = (ebj[2:] - ebj[:-2]) * (cdi[:, 1:, :] - cdi[:, :-1, :])
    gk = ((_lane_shift(bc, bj_glo[1:b + 1], bj_ghi[1:b + 1], 1)
           - _lane_shift(bc, bj_glo[1:b + 1], bj_ghi[1:b + 1], -1))
          * (cdk[1:b + 1, 1:] - cdk[1:b + 1, :-1]))
    tf = bc * (15.0 * d1 - dbig) + q * (gi + gk)            # (b, n+1, n)
    ax = ax + tf[:, 1:, :] - tf[:, :-1, :]

    # ---- k faces: m in [0, n) in lanes + the top face plane ----
    xcc = sl(xj, 2, b + 2, 2, n + 2)                        # (b, n, n)
    gloc = sl(xglo, 2, b + 2, 2, n + 2)
    ghic = sl(xghi, 2, b + 2, 2, n + 2)
    d1 = xcc - _lane_shift(xcc, gloc, ghic, -1)
    d1_top = ghic[..., :1] - xcc[..., n - 1:]
    dbig = (_lane_shift(xcc, gloc, ghic, 1)
            - _lane_shift(xcc, gloc, ghic, -2))
    dbig_top = ghic[..., 1:] - xcc[..., n - 2:n - 1]
    bc = ebk[1:b + 1, 1:n + 1, :]
    cdic = cdi[:, 1:n + 1, :]
    cdjc = cdj[1:b + 1]
    cdi_m1 = _lane_shift(cdic, cdi_glo[:, 1:n + 1], cdi_ghi[:, 1:n + 1], -1)
    cdj_m1 = _lane_shift(cdjc, cdj_glo[1:b + 1], cdj_ghi[1:b + 1], -1)
    gi = (ebk[2:, 1:n + 1] - ebk[:-2, 1:n + 1]) * (cdic - cdi_m1)
    gj = (ebk[1:b + 1, 2:] - ebk[1:b + 1, :-2]) * (cdjc - cdj_m1)
    tf = bc * (15.0 * d1 - dbig) + q * (gi + gj)            # (b, n, n)
    gi_t = ((ebk_top[2:, 1:n + 1] - ebk_top[:-2, 1:n + 1])
            * (cdi_ghi[:, 1:n + 1] - cdic[..., n - 1:]))
    gj_t = ((ebk_top[1:b + 1, 2:] - ebk_top[1:b + 1, :-2])
            * (cdj_ghi[1:b + 1] - cdjc[..., n - 1:]))
    tf_top = (ebk_top[1:b + 1, 1:n + 1]
              * (15.0 * d1_top - dbig_top) + q * (gi_t + gj_t))
    ax = ax + _lane_shift(tf, None, tf_top, 1) - tf
    return ax


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _fv4_kernel(*refs, n, b, nt, mode, b_h2inv):
    """Shared fv4 stencil body on a (b, n, n) i-slab.

    mode: 'apply' -> Ax; 'residual' -> rhs - Ax;
          'gsrb' -> x + kdinv[parity] * (rhs - Ax)
    """
    xw_ref, bi_ref, bj_ref, bk_ref, bktop_ref = refs[:5]
    k = 5
    rhs_ref = dinv_ref = None
    if mode != "apply":
        rhs_ref = refs[k]
        k += 1
    if mode == "gsrb":
        dinv_ref = refs[k]
        k += 1
    out_ref = refs[k]

    t = pl.program_id(0)

    # separable boundary extension, same axis order as ghost_fill_fv:
    # i (from interior), then j (reads i-ghosts), then k (reads both)
    xi = _ext_slab_axis(xw_ref[...], b, t, nt)             # (b+4, n, n)
    g1lo, g2lo = _v4_ghost_pair(xi, 1, lo=True)
    g1hi, g2hi = _v4_ghost_pair(xi, 1, lo=False)
    xj = jnp.concatenate([g2lo, g1lo, xi, g1hi, g2hi], 1)  # (b+4, n+4, n)
    k1lo, k2lo = _v4_ghost_pair(xj, 2, lo=True)
    k1hi, k2hi = _v4_ghost_pair(xj, 2, lo=False)
    xglo = jnp.concatenate([k2lo, k1lo], axis=-1)
    xghi = jnp.concatenate([k1hi, k2hi], axis=-1)

    # face coefficients: tangential i/j ghosts are baked into storage;
    # only the lane (k) ghost of kbi/kbj is rebuilt here
    ebi, ebj = bi_ref[...], bj_ref[...]
    bi_glo = _quintic_ghost(ebi, 2, lo=True)
    bi_ghi = _quintic_ghost(ebi, 2, lo=False)
    bj_glo = _quintic_ghost(ebj, 2, lo=True)
    bj_ghi = _quintic_ghost(ebj, 2, lo=False)

    ax = (-b_h2inv / 12.0) * _flux_ax(
        xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
        bk_ref[...], bktop_ref[...], b, n)

    if mode == "apply":
        out_ref[...] = ax
        return
    if mode == "residual":
        out_ref[...] = rhs_ref[...] - ax
        return

    # GSRB masked update: the red/black mask is pre-folded into the
    # per-parity dinv field (kdinv, zeros at non-updated cells) — the
    # GSRB_FP trick (gsrb.c:78-87) moved to MGBuild time, saving ~5 VPU
    # passes of in-kernel iota/mask work per half-sweep
    xc = xj[2:2 + b, 2:2 + n, :]
    out_ref[...] = xc + dinv_ref[...] * (rhs_ref[...] - ax)


def _fv4_call(level: Level, x, rhs, dinv, cfg: SolverConfig, mode: str):
    n = level.dim
    b = slab_rows(n)
    nt = n // b
    # note: parity enters only through which kdinv field rides in `dinv` —
    # both half-sweeps share ONE compiled kernel
    kernel = functools.partial(
        _fv4_kernel, n=n, b=b, nt=nt, mode=mode,
        b_h2inv=cfg.b * level.h2inv)

    E = pl.Element

    in_specs = [
        pl.BlockSpec((E(b + 4), E(n), E(n)),
                     lambda t: (jnp.clip(t * b - 2, 0, n - b - 4), 0, 0)),
        pl.BlockSpec((E(b + 1), E(n + 2), E(n)), lambda t: (t * b, 0, 0)),
        pl.BlockSpec((E(b + 2), E(n + 1), E(n)), lambda t: (t * b, 0, 0)),
        pl.BlockSpec((E(b + 2), E(n + 2), E(n)), lambda t: (t * b, 0, 0)),
        pl.BlockSpec((E(b + 2), E(n + 2), E(1)), lambda t: (t * b, 0, 0)),
    ]
    args = [x, level.kbi, level.kbj, level.kbk, level.kbk_top]
    slab_spec = pl.BlockSpec((b, n, n), lambda t: (t, 0, 0))
    if mode != "apply":
        in_specs.append(slab_spec)
        args.append(rhs)
    if mode == "gsrb":
        in_specs.append(slab_spec)
        args.append(dinv)

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=slab_spec,
        out_shape=jax.ShapeDtypeStruct(level.shape, x.dtype),
        interpret=INTERPRET,
    )(*args)


def fv4_apply_pallas(level: Level, x, cfg: SolverConfig):
    return _fv4_call(level, x, None, None, cfg, "apply")


def fv4_residual_pallas(level: Level, x, rhs, cfg: SolverConfig):
    return _fv4_call(level, x, rhs, None, cfg, "residual")


def fv4_gsrb_sweep_pallas(level: Level, x, rhs, cfg: SolverConfig,
                          parity: int):
    """One GSRB half-sweep, boundary fill fused into the stencil kernel."""
    return _fv4_call(level, x, rhs, level.kdinv[parity & 1], cfg, "gsrb")


# ---------------------------------------------------------------------------
# kernel-layout coefficient views (stored on Level by rebuild_operator)
# ---------------------------------------------------------------------------

def kernel_beta_views(beta_i_ext, beta_j_ext, beta_k_ext):
    """Slice the tangentially-extended face coefficients into the
    lane-aligned kernel layout (trailing dim exactly n):

    kbi (n+1, n+2, n): i-faces, j-ghosts in sublanes, k-ghosts dropped
    kbj (n+2, n+1, n): i-ghosts leading, j-faces in sublanes
    kbk (n+2, n+2, n) + kbk_top (n+2, n+2, 1): k-faces — the face axis in
        lanes would pad n+1 -> 2x, so store the low faces plus the single
        top plane; the high face of cell k is the low face of cell k+1
        (one in-kernel lane shift)
    """
    kbi = beta_i_ext[:, :, 1:-1]
    kbj = beta_j_ext[:, :, 1:-1]
    kbk = beta_k_ext[:, :, :-1]
    kbk_top = beta_k_ext[:, :, -1:]
    return kbi, kbj, kbk, kbk_top
