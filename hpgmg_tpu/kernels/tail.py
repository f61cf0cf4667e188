"""Fused coarse-ladder ("tail") V-cycle megakernels for fv4.

The small-grid F-cycle is launch/op-count bound, not compute bound: the
round-4 on-chip decomposition (docs/FLOOR128_r04.md + the batch-d
ladder-depth A/B) showed 128^3 pays a ~2.75 ms size-independent cost over
the 512^3 per-DOF rate, that truncating the ladder does NOT recover it
(min_coarse_dim 2 == 8; truncation at 32 is *worse*), and that every
phase at <=32^3 costs XLA per-op overhead rather than bandwidth. The fix
is structural, per SURVEY §7 hard part 3 (replicate-and-fuse tiny
levels): run the ENTIRE sub-ladder at dims <= TAIL_MAX_DIM inside two
Pallas launches whose working set lives wholly in VMEM —

* ``tail_down_call``: for each tail level {pre-smooth (all GSRB half
  sweeps), residual, full 3-axis restriction} chained in-register,
  emitting the pre-smoothed iterates and the per-level restricted rhs
  (mg.c:1135-1164's descent)
* the bottom solve stays outside (one XLA dense matvec for DIRECT —
  flattening 3D->1D inside Mosaic would cross lane tiles)
* ``tail_up_call``: for each tail level {v2 interpolation += , post-
  smooth} climbing back (mg.c:1152-1158)

replacing the many hundreds of tiny XLA ops of the unfused subtree
(each fv4 apply alone is ~25 shifted multiplies) with 2 kernel launches
+ ~3 XLA ops per V-subtree visit.

In-kernel idioms (all previously legalized in this repo's kernels —
kernels/stencils.py, kernels/restrict.py):

* the production ``_flux_ax`` flux-form stencil evaluated on the FULL
  (d+4, d+4, d) boundary-extended array (quartic Dirichlet ghosts
  synthesized in-kernel per sweep, apply_BCs_v4 semantics);
* leading-axis (i) transfers as slice/stack/reshape (free: the trailing
  (sublane, lane) tile is untouched);
* j/k transfers as per-leading-slice 2D MXU dots (a (d, d) slice per
  fine i-row against the per-axis transfer matrices) — sublane-axis
  einsums and (sublane, lane) transposes do not reliably legalize in
  Mosaic, per-slice rank-2 dots always do, and at tail dims the extra
  unrolled dots are free (the kernel replaces *launches*, not FLOPs).

Reference analogs: mg.c:1135-1164 (MGVCycle), operators/gsrb.c (GSRB_FP),
operators/restriction.c:6-94, operators/interpolation_v2.c:42-62,
boundary_fv.c:262-569 (apply_BCs_v4). Single-chip masked Dirichlet only
(the distributed path never runs tail levels sharded — they are
replicated by the agglomeration rule, but an active GSPMD mesh routes
through XLA for partitioning safety).
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
from hpgmg_tpu.core.config import BC, Smoother, SolverConfig

# Default ON after the on-chip whole-solve A/B (2026-08-20, bench/
# tail_ab.py, docs/TAIL_r05.md): tail=ON wins at every size — 64^3
# 1.715->1.630 ms/solve (+5.2%), 128^3 5.665->5.474 (+3.5%), 256^3
# 28.10->27.74 (+1.3%), 512^3 neutral-to-positive (186.9->186.0 ms) —
# with equal-order convergence. Interpret parity: tests/test_tail.py.
TAIL_FUSE = True
TAIL_MAX_DIM = 32   # levels with dim <= this fuse into the tail kernels
_TAIL_MIN_DIM = 8   # quartic ghosts / quintic beta ghosts need >= 4 / 5

_VMEM_LIMIT_TAIL = 100 * 2 ** 20


# ---------------------------------------------------------------------------
# transfer matrices (compile-time constants, passed as kernel operands)
# ---------------------------------------------------------------------------

def _pair_matrix(d: int, scale: float) -> np.ndarray:
    """(d/2, d) pairwise-sum matrix with entries ``scale`` (one axis of the
    8->1 cell average, restriction.c:6-94)."""
    m = np.zeros((d // 2, d), np.float64)
    c = np.arange(d // 2)
    m[c, 2 * c] = scale
    m[c, 2 * c + 1] = scale
    return m


def _interp_v2_matrix(dc: int) -> np.ndarray:
    """(2dc, dc) one-axis v2 interpolation matrix with the quadratic
    Dirichlet ghost fold (interpolation_v2.c:55-57 + boundary_fv.c:101):
    even child of coarse cell I = c[I] + (c[I-1] - c[I+1])/8, odd
    mirrored; ghosts g = -2.5 x1 + 0.5 x2."""
    w = np.zeros((2 * dc, dc), np.float64)
    ext = np.zeros((dc + 2, dc))
    ext[1:-1] = np.eye(dc)
    ext[0, 0], ext[0, 1] = -2.5, 0.5            # low ghost row
    ext[-1, -1], ext[-1, -2] = -2.5, 0.5        # high ghost row
    lo, mid, hi = ext[:-2], ext[1:-1], ext[2:]
    w[0::2] = mid + (lo - hi) / 8.0             # even children
    w[1::2] = mid + (hi - lo) / 8.0             # odd children
    return w


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

def _ext_full(x, axis: int):
    """Quartic volume-averaged Dirichlet extension by 2 ghosts on BOTH
    sides of ``axis`` (the full-array analog of _ext_tile_axis: at tail
    dims the kernel holds the whole level, so no first/last-tile masks)."""
    g1l, g2l = _s._v4_ghost_pair(x, axis, lo=True)
    g1h, g2h = _s._v4_ghost_pair(x, axis, lo=False)
    return jnp.concatenate([g2l, g1l, x, g1h, g2h], axis)


def _tail_ax(x, ebi, ebj, ebk, ebk_top, b_h2inv, a_alpha=0.0, alpha=None):
    """fv4 A(x) on a full (d, d, d) value: i/j boundary extension +
    in-kernel k lane ghosts feeding the production _flux_ax."""
    d = x.shape[0]
    xj = _ext_full(_ext_full(x, 0), 1)          # (d+4, d+4, d)
    k1lo, k2lo = _s._v4_ghost_pair(xj, 2, lo=True)
    k1hi, k2hi = _s._v4_ghost_pair(xj, 2, lo=False)
    xglo = jnp.concatenate([k2lo, k1lo], axis=-1)
    xghi = jnp.concatenate([k1hi, k2hi], axis=-1)
    bi_glo = _s._quintic_ghost(ebi, 2, lo=True)
    bi_ghi = _s._quintic_ghost(ebi, 2, lo=False)
    bj_glo = _s._quintic_ghost(ebj, 2, lo=True)
    bj_ghi = _s._quintic_ghost(ebj, 2, lo=False)
    ax = (-b_h2inv / 12.0) * _s._flux_ax(
        xj, xglo, xghi, ebi, bi_glo, bi_ghi, ebj, bj_glo, bj_ghi,
        ebk, ebk_top, d, d)
    if a_alpha:
        ax = ax + a_alpha * alpha * x
    return ax


def _dot2(m, x2d):
    """(a, b) @ (b, c) MXU dot at HIGHEST precision (transfer parity with
    the XLA einsum path)."""
    return jax.lax.dot(m, x2d, precision=lax.Precision.HIGHEST,
                       preferred_element_type=x2d.dtype)


def _restrict3(r, rj, rk):
    """Full 8->1 cell restriction of a (d, d, d) value: per coarse i-row,
    the leading pair-sum is free and j/k halve as two 2D MXU dots
    (weights: 0.5 in the i pair fold, rj/rk carry 0.5 each => 1/8)."""
    d = r.shape[0]
    rows = []
    for ci in range(d // 2):
        t = 0.5 * (r[2 * ci] + r[2 * ci + 1])    # (d, d)
        rows.append(_dot2(_dot2(rj, t), rk))     # (d/2, d) @ (d,d) @ (d,d/2)
    return jnp.stack(rows)


def _interp_v2_add(e_c, e_f, w):
    """e_f + P_v2 e_c: j/k expansion as per-slice 2D dots against the
    (2dc, dc) one-axis matrix ``w``; the i expansion is the 3-tap tensor
    stencil on the leading axis (stack/reshape — leading dims are free)."""
    dc = e_c.shape[0]
    # j/k expansion per coarse i-slice: (2dc, dc)@(dc, dc)@(dc, 2dc)
    wt = w.T
    planes = jnp.stack([_dot2(_dot2(w, e_c[ci]), wt) for ci in range(dc)])
    # i expansion: quadratic ghosts then the 3-tap even/odd children
    g_lo = -2.5 * planes[0:1] + 0.5 * planes[1:2]
    g_hi = -2.5 * planes[dc - 1:dc] + 0.5 * planes[dc - 2:dc - 1]
    ext = jnp.concatenate([g_lo, planes, g_hi], axis=0)   # (dc+2, 2dc, 2dc)
    lo, mid, hi = ext[:-2], ext[1:-1], ext[2:]
    even = mid + (lo - hi) / 8.0
    odd = mid + (hi - lo) / 8.0
    up = jnp.stack([even, odd], axis=1).reshape(e_f.shape)
    return e_f + up


def _gsrb_sweeps(x, rhs, kdr, kdb, ax_fn, nsweeps: int):
    """GSRB_FP half-sweeps with the parity mask pre-folded into the
    red/black dinv operands (gsrb.c:78-87; sweep s updates parity s&1)."""
    for s in range(nsweeps):
        kd = kdr if (s & 1) == 0 else kdb
        x = x + kd * (rhs - ax_fn(x))
    return x


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _level_operands(level, cfg):
    """Per-level kernel operands: exact _flux_ax-shaped beta views sliced
    from the tangentially-extended coefficients + pre-masked dinvs."""
    ebi = level.beta_i[:, :, 1:-1]        # (d+1, d+2, d)
    ebj = level.beta_j[:, :, 1:-1]        # (d+2, d+1, d)
    ebk = level.beta_k[:, :, :-1]         # (d+2, d+2, d)
    ebk_top = level.beta_k[:, :, -1:]     # (d+2, d+2, 1)
    kdr, kdb = level.kdinv
    ops = [ebi, ebj, ebk, ebk_top, kdr, kdb]
    if cfg.helmholtz:
        ops.append(level.alpha)
    return ops


def _unpack_level(refs, k, cfg):
    """Read one level's operand block; returns (coef dict, next index)."""
    ebi, ebj, ebk, ebk_top, kdr, kdb = (r[...] for r in refs[k:k + 6])
    k += 6
    alpha = None
    if cfg.helmholtz:
        alpha = refs[k][...]
        k += 1
    return (ebi, ebj, ebk, ebk_top, kdr, kdb, alpha), k


def _bottom_direct(r, b6, db: int):
    """In-kernel DIRECT bottom solve u = A^-1 r at the (db, db, db)
    coarsest grid (solvers.c DIRECT analog; the dense inverse is the
    MGBuild precompute, core/hierarchy.py). ``b6`` is the inverse
    re-laid-out as [i, j, a, b, c, k] so every step is a static slice +
    lane-broadcast multiply + lane reduction directly into the 3D
    output shape — guaranteed-legal Mosaic ops, no lane-crossing
    reshape; at db=8 the whole solve is ~0.5 MFLOP of VPU work, far
    below one kernel-launch overhead."""
    u = jnp.zeros((db, db, db), r.dtype)
    for i in range(db):
        for j in range(db):
            row = r[i, j, :]                          # (db,) lanes
            u = u + jnp.sum(b6[i, j] * row[None, None, None, :], axis=-1)
    return u


def _v_kernel(*refs, nlev, nsweeps, b_h2invs, a_alpha, cfg, db):
    """The WHOLE V-subtree in one launch: descent (pre-smooth, residual,
    restrict per level), the DIRECT bottom solve, and the climb (v2
    interpolation +=, post-smooth per level) — pre-smoothed iterates and
    per-level rhs stay in VMEM (no intermediate HBM round-trips), and
    the per-V-visit launch count drops from 2 kernels + an XLA bottom
    to ONE kernel (mg.c:1135-1164 entire)."""
    x = refs[0][...]
    rhs = refs[1][...]
    k = 2
    coefs, rmats, wmats = [], [], []
    for li in range(nlev):
        coef, k = _unpack_level(refs, k, cfg)
        coefs.append(coef)
        rmats.append((refs[k][...], refs[k + 1][...]))  # (rj, rk)
        wmats.append(refs[k + 2][...])                  # v2 interp matrix
        k += 3
    b6 = refs[k][...]
    out = refs[k + 1]
    ax_fns = []
    for li in range(nlev):
        ebi, ebj, ebk, ebk_top, kdr, kdb, alpha = coefs[li]
        ax_fns.append(functools.partial(
            _tail_ax, ebi=ebi, ebj=ebj, ebk=ebk, ebk_top=ebk_top,
            b_h2inv=b_h2invs[li], a_alpha=a_alpha, alpha=alpha))
    es, rhss = [], []
    for li in range(nlev):
        ebi, ebj, ebk, ebk_top, kdr, kdb, alpha = coefs[li]
        x = _gsrb_sweeps(x, rhs, kdr, kdb, ax_fns[li], nsweeps)
        es.append(x)
        rhss.append(rhs)
        rj, rk = rmats[li]
        rhs = _restrict3(rhs - ax_fns[li](x), rj, rk)
        x = jnp.zeros_like(rhs)
    u = _bottom_direct(rhs, b6, db)
    for li in range(nlev - 1, -1, -1):
        ebi, ebj, ebk, ebk_top, kdr, kdb, alpha = coefs[li]
        x = _interp_v2_add(u, es[li], wmats[li])
        u = _gsrb_sweeps(x, rhss[li], kdr, kdb, ax_fns[li], nsweeps)
    out[...] = u


def _down_kernel(*refs, nlev, nsweeps, b_h2invs, a_alpha, cfg):
    """Descent over the tail levels: pre-smooth, residual, restrict."""
    x = refs[0][...]
    rhs = refs[1][...]
    k = 2
    coefs, mats = [], []
    for li in range(nlev):
        coef, k = _unpack_level(refs, k, cfg)
        coefs.append(coef)
        mats.append((refs[k][...], refs[k + 1][...]))  # (rj, rk)
        k += 2
    outs = refs[k:]
    for li in range(nlev):
        ebi, ebj, ebk, ebk_top, kdr, kdb, alpha = coefs[li]
        ax_fn = functools.partial(
            _tail_ax, ebi=ebi, ebj=ebj, ebk=ebk, ebk_top=ebk_top,
            b_h2inv=b_h2invs[li], a_alpha=a_alpha, alpha=alpha)
        x = _gsrb_sweeps(x, rhs, kdr, kdb, ax_fn, nsweeps)
        outs[li][...] = x                      # pre-smoothed iterate
        rj, rk = mats[li]
        rhs = _restrict3(rhs - ax_fn(x), rj, rk)
        outs[nlev + li][...] = rhs             # next level's rhs
        x = jnp.zeros_like(rhs)


def _up_kernel(*refs, nlev, nsweeps, b_h2invs, a_alpha, cfg):
    """Climb over the tail levels: v2 interpolation (+=), post-smooth."""
    k = 0
    coefs, ws, es, rhss = [], [], [], []
    for li in range(nlev):
        coef, k = _unpack_level(refs, k, cfg)
        coefs.append(coef)
        ws.append(refs[k][...])                # (2dc, dc) interp matrix
        k += 1
    for li in range(nlev):
        es.append(refs[k][...])
        rhss.append(refs[k + 1][...])
        k += 2
    u = refs[k][...]                           # bottom solution
    out = refs[k + 1]
    for li in range(nlev - 1, -1, -1):
        ebi, ebj, ebk, ebk_top, kdr, kdb, alpha = coefs[li]
        ax_fn = functools.partial(
            _tail_ax, ebi=ebi, ebj=ebj, ebk=ebk, ebk_top=ebk_top,
            b_h2inv=b_h2invs[li], a_alpha=a_alpha, alpha=alpha)
        x = _interp_v2_add(u, es[li], ws[li])
        u = _gsrb_sweeps(x, rhss[li], kdr, kdb, ax_fn, nsweeps)
    out[...] = u


def _compiler_params():
    return None if _s.INTERPRET else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_TAIL)


def tail_down_call(tail, e, rhs, cfg: SolverConfig):
    """Fused descent over the fused levels ``tail``: returns
    ([pre-smoothed e per level], [restricted rhs per level BELOW each] —
    the last entry feeds whatever continues under the fused span)."""
    nlev = len(tail)
    dims = [lv.dim for lv in tail]
    dtype = e.dtype
    nsweeps = 2 * cfg.resolved_num_smooths(_FV4)
    args = [e, rhs]
    for lv in tail:
        args += _level_operands(lv, cfg)
        d = lv.dim
        args.append(jnp.asarray(_pair_matrix(d, 0.5), dtype))   # rj
        args.append(jnp.asarray(_pair_matrix(d, 0.5).T, dtype))  # rk
    out_shape = ([jax.ShapeDtypeStruct((d, d, d), dtype) for d in dims]
                 + [jax.ShapeDtypeStruct((d // 2,) * 3, dtype)
                    for d in dims])
    kern = functools.partial(
        _down_kernel, nlev=nlev, nsweeps=nsweeps,
        b_h2invs=tuple(cfg.b * lv.h2inv for lv in tail),
        a_alpha=cfg.a if cfg.helmholtz else 0.0, cfg=cfg)
    outs = pl.pallas_call(
        kern, out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=_s.INTERPRET)(*args)
    return outs[:nlev], outs[nlev:]


def tail_up_call(tail, es, rhss, u_bot, cfg: SolverConfig):
    """Fused climb from the sub-span solution; returns the root iterate."""
    nlev = len(tail)
    dtype = u_bot.dtype
    nsweeps = 2 * cfg.resolved_num_smooths(_FV4)
    args = []
    for lv in tail:
        args += _level_operands(lv, cfg)
        args.append(jnp.asarray(_interp_v2_matrix(lv.dim // 2), dtype))
    for e_l, r_l in zip(es, rhss):
        args += [e_l, r_l]
    args.append(u_bot)
    kern = functools.partial(
        _up_kernel, nlev=nlev, nsweeps=nsweeps,
        b_h2invs=tuple(cfg.b * lv.h2inv for lv in tail),
        a_alpha=cfg.a if cfg.helmholtz else 0.0, cfg=cfg)
    d0 = tail[0].dim
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((d0, d0, d0), dtype),
        compiler_params=_compiler_params(),
        interpret=_s.INTERPRET)(*args)


def tail_v_call(tail, bottom_level, e, rhs, cfg: SolverConfig):
    """ONE-launch fused V-subtree: descent + DIRECT bottom + climb
    (mg.c:1135-1164 whole) when the level below the fused span IS the
    bottom and carries the precomputed dense inverse. Returns the root
    iterate."""
    nlev = len(tail)
    dtype = e.dtype
    nsweeps = 2 * cfg.resolved_num_smooths(_FV4)
    db = bottom_level.dim
    args = [e, rhs]
    for lv in tail:
        args += _level_operands(lv, cfg)
        d = lv.dim
        args.append(jnp.asarray(_pair_matrix(d, 0.5), dtype))    # rj
        args.append(jnp.asarray(_pair_matrix(d, 0.5).T, dtype))  # rk
        args.append(jnp.asarray(_interp_v2_matrix(d // 2), dtype))
    # Binv[(a,b,c),(i,j,k)] -> [i,j,a,b,c,k] for the in-kernel bottom
    b6 = (bottom_level.bottom_ainv.astype(dtype)
          .reshape(db, db, db, db, db, db)
          .transpose(3, 4, 0, 1, 2, 5))
    args.append(b6)
    kern = functools.partial(
        _v_kernel, nlev=nlev, nsweeps=nsweeps,
        b_h2invs=tuple(cfg.b * lv.h2inv for lv in tail),
        a_alpha=cfg.a if cfg.helmholtz else 0.0, cfg=cfg, db=db)
    d0 = tail[0].dim
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((d0, d0, d0), dtype),
        compiler_params=_compiler_params(),
        interpret=_s.INTERPRET)(*args)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

class _FV4:
    gsrb_num_smooths = 3  # static sweep-count resolution (ops/fv4.py)


def _fusible(lv) -> bool:
    return (_TAIL_MIN_DIM <= lv.dim <= TAIL_MAX_DIM and lv.dim % 2 == 0
            and not getattr(lv, "ksharded", False)
            and getattr(lv, "kdinv", None) is not None)


def tail_span(levels, lev: int) -> int:
    """Number of consecutive fusible levels starting at ``lev`` (never
    including the bottom level — it has no sub-level to restrict to;
    whatever follows the span runs the ordinary recursion/bottom)."""
    span = 0
    for lv in levels[lev:-1]:
        if not _fusible(lv):
            break
        span += 1
    return span


def use_tail(op, cfg: SolverConfig, levels, lev: int) -> bool:
    """Gate for the fused tail V-cycle at ``levels[lev:]``: fv4 masked
    Dirichlet GSRB, a non-empty fusible span, single-chip."""
    if not TAIL_FUSE or getattr(cfg, "kernels", "auto") == "xla":
        return False
    if getattr(op, "name", None) != "fv4":
        return False
    if cfg.bc != BC.DIRICHLET or cfg.smoother != Smoother.GSRB:
        return False
    if cfg.helmholtz and getattr(levels[lev], "alpha", None) is None:
        return False
    if tail_span(levels, lev) < 1:
        return False
    from hpgmg_tpu.parallel.mesh import get_active_mesh

    if get_active_mesh() is not None:
        return False  # GSPMD partitioning of the custom call: XLA path
    if _s.INTERPRET:
        return True
    if jnp.dtype(levels[lev].dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ONE-launch variant (down + DIRECT bottom + climb in a single kernel,
# tail_v_call) when the level below the span is the DIRECT bottom.
# Default OFF until the on-chip A/B (bench/tail_ab.py --one-launch).
TAIL_ONE_LAUNCH = False


def tail_vcycle(op, levels, lev: int, e, rhs, cfg: SolverConfig):
    """The fused V-cycle: DOWN kernel over the fusible span -> ordinary
    recursion below it (deeper tiny levels and/or the bottom solve, which
    are launch-free XLA per the batch-d A/B) -> UP kernel. Drop-in for
    solve/mg.py:vcycle at a qualified root. With TAIL_ONE_LAUNCH and a
    DIRECT bottom right below the span, the whole subtree (descent +
    bottom + climb) runs as ONE kernel instead (tail_v_call)."""
    from hpgmg_tpu.core.config import BottomSolver
    from hpgmg_tpu.solve import mg as _mg

    span = tail_span(levels, lev)
    sub = levels[lev:lev + span]
    below = levels[lev + span]
    if (TAIL_ONE_LAUNCH and lev + span == len(levels) - 1
            and cfg.bottom == BottomSolver.DIRECT
            and getattr(below, "bottom_ainv", None) is not None
            and not getattr(below, "ksharded", False)):
        return tail_v_call(sub, below, e, rhs, cfg)
    es, rhss = tail_down_call(sub, e, rhs, cfg)
    e_below = _mg.vcycle(op, levels, lev + span,
                         jnp.zeros(below.shape, below.dtype),
                         rhss[-1], cfg)
    return tail_up_call(sub, es, [rhs] + list(rhss[:-1]), e_below, cfg)
