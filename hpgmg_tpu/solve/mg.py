"""Multigrid cycle drivers: V-cycle, MGSolve, FMGSolve, Richardson analysis.

Rebuild of the reference mg.c:1135-1495. The level ladder is static, so a
"recursive" V-cycle is a Python recursion unrolled at trace time into one
XLA program — the analog of the reference's precomputed MGBuild ladder
(mg.c:894-952). Convergence-dependent iteration (MGSolve's rtol loop,
mg.c:1199-1222) is offered two ways:

* ``mg_solve`` — host-driven loop with early exit (test/verification mode);
* ``mg_solve_fixed`` / ``fmg_solve`` — fully traced with static trip counts
  (benchmark mode; the F-cycle is non-iterative anyway, mg.c:1243-1246).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from hpgmg_tpu.core import blas
from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.hierarchy import Hierarchy
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.ops.base import OperatorSuite, get_suite
from hpgmg_tpu.kernels.restrict import restrict_cell_auto, use_pallas_restrict
from hpgmg_tpu.ops.transfer import get_interpolation, restrict_cell
from hpgmg_tpu.parallel.mesh import maybe_constrain
from hpgmg_tpu.solve.bottom import bottom_solve
from hpgmg_tpu.solve.smoothers import smooth
from hpgmg_tpu.utils.profiler import scope


def _must_subtract_mean(cfg: SolverConfig) -> bool:
    """Periodic pure-Poisson has a null space of constants (mg.c:1008-1018)."""
    return cfg.bc == BC.PERIODIC and not cfg.helmholtz


import functools


@functools.lru_cache(maxsize=None)
def _phase_jit(name: str, variant: str = ""):
    """Jitted per-phase kernels for the timed (MGPrintTiming) solve mode.
    Stable callables so jax's compile cache hits across phase calls.

    The cache key is only (name, variant): ``op``/``cfg`` ride as jit
    static arguments, so a second config in the same process simply adds
    entries to the *inner* jit cache of the same callable (correct, no
    cross-config aliasing). The outer lru_cache is bounded by the ~7
    phase names x interpolation variants; it never needs eviction."""
    if name == "smooth":
        return jax.jit(smooth, static_argnums=(0, 4))
    if name == "residual":
        return jax.jit(lambda op, level, e, rhs, cfg:
                       op.residual(level, e, rhs, cfg),
                       static_argnums=(0, 4))
    if name == "restriction":
        fast = variant == "fast"
        return jax.jit(lambda dim, t: maybe_constrain(
            dim, restrict_cell_auto(t, fast)), static_argnums=(0,))
    if name in ("interpolation", "interpolation_f"):
        interp = get_interpolation(variant)
        prescale = 1.0 if name == "interpolation" else 0.0
        return jax.jit(lambda dim, e_c, e, bc: maybe_constrain(
            dim, interp(e_c, prescale, e, bc)),
            static_argnums=(0, 3))
    if name == "bottom":
        return jax.jit(lambda op, level, e, rhs, cfg, msm: bottom_solve(
            op, level, e, rhs, cfg, must_subtract_mean=msm),
            static_argnums=(0, 4, 5))
    raise KeyError(name)


def _phase(timers, lev: int, name: str, fn, args=None, variant: str = ""):
    """Run one cycle phase. Traced mode (``timers`` is None): run ``fn``
    inline under a profiler named scope. Timed mode (``timers`` a dict):
    run the phase as its own cached-jitted program with a device sync and
    accumulate wall-clock into ``timers[(lev, name)]`` — the per-level
    accumulator array of the reference (level.h:162-196), giving
    MGPrintTiming-style tables from an actual solve in solve order.
    (Each phase pays one dispatch; ~28 ms through the axon tunnel.)"""
    if timers is None:
        with scope(f"mg.L{lev}.{name}"):
            return fn()
    import time

    jf = _phase_jit(name, variant)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(*args))
    timers[(lev, name)] = (timers.get((lev, name), 0.0)
                           + time.perf_counter() - t0)
    return out


def vcycle(op: OperatorSuite, levels: List[Level], lev: int, e, rhs,
           cfg: SolverConfig, timers=None):
    """One V-cycle from level ``lev`` down to the bottom (MGVCycle, mg.c:1135).

    smooth -> residual -> restrict -> recurse -> interpolate(+=) -> smooth;
    the bottom level runs the Krylov solver.
    """
    level = levels[lev]
    msm = _must_subtract_mean(cfg)
    if lev == len(levels) - 1:
        return _phase(timers, lev, "bottom",
                      lambda: bottom_solve(op, level, e, rhs, cfg,
                                           must_subtract_mean=msm),
                      args=(op, level, e, rhs, cfg, msm))

    # fused coarse-ladder subtree: the whole V-cycle below here runs as
    # two Pallas launches + the bottom solve (kernels/tail.py — the
    # small-grid launch-floor fix, SURVEY §7 hard part 3). Traced mode
    # only; the timed mode keeps phases itemized.
    from hpgmg_tpu.kernels.tail import tail_vcycle, use_tail

    if timers is None and use_tail(op, cfg, levels, lev):
        with scope(f"mg.L{lev}.tail"):
            return tail_vcycle(op, levels, lev, e, rhs, cfg)

    e = _phase(timers, lev, "smooth",
               lambda: smooth(op, level, e, rhs, cfg),
               args=(op, level, e, rhs, cfg))
    # residual + restriction: fused into one kernel pass when the suite
    # serves it (traced mode; the timed mode keeps the phases itemized —
    # its restriction program still runs the production kernel variant)
    fused = None
    if timers is None:
        with scope(f"mg.L{lev}.res+restrict"):
            fused = op.restrict_residual(level, e, rhs, cfg)
    if fused is not None:
        # place the coarse rhs on the coarse level's mesh footprint
        # (sharded or replicated — the agglomeration decision)
        rhs_c = maybe_constrain(levels[lev + 1].dim, fused)
    else:
        t = _phase(timers, lev, "residual",
                   lambda: op.residual(level, e, rhs, cfg),
                   args=(op, level, e, rhs, cfg))
        rfast = use_pallas_restrict(cfg, level)
        rhs_c = _phase(timers, lev, "restriction",
                       lambda: maybe_constrain(levels[lev + 1].dim,
                                               restrict_cell_auto(t, rfast)),
                       args=(levels[lev + 1].dim, t),
                       variant="fast" if rfast else "")
    e_c = jnp.zeros_like(rhs_c)
    e_c = vcycle(op, levels, lev + 1, e_c, rhs_c, cfg, timers)
    interp = get_interpolation(op.interpolation_vcycle)
    e = _phase(timers, lev, "interpolation",
               lambda: maybe_constrain(level.dim,
                                       interp(e_c, 1.0, e, cfg.bc)),
               args=(level.dim, e_c, e, cfg.bc),
               variant=op.interpolation_vcycle)
    e = _phase(timers, lev, "smooth",
               lambda: smooth(op, level, e, rhs, cfg),
               args=(op, level, e, rhs, cfg))
    return e


def _cycle_norm(op, level, u, f, cfg) -> Tuple[jax.Array, jax.Array]:
    """Post-cycle true-residual norm with optional mean subtraction
    (mg.c:1208-1213)."""
    if _must_subtract_mean(cfg):
        u = u - blas.mean(u, cfg.reduce_dtype)
    res = op.residual(level, u, f, cfg)
    return u, blas.norm(res)


def mg_solve(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
             u0=None, verbose: bool = False):
    """MGSolve (mg.c:1168-1233): V-cycles until ||r||/||F|| < rtol.

    Host-driven loop (one device sync per cycle) — use for verification.
    Returns (u, history) where history is the list of per-cycle relative
    residual norms.
    """
    levels = hier.levels
    u = jnp.zeros(levels[0].shape, levels[0].dtype) if u0 is None else u0
    norm_f = float(blas.norm(f))

    # NOTE: hier rides as a traced argument, never a closure constant —
    # closed-over arrays become XLA literals and explode compile time.
    @jax.jit
    def step(hier, u, f):
        u2 = vcycle(op, hier.levels, 0, u, f, cfg)
        return _cycle_norm(op, hier.levels[0], u2, f, cfg)

    history = []
    for v in range(cfg.max_vcycles):
        u, norm_r = step(hier, u, f)
        rel = float(norm_r) / norm_f if norm_f != 0.0 else float(norm_r)
        history.append(rel)
        if verbose:
            print(f"v-cycle={v + 1:2d}  norm={float(norm_r):1.15e}  rel={rel:1.15e}")
        if rel < cfg.rtol:
            break
    return u, history


def mg_solve_fixed(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
                   num_cycles: int, u0=None):
    """Fully-traced MGSolve with a static V-cycle count. Returns
    (u, stacked relative residual norms)."""
    levels = hier.levels
    u = jnp.zeros(levels[0].shape, levels[0].dtype) if u0 is None else u0
    norm_f = blas.norm(f)
    rels = []
    for _ in range(num_cycles):
        u = vcycle(op, levels, 0, u, f, cfg)
        u, norm_r = _cycle_norm(op, levels[0], u, f, cfg)
        rels.append(norm_r / norm_f)
    return u, jnp.stack(rels)


def fmg_solve(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
              u0=None, timers=None):
    """FMGSolve (mg.c:1237-1344): one F-cycle (+ optional trailing V-cycles).

    Restrict F to every level, solve the coarsest, then per level
    {high-order interpolation; V-cycle} up to the finest. Returns
    (u, norm_r, norm_f) — the caller checks norm_r/norm_f < rtol
    (one F-cycle reaches discretization error; README.md:4-10).
    ``timers``: optional per-level accumulator dict (see ``_phase``).
    """
    levels = hier.levels
    norm_f = blas.norm(f)

    # restrict the rhs down the whole ladder (mg.c:1274-1278)
    rhs = [f]
    msm = _must_subtract_mean(cfg)
    for lev in range(len(levels) - 1):
        t = rhs[-1]
        rfast = use_pallas_restrict(cfg, levels[lev])
        rhs.append(_phase(timers, lev, "restriction",
                          lambda lev=lev, t=t, rfast=rfast: maybe_constrain(
                              levels[lev + 1].dim,
                              restrict_cell_auto(t, rfast)),
                          args=(levels[lev + 1].dim, t),
                          variant="fast" if rfast else ""))

    # coarsest-grid solve (mg.c:1283-1287)
    bot = len(levels) - 1
    if bot == 0 and u0 is not None:
        u = u0
    else:
        u = jnp.zeros(levels[bot].shape, levels[bot].dtype)
    u = _phase(timers, bot, "bottom",
               lambda: bottom_solve(op, levels[bot], u, rhs[bot], cfg,
                                    must_subtract_mean=msm),
               args=(op, levels[bot], u, rhs[bot], cfg, msm))

    # climb: high-order interpolation then a V-cycle at each level
    interp_f = get_interpolation(op.interpolation_fcycle)
    for lev in range(bot - 1, -1, -1):
        # prescale 0: overwrite (mg.c:1295)
        u = _phase(timers, lev, "interpolation_f",
                   lambda lev=lev, u=u: maybe_constrain(
                       levels[lev].dim, interp_f(u, 0.0, None, cfg.bc)),
                   args=(levels[lev].dim, u, None, cfg.bc),
                   variant=op.interpolation_fcycle)
        u = vcycle(op, levels, lev, u, rhs[lev], cfg, timers)

    # trailing V-cycles (UNLIMIT_FMG_ITERATIONS analog), fixed count
    for _ in range(cfg.post_f_vcycles):
        u = vcycle(op, levels, 0, u, f, cfg, timers)

    u, norm_r = _cycle_norm(op, levels[0], u, f, cfg)
    return u, norm_r, norm_f


def fmg_solve2(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
               u0=None, max_fcycles: int = 20, verbose: bool = False):
    """FMGSolve2 (mg.c:1348-1495): iterated F-cycles in residual-correction
    form — compute r = f - A u, solve A e = r with one F-cycle, u += e,
    repeat until rtol. Host-driven outer loop (each F-cycle is one jitted
    program); used when a single F-cycle isn't enough (e.g. f32 runs).
    """
    levels = hier.levels
    u = jnp.zeros(levels[0].shape, levels[0].dtype) if u0 is None else u0
    subtract = _must_subtract_mean(cfg)

    @jax.jit
    def fstep(hier, u, f):
        r = op.residual(hier.levels[0], u, f, cfg)
        e, _, _ = fmg_solve(op, hier, r, cfg)
        u2 = u + e
        if subtract:
            u2 = u2 - blas.mean(u2, cfg.reduce_dtype)
        r2 = op.residual(hier.levels[0], u2, f, cfg)
        return u2, blas.norm(r2)

    norm_f = float(blas.norm(f))
    history = []
    for fc in range(max_fcycles):
        u, norm_r = fstep(hier, u, f)
        rel = float(norm_r) / norm_f
        history.append(rel)
        if verbose:
            print(f"f-cycle={fc + 1:2d}  norm={float(norm_r):1.15e}  rel={rel:1.15e}")
        if rel < cfg.rtol:
            break
    return u, history


def fmg_solve2_dd(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
                  max_fcycles: int = 20, verbose: bool = False):
    """Mixed-precision FMGSolve2: f32 cycles with a COMPENSATED fine-level
    iterate (SURVEY §7.8 risk #1; the mg.c:1221 rtol-1e-10 oracle's f32
    analog).

    The flagship f32 F-cycle floors at ~5e-4 relative residual because the
    fine iterate u is *stored* in f32: representation noise delta_u ~
    eps*|u| is non-smooth, so the h^-2-scaled stencil amplifies it to
    ||A delta_u|| ~ 25 * h^-2 * eps * |u| — at 512^3 that is ~3e-4 of
    ||f||, exactly the observed plateau. Storing the fine solution as an
    unevaluated double-f32 sum (u_hi + u_lo, Dekker/Knuth two-sum
    accumulation) removes that floor while every operator apply, transfer
    and smooth stays in plain f32 on the fast kernels:

        r   = (f - A u_hi) - A u_lo      (linearity; two f32 applies)
        e   = FMG(r)                     (one plain f32 F-cycle)
        u   = two_sum(u_hi, u_lo + e)    (exact-error accumulation)

    The remaining floor is the f32 rounding *inside* one apply of the
    smooth iterate (differences of adjacent u are Sterbenz-exact; the
    flux scalings contribute ~2 eps each), measured ~1e-6 — two to three
    orders below the plain-f32 plateau, at the cost of ONE extra fine
    apply per F-cycle (the r4 512^3 breakdown prices a fine residual at
    ~11 ms against a 183 ms solve).

    Returns (u_hi, u_lo, history) — the converged solution is
    u_hi + u_lo (u_hi alone is the f32-representable part).
    """
    levels = hier.levels
    lv0 = levels[0]
    u_hi = jnp.zeros(lv0.shape, lv0.dtype)
    u_lo = jnp.zeros(lv0.shape, lv0.dtype)
    subtract = _must_subtract_mean(cfg)

    @jax.jit
    def fstep(hier, u_hi, u_lo, f):
        lv = hier.levels[0]
        # residual of the unevaluated sum: big cancellation first
        r = op.residual(lv, u_hi, f, cfg) - op.apply_op(lv, u_lo, cfg)
        e, _, _ = fmg_solve(op, hier, r, cfg)
        # two-sum accumulate: (u_hi, u_lo) <- fl(u_hi + t), exact error
        t = u_lo + e
        s = u_hi + t
        err = (u_hi - s) + t
        if subtract:
            m = blas.mean(s, cfg.reduce_dtype) + blas.mean(
                err, cfg.reduce_dtype)
            s = s - m
        r2 = op.residual(lv, s, f, cfg) - op.apply_op(lv, err, cfg)
        return s, err, blas.norm(r2)

    norm_f = float(blas.norm(f))
    history = []
    for fc in range(max_fcycles):
        u_hi, u_lo, norm_r = fstep(hier, u_hi, u_lo, f)
        rel = float(norm_r) / norm_f
        history.append(rel)
        if verbose:
            print(f"f-cycle={fc + 1:2d}  norm={float(norm_r):1.15e}  "
                  f"rel={rel:1.15e}")
        if rel < cfg.rtol:
            break
    return u_hi, u_lo, history


def mgpcg(op: OperatorSuite, hier: Hierarchy, f, cfg: SolverConfig,
          max_iters: int = 20, verbose: bool = False):
    """MGPCG (mg.c:1500-1607): CG preconditioned by one MG V-cycle
    (Saad Alg 9.1). The true residual is recomputed every iteration for the
    convergence test (mg.c:1578-1585). Host-driven loop; each iteration is
    one jitted program containing the V-cycle preconditioner application.
    """
    levels = hier.levels
    lv0 = levels[0]
    subtract = _must_subtract_mean(cfg)

    def precond(hier, r):
        z = jnp.zeros_like(r)
        return vcycle(op, hier.levels, 0, z, r, cfg)

    @jax.jit
    def init(hier, f):
        x = jnp.zeros(lv0.shape, lv0.dtype)
        r = op.residual(hier.levels[0], x, f, cfg)
        if subtract:
            r = r - blas.mean(r, cfg.reduce_dtype)
        z = precond(hier, r)
        return x, r, z, blas.dot(r, z, cfg.reduce_dtype), blas.norm(r)

    @jax.jit
    def step(hier, x, r, p, r_dot_z, f):
        ap = op.apply_op(hier.levels[0], p, cfg)
        ap_dot_p = blas.dot(ap, p, cfg.reduce_dtype)
        alpha = r_dot_z / ap_dot_p
        x = x + alpha * p
        r = r - alpha * ap
        if subtract:
            r = r - blas.mean(r, cfg.reduce_dtype)
        true_r = op.residual(hier.levels[0], x, f, cfg)
        norm_true = blas.norm(true_r)
        z = precond(hier, r)
        r_dot_z_new = blas.dot(r, z, cfg.reduce_dtype)
        beta = r_dot_z_new / r_dot_z
        p = z + beta * p
        return x, r, p, r_dot_z_new, norm_true

    x, r, z, r_dot_z, norm_r0 = init(hier, f)
    p = z
    history = []
    for j in range(max_iters):
        x, r, p, r_dot_z, norm_true = step(hier, x, r, p, r_dot_z, f)
        rel = float(norm_true) / float(norm_r0)
        history.append(rel)
        if verbose:
            print(f"iter={j + 1:3d}  norm={float(norm_true):1.15e}  rel={rel:1.15e}")
        if rel < cfg.rtol:
            break
    return x, history


def richardson_error(op: OperatorSuite, u_h, u_2h, u_4h) -> Tuple[jax.Array, jax.Array]:
    """Richardson order estimate from solves at h, 2h, 4h (mg.c:1113-1131).

    Returns (||u2h - R uh||_max, order) with
    order = log2(||u4h - R u2h|| / ||u2h - R uh||).
    """
    e_h = blas.norm(u_2h - restrict_cell(u_h))
    e_2h = blas.norm(u_4h - restrict_cell(u_2h))
    order = jnp.log2(e_2h / e_h)
    return e_h, order


class MGSolver:
    """Convenience wrapper binding an operator suite + config + hierarchy.

    Mirrors the role of the reference's ``mg_type`` (mg.h) without owning
    any mutable solve state.
    """

    def __init__(self, hier: Hierarchy, cfg: SolverConfig):
        self.hier = hier
        self.cfg = cfg
        self.op = get_suite(cfg.op)

    def solve(self, f, u0=None, verbose: bool = False):
        from hpgmg_tpu.core.config import CycleType

        if self.cfg.cycle == CycleType.F:
            u, norm_r, norm_f = jax.jit(
                lambda hier, f: fmg_solve(self.op, hier, f, self.cfg))(
                    self.hier, f)
            if verbose:
                rel = float(norm_r) / float(norm_f)
                print(f"f-cycle     norm={float(norm_r):1.15e}  rel={rel:1.15e}")
            return u, [float(norm_r) / float(norm_f)]
        return mg_solve(self.op, self.hier, f, self.cfg, u0=u0, verbose=verbose)
