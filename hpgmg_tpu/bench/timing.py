"""Per-level / per-operation timing table (MGPrintTiming analog, mg.c:54-163).

Inside one fused XLA program the reference's 25 per-level accumulators
(level.h:162-196) have no direct equivalent — XLA deliberately fuses and
overlaps the phases. Two complementary tools:

* ``measure_breakdown``: compiles each phase (smooth / residual /
  restriction / interpolation / BC+ghost / BLAS1 / bottom solve) as its own
  jitted function per level and times them standalone. The numbers bound
  the fused cost from above and give the same per-level x per-op table the
  reference prints.
* ``trace`` (see hpgmg_tpu/utils/profiler.py): a jax.profiler trace of the
  fused solve with named scopes, for true overlap analysis.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp

from hpgmg_tpu.core import blas
from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import Hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.ops.transfer import get_interpolation, restrict_cell
from hpgmg_tpu.solve.bottom import bottom_solve
from hpgmg_tpu.solve.smoothers import smooth


def _time_fn(fn, *args, reps: int = 50) -> float:
    """Time ``reps`` chained applications inside ONE jitted program.

    The chain makes iterations data-dependent (no overlap/DCE) and the
    single launch amortizes dispatch/tunnel latency — through the axon
    tunnel a single launch costs tens of ms, so per-launch timing lies.
    The first positional arg is threaded as the carry.
    """
    chained = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda i, c: fn(*((c,) + a[1:])), a[0]))
    out = chained(*args)
    _ = float(jnp.sum(out))  # host transfer = reliable sync
    t0 = time.perf_counter()
    out = chained(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def measure_breakdown(hier: Hierarchy, cfg: SolverConfig,
                      reps: int = 5) -> List[Dict[str, float]]:
    """Time each multigrid phase per level. Returns a list (one dict per
    level) of seconds per single invocation."""
    op = get_suite(cfg.op)
    rows = []
    for idx, lv in enumerate(hier.levels):
        dtype = lv.dtype
        x = jnp.zeros(lv.shape, dtype)
        r = jnp.ones(lv.shape, dtype)
        row = {"level": idx, "dim": lv.dim}
        # the carry (first arg) threads through the chained iterations
        row["smooth"] = _time_fn(
            lambda x, lv, r: smooth(op, lv, x, r, cfg), x, lv, r, reps=reps)
        row["residual"] = _time_fn(
            lambda x, lv, r: op.residual(lv, x, r, cfg), x, lv, r, reps=reps)
        row["blas1"] = _time_fn(
            lambda c, x, r: blas.dot(x + c, r, cfg.reduce_dtype),
            jnp.zeros((), dtype), x, r, reps=reps)
        if idx + 1 < len(hier.levels):
            # time the REAL restrict->interpolate round trip chained on
            # the fine array (shape-preserving, data-dependent) — no
            # plumbing: an earlier version padded the coarse result back
            # to fine shape and strided-sliced the interpolant, which at
            # 512^3 cost far more than the ops being measured (strided
            # lane slicing is ~100x off the roofline on TPU).
            interp_v = get_interpolation(op.interpolation_vcycle)
            row["transfer_v"] = _time_fn(
                lambda x: interp_v(restrict_cell(x), 1.0, x, cfg.bc),
                r, reps=reps)
            interp_f = get_interpolation(op.interpolation_fcycle)
            row["transfer_f"] = _time_fn(
                lambda x: interp_f(restrict_cell(x), 1.0, x, cfg.bc),
                r, reps=reps)
        else:
            row["bottom"] = _time_fn(
                lambda x, lv, r: bottom_solve(op, lv, x, r, cfg), x, lv, r,
                reps=max(5, reps // 5))
        rows.append(row)
    return rows


def fmg_timing_table(hier: Hierarchy, cfg: SolverConfig, f=None):
    """MGPrintTiming analog (mg.c:54-163): per-level x per-operation wall
    time accumulated inside ONE ACTUAL F-cycle solve.

    The solve runs eagerly (op granularity) with a device sync per phase,
    so — unlike ``measure_breakdown``'s standalone upper bounds — the
    numbers are the phases of a real solve in solve order. Caveat: each
    phase pays one dispatch; through the axon tunnel that is ~28 ms/phase,
    so use this on locally-attached devices (or read relative shares).
    Returns (timers dict {(level, phase): seconds}, formatted table)."""
    from hpgmg_tpu.solve.mg import fmg_solve

    op = get_suite(cfg.op)
    if f is None:
        f = jnp.ones(hier.levels[0].shape, hier.levels[0].dtype)
    fmg_solve(op, hier, f, cfg, timers={})  # warm the per-phase jit cache
    timers: Dict = {}
    fmg_solve(op, hier, f, cfg, timers=timers)

    phases = ["smooth", "residual", "restriction", "interpolation",
              "interpolation_f", "bottom"]
    nlev = len(hier.levels)
    lines = ["level".ljust(16) + "".join(f"{i:>12d}" for i in range(nlev)),
             "dim".ljust(16) + "".join(f"{lv.dim:>10d}^3"
                                       for lv in hier.levels)]
    total = [0.0] * nlev
    for ph in phases:
        cells = []
        for i in range(nlev):
            v = timers.get((i, ph))
            cells.append(f"{v:12.6f}" if v is not None else " " * 12)
            total[i] += v or 0.0
        lines.append(ph.ljust(16) + "".join(cells))
    lines.append("total".ljust(16) + "".join(f"{t:12.6f}" for t in total))
    return timers, "\n".join(lines)


def format_breakdown(rows: List[Dict[str, float]]) -> str:
    """Render the per-level x per-op table the way MGPrintTiming does
    (levels as columns, operations as rows)."""
    ops = ["smooth", "residual", "blas1", "transfer_v", "transfer_f",
           "bottom"]
    head = "level".ljust(16) + "".join(f"{r['level']:>12d}" for r in rows)
    dims = "dim".ljust(16) + "".join(f"{r['dim']:>10d}^3" for r in rows)
    lines = [head, dims]
    total = [0.0] * len(rows)
    for name in ops:
        cells = []
        for i, r in enumerate(rows):
            v = r.get(name)
            cells.append(f"{v:12.6f}" if v is not None else " " * 12)
            if v is not None:
                total[i] += v
        lines.append(name.ljust(16) + "".join(cells))
    lines.append("total".ljust(16) + "".join(f"{t:12.6f}" for t in total))
    return "\n".join(lines)
