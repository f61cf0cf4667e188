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


def _time_fn(fn, *args, reps: int = 5) -> float:
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def measure_breakdown(hier: Hierarchy, cfg: SolverConfig,
                      reps: int = 5) -> List[Dict[str, float]]:
    """Time each multigrid phase per level. Returns a list (one dict per
    level) of seconds per single invocation."""
    op = get_suite(cfg.op)
    rows = []
    for idx, lv in enumerate(hier.levels):
        dtype = lv.beta_i.dtype
        x = jnp.zeros(lv.shape, dtype)
        r = jnp.ones(lv.shape, dtype)
        row = {"level": idx, "dim": lv.dim}
        row["smooth"] = _time_fn(
            jax.jit(lambda lv, x, r: smooth(op, lv, x, r, cfg)), lv, x, r,
            reps=reps)
        row["residual"] = _time_fn(
            jax.jit(lambda lv, x, r: op.residual(lv, x, r, cfg)), lv, x, r,
            reps=reps)
        row["blas1"] = _time_fn(
            jax.jit(lambda x, r: blas.dot(x, r, cfg.reduce_dtype)), x, r,
            reps=reps)
        if idx + 1 < len(hier.levels):
            row["restriction"] = _time_fn(jax.jit(restrict_cell), r, reps=reps)
            interp = get_interpolation(op.interpolation_vcycle)
            xc = jnp.ones(hier.levels[idx + 1].shape, dtype)
            row["interpolation"] = _time_fn(
                jax.jit(lambda xc, x: interp(xc, 1.0, x, cfg.bc)), xc, x,
                reps=reps)
        else:
            row["bottom"] = _time_fn(
                jax.jit(lambda lv, x, r: bottom_solve(op, lv, x, r, cfg)),
                lv, x, r, reps=reps)
        rows.append(row)
    return rows


def format_breakdown(rows: List[Dict[str, float]]) -> str:
    """Render the per-level x per-op table the way MGPrintTiming does
    (levels as columns, operations as rows)."""
    ops = ["smooth", "residual", "blas1", "restriction", "interpolation",
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
