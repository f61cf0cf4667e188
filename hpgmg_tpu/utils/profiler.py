"""Tracing / profiling utilities (the reference's timer subsystem analog).

FV hand-rolls hierarchical timers (timers.h:11-23, level.h:162-196) and FE
uses PetscLogStage/Event (fmg.c:180-196). On TPU the native equivalent is a
jax.profiler device trace with named scopes — the scopes below mark cycle
phases so the trace viewer shows the same per-level structure the
reference's tables do. Flop accounting (PetscLogFlops analog) is analytic,
from the static stencil shapes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def scope(name: str):
    """Named scope for solver phases. Composes BOTH annotation kinds:
    ``jax.named_scope`` names the HLO ops emitted while tracing (so a
    device trace of the fused solve shows per-level phases — the
    MGPrintTiming / PetscLogStage analog) and ``TraceAnnotation`` marks
    host time when used around eager calls."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hpgmg_tpu_trace"):
    """Capture a device trace around a block: use with the fused solve."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class WallTimer:
    """getTime() analog (timers.h:11-23): accumulating wall-clock timer with
    explicit device synchronization."""

    def __init__(self):
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        return False


# -- analytic flop accounting (PetscLogFlops analog) -------------------------

def stencil_flops_per_cell(op_name: str) -> int:
    """FLOPs per cell for one operator application (counted from the
    stencil expressions, matching the reference's hand counts)."""
    return {
        "fv7pt": 13,  # 6 face terms: 6 mul + 6 add/sub pairs + scale
        "fv2": 13,
        "fv4": 73,  # 6 high-order fluxes (5 ops each) + 12 mixed terms
        "27pt": 30,
    }.get(op_name, 0)


def fcycle_dof_per_solve(n: int) -> int:
    return n ** 3
