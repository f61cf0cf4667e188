#!/usr/bin/env python
"""Headline benchmark: FV F-cycle DOF/s on the available TPU chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published FV 4th-order F-cycle throughput of
2.781e8 DOF/s on 8 ranks x 8 threads of Cray XC-30 (BASELINE.md).
"""

import json
import os
import sys

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import BottomSolver, Smoother, SolverConfig
from hpgmg_tpu.bench.driver import run_benchmark

BASELINE_DOF_S = 2.781e8  # README.md:303 (reference)


def main():
    # 256^3 headline: the reference benchmarks at 512^3 (hpgmg-fv 7 8);
    # large n amortizes the coarse-level fixed costs on both sides, and
    # the 2D-tiled kernel keeps per-DOF cost flat from 128^3 up
    n = int(os.environ.get("HPGMG_BENCH_N", "256"))
    op = os.environ.get("HPGMG_BENCH_OP", "fv4")  # the HPGMG-500 operator
    cfg = SolverConfig(
        op=op,
        a=0.0,
        b=1.0,
        smoother=Smoother.GSRB,
        bottom=BottomSolver.DIRECT,  # exact dense bottom (one MXU matvec)
        # 8^3 bottom: the exact direct solve makes the 4^3/2^3 tail levels
        # pure overhead (reference MAX_COARSE_DIM=11 permits 11^3 bottoms);
        # measured: 8^3 bottom beats 4^3 by ~3% at n=128
        min_coarse_dim=8,
        dtype=jnp.float32,
    )
    res = run_benchmark(n, cfg, mesh=None, min_solve_seconds=2.0,
                        verbose=False)
    print(json.dumps({
        "metric": f"{op}_fcycle_dof_per_s_n{n}",
        "value": res.dof_per_second,
        "unit": "DOF/s",
        "vs_baseline": res.dof_per_second / BASELINE_DOF_S,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
