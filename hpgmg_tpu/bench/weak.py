"""Weak-scaling benchmark over a device mesh.

The reference's headline scaling study runs a fixed per-rank volume while
growing the machine (finite-volume/source/README "Understanding the
Results": 512 ranks x 12 threads at 8e9 DOF). TPU analog: fixed per-chip
subdomain, growing 3D mesh; fine levels sharded, coarse levels
replicated.

Usage (virtual devices for a dry run):
    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m hpgmg_tpu.bench.weak --per-chip 32 --devices 1 8
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def run_weak(per_chip: int, n_devices: int, op_name: str = "fv4",
             dtype=jnp.float32, reps: int = 10):
    from hpgmg_tpu.core.config import SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.parallel.mesh import (active_mesh, make_mesh, shard_array,
                                         shard_hierarchy)
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.mg import fmg_solve

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    shape = tuple(mesh.shape[a] for a in ("x", "y", "z"))
    n = per_chip * max(shape)  # cube sized by the longest mesh axis
    cfg = SolverConfig(op=op_name, a=0.0, dtype=dtype)
    prob = init_problem_fv(n, dtype=dtype)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    hier = shard_hierarchy(mesh, hier, cfg)
    f = shard_array(mesh, prob.f)
    opsuite = get_suite(op_name)

    with active_mesh(mesh):
        @jax.jit
        def chained(hier, f):
            def body(i, carry):
                dep, _ = carry
                _, nr, _ = fmg_solve(opsuite, hier, f + dep, cfg)
                return (0.0 * nr, nr)

            return jax.lax.fori_loop(
                0, reps, body, (jnp.zeros((), f.dtype),) * 2)[1]

        nr = chained(hier, f)
        _ = float(nr)  # warm + compile
        t0 = time.perf_counter()
        nr = chained(hier, f)
        _ = float(nr)
        dt = (time.perf_counter() - t0) / reps
    dof = n ** 3
    return dict(devices=n_devices, mesh=shape, n=n, seconds=dt,
                dof_per_s=dof / dt)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-chip", type=int, default=32)
    p.add_argument("--op", default="fv4")
    p.add_argument("--devices", type=int, nargs="+", default=[1])
    p.add_argument("--dtype", default="float32")
    args = p.parse_args(argv)
    base_t = None
    for nd in args.devices:
        r = run_weak(args.per_chip, nd, args.op, jnp.dtype(args.dtype))
        if base_t is None:
            base_t = r["seconds"]
        # weak-eff: wall-clock efficiency vs the 1-device run (the real
        # metric on real chips). serial-eff: efficiency vs the SERIALIZED
        # ideal nd*t1 — on forced-host virtual devices sharing one core
        # the shards execute sequentially, so serial-eff isolates the
        # distribution layer's overhead (halos, collectives, resharding)
        # from the absent hardware parallelism.
        weak_eff = base_t / r["seconds"]
        serial_eff = nd * base_t / r["seconds"]
        print(f"devices={r['devices']:3d} mesh={r['mesh']} n={r['n']:4d} "
              f"{r['seconds'] * 1e3:8.2f} ms/solve {r['dof_per_s']:.3e} DOF/s "
              f"weak-eff={weak_eff:5.2f} serial-eff={min(serial_eff, 1.0):5.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
