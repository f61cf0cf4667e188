"""Explicit halo exchange with shard_map collectives.

The ghost-zone machinery of the reference (exchange_boundary.c +
build_exchange_ghosts' precompiled pack/local/unpack programs) has TWO
TPU-native equivalents in this framework:

1. **Implicit (default)**: solvers are written on global arrays; when the
   arrays carry a ``NamedSharding``, XLA's SPMD partitioner turns the
   pad/slice stencil accesses into ICI halo collectives automatically.
   This is what the solve paths use — zero bookkeeping, correct by
   construction.

2. **Explicit (this module)**: a ``shard_map`` halo exchange built from
   ``jax.lax.ppermute``, one exchange per sharded axis per direction,
   applied axis-by-axis so edge/corner ghosts arrive transitively
   (exactly the shape-aware schedule of build_exchange_ghosts,
   level.c:498-531 — SURVEY.md §7 hard part #5). Use it to hand-schedule
   communication when profiling shows the partitioner doing something
   suboptimal, or as the building block for pallas-side RDMA later.

The exchanged array is returned ghost-EXTENDED by ``radius`` on every
axis (the local shard gains 2*radius cells per sharded axis), with
boundary shards filled by the BC (Dirichlet reflection handled by the
caller's BC fill on the assembled global ghosts — here we fill zeros and
let the caller overwrite, or wrap for periodic).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpgmg_tpu.core.config import BC


def _exchange_axis(x_local, axis_name: str, axis: int, radius: int,
                   periodic: bool):
    """Send my low/high faces to my -/+ neighbors along one mesh axis."""
    n_shards = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    lo_face = lax.slice_in_dim(x_local, 0, radius, axis=axis)
    n = x_local.shape[axis]
    hi_face = lax.slice_in_dim(x_local, n - radius, n, axis=axis)

    # neighbor's high face becomes my low ghost, and vice versa
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    ghost_lo = lax.ppermute(hi_face, axis_name, fwd)   # from idx-1
    ghost_hi = lax.ppermute(lo_face, axis_name, bwd)   # from idx+1

    if not periodic:
        # zero the wrap-around ghosts at the physical boundary; the caller
        # overwrites them with the BC fill
        at_lo = (idx == 0)
        at_hi = (idx == n_shards - 1)
        ghost_lo = jnp.where(at_lo, jnp.zeros_like(ghost_lo), ghost_lo)
        ghost_hi = jnp.where(at_hi, jnp.zeros_like(ghost_hi), ghost_hi)

    return jnp.concatenate([ghost_lo, x_local, ghost_hi], axis=axis)


def halo_exchange(mesh: Mesh, x, radius: int = 1, bc: BC = BC.PERIODIC,
                  axes: Tuple[str, str, str] = ("x", "y", "z")):
    """Exchange ghost zones for a 3D array sharded as P(*axes) over `mesh`.

    Returns the array extended by ``radius`` ghosts on every axis of every
    shard (shape grows by 2*radius*n_shards per axis globally — callers
    slice their own shard's view inside shard_map, or use this as a
    building block inside a larger shard_map region).
    """
    spec = P(*axes)
    return shard_map(lambda xl: exchange_local(xl, mesh, radius, bc, axes),
                     mesh=mesh, in_specs=(spec,), out_specs=spec)(x)


def exchange_local(x_local, mesh: Mesh, radius: int, bc: BC,
                   axes: Tuple[str, str, str] = ("x", "y", "z")):
    """The exchange body, usable INSIDE a larger shard_map region — the
    building block for composing explicit communication with local
    compute, mirroring the reference's exchange-then-stencil anatomy."""
    periodic = bc == BC.PERIODIC
    for ax, name in enumerate(axes):
        if mesh.shape[name] > 1:
            x_local = _exchange_axis(x_local, name, ax, radius, periodic)
        else:
            # single shard on this axis: wrap or zero-extend locally
            nloc = x_local.shape[ax]
            if periodic:
                lo = lax.slice_in_dim(x_local, nloc - radius, nloc, axis=ax)
                hi = lax.slice_in_dim(x_local, 0, radius, axis=ax)
            else:
                shp = list(x_local.shape)
                shp[ax] = radius
                lo = hi = jnp.zeros(shp, x_local.dtype)
            x_local = jnp.concatenate([lo, x_local, hi], axis=ax)
    return x_local


def apply_poisson7_explicit(mesh: Mesh, x, h2inv, bc: BC = BC.PERIODIC):
    """Constant-coefficient 7-point A(u) = -h2inv*(sum(neighbors) - 6u)
    with EXPLICIT communication: one shard_map region that first runs the
    ppermute halo exchange and then the purely-local stencil — exactly
    the anatomy of the reference's exchange_boundary + apply_op pair
    (exchange_boundary.c:12-117, apply_op.c:9). The solve paths use the
    implicit GSPMD form; this is the hand-scheduled alternative (and a
    correctness cross-check for it, tests/test_halo.py)."""
    spec = P("x", "y", "z")

    def body(xl):
        g = exchange_local(xl, mesh, 1, bc)
        c = g[1:-1, 1:-1, 1:-1]
        neigh = (g[:-2, 1:-1, 1:-1] + g[2:, 1:-1, 1:-1]
                 + g[1:-1, :-2, 1:-1] + g[1:-1, 2:, 1:-1]
                 + g[1:-1, 1:-1, :-2] + g[1:-1, 1:-1, 2:])
        return -h2inv * (neigh - 6.0 * c)

    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)


def jacobi_sweeps_explicit(mesh: Mesh, x, rhs, h2inv, sweeps: int,
                           bc: BC = BC.PERIODIC, weight: float = 2.0 / 3.0):
    """Weighted-Jacobi smoothing built on the explicit-communication apply
    (jacobi.c:8-65 with exchange_boundary per sweep): demonstrates the
    explicit halo path composed into an actual smoother iteration."""
    dinv = 1.0 / (6.0 * h2inv)

    def sweep(_, x):
        ax = apply_poisson7_explicit(mesh, x, h2inv, bc)
        return x + weight * dinv * (rhs - ax)

    return lax.fori_loop(0, sweeps, sweep, x)
