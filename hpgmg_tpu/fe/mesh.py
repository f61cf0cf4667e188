"""FE distribution: place FELevel fields over a device mesh.

The reference FE distributes an element range per rank on a Z-ordered
process grid and coarsens the process set by keeping every 8th Z-rank
(grid.c:106-220); halos and injections are PetscSF graphs. TPU-native
equivalent: the element-batch axes (Mx, My, Mz) — the trailing dims of
every element tensor — are sharded over the 3D mesh, node arrays are
sharded over the same axes, and XLA's SPMD partitioner emits the halo
exchanges that PetscSF encoded. Coarse levels whose per-chip element count
drops below the agglomeration floor are replicated — the every-8th-rank
comm-split (grid.c:208-220) becomes "every chip redundantly owns the
coarse grid", exactly like the FV path (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpgmg_tpu.fe.fas import FELevel
from hpgmg_tpu.parallel.mesh import MESH_AXES

# Replicate a level when any sharded axis would hold fewer elements than
# this per chip (the cmax=192-local-elements rationale, fmg.c:43-53,
# scaled to per-axis form).
MIN_ELEMS_PER_CHIP = 2


def _axis_spec(mesh: Mesh, M) -> tuple:
    """Mesh axis names for the three element-batch dims (None = replicated
    on that axis)."""
    spec = []
    for ax, name in enumerate(MESH_AXES):
        size = mesh.shape[name]
        if (size > 1 and M[ax] % size == 0
                and M[ax] // size >= MIN_ELEMS_PER_CHIP):
            spec.append(name)
        else:
            spec.append(None)
    return tuple(spec)


def fe_level_sharding(mesh: Mesh, level: FELevel):
    """Shardings for (coords, dinv, metric_a, metric_w) of one level."""
    spec = _axis_spec(mesh, level.grid.M)
    if all(s is None for s in spec):
        rep = NamedSharding(mesh, P())
        return rep, rep, rep, rep
    # node arrays (Nx, Ny, Nz) with N = degree*M + 1: shard the same axes
    # (uneven by the +1 fringe — GSPMD pads the last shard)
    node = NamedSharding(mesh, P(*spec))
    coords = NamedSharding(mesh, P(None, *spec))
    # metric arrays carry the element batch in their trailing three dims
    def trailing(arr):
        lead = (None,) * (arr.ndim - 3)
        if arr.ndim < 3 or arr.shape[-3:] != tuple(level.grid.M):
            return NamedSharding(mesh, P())  # affine kdiag / (Q,Q,Q,1,1,1)
        return NamedSharding(mesh, P(*lead, *spec))
    return coords, node, trailing(level.metric_a), trailing(level.metric_w)


def _place(x, sharding):
    """Reshard one array. Node arrays have N = degree*M + 1 — not evenly
    divisible by the mesh — and both ``jax.device_put`` and jit
    ``out_shardings`` reject uneven shardings, so route through an
    in-program ``with_sharding_constraint`` (GSPMD pads the last shard
    internally)."""
    return jax.jit(
        lambda a: jax.lax.with_sharding_constraint(a, sharding))(x)


def shard_fe_levels(mesh: Optional[Mesh],
                    levels: List[FELevel]) -> List[FELevel]:
    """Place every FE level on the mesh: fine levels sharded over
    (Mx, My, Mz), coarse levels replicated (the process-set coarsening
    analog)."""
    if mesh is None:
        return levels
    out = []
    for lv in levels:
        s_coords, s_node, s_ma, s_mw = fe_level_sharding(mesh, lv)
        out.append(dataclasses.replace(
            lv,
            coords=_place(lv.coords, s_coords),
            dinv=_place(lv.dinv, s_node),
            metric_a=_place(lv.metric_a, s_ma),
            metric_w=_place(lv.metric_w, s_mw)))
    return out


def shard_fe_field(mesh: Optional[Mesh], level: FELevel, x):
    """Place one node field (e.g. the forcing) on the level's sharding."""
    if mesh is None:
        return x
    _, s_node, _, _ = fe_level_sharding(mesh, level)
    return _place(x, s_node)
