"""Device mesh + level placement (the distribution layer).

The reference distributes boxes over MPI ranks with a Z-Morton SFC
(level.c:240-275) and re-agglomerates coarse levels onto fewer ranks with
per-level subcommunicators (mg.c:894-997). The TPU-native equivalents:

* a 3D ``jax.sharding.Mesh`` over the chips; fine-level fields carry a
  ``NamedSharding(P('x','y','z'))`` — the SPMD partitioner turns the
  stencil's pad/slice halos into ICI collective-permutes, replacing the
  entire blockCopy/exchange_boundary machinery;
* levels whose per-chip extent would drop below ``AGGLOMERATION_START``
  cells per axis are **replicated** (sharding ``P()``) — every chip
  redundantly runs the coarse grids and the bottom solve, so coarse-level
  all-reduces cost nothing and the coarse->fine broadcast is free. This is
  the analog of MG_AGGLOMERATION_START=8^3 + "agglomerate to 1 rank"
  (mg.h:15-17, mg.c:902-949).

Sharding is expressed with ``jax.lax.with_sharding_constraint`` inside the
traced solver, so a single jitted F-cycle contains the fine sharded phase,
the replication "gather", and the redundant coarse phase.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Per-chip box floor below which a level is replicated on every chip
# (MG_AGGLOMERATION_START analog, mg.h:15-17).
AGGLOMERATION_START = 8

# Graduated agglomeration: axes drop out of a level's sharding one at a
# time as the per-chip extent falls below AGGLOMERATION_START, so a
# mid-ladder level can stay sharded over the surviving axes (e.g. a 16^3
# level on a 4x2x1 mesh keeps 2-way y-sharding) — the analog of the
# reference's graduated 8:1-then-1-rank agglomeration ladder
# (mg.c:894-952) instead of a binary sharded/replicated jump. False
# restores the binary rule (an A/B knob; the FLOP-overhead delta is
# tracked by tests/test_weak_scaling.py).
GRADUATED = True

MESH_AXES = ("x", "y", "z")


def _factor3(n: int) -> Tuple[int, int, int]:
    """Split n devices into the squarest (x, y, z) factorization, mirroring
    ProcessGridFindSquarest (sampler.c:19-41)."""
    best_key, best = None, (n, 1, 1)
    for fx in range(1, n + 1):
        if n % fx:
            continue
        rem = n // fx
        for fy in range(1, rem + 1):
            if rem % fy:
                continue
            fz = rem // fy
            key = (max(fx, fy, fz) - min(fx, fy, fz), max(fx, fy, fz))
            if best_key is None or key < best_key:
                best_key, best = key, (fx, fy, fz)
    return tuple(sorted(best, reverse=True))


def make_mesh(devices: Optional[List] = None) -> Mesh:
    """Build a 3D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    shape = _factor3(len(devices))
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, MESH_AXES)


def make_mesh_ij(devices: Optional[List] = None) -> Mesh:
    """Mesh for the distributed Pallas kernel path: devices factored over
    the i/j ('x'/'y') axes only, z kept at 1 — the k axis is the TPU lane
    dimension and stays whole per chip (parallel/shard_kernels.py)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    best = (n, 1)
    for fx in range(1, n + 1):
        if n % fx:
            continue
        fy = n // fx
        if max(fx, fy) - min(fx, fy) <= max(best) - min(best):
            best = (fx, fy)
    shape = tuple(sorted(best, reverse=True)) + (1,)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, MESH_AXES)


def make_pod_mesh(devices: Optional[List] = None,
                  n_slices: Optional[int] = None) -> Mesh:
    """Pod-scale mesh: the slice-to-slice (DCN) dimension becomes the
    OUTERMOST factor of the 'z' axis, so z-sharded halo exchanges cross
    DCN only at one plane per slice boundary while x/y halos and all
    intra-slice traffic ride ICI — the reference's analog is Z-Morton
    locality keeping surface:volume low across nodes (level.c:240-275).

    Uses ``mesh_utils.create_hybrid_device_mesh`` when the devices span
    multiple slices; single-slice (or CPU) falls back to ``make_mesh``
    unless ``n_slices`` explicitly emulates the slice structure
    (consecutive device blocks = one slice) — the dryrun's hybrid-mesh
    compile check on virtual devices, where slice_index doesn't exist.
    """
    if devices is None:
        devices = jax.devices()
    detected = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices is None:
        n_slices = detected
    if n_slices <= 1:
        return make_mesh(devices)
    per = len(devices) // n_slices
    per_slice = _factor3(per)
    if detected == n_slices and detected > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=per_slice, dcn_mesh_shape=(1, 1, n_slices),
            devices=devices)
    else:
        # emulated slices: same hybrid layout (DCN factor outermost on
        # z), built by hand from consecutive per-slice device blocks
        arr = np.concatenate(
            [np.array(devices[s * per:(s + 1) * per]).reshape(per_slice)
             for s in range(n_slices)], axis=2)
    return Mesh(arr, MESH_AXES)


def level_sharding(mesh: Mesh, dim: int,
                   face_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for a level of extent ``dim``: an axis stays sharded while
    each chip keeps >= AGGLOMERATION_START cells along it; axes that fall
    below drop out individually (GRADUATED, the graduated agglomeration
    ladder of mg.c:894-952) until the level is fully replicated.

    ``face_axis``: face arrays have dim+1 entries along one axis, which is
    not evenly divisible — that axis stays unsharded (its footprint is
    small and XLA would pad otherwise).
    """
    spec = []
    dropped = False
    for ax, name in enumerate(MESH_AXES):
        size = mesh.shape[name]
        if ax == face_axis or size == 1:
            spec.append(None)
            continue
        if dim % size == 0 and dim // size >= AGGLOMERATION_START:
            spec.append(name)
        else:
            spec.append(None)
            dropped = True
    if all(s is None for s in spec) or (dropped and not GRADUATED):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def shard_array(mesh: Mesh, x, face_axis: Optional[int] = None):
    dim = min(x.shape)
    return jax.device_put(x, level_sharding(mesh, dim, face_axis))


def array_sharding(mesh: Mesh, shape, dim: int) -> NamedSharding:
    """Sharding for a coefficient array whose extents may exceed ``dim``
    (ghost-extended betas: n+1 / n+2 per axis): shard an axis only where
    the LEVEL is sharded (dim divisible, >= AGGLOMERATION_START per chip)
    AND the actual extent divides evenly; ghost-extended axes that don't
    divide stay replicated (small waste, correct always)."""
    spec = []
    level_dropped = False
    for ax, name in enumerate(MESH_AXES):
        size = mesh.shape[name]
        level_ok = dim % size == 0 and dim // size >= AGGLOMERATION_START
        if size > 1 and not level_ok:
            level_dropped = True
        if size > 1 and level_ok and shape[ax] % size == 0:
            spec.append(name)
        else:
            spec.append(None)
    if all(s is None for s in spec) or (level_dropped and not GRADUATED):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def shard_hierarchy(mesh: Mesh, hier, cfg=None):
    """Place every level of a hierarchy: fine levels sharded, coarse levels
    replicated (decided per level by ``level_sharding``).

    With ``cfg`` given, levels that can run the distributed Pallas fast
    path (mesh sharded over i/j only, local dims workable —
    ``sharded_kernel_eligible``) get PER-SHARD kernel coefficient views
    cut from the global betas (parallel/shard_kernels.py), so the fast
    kernels and the mesh compose; other sharded levels drop the
    single-chip views (the kernels can't read a sharded global view) and
    run the XLA path. Replicated (coarse) levels keep their single-chip
    views — every chip redundantly runs the whole kernel there.
    """
    import dataclasses

    from hpgmg_tpu.core.hierarchy import Hierarchy
    from hpgmg_tpu.parallel.shard_kernels import (build_sharded_k2_r1,
                                                  build_sharded_views,
                                                  build_sharded_views_r1,
                                                  sharded_gsrb2_eligible,
                                                  sharded_kernel_eligible,
                                                  sharded_r1_eligible)

    new_levels = []
    for lv in hier.levels:
        spec = level_sharding(mesh, lv.dim)
        replicated = spec.spec == P()
        # the BF16C smoother views are single-chip masked-mode only
        kw = {"kb16": None} if getattr(lv, "kb16", None) is not None else {}
        kviews = None
        if (cfg is not None and lv.kbi is not None and not replicated
                and lv.kernel_suite is None
                and sharded_kernel_eligible(mesh, lv.dim, cfg)):
            # fv4-layout views: the distributed radius-2 fast path
            kbi, kbj, kbk, kbk_top, kdinv = build_sharded_views(mesh, lv)
            kviews = dict(kbi=kbi, kbj=kbj, kbk=kbk, kbk_top=kbk_top,
                          kdinv=kdinv, ksharded=True,
                          # global-layout kb16 unusable per-shard
                          kgd=None, kb16=None)
            if getattr(lv, "kgd", None) is not None:
                # distributed PREDIFF: per-shard cuts of the global
                # mixed-flux operands, so the sharded kernel matches
                # the single-chip best-known config at sizes where
                # prediff wins (<= PREDIFF_MAX_DIM)
                from hpgmg_tpu.parallel.shard_kernels import \
                    build_sharded_kgd

                kviews["kgd"] = build_sharded_kgd(mesh, lv)
        elif (cfg is not None and lv.kernel_suite is not None
                and not replicated and lv.dinv is not None
                and sharded_r1_eligible(mesh, lv.dim, cfg,
                                        lv.kernel_suite == "var7")):
            # radius-1 view layouts (fv7pt/fv2/27pt): per-shard cuts of
            # the unextended face coefficients
            kbi, kbj, kbk, kbk_top, kdinv = build_sharded_views_r1(mesh, lv)
            kviews = dict(kbi=kbi, kbj=kbj, kbk=kbk, kbk_top=kbk_top,
                          kdinv=kdinv, ksharded=True,
                          k2=None)  # global-layout k2 unusable per-shard
            if sharded_gsrb2_eligible(mesh, lv.dim, cfg,
                                      lv.kernel_suite == "var7"):
                # per-shard double-sweep ring views (slab2 fast path)
                kviews["k2"] = build_sharded_k2_r1(mesh, lv, cfg)
        for name in ("beta_i", "beta_j", "beta_k", "alpha", "dinv",
                     "l1inv"):
            arr = getattr(lv, name)
            if arr is not None:
                kw[name] = jax.device_put(
                    arr, array_sharding(mesh, arr.shape, lv.dim))
        for name in ("lambda_max", "bottom_ainv"):
            arr = getattr(lv, name)
            if arr is not None:
                kw[name] = jax.device_put(arr, NamedSharding(mesh, P()))
        if kviews is not None:
            kw.update(kviews)
        elif replicated and (lv.kbi is not None or lv.kdinv is not None):
            # coarse replicated level: keep the single-chip views, placed
            # replicated so each chip runs the kernel redundantly (the
            # agglomeration analog). Covers both the fv4 and radius-1
            # view layouts (the dense 27pt carries only kdinv).
            rep = NamedSharding(mesh, P())
            for name in ("kbi", "kbj", "kbk", "kbk_top"):
                arr = getattr(lv, name)
                if arr is not None:
                    kw[name] = jax.device_put(arr, rep)
            if lv.kdinv is not None:
                kw["kdinv"] = tuple(jax.device_put(d, rep)
                                    for d in lv.kdinv)
            if getattr(lv, "kgd", None) is not None:
                kw["kgd"] = tuple(jax.device_put(d, rep) for d in lv.kgd)
            if getattr(lv, "k2", None) is not None:
                kw["k2"] = tuple(None if d is None
                                 else jax.device_put(d, rep)
                                 for d in lv.k2)
        else:
            # sharded level the kernels cannot serve: the single-chip views
            # would ride along as dead weight — drop them (XLA path)
            kw.update(kbi=None, kbj=None, kbk=None, kbk_top=None,
                      kdinv=None, kernel_suite=None, kgd=None, k2=None)
        new_levels.append(dataclasses.replace(lv, **kw))
    return Hierarchy(levels=new_levels)


def constrain_level(mesh: Mesh, dim: int, x):
    """with_sharding_constraint helper for use inside traced solvers."""
    return jax.lax.with_sharding_constraint(x, level_sharding(mesh, dim))


# ---------------------------------------------------------------------------
# Active-mesh context: lets the cycle drivers place level temporaries without
# threading a mesh argument through every call. Set before tracing; the
# placement is baked into the compiled program (the MGBuild analog of
# deciding each level's rank set once, mg.c:894-997).
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]):
    """Set (or clear, with None) the mesh used for level placement."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


class active_mesh:
    """Context manager: ``with active_mesh(mesh): u = jit(solve)(f)``."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def maybe_constrain(dim: int, x):
    """Constrain a level-sized temporary to the active placement, if any."""
    if _ACTIVE_MESH is None:
        return x
    return constrain_level(_ACTIVE_MESH, dim, x)
