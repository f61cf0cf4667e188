"""Distributed fast path: Pallas fv4 kernels composed with an explicit
radius-2 halo exchange under ``shard_map``.

This is the TPU-native analog of the reference's core composition — the
precompiled ghost exchange replayed before every stencil sweep
(exchange_boundary.c:12-117) under the GSRB smoother (gsrb.c:24-41) with
2-deep shape-aware ghosts for the radius-2 fv4 operator (level.c:498-531,
operators.fv4.c:137-139). Design:

* The device mesh shards the i ('x') and j ('y') array axes; the k axis
  (TPU lanes) stays whole on every chip — lanes are the vector dimension
  and splitting them would fragment the (8, 128) native tile. ``z``-size-1
  meshes only (``make_mesh_ij``); 3D-sharded meshes fall back to the XLA
  path.
* One ``shard_map`` region per kernel launch: ppermute radius-2 halo
  slabs along x then y (so edge ghosts arrive transitively — the
  NO_CORNERS shape), overwrite physical-boundary slabs with the quartic
  volume-averaged Dirichlet fill (the separable apply_BCs_v4 order:
  i from interior, then j reading the i-ghosts), then run the Pallas
  kernel in pre-extended (``ext``) mode on the local block.
* Per-shard coefficient views (``kbi/kbj/kbk/kbk_top``) are cut once at
  ``shard_hierarchy`` time from the globally ghost-extended beta arrays —
  interior-shard tangential ghosts are true neighbor faces, physical ones
  the quintic extrapolation, both already present in the extended global —
  and stored stacked: global shape (sx*(nli+1), sy*(nlj+8), n) sharded
  P('x','y'), so the sweep's shard_map hands each shard exactly its local
  view with zero communication.
* GSRB parity masks stay GLOBAL (rb_mask on global indices): local dims
  are even, so every shard's local mask equals the global one restricted
  to its block; ``kdinv`` is simply sharded like any cell field.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level

_SPEC = P("x", "y", None)

# Comm/compute overlap for the fv4 slab fast path: split each sweep into
# an interior pass (no halo dependency -> schedulable while the slab
# ppermutes are in flight) and an edge-tile pass
# (kernels/stencils.py:fv4_call_overlap; exchange_boundary.c:48-56 +
# operators.test/exchange_boundary_overlap.c analog). A/B via
# kernel_sweep --overlap.
OVERLAP = False


# ---------------------------------------------------------------------------
# eligibility
# ---------------------------------------------------------------------------

def sharded_kernel_eligible(mesh: Mesh, dim: int, cfg: SolverConfig) -> bool:
    """Static check: can level ``dim`` run the Pallas kernels under this
    mesh? Mirrors ``use_pallas`` plus the distribution constraints."""
    from hpgmg_tpu.kernels.stencils import (_AUTO_MIN_DIM, _MIN_DIM,
                                            tile_shape_local)

    if getattr(cfg, "kernels", "auto") == "xla":
        return False
    if cfg.bc not in (BC.DIRICHLET, BC.PERIODIC):
        return False
    if mesh.shape["z"] != 1:
        return False
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    if sx * sy == 1:
        return False  # single device: the single-chip path serves
    if dim % sx or dim % sy:
        return False
    nli, nlj = dim // sx, dim // sy
    if nli < 8 or nlj < 8 or nli % 2 or nlj % 2:
        return False
    floor = _MIN_DIM if cfg.kernels == "pallas" else _AUTO_MIN_DIM
    if dim < floor:
        return False
    return tile_shape_local(nli, nlj, dim) is not None


def use_pallas_sharded(cfg: SolverConfig, level: Level) -> bool:
    """Trace-time gate for the distributed fv4 kernel path: the level
    carries per-shard views (built by shard_hierarchy) and a mesh is
    active."""
    from hpgmg_tpu.kernels import stencils
    from hpgmg_tpu.parallel.mesh import get_active_mesh

    if not getattr(level, "ksharded", False) or level.kbi is None:
        return False
    if getattr(level, "kernel_suite", None) is not None:
        return False  # radius-1 view layouts (use_pallas_r1_sharded)
    if cfg.helmholtz and level.alpha is None:
        return False
    if get_active_mesh() is None:
        return False
    if stencils.INTERPRET:
        return True  # the interpreter handles 64-bit (CPU parity tests)
    if jnp.dtype(level.dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types (f64 verification runs)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def sharded_r1_eligible(mesh: Mesh, dim: int, cfg: SolverConfig,
                        var7: bool) -> bool:
    """Static check: can a radius-1 level of extent ``dim`` run the
    Pallas kernels under this mesh? Mirrors ``use_pallas_r1`` plus the
    distribution constraints (z unsharded, even local dims for the
    global-parity GSRB masks, tileable local block)."""
    from hpgmg_tpu.kernels.stencils import _AUTO_MIN_DIM, _MIN_DIM
    from hpgmg_tpu.kernels.stencils_r1 import tile_shape_r1_local

    if getattr(cfg, "kernels", "auto") == "xla":
        return False
    if cfg.bc not in (BC.DIRICHLET, BC.PERIODIC):
        return False
    if mesh.shape["z"] != 1:
        return False
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    if sx * sy == 1:
        return False  # single device: the single-chip path serves
    if dim % sx or dim % sy:
        return False
    nli, nlj = dim // sx, dim // sy
    if nli < 8 or nlj < 8 or nli % 2 or nlj % 2:
        return False
    floor = _MIN_DIM if cfg.kernels == "pallas" else _AUTO_MIN_DIM
    if dim < floor:
        return False
    return tile_shape_r1_local(nli, nlj, dim, var7) is not None


def get_mesh_for_level(cfg: SolverConfig, level: Level):
    """The active mesh when the distributed radius-1 path serves this
    level, else None (ops/base.py RadiusOneKernelMixin dispatch)."""
    from hpgmg_tpu.parallel.mesh import get_active_mesh

    if not use_pallas_r1_sharded(cfg, level):
        return None
    return get_active_mesh()


def use_pallas_r1_sharded(cfg: SolverConfig, level: Level) -> bool:
    """Trace-time gate for the distributed radius-1 kernel path."""
    from hpgmg_tpu.kernels import stencils
    from hpgmg_tpu.parallel.mesh import get_active_mesh

    if not getattr(level, "ksharded", False):
        return False
    if getattr(level, "kernel_suite", None) not in ("var7", "27pt"):
        return False
    if (cfg.helmholtz and level.kernel_suite == "var7"
            and level.alpha is None):
        return False
    if get_active_mesh() is None:
        return False
    if stencils.INTERPRET:
        return True  # the interpreter handles 64-bit (CPU parity tests)
    if jnp.dtype(level.dtype).itemsize > 4:
        return False  # Mosaic has no 64-bit types (f64 verification runs)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# halo exchange + BC fill (the exchange_boundary + apply_BCs_v4 pair)
# ---------------------------------------------------------------------------

def _bc_slab(xl, axis: int, lo: bool):
    """2-deep quartic Dirichlet ghost slab ordered [far, near] on the low
    side / [near, far] on the high side (apply_BCs_v4, boundary_fv.c:334)."""
    from hpgmg_tpu.kernels.stencils import _v4_ghost_pair

    g1, g2 = _v4_ghost_pair(xl, axis, lo=lo)
    return jnp.concatenate([g2, g1] if lo else [g1, g2], axis=axis)


def _extend_axis_sharded_r1(xl, name: str, axis: int, mesh: Mesh,
                            periodic: bool, taps):
    """Radius-1 analog of ``_extend_axis_sharded``: 1-deep neighbor halos
    via ppermute; physical boundaries via the suite's 2-tap Dirichlet
    ghost ``g = t1*x1 + t2*x2`` (stencils_r1._TAPS) — or the ring wrap
    for periodic. Applied i-then-j so the tensor-product edge ghosts the
    27pt stencil reads arrive transitively."""
    t1, t2 = taps
    nl = xl.shape[axis]

    def bc(lo):
        i1, i2 = (0, 1) if lo else (nl - 1, nl - 2)
        g = t1 * lax.slice_in_dim(xl, i1, i1 + 1, axis=axis)
        if t2:
            g = g + t2 * lax.slice_in_dim(xl, i2, i2 + 1, axis=axis)
        return g

    n_sh = mesh.shape[name]
    if n_sh == 1:
        if periodic:
            glo = lax.slice_in_dim(xl, nl - 1, nl, axis=axis)
            ghi = lax.slice_in_dim(xl, 0, 1, axis=axis)
        else:
            glo, ghi = bc(True), bc(False)
    else:
        lo_face = lax.slice_in_dim(xl, 0, 1, axis=axis)
        hi_face = lax.slice_in_dim(xl, nl - 1, nl, axis=axis)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(hi_face, name, fwd)  # from my -1 neighbor
        ghi = lax.ppermute(lo_face, name, bwd)  # from my +1 neighbor
        if not periodic:
            idx = lax.axis_index(name)
            glo = jnp.where(idx == 0, bc(True), glo)
            ghi = jnp.where(idx == n_sh - 1, bc(False), ghi)
    return jnp.concatenate([glo, xl, ghi], axis=axis)


def extend_for_kernel_r1(xl, mesh: Mesh, periodic: bool, taps):
    """(nli, nlj, nk) local block -> (nli+2, nlj+16, nk) pre-extended
    array in the radius-1 kernel's j-padded layout (live extended j rows
    at [7, nlj+9))."""
    xe = _extend_axis_sharded_r1(xl, "x", 0, mesh, periodic, taps)
    xe = _extend_axis_sharded_r1(xe, "y", 1, mesh, periodic, taps)
    return jnp.pad(xe, ((0, 0), (7, 7), (0, 0)))


def slabs_for_kernel_r1(xl, mesh: Mesh, periodic: bool, taps):
    """Radius-1 analog of ``slabs_for_kernel``: thin 1-deep edge slabs
    for the slab-operand kernel (stencils_r1.r1_call_slab) — the
    exchange moves ONLY the 4 halo slabs. i slabs via ppermute/2-tap BC
    fill; j slabs are the i-EXTENDED j-face strips (corner ghosts arrive
    transitively — the NO_CORNERS schedule). Returns ilo (1, nlj, nk),
    ihi, jlo (nli+2, 8, nk), jhi."""
    t1, t2 = taps
    nli, nlj = xl.shape[0], xl.shape[1]

    def bc_row(src, axis, lo):
        m = src.shape[axis]
        i1, i2 = (0, 1) if lo else (m - 1, m - 2)
        g = t1 * lax.slice_in_dim(src, i1, i1 + 1, axis=axis)
        if t2:
            g = g + t2 * lax.slice_in_dim(src, i2, i2 + 1, axis=axis)
        return g

    def halo(face_lo, face_hi, name, bc_lo, bc_hi, wrap_lo, wrap_hi):
        n_sh = mesh.shape[name]
        if n_sh == 1:
            return ((wrap_lo(), wrap_hi()) if periodic
                    else (bc_lo(), bc_hi()))
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(face_hi, name, fwd)  # from my -1 neighbor
        ghi = lax.ppermute(face_lo, name, bwd)  # from my +1 neighbor
        if not periodic:
            idx = lax.axis_index(name)
            glo = jnp.where(idx == 0, bc_lo(), glo)
            ghi = jnp.where(idx == n_sh - 1, bc_hi(), ghi)
        return glo, ghi

    ilo, ihi = halo(
        xl[:1], xl[nli - 1:], "x",
        lambda: bc_row(xl, 0, True), lambda: bc_row(xl, 0, False),
        lambda: xl[nli - 1:], lambda: xl[:1])

    def strip(j0, j1):  # i-extended thin j strip (nli+2, j1-j0, nk)
        return jnp.concatenate(
            [ilo[:, j0:j1], xl[:, j0:j1], ihi[:, j0:j1]], axis=0)

    jlo, jhi = halo(
        strip(0, 1), strip(nlj - 1, nlj), "y",
        lambda: bc_row(strip(0, 2), 1, True),
        lambda: bc_row(strip(nlj - 2, nlj), 1, False),
        lambda: strip(nlj - 1, nlj), lambda: strip(0, 1))
    pad8 = lambda a: jnp.pad(a, ((0, 0), (0, 7), (0, 0)))  # noqa: E731
    return ilo, ihi, pad8(jlo), pad8(jhi)


def slabs2_for_kernel_r1(xl, mesh: Mesh, taps):
    """2-deep edge slabs for the distributed double-sweep kernel
    (stencils_r1.r1_gsrb2_call_slab): ONE exchange serves a full
    red+black sweep (the deep-halo/temporal-blocking schedule — the
    reference exchanges before every half-sweep, gsrb.c:24-41).
    Dirichlet only; i slabs ordered [far, near]/[near, far]; j slabs are
    i-extended-by-2 strips (corner ghosts transitive). At domain edges
    the far row duplicates the 2-tap ghost — it is only read by red
    applications at ghost positions, whose results are discarded."""
    t1, t2 = taps
    nli, nlj = xl.shape[0], xl.shape[1]

    def bc_pair(src, axis, lo):
        m = src.shape[axis]
        i1, i2 = (0, 1) if lo else (m - 1, m - 2)
        g = t1 * lax.slice_in_dim(src, i1, i1 + 1, axis=axis)
        if t2:
            g = g + t2 * lax.slice_in_dim(src, i2, i2 + 1, axis=axis)
        return jnp.concatenate([g, g], axis=axis)

    def halo(face_lo, face_hi, name, bc_lo, bc_hi):
        n_sh = mesh.shape[name]
        if n_sh == 1:
            return bc_lo(), bc_hi()
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(face_hi, name, fwd)  # from my -1 neighbor
        ghi = lax.ppermute(face_lo, name, bwd)  # from my +1 neighbor
        idx = lax.axis_index(name)
        glo = jnp.where(idx == 0, bc_lo(), glo)
        ghi = jnp.where(idx == n_sh - 1, bc_hi(), ghi)
        return glo, ghi

    ilo, ihi = halo(xl[:2], xl[nli - 2:], "x",
                    lambda: bc_pair(xl, 0, True),
                    lambda: bc_pair(xl, 0, False))

    def strip(j0, j1):  # i-extended-by-2 thin j strip (nli+4, w, nk)
        return jnp.concatenate(
            [ilo[:, j0:j1], xl[:, j0:j1], ihi[:, j0:j1]], axis=0)

    jlo, jhi = halo(strip(0, 2), strip(nlj - 2, nlj), "y",
                    lambda: bc_pair(strip(0, 2), 1, True),
                    lambda: bc_pair(strip(nlj - 2, nlj), 1, False))
    pad8 = lambda a: jnp.pad(a, ((0, 0), (0, 6), (0, 0)))  # noqa: E731
    return ilo, ihi, pad8(jlo), pad8(jhi)


def _extend_axis_sharded(xl, name: str, axis: int, mesh: Mesh,
                         periodic: bool = False):
    """Extend one sharded axis by 2 ghosts: neighbor halos via ppermute,
    physical boundaries via the v4 fill — or, for periodic, the ring
    permute's wrap-around IS the boundary condition (the opposite domain
    face arrives from the ring neighbor). Applied i-then-j so edge ghosts
    arrive transitively (the NO_CORNERS schedule, level.c:499-531)."""
    n_sh = mesh.shape[name]
    nl = xl.shape[axis]
    if n_sh == 1:
        if periodic:
            glo = lax.slice_in_dim(xl, nl - 2, nl, axis=axis)
            ghi = lax.slice_in_dim(xl, 0, 2, axis=axis)
        else:
            glo = _bc_slab(xl, axis, lo=True)
            ghi = _bc_slab(xl, axis, lo=False)
    else:
        lo_face = lax.slice_in_dim(xl, 0, 2, axis=axis)
        hi_face = lax.slice_in_dim(xl, nl - 2, nl, axis=axis)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(hi_face, name, fwd)  # from my -1 neighbor
        ghi = lax.ppermute(lo_face, name, bwd)  # from my +1 neighbor
        if not periodic:
            idx = lax.axis_index(name)
            glo = jnp.where(idx == 0, _bc_slab(xl, axis, lo=True), glo)
            ghi = jnp.where(idx == n_sh - 1, _bc_slab(xl, axis, lo=False),
                            ghi)
    return jnp.concatenate([glo, xl, ghi], axis=axis)


def extend_for_kernel(xl, mesh: Mesh, periodic: bool = False):
    """(nli, nlj, nk) local block -> (nli+4, nlj+16, nk) pre-extended array
    in the kernel's j-padded layout (live extended j rows at [6, nlj+10))."""
    xe = _extend_axis_sharded(xl, "x", 0, mesh, periodic)
    xe = _extend_axis_sharded(xe, "y", 1, mesh, periodic)
    return jnp.pad(xe, ((0, 0), (6, 6), (0, 0)))


def slabs_for_kernel(xl, mesh: Mesh, periodic: bool = False):
    """Thin 2-deep edge slabs for the slab-operand kernel
    (stencils.fv4_call_slab): no (nli+4, nlj+16) array is materialized —
    the exchange moves ONLY the 4 halo slabs (the reference exchanges
    exactly the ghost regions, exchange_boundary.c:12-117). i slabs via
    ppermute/BC fill; j slabs are the i-EXTENDED j-face strips (built
    from the i slabs + thin local strips, so corner ghosts arrive
    transitively — the NO_CORNERS schedule) exchanged the same way.
    Returns ilo (2, nlj, nk), ihi, jlo (nli+4, 8, nk), jhi in the slab
    kernel's [far, near]/[near, far] row order."""
    from hpgmg_tpu.kernels.stencils import _v4_ghost_pair

    nli, nlj = xl.shape[0], xl.shape[1]

    def halo(face_lo, face_hi, name, axis, bc_lo, bc_hi, wrap_lo, wrap_hi):
        n_sh = mesh.shape[name]
        if n_sh == 1:
            return ((wrap_lo(), wrap_hi()) if periodic
                    else (bc_lo(), bc_hi()))
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(face_hi, name, fwd)  # from my -1 neighbor
        ghi = lax.ppermute(face_lo, name, bwd)  # from my +1 neighbor
        if not periodic:
            idx = lax.axis_index(name)
            glo = jnp.where(idx == 0, bc_lo(), glo)
            ghi = jnp.where(idx == n_sh - 1, bc_hi(), ghi)
        return glo, ghi

    def bc_pair(src, axis, lo):
        g1, g2 = _v4_ghost_pair(src, axis, lo=lo)
        return jnp.concatenate([g2, g1] if lo else [g1, g2], axis=axis)

    ilo, ihi = halo(
        xl[:2], xl[nli - 2:], "x", 0,
        lambda: bc_pair(xl, 0, True), lambda: bc_pair(xl, 0, False),
        lambda: xl[nli - 2:], lambda: xl[:2])

    def strip(j0, j1):  # i-extended thin j strip (nli+4, j1-j0, nk)
        return jnp.concatenate(
            [ilo[:, j0:j1], xl[:, j0:j1], ihi[:, j0:j1]], axis=0)

    jlo, jhi = halo(
        strip(0, 2), strip(nlj - 2, nlj), "y", 1,
        lambda: bc_pair(strip(0, 4), 1, True),
        lambda: bc_pair(strip(nlj - 4, nlj), 1, False),
        lambda: strip(nlj - 2, nlj), lambda: strip(0, 2))
    pad8 = lambda a: jnp.pad(a, ((0, 0), (0, 6), (0, 0)))  # noqa: E731
    return ilo, ihi, pad8(jlo), pad8(jhi)


# ---------------------------------------------------------------------------
# the sharded kernel launch
# ---------------------------------------------------------------------------

def fv4_sharded(mesh: Mesh, level: Level, x, rhs, cfg: SolverConfig,
                mode: str, parity: int = 0):
    """One distributed fv4 kernel application (apply / residual / one GSRB
    half-sweep): exchange-then-stencil in a single shard_map region.

    Two per-shard stencil mechanisms, chosen statically by block shape:

    * slab (preferred): exchange ONLY the 4 thin halo slabs and run the
      masked-window kernel on the unextended block
      (stencils.fv4_call_slab) — no (nli+4, nlj+16) array
      materialization; per-DOF cost equals the single-chip masked
      kernel (ext measured 1.48x slower at 512 lanes).
    * ext (fallback for blocks too small for the slab window
      constraints): materialize the pre-extended array and run the ext
      kernel.
    """
    from hpgmg_tpu.kernels.stencils import tile_shape_slab

    b_h2inv = cfg.b * level.h2inv
    periodic = cfg.bc == BC.PERIODIC
    a_alpha = cfg.a if cfg.helmholtz else 0.0
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    nli, nlj = level.dim // sx, level.dim // sy
    kgd = getattr(level, "kgd", None)
    npd = len(kgd) if kgd is not None else 0
    use_slab = tile_shape_slab(nli, nlj, level.dim,
                               kgd is not None) is not None
    args = [x, level.kbi, level.kbj, level.kbk, level.kbk_top]
    if kgd is not None:
        args += list(kgd)  # distributed PREDIFF operands (per-shard cuts)
    if a_alpha:
        args.append(level.alpha)
    if mode != "apply":
        args.append(rhs)
    if mode == "gsrb":
        args.append(level.kdinv[parity & 1])
    in_specs = tuple(_SPEC for _ in args)

    def body(xl, kbi, kbj, kbk, kbktop, *rest):
        from hpgmg_tpu.kernels.stencils import (
            fv4_call_ext, fv4_call_overlap, fv4_call_slab,
            overlap_grid_shape)

        k = 0
        kgdl = None
        if npd:
            kgdl = rest[:npd]
            k = npd
        alphal = None
        if a_alpha:
            alphal = rest[k]
            k += 1
        rhsl = rest[k] if mode != "apply" else None
        dl = rest[k + 1] if mode == "gsrb" else None
        if use_slab:
            ilo, ihi, jlo, jhi = slabs_for_kernel(xl, mesh, periodic)
            call = fv4_call_slab
            if (OVERLAP and mode in ("apply", "residual", "gsrb")
                    and overlap_grid_shape(nli, nlj, level.dim,
                                           kgd is not None) is not None):
                call = fv4_call_overlap
            return call(xl, ilo, ihi, jlo, jhi, kbi, kbj, kbk,
                        kbktop, rhsl, dl, mode, b_h2inv,
                        kperiodic=periodic, a_alpha=a_alpha,
                        alpha=alphal, kgd=kgdl)
        xe = extend_for_kernel(xl, mesh, periodic)
        return fv4_call_ext(xe, kbi, kbj, kbk, kbktop, rhsl, dl, mode,
                            b_h2inv, kperiodic=periodic, a_alpha=a_alpha,
                            alpha=alphal, kgd=kgdl)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the checker (jax >= 0.7) would reject
    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=_SPEC, check_vma=False)(*args)


def r1_sharded(mesh: Mesh, level: Level, x, rhs, cfg: SolverConfig,
               mode: str, taps_key: str, parity: int = 0):
    """One distributed radius-1 kernel application (apply / residual /
    one GSRB half-sweep): radius-1 exchange-then-stencil in a single
    shard_map region (exchange_boundary.c:12-117 + the STAR-shape
    radius-1 suites, operators.7pt.c:52-76). Per-shard mechanism chosen
    statically by block shape, like ``fv4_sharded``: slab (thin 1-deep
    halo slabs + masked-window kernel, preferred) or ext (materialized
    pre-extended array, small-block fallback)."""
    from hpgmg_tpu.kernels.stencils_r1 import (_TAPS, r1_call_ext,
                                               tile_shape_slab_r1)

    b_h2inv = cfg.b * level.h2inv
    periodic = cfg.bc == BC.PERIODIC
    suite = level.kernel_suite
    var7 = suite == "var7"
    const_a = 0.0 if var7 else cfg.a
    a_alpha = (cfg.a if cfg.helmholtz else 0.0) if var7 else 0.0
    taps = _TAPS[taps_key]
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    nli, nlj = level.dim // sx, level.dim // sy
    use_slab = tile_shape_slab_r1(nli, nlj, level.dim, var7) is not None
    args = [x]
    if var7:
        args += [level.kbi, level.kbj, level.kbk, level.kbk_top]
    if a_alpha:
        args.append(level.alpha)
    if mode != "apply":
        args.append(rhs)
    if mode == "gsrb":
        args.append(level.kdinv[parity & 1])
    in_specs = tuple(_SPEC for _ in args)

    def body(xl, *rest):
        k = 0
        kbi = kbj = kbk = kbktop = None
        if var7:
            kbi, kbj, kbk, kbktop = rest[:4]
            k = 4
        alphal = None
        if a_alpha:
            alphal = rest[k]
            k += 1
        rhsl = rest[k] if mode != "apply" else None
        dl = rest[k + 1] if mode == "gsrb" else None
        if use_slab:
            from hpgmg_tpu.kernels.stencils_r1 import r1_call_slab

            ilo, ihi, jlo, jhi = slabs_for_kernel_r1(xl, mesh, periodic,
                                                     taps)
            return r1_call_slab(xl, ilo, ihi, jlo, jhi, kbi, kbj, kbk,
                                kbktop, rhsl, dl, mode, b_h2inv, suite,
                                taps_key, kperiodic=periodic,
                                const_a=const_a, a_alpha=a_alpha,
                                alpha=alphal)
        xe = extend_for_kernel_r1(xl, mesh, periodic, taps)
        return r1_call_ext(xe, kbi, kbj, kbk, kbktop, rhsl, dl, mode,
                           b_h2inv, suite, taps_key, kperiodic=periodic,
                           const_a=const_a, a_alpha=a_alpha, alpha=alphal)

    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=_SPEC, check_vma=False)(*args)


def sharded_gsrb2_eligible(mesh: Mesh, dim: int, cfg: SolverConfig,
                           var7: bool) -> bool:
    """Static check for the distributed double-sweep path (slab2):
    Dirichlet, r1-sharded-eligible, and local blocks large enough for
    the radius-2 masked windows."""
    from hpgmg_tpu.kernels.stencils_r1 import (GSRB2, GSRB2_MAX_DIM,
                                               GSRB2_VAR7_ONLY,
                                               tile_shape_slab2_r1)

    if not GSRB2 or cfg.bc != BC.DIRICHLET or dim > GSRB2_MAX_DIM:
        return False
    if GSRB2_VAR7_ONLY and not var7:
        return False
    if not sharded_r1_eligible(mesh, dim, cfg, var7):
        return False
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    return tile_shape_slab2_r1(dim // sx, dim // sy, dim, var7) is not None


def r1_gsrb2_rhs_sharded(mesh: Mesh, rhs):
    """Ring-exchanged padded rhs for the distributed double-sweep:
    P('x','y')-sharded (n, n, n) -> stacked (sx*(nli+2), sy*(nlj+16), nk)
    with each shard's 1-deep neighbor ring baked in. Corner ring values
    are never consumed by the kernel — zeros; domain edges zero (the
    parity-prefolded ring kdinv0 is zero there too). Built ONCE per
    smooth() call and amortized over its sweeps."""
    def halo1(arr, name, axis):
        n_sh = mesh.shape[name]
        nl = arr.shape[axis]
        lo = lax.slice_in_dim(arr, 0, 1, axis=axis)
        hi = lax.slice_in_dim(arr, nl - 1, nl, axis=axis)
        if n_sh == 1:
            return jnp.zeros_like(lo), jnp.zeros_like(hi)
        fwd = [(i, (i + 1) % n_sh) for i in range(n_sh)]
        bwd = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        glo = lax.ppermute(hi, name, fwd)
        ghi = lax.ppermute(lo, name, bwd)
        idx = lax.axis_index(name)
        glo = jnp.where(idx == 0, jnp.zeros_like(glo), glo)
        ghi = jnp.where(idx == n_sh - 1, jnp.zeros_like(ghi), ghi)
        return glo, ghi

    def body(rl):
        ilo, ihi = halo1(rl, "x", 0)
        re = jnp.concatenate([ilo, rl, ihi], 0)
        jlo, jhi = halo1(re, "y", 1)
        re = jnp.concatenate([jlo, re, jhi], 1)
        return jnp.pad(re, ((0, 0), (7, 7), (0, 0)))

    return shard_map(body, mesh=mesh, in_specs=_SPEC,
                     out_specs=_SPEC, check_vma=False)(rhs)


def r1_gsrb2_sharded(mesh: Mesh, level: Level, x, rhs2,
                     cfg: SolverConfig, taps_key: str):
    """One distributed fused red+black GSRB sweep: a single 2-deep slab
    exchange + ONE kernel launch per FULL sweep — half the messages and
    launches of the half-sweep schedule. ``rhs2`` from
    ``r1_gsrb2_rhs_sharded``; the coefficient/dinv ring views ride in
    the per-shard ``level.k2`` (build_sharded_k2_r1)."""
    from hpgmg_tpu.kernels.stencils_r1 import _TAPS, r1_gsrb2_call_slab

    b_h2inv = cfg.b * level.h2inv
    suite = level.kernel_suite
    var7 = suite == "var7"
    const_a = 0.0 if var7 else cfg.a
    a_alpha = (cfg.a if cfg.helmholtz else 0.0) if var7 else 0.0
    taps = _TAPS[taps_key]
    k2 = level.k2
    k2_present = [v for v in k2 if v is not None]
    args = [x, rhs2, level.kdinv[1]] + k2_present
    in_specs = tuple(_SPEC for _ in args)

    def body(xl, r2l, d1l, *k2l):
        it = iter(k2l)
        k2_local = tuple(next(it) if v is not None else None for v in k2)
        ilo, ihi, jlo, jhi = slabs2_for_kernel_r1(xl, mesh, taps)
        flags = [lax.axis_index("x") == 0,
                 lax.axis_index("x") == mesh.shape["x"] - 1,
                 lax.axis_index("y") == 0,
                 lax.axis_index("y") == mesh.shape["y"] - 1]
        ef = jnp.concatenate(
            [jnp.stack(flags).astype(xl.dtype), jnp.zeros(4, xl.dtype)])
        ef = jnp.broadcast_to(ef.reshape(1, 8, 1), (1, 8, xl.shape[2]))
        return r1_gsrb2_call_slab(xl, ilo, ihi, jlo, jhi, ef, k2_local,
                                  d1l, r2l, b_h2inv, suite, taps_key,
                                  a_alpha=a_alpha, const_a=const_a)

    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=_SPEC, check_vma=False)(*args)


# ---------------------------------------------------------------------------
# per-shard coefficient views (cut at shard_hierarchy time)
# ---------------------------------------------------------------------------

def build_sharded_views(mesh: Mesh, level: Level):
    """Cut per-shard kernel-layout coefficient views from the level's
    globally ghost-extended betas and stack them into P('x','y')-sharded
    arrays (see module docstring). Also returns the parity-prefolded kdinv
    pair sharded over the same spec. Requires the level to still carry its
    extended ``beta_*`` views and ``dinv``."""
    from hpgmg_tpu.core.level import rb_mask

    sx, sy = mesh.shape["x"], mesh.shape["y"]
    n = level.dim
    nli, nlj = n // sx, n // sy
    bie, bje, bke = level.beta_i, level.beta_j, level.beta_k

    def stack(blocks):
        return jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in blocks], axis=0)

    def padj(a, lead):
        pad_hi = (nlj + 8) - lead - a.shape[1]
        return jnp.pad(a, ((0, 0), (lead, pad_hi), (0, 0)))

    kbi = stack([[padj(bie[p * nli:(p + 1) * nli + 1,
                           q * nlj:q * nlj + nlj + 2, 1:-1], 3)
                  for q in range(sy)] for p in range(sx)])
    kbj = stack([[padj(bje[p * nli:p * nli + nli + 2,
                           q * nlj:(q + 1) * nlj + 1, 1:-1], 4)
                  for q in range(sy)] for p in range(sx)])
    kbk_full = [[bke[p * nli:p * nli + nli + 2,
                     q * nlj:q * nlj + nlj + 2, :]
                 for q in range(sy)] for p in range(sx)]
    kbk = stack([[padj(b[:, :, :-1], 3) for b in row] for row in kbk_full])
    kbk_top = stack([[padj(b[:, :, -1:], 3) for b in row]
                     for row in kbk_full])

    sh = NamedSharding(mesh, _SPEC)
    kdinv = tuple(
        jax.device_put(rb_mask(n, p, level.dinv.dtype) * level.dinv, sh)
        for p in (0, 1))
    put = lambda a: jax.device_put(a, sh)  # noqa: E731
    return put(kbi), put(kbj), put(kbk), put(kbk_top), kdinv


def build_sharded_kgd(mesh: Mesh, level: Level):
    """Per-shard cuts of the 8 precomputed mixed-flux operands
    (``Level.kgd``, kernels/stencils.py kernel_beta_prediff), stacked
    P('x','y')-sharded like ``build_sharded_views`` — the distributed
    PREDIFF path (VERDICT r3 item 5). The prediff operands carry NO
    tangential ghosts (the diffs folded them at build time), so each
    shard's block is a plain cut of the live rows re-padded to the
    (nlj+8)-row lead-4 kernel layout; the global j lead is also 4, so
    the cut is ``[q*nlj+4, ...)`` of the padded axis."""
    sx, sy = mesh.shape["x"], mesh.shape["y"]
    n = level.dim
    nli, nlj = n // sx, n // sy

    def stack(blocks):
        return jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in blocks], axis=0)

    def cut(g, iext, jext):
        # g: (n + 4 + iext, n + 8, nk) — global kgd layout: i zero-padded
        # by 2 each side (live rows at +2), live j rows at lead 4. The
        # per-shard cuts stay UNpadded on i (the sharded kernels read
        # them at plain ti*bi offsets, ipad=0).
        out = stack([[jnp.pad(
            g[p * nli + 2:p * nli + 2 + nli + iext,
              q * nlj + 4:q * nlj + 4 + nlj + jext, :],
            ((0, 0), (4, 4 - jext), (0, 0)))
            for q in range(sy)] for p in range(sx)])
        return jax.device_put(out, NamedSharding(mesh, _SPEC))

    dij, dik, dji, djk, dki, dkj, dki_t, dkj_t = level.kgd
    # i-face diffs ride the (nli+1)-row face window; j-face diffs keep
    # their sublane face axis (nlj+1 live rows); the rest are cell dims
    return (cut(dij, 1, 0), cut(dik, 1, 0), cut(dji, 0, 1),
            cut(djk, 0, 1), cut(dki, 0, 0), cut(dkj, 0, 0),
            cut(dki_t, 0, 0), cut(dkj_t, 0, 0))


def build_sharded_views_r1(mesh: Mesh, level: Level):
    """Per-shard radius-1 kernel views, stacked P('x','y')-sharded (see
    ``build_sharded_views``). Much simpler than fv4: the radius-1 flux
    reads NO tangential coefficient ghosts (every face is in-domain), so
    the local views are plain overlapping cuts of the unextended face
    coefficients in the single-chip layouts of ``r1_beta_views`` —
    kbi (nli+1, nlj, nk), kbj (nli, nlj+8, nk) [j face axis padded
    nlj+1 -> nlj+8], kbk (nli, nlj, nk) low faces + kbk_top (nli, nlj, 1).
    The dense 27pt carries no beta views: returns kdinv only."""
    from hpgmg_tpu.core.level import rb_mask

    sx, sy = mesh.shape["x"], mesh.shape["y"]
    n = level.dim
    nli, nlj = n // sx, n // sy
    sh = NamedSharding(mesh, _SPEC)
    kdinv = tuple(
        jax.device_put(rb_mask(n, p, level.dinv.dtype) * level.dinv, sh)
        for p in (0, 1))
    if level.kernel_suite != "var7":
        return None, None, None, None, kdinv

    bi, bj, bk = level.beta_i, level.beta_j, level.beta_k

    def stack(blocks):
        return jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in blocks], axis=0)

    kbi = stack([[bi[p * nli:(p + 1) * nli + 1, q * nlj:(q + 1) * nlj, :]
                  for q in range(sy)] for p in range(sx)])
    kbj = stack([[jnp.pad(bj[p * nli:(p + 1) * nli,
                             q * nlj:(q + 1) * nlj + 1, :],
                          ((0, 0), (0, 7), (0, 0)))
                  for q in range(sy)] for p in range(sx)])
    kbk = stack([[bk[p * nli:(p + 1) * nli, q * nlj:(q + 1) * nlj, :-1]
                  for q in range(sy)] for p in range(sx)])
    kbk_top = stack([[bk[p * nli:(p + 1) * nli, q * nlj:(q + 1) * nlj, -1:]
                      for q in range(sy)] for p in range(sx)])
    put = lambda a: jax.device_put(a, sh)  # noqa: E731
    return put(kbi), put(kbj), put(kbk), put(kbk_top), kdinv


def build_sharded_k2_r1(mesh: Mesh, level: Level, cfg: SolverConfig):
    """Per-shard pre-padded double-sweep ring views (Level.k2 for the
    slab2 path), stacked P('x','y')-sharded: per-shard cuts of the
    GLOBAL padded views (stencils_r1.r1_gsrb2_views) WITH each shard's
    1-deep neighbor ring baked in — interior-shard ring values are the
    true neighbor coefficients, domain edges the zero padding, so the
    double-sweep kernel needs no runtime coefficient exchange at all."""
    from hpgmg_tpu.core.level import rb_mask
    from hpgmg_tpu.kernels.stencils_r1 import r1_gsrb2_views

    sx, sy = mesh.shape["x"], mesh.shape["y"]
    n = level.dim
    nli, nlj = n // sx, n // sy
    var7 = level.kernel_suite == "var7"
    kdinv0 = rb_mask(n, 0, level.dinv.dtype) * level.dinv
    alpha = level.alpha if (cfg.helmholtz and var7) else None
    G = r1_gsrb2_views(level.beta_i if var7 else None,
                       level.beta_j, level.beta_k, kdinv0, alpha)

    def stack(V, ilen):
        blocks = [[V[p * nli:p * nli + ilen,
                     q * nlj:q * nlj + nlj + 16, :]
                   for q in range(sy)] for p in range(sx)]
        return jnp.concatenate(
            [jnp.concatenate(row, axis=1) for row in blocks], axis=0)

    sh = NamedSharding(mesh, _SPEC)
    put = lambda a: jax.device_put(a, sh)  # noqa: E731
    k2d0 = put(stack(G[0], nli + 2))
    k2a = put(stack(G[1], nli + 2)) if G[1] is not None else None
    if not var7:
        return (k2d0, k2a, None, None, None, None)
    return (k2d0, k2a, put(stack(G[2], nli + 3)),
            put(stack(G[3], nli + 2)), put(stack(G[4], nli + 2)),
            put(stack(G[5], nli + 2)))
