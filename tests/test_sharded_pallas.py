"""Distributed Pallas fast-path parity on the 8-virtual-CPU mesh.

The round-2 gap: fast kernels and the mesh were mutually exclusive. These
tests run the fv4 Pallas kernels (interpret mode) under shard_map with the
explicit radius-2 halo exchange (parallel/shard_kernels.py) and assert
parity with the XLA path — the reference's A/B discipline of identical
convergence between kernel implementations (operators.test.c) applied to
the distributed composition (exchange_boundary.c + gsrb.c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.kernels import stencils
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.parallel.mesh import (active_mesh, make_mesh_ij, shard_array,
                                     shard_hierarchy)
from hpgmg_tpu.problems.fv import init_problem_fv
from hpgmg_tpu.solve.mg import fmg_solve
from hpgmg_tpu.solve.smoothers import gsrb

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture
def interpret():
    old = stencils.INTERPRET
    stencils.INTERPRET = True
    yield
    stencils.INTERPRET = old


def _setup(n=64, dtype=jnp.float64):
    cfg = SolverConfig(op="fv4", a=0.0, dtype=dtype, kernels="pallas")
    prob = init_problem_fv(n, dtype=dtype)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
    return cfg, hier, prob


@requires_8dev
def test_mesh_ij_shape():
    mesh = make_mesh_ij()
    assert dict(mesh.shape) == {"x": 4, "y": 2, "z": 1}


@requires_8dev
def test_sharded_views_built(interpret):
    cfg, hier, prob = _setup(64)
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lv = hier_s.levels[0]
    assert lv.ksharded and lv.kbi is not None
    # stacked per-shard view shapes: (sx*(nli+1), sy*(nlj+8), n)
    assert lv.kbi.shape == (4 * (16 + 1), 2 * (32 + 8), 64)
    assert lv.kbj.shape == (4 * (16 + 2), 2 * (32 + 8), 64)
    # level 32 still eligible (8 x 16 local); level 16 is not (mixed
    # partial sharding) -> XLA fallback with views dropped
    assert hier_s.levels[1].ksharded
    assert hier_s.levels[2].kbi is None


@requires_8dev
def test_sharded_prediff_views_built(interpret):
    """Distributed PREDIFF (VERDICT r3 item 5): shard_hierarchy cuts
    per-shard kgd operands whenever the single-chip build attached them
    (prediff is default-on <= 256), and both per-shard mechanisms (slab
    and ext) consume them with parity vs the XLA path."""
    from hpgmg_tpu.parallel import shard_kernels as SK

    cfg, hier, prob = _setup(64)
    assert hier.levels[0].kgd is not None  # single-chip prediff attached
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    assert lvs.ksharded and lvs.kgd is not None and len(lvs.kgd) == 8
    # stacked per-shard shapes: i-face diffs (sx*(nli+1), sy*(nlj+8), n)
    assert lvs.kgd[0].shape == (4 * 17, 2 * 40, 64)
    assert lvs.kgd[2].shape == (4 * 16, 2 * 40, 64)

    op = get_suite(cfg.op)
    cfg_xla = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="xla")
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
        hier.levels[0], x, prob.f)
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, prob.f)
    for force_ext in (False, True):
        if force_ext:
            # drop to the ext mechanism by denying the slab tile
            orig = stencils.tile_shape_slab
            stencils.tile_shape_slab = lambda *a, **k: None
        try:
            with active_mesh(mesh):
                out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
                    lvs, x_s, rhs_s)
        finally:
            if force_ext:
                stencils.tile_shape_slab = orig
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-12, atol=5e-13)


@requires_8dev
@pytest.mark.parametrize("mode", ["apply", "residual", "gsrb"])
def test_sharded_kernel_matches_xla(interpret, mode):
    """One kernel application, sharded Pallas vs single-device XLA."""
    cfg, hier, prob = _setup(64)
    op = get_suite(cfg.op)
    cfg_xla = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64, kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    rhs = prob.f

    if mode == "apply":
        ref = jax.jit(lambda lv, x: op.apply_op(lv, x, cfg_xla))(lv, x)
    elif mode == "residual":
        ref = jax.jit(lambda lv, x, r: op.residual(lv, x, r, cfg_xla))(
            lv, x, rhs)
    else:
        ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
            lv, x, rhs)

    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    assert lvs.ksharded
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, rhs)
    with active_mesh(mesh):
        if mode == "apply":
            out = jax.jit(lambda lv, x: op.apply_op(lv, x, cfg))(lvs, x_s)
        elif mode == "residual":
            out = jax.jit(lambda lv, x, r: op.residual(lv, x, r, cfg))(
                lvs, x_s, rhs_s)
        else:
            out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
                lvs, x_s, rhs_s)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
def test_sharded_fcycle_matches_serial_pallas(interpret):
    """Whole F-cycle: sharded Pallas path == single-chip Pallas path.

    Ghost values are identical by construction (neighbor halos carry the
    same cells the single-chip kernel reads from its window), so parity is
    tight."""
    cfg, hier, prob = _setup(64)
    op = get_suite(cfg.op)

    u_ser, r_ser, f_ser = jax.jit(
        lambda hier, f: fmg_solve(op, hier, f, cfg))(hier, prob.f)

    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        u_par, r_par, f_par = jax.jit(
            lambda hier, f: fmg_solve(op, hier, f, cfg))(hier_s, f_s)

    # one F-cycle reaches discretization error (README.md:4-10; same
    # threshold as test_fv4's serial F-cycle check)
    assert float(r_par) / float(f_par) < 2e-3
    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                               rtol=1e-11, atol=1e-13)


@requires_8dev
def test_sharded_periodic_gsrb_matches_xla(interpret):
    """Periodic BCs on the mesh: the ring ppermute's wrap-around IS the
    boundary condition — one GSRB smooth sharded-Pallas vs XLA wrap."""
    from hpgmg_tpu.core.config import BC

    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                       kernels="pallas", bc=BC.PERIODIC)
    cfg_xla = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="xla", bc=BC.PERIODIC)
    prob = init_problem_fv(64, dtype=jnp.float64, periodic=True)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
    op = get_suite(cfg.op)
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
        lv, x, prob.f)

    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    assert hier_s.levels[0].ksharded
    with active_mesh(mesh):
        out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            hier_s.levels[0], shard_array(mesh, x),
            shard_array(mesh, prob.f))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


# ---------------------------------------------------------------------------
# radius-1 suites (fv7pt / fv2 / 27pt) on the distributed fast path
# ---------------------------------------------------------------------------

def _setup_r1(name, n=64, dtype=jnp.float64, periodic=False):
    from hpgmg_tpu.core.config import BC

    cfg = SolverConfig(op=name, a=1.0 if name == "27pt" else 0.0,
                       dtype=dtype, kernels="pallas",
                       bc=BC.PERIODIC if periodic else BC.DIRICHLET)
    prob = init_problem_fv(n, dtype=dtype, periodic=periodic)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    return cfg, hier, prob


@requires_8dev
def test_sharded_r1_views_built(interpret):
    cfg, hier, prob = _setup_r1("fv7pt")
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lv = hier_s.levels[0]
    assert lv.ksharded and lv.kernel_suite == "var7"
    # stacked per-shard radius-1 views: kbi (sx*(nli+1), sy*nlj, n)
    assert lv.kbi.shape == (4 * (16 + 1), 2 * 32, 64)
    assert lv.kbj.shape == (4 * 16, 2 * (32 + 8), 64)
    assert lv.kbk.shape == (4 * 16, 2 * 32, 64)
    assert lv.kbk_top.shape == (4 * 16, 2 * 32, 1)


@requires_8dev
@pytest.mark.parametrize("name", ["fv7pt", "fv2", "27pt"])
@pytest.mark.parametrize("mode", ["apply", "gsrb"])
def test_sharded_r1_kernel_matches_xla(interpret, name, mode):
    """One radius-1 kernel application, sharded Pallas vs XLA."""
    import dataclasses

    cfg, hier, prob = _setup_r1(name)
    op = get_suite(name)
    cfg_xla = dataclasses.replace(cfg, kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    rhs = prob.f

    if mode == "apply":
        ref = jax.jit(lambda lv, x: op.apply_op(lv, x, cfg_xla))(lv, x)
    else:
        ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
            lv, x, rhs)

    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    assert lvs.ksharded and lvs.kernel_suite is not None
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, rhs)
    with active_mesh(mesh):
        if mode == "apply":
            out = jax.jit(lambda lv, x: op.apply_op(lv, x, cfg))(lvs, x_s)
        else:
            out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
                lvs, x_s, rhs_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
def test_sharded_r1_fcycle_matches_serial(interpret):
    """Whole F-cycle on fv2: sharded radius-1 Pallas == single-chip."""
    cfg, hier, prob = _setup_r1("fv2")
    op = get_suite("fv2")
    u_ser, r_ser, f_ser = jax.jit(
        lambda hier, f: fmg_solve(op, hier, f, cfg))(hier, prob.f)
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        u_par, r_par, f_par = jax.jit(
            lambda hier, f: fmg_solve(op, hier, f, cfg))(hier_s, f_s)
    # fv2 is 2nd order: one F-cycle reaches its (larger) discretization
    # error — serial XLA measures 2.59e-3 at 64^3
    assert float(r_par) / float(f_par) < 5e-3
    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                               rtol=1e-11, atol=1e-13)


@requires_8dev
def test_sharded_r1_periodic_gsrb_matches_xla(interpret):
    """Periodic radius-1 on the mesh: ring-wrap halos are the BC."""
    import dataclasses

    cfg, hier, prob = _setup_r1("fv7pt", periodic=True)
    op = get_suite("fv7pt")
    cfg_xla = dataclasses.replace(cfg, kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
        lv, x, prob.f)
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    assert hier_s.levels[0].ksharded
    with active_mesh(mesh):
        out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            hier_s.levels[0], shard_array(mesh, x),
            shard_array(mesh, prob.f))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
@pytest.mark.parametrize("name", ["fv4", "fv7pt"])
def test_sharded_helmholtz_gsrb_matches_xla(interpret, name):
    """Helmholtz (a*alpha*u term) through the sharded kernels: the alpha
    operand rides the shard_map like any cell field."""
    import dataclasses

    cfg = SolverConfig(op=name, a=0.9, b=1.0, helmholtz=True,
                       dtype=jnp.float64, kernels="pallas")
    prob = init_problem_fv(64, dtype=jnp.float64)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    op = get_suite(name)
    cfg_xla = dataclasses.replace(cfg, kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
        lv, x, prob.f)
    mesh = make_mesh_ij()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    assert hier_s.levels[0].ksharded
    with active_mesh(mesh):
        out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            hier_s.levels[0], shard_array(mesh, x),
            shard_array(mesh, prob.f))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
def test_sharded_slab_vs_ext_paths(interpret, monkeypatch):
    """The slab fast path (thin-slab exchange + masked-window kernel,
    stencils.fv4_call_slab) vs the ext fallback (materialized
    pre-extended array) — both shard_map compositions must agree with
    each other and the XLA path. At n=64 on the 4x2 mesh the local
    16x32 blocks are slab-eligible; forcing tile_shape_slab -> None
    exercises the ext fallback on the same shapes."""
    cfg, hier, prob = _setup(64)
    op = get_suite(cfg.op)
    cfg_xla = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    rhs = prob.f
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(lv, x, rhs)

    mesh = make_mesh_ij()
    assert stencils.tile_shape_slab(16, 32, 64) is not None
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, rhs)
    with active_mesh(mesh):
        out_slab = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            lvs, x_s, rhs_s)
        monkeypatch.setattr(stencils, "tile_shape_slab",
                            lambda *a: None)
        out_ext = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            lvs, x_s, rhs_s)
    np.testing.assert_allclose(np.asarray(out_slab), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)
    np.testing.assert_allclose(np.asarray(out_ext), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


def test_single_chip_slab_parity(interpret):
    """fv4_call_slab with BC-fill slabs (single_chip_slabs) == the XLA
    path on one whole-domain block, Dirichlet + periodic — the direct
    harness behind the slab-vs-masked speed A/B (docs/GSRB_VPU.md)."""
    import dataclasses

    from hpgmg_tpu.core.config import BC
    from hpgmg_tpu.core.level import rb_mask

    for bc in (BC.DIRICHLET, BC.PERIODIC):
        cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="pallas", bc=bc)
        cfg_x = dataclasses.replace(cfg, kernels="xla")
        prob = init_problem_fv(48, dtype=jnp.float64,
                               periodic=bc == BC.PERIODIC)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
        lv = hier.levels[0]
        op = get_suite("fv4")
        x = jnp.asarray(
            np.random.default_rng(9).standard_normal((48, 48, 48)))
        ilo, ihi, jlo, jhi = stencils.single_chip_slabs(x, bc)
        kper = bc == BC.PERIODIC
        out = stencils.fv4_call_slab(
            x, ilo, ihi, jlo, jhi, lv.kbi, lv.kbj, lv.kbk, lv.kbk_top,
            None, None, "apply", cfg.b * lv.h2inv, kperiodic=kper,
            ipad=2)
        ref = op.apply_op(lv, x, cfg_x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-10)
        ax = op.apply_op(lv, x, cfg_x)
        refg = x + rb_mask(48, 1, x.dtype) * lv.dinv * (prob.f - ax)
        outg = stencils.fv4_call_slab(
            x, ilo, ihi, jlo, jhi, lv.kbi, lv.kbj, lv.kbk, lv.kbk_top,
            prob.f, lv.kdinv[1], "gsrb", cfg.b * lv.h2inv, kperiodic=kper,
            ipad=2)
        np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                                   rtol=1e-12, atol=1e-12)


def test_single_chip_overlap_parity(interpret, monkeypatch):
    """fv4_call_overlap (interior pass + aliased edge-tile pass,
    kernels/stencils.py) == fv4_call_slab on one whole-domain block:
    the comm-overlap split (exchange_boundary.c:48-56 +
    operators.test/exchange_boundary_overlap.c analog) is a pure
    re-scheduling — identical results per mode. Tiles forced to
    (16, 16) so the 48^3 block has the >= 3x3 tile grid overlap needs
    (the production tile search prefers 2-tile axes at this size)."""
    from hpgmg_tpu.core.config import BC

    monkeypatch.setattr(stencils, "tile_shape_slab", lambda *a: (16, 16))
    assert stencils.overlap_grid_shape(48, 48, 48) == (3, 3)
    for bc in (BC.DIRICHLET, BC.PERIODIC):
        cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="pallas", bc=bc)
        prob = init_problem_fv(48, dtype=jnp.float64,
                               periodic=bc == BC.PERIODIC)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
        lv = hier.levels[0]
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((48, 48, 48)))
        ilo, ihi, jlo, jhi = stencils.single_chip_slabs(x, bc)
        kper = bc == BC.PERIODIC
        for mode, rhs, dinv in (("apply", None, None),
                                ("residual", prob.f, None),
                                ("gsrb", prob.f, lv.kdinv[0])):
            common = (x, ilo, ihi, jlo, jhi, lv.kbi, lv.kbj, lv.kbk,
                      lv.kbk_top, rhs, dinv, mode, cfg.b * lv.h2inv)
            ref = stencils.fv4_call_slab(*common, kperiodic=kper, ipad=2)
            out = stencils.fv4_call_overlap(*common, kperiodic=kper,
                                            ipad=2)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-14, atol=1e-14)


@requires_8dev
def test_sharded_overlap_matches_xla(interpret, monkeypatch):
    """OVERLAP=True routes the distributed slab fast path through the
    two-pass interior/edge split under shard_map (the interior pallas
    call takes no slab operand, so it carries no data dependency on the
    halo ppermutes); parity vs the XLA smoother on the 4x2 mesh. Tiles
    forced to (4, 8) so the 16x32 local blocks have a 4x4 tile grid;
    exercises the per-shard PREDIFF kgd operands through both passes."""
    from hpgmg_tpu.parallel import shard_kernels as SK

    cfg, hier, prob = _setup(64)
    op = get_suite(cfg.op)
    cfg_xla = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    rhs = prob.f
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(lv, x, rhs)
    mesh = make_mesh_ij()
    monkeypatch.setattr(stencils, "tile_shape_slab", lambda *a: (4, 8))
    assert stencils.overlap_grid_shape(16, 32, 64) == (4, 4)
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    assert lvs.kgd is not None  # PREDIFF operands ride both passes
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, rhs)
    monkeypatch.setattr(SK, "OVERLAP", True)
    with active_mesh(mesh):
        out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            lvs, x_s, rhs_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
@pytest.mark.parametrize("name", ["fv2", "27pt"])
def test_sharded_gsrb2_matches_xla(interpret, name):
    """Distributed fused red+black double sweep (slab2: ONE 2-deep slab
    exchange + ONE launch per full sweep, per-shard k2 ring views) ==
    the XLA smoother. Exercises shard-interior edges (exchanged red ring
    kept) and domain edges (in-kernel ghost re-synthesis gated by the
    eflags operand) on the 4x2 mesh."""
    from hpgmg_tpu.kernels import stencils_r1 as K1

    old, old_v = K1.GSRB2, K1.GSRB2_VAR7_ONLY
    K1.GSRB2, K1.GSRB2_VAR7_ONLY = True, False
    try:
        cfg, hier, prob = _setup_r1(name)
        op = get_suite(name)
        import dataclasses

        cfg_xla = dataclasses.replace(cfg, kernels="xla")
        lv = hier.levels[0]
        x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
        rhs = prob.f
        ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
            lv, x, rhs)
        mesh = make_mesh_ij()
        hier_s = shard_hierarchy(mesh, hier, cfg)
        lvs = hier_s.levels[0]
        assert lvs.k2 is not None  # slab2-eligible at 16x32 local blocks
        with active_mesh(mesh):
            out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
                lvs, shard_array(mesh, x), shard_array(mesh, rhs))
    finally:
        K1.GSRB2, K1.GSRB2_VAR7_ONLY = old, old_v
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
def test_sharded_gsrb2_helmholtz_matches_xla(interpret):
    """slab2 with the Helmholtz a*alpha*x term: alpha rides as the
    per-shard padded k2 ring view."""
    import dataclasses

    from hpgmg_tpu.core.config import BC
    from hpgmg_tpu.kernels import stencils_r1 as K1

    old = K1.GSRB2
    K1.GSRB2 = True
    try:
        cfg = SolverConfig(op="fv7pt", a=0.9, b=1.0, helmholtz=True,
                           dtype=jnp.float64, kernels="pallas",
                           bc=BC.DIRICHLET)
        prob = init_problem_fv(64, dtype=jnp.float64)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k,
                               cfg, alpha=prob.alpha)
        op = get_suite("fv7pt")
        cfg_xla = dataclasses.replace(cfg, kernels="xla")
        lv = hier.levels[0]
        x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
        ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(
            lv, x, prob.f)
        mesh = make_mesh_ij()
        hier_s = shard_hierarchy(mesh, hier, cfg)
        lvs = hier_s.levels[0]
        assert lvs.k2 is not None and lvs.k2[1] is not None
        with active_mesh(mesh):
            out = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
                lvs, shard_array(mesh, x), shard_array(mesh, prob.f))
    finally:
        K1.GSRB2 = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)


@requires_8dev
def test_sharded_r1_slab_vs_ext_paths(interpret, monkeypatch):
    """Radius-1 slab fast path (thin 1-deep slab exchange + masked-window
    kernel, stencils_r1.r1_call_slab) vs the ext fallback — both
    shard_map compositions must agree with the XLA path (fv4
    test_sharded_slab_vs_ext_paths analog). At n=64 on the 4x2 mesh the
    16x32 local blocks are slab-eligible; forcing tile_shape_slab_r1 ->
    None exercises the ext fallback on the same shapes."""
    import dataclasses

    from hpgmg_tpu.kernels import stencils_r1

    cfg, hier, prob = _setup_r1("fv2")
    op = get_suite("fv2")
    cfg_xla = dataclasses.replace(cfg, kernels="xla")
    lv = hier.levels[0]
    x = prob.f / (1.0 + jnp.max(jnp.abs(prob.f)))
    rhs = prob.f
    ref = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_xla))(lv, x, rhs)

    mesh = make_mesh_ij()
    assert stencils_r1.tile_shape_slab_r1(16, 32, 64) is not None
    hier_s = shard_hierarchy(mesh, hier, cfg)
    lvs = hier_s.levels[0]
    x_s, rhs_s = shard_array(mesh, x), shard_array(mesh, rhs)
    with active_mesh(mesh):
        out_slab = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            lvs, x_s, rhs_s)
        monkeypatch.setattr(stencils_r1, "tile_shape_slab_r1",
                            lambda *a, **k: None)
        out_ext = jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg))(
            lvs, x_s, rhs_s)
    np.testing.assert_allclose(np.asarray(out_slab), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)
    np.testing.assert_allclose(np.asarray(out_ext), np.asarray(ref),
                               rtol=5e-12, atol=5e-13)
