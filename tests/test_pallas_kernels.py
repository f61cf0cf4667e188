"""Pallas stencil kernels vs the XLA reference path (interpreter mode).

The phase-2 kernels compute the v4 boundary extension in-kernel, so the
parity tests cover the regimes where that logic differs: edge vs interior
tiles on both tiled axes and all red/black parities. Exercised through the
Pallas interpreter on CPU so the suite stays hardware-independent; on-TPU
parity is verified by the solve-level golden tests when run on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpgmg_tpu.kernels.stencils as K
from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.core.level import rb_mask
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.fv import init_problem_fv


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    yield
    K.INTERPRET = False


@pytest.fixture(scope="module")
def setup():
    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64)
    # n=48 -> 16^3 tiles in a 3x3 grid: first/interior/last tile
    # cases are all exercised on both tiled axes
    prob = init_problem_fv(48, dtype=jnp.float64)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    return cfg, prob, hier, get_suite("fv4"), x


def test_use_pallas_gating(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    import dataclasses as dc
    # auto applies the >=64 perf floor on 48^3; forcing selects the kernel
    assert lv.kbi is not None
    assert not K.use_pallas(cfg, lv, x)
    assert K.use_pallas(dc.replace(cfg, kernels="pallas"), lv, x)
    # too-small levels never get the kernel layout
    assert all(l.kbi is None for l in hier.levels if l.dim < K._MIN_DIM)
    import dataclasses
    assert not K.use_pallas(dataclasses.replace(cfg, kernels="xla"), lv, x)


def test_use_pallas_f64_hardware_gate(setup, monkeypatch):
    """On real hardware (INTERPRET off) f64 levels must fall back to the
    XLA path: Mosaic has no 64-bit types (observed on-chip: every f64
    kernel compile dies with 'NotImplementedError: 64-bit types')."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]  # f64 by the module fixture
    import dataclasses as dc

    import hpgmg_tpu.kernels.stencils_r1 as K1

    pcfg = dc.replace(cfg, kernels="pallas")
    assert K.use_pallas(pcfg, lv, x)  # interpreter: 64-bit fine
    K.INTERPRET = False
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not K.use_pallas(pcfg, lv, x)
    assert not K1.use_pallas_r1(pcfg, dc.replace(lv, kernel_suite="var7"))
    # an f32 level still selects the kernel under the same conditions
    lv32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, lv)
    assert K.use_pallas(pcfg, lv32, x.astype(jnp.float32))
    K.INTERPRET = True


def test_apply_matches_xla(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ref = op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def dataclasses_xla(cfg):
    import dataclasses
    return dataclasses.replace(cfg, kernels="xla")


def test_residual_matches_xla(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ref = prob.f - op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_residual_pallas(lv, x, prob.f, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_apply_matches_xla_interior_j_tiles(setup, monkeypatch):
    """Force (bi, bj) = (16, 8) so the j axis has 6 tiles — the interior
    j-tile branch of the boundary-extension switch (the auto-picked
    (16, 24) tiling at n=48 only has first/last j-tiles)."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K, "tile_shape", lambda n, *a, **kw: (16, 8))
    ref = op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("parity", [0, 1])
def test_gsrb_sweep_matches_xla(setup, parity):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ax = op.apply_op(lv, x, dataclasses_xla(cfg))
    ref = x + rb_mask(48, parity, x.dtype) * lv.dinv * (prob.f - ax)
    out = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, parity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def _two_half_sweeps_xla(op, lv, x, rhs, cfg):
    """Reference full GSRB sweep: red then black through the XLA path
    with a fresh ghost fill before each half (gsrb.c:24-41)."""
    xc = dataclasses_xla(cfg)
    n = lv.dim
    x1 = x + rb_mask(n, 0, x.dtype) * lv.dinv * (rhs - op.apply_op(lv, x, xc))
    return x1 + rb_mask(n, 1, x.dtype) * lv.dinv * (
        rhs - op.apply_op(lv, x1, xc))


@pytest.mark.parametrize("prediff", [False, True])
def test_fv4_gsrb2_matches_two_half_sweeps(setup, monkeypatch, prediff):
    """The fused red+black double-sweep kernel (GSRB2_FV4) against two
    XLA half-sweeps with the mid-sweep apply_BCs_v4 ghost fill, with and
    without the prediff ring operands. n=48 with the auto tile (16, 24)
    exercises first/mid/last i tiles and first/last j tiles."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K, "GSRB2_FV4", True)
    assert K.gsrb2_fv4_eligible(cfg, lv.dim)
    import dataclasses as dc
    lv2 = dc.replace(lv, k2=K.fv4_gsrb2_views(lv.kdinv[0]),
                     kgd=lv.kgd if prediff else None)
    if prediff:
        assert lv.kgd is not None  # prediff_active at n=48
    ref = _two_half_sweeps_xla(op, lv, x, prob.f, cfg)
    out = K.fv4_gsrb2_pallas(lv2, x, K.pad_rhs_gsrb2_fv4(prob.f), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_fv4_gsrb2_interior_j_tiles(setup, monkeypatch):
    """Force an (8, 16) tile so the j axis also has an interior tile
    (the auto pick at n=48 only has first/last on j)."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K, "GSRB2_FV4", True)
    monkeypatch.setattr(K, "tile_shape_gsrb2_fv4", lambda n, prediff=None: (8, 16))
    import dataclasses as dc
    lv2 = dc.replace(lv, k2=K.fv4_gsrb2_views(lv.kdinv[0]))
    ref = _two_half_sweeps_xla(op, lv, x, prob.f, cfg)
    out = K.fv4_gsrb2_pallas(lv2, x, K.pad_rhs_gsrb2_fv4(prob.f), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_fv4_gsrb2_dispatch(setup, monkeypatch):
    """op.gsrb_sweep routes even sweep counts through the double-sweep
    kernel when the k2 operands are attached; 6 half-sweeps must equal
    3 fused full sweeps."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K, "GSRB2_FV4", True)
    import dataclasses as dc
    lv2 = dc.replace(lv, k2=K.fv4_gsrb2_views(lv.kdinv[0]))
    pcfg = dc.replace(cfg, kernels="pallas")
    ref = x
    for _ in range(3):
        ref = _two_half_sweeps_xla(op, lv, ref, prob.f, cfg)
    out = op.gsrb_sweep(lv2, x, prob.f, pcfg, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_dirichlet_ext_mode_matches_xla(setup, monkeypatch):
    """The pre-extended (ext) single-chip path — ghosts materialized by
    XLA outside the kernel — against the XLA reference (Dirichlet A/B of
    the layout the periodic and sharded paths use)."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K, "SINGLE_EXT", True)
    ref = op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    ax = op.apply_op(lv, x, dataclasses_xla(cfg))
    ref_g = x + rb_mask(48, 1, x.dtype) * lv.dinv * (prob.f - ax)
    out_g = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, 1)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def setup_periodic():
    from hpgmg_tpu.core.config import BC

    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64, bc=BC.PERIODIC)
    prob = init_problem_fv(48, dtype=jnp.float64, periodic=True)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    return cfg, prob, hier, get_suite("fv4"), x


@pytest.mark.parametrize("mode", ["apply", "gsrb"])
def test_periodic_matches_xla(setup_periodic, mode):
    """Periodic BCs through the kernel (wrap ghosts fed via the
    pre-extended layout + in-kernel lane wraps) vs the XLA wrap path —
    closes the round-2 gap where periodic silently fell back ~2x slower
    (USE_PERIODIC_BC, hpgmg-fv.c:296-302 runs the same GSRB hot loop)."""
    cfg, prob, hier, op, x = setup_periodic
    lv = hier.levels[0]
    assert lv.kbi is not None  # views attached for periodic now
    assert K.use_pallas(dataclasses_replace_kernels(cfg, "pallas"), lv, x)
    if mode == "apply":
        ref = op.apply_op(lv, x, dataclasses_xla(cfg))
        out = K.fv4_apply_pallas(lv, x, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-10)
    else:
        ax = op.apply_op(lv, x, dataclasses_xla(cfg))
        ref = x + rb_mask(48, 0, x.dtype) * lv.dinv * (prob.f - ax)
        out = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)


def dataclasses_replace_kernels(cfg, kernels):
    import dataclasses
    return dataclasses.replace(cfg, kernels=kernels)


def test_periodic_fcycle_matches_xla(setup_periodic):
    """Whole periodic F-cycle: kernel path == XLA path (+ mean handling)."""
    from hpgmg_tpu.solve.mg import fmg_solve

    cfg, prob, hier, op, x = setup_periodic
    cfg_p = dataclasses_replace_kernels(cfg, "pallas")
    u_ref, r_ref, f_ref = jax.jit(lambda h, f: fmg_solve(
        op, h, f, dataclasses_xla(cfg)))(hier, prob.f)
    u_out, r_out, f_out = jax.jit(lambda h, f: fmg_solve(
        op, h, f, cfg_p))(hier, prob.f)
    assert float(r_out) / float(f_out) < 2e-3
    np.testing.assert_allclose(np.asarray(u_out), np.asarray(u_ref),
                               rtol=1e-10, atol=1e-12)


def test_helmholtz_matches_xla():
    """Helmholtz (a*alpha*u + divergence term) through the kernel with the
    extra alpha operand vs the XLA path (operators.fv4.c:87 u-term;
    previously a silent ~2x fallback)."""
    K.INTERPRET = True
    cfg = SolverConfig(op="fv4", a=1.0, b=1.0, helmholtz=True,
                       dtype=jnp.float64, kernels="pallas")
    prob = init_problem_fv(32, dtype=jnp.float64)
    alpha = 1.0 + 0.1 * jnp.asarray(
        np.random.default_rng(2).standard_normal((32, 32, 32)))
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=alpha)
    op = get_suite("fv4")
    lv = hier.levels[0]
    assert lv.kbi is not None
    assert K.use_pallas(cfg, lv)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((32, 32, 32)))
    ref = op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    ax = op.apply_op(lv, x, dataclasses_xla(cfg))
    rhs = prob.f
    ref_g = x + rb_mask(32, 0, x.dtype) * lv.dinv * (rhs - ax)
    out_g = K.fv4_gsrb_sweep_pallas(lv, x, rhs, cfg, 0)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("periodic", [False, True])
def test_prediff_matches_xla(periodic):
    """PREDIFF variant: the mixed-flux tangential beta differences arrive
    precomputed (Level.kgd, 0.25 factor folded — bitwise-neutral power of
    two) instead of being recomputed from the beta windows every sweep
    (docs/GSRB_VPU.md). Covers the masked Dirichlet path and the
    pre-extended periodic path."""
    from hpgmg_tpu.core.config import BC

    K.INTERPRET = True
    old = K.PREDIFF
    K.PREDIFF = True
    try:
        cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                           kernels="pallas",
                           bc=BC.PERIODIC if periodic else BC.DIRICHLET)
        prob = init_problem_fv(48, dtype=jnp.float64, periodic=periodic)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
        op = get_suite("fv4")
        lv = hier.levels[0]
        assert lv.kgd is not None and len(lv.kgd) == 8
    finally:
        K.PREDIFF = old
    x = jnp.asarray(np.random.default_rng(4).standard_normal((48, 48, 48)))
    ref = op.apply_op(lv, x, dataclasses_xla(cfg))
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    ax = op.apply_op(lv, x, dataclasses_xla(cfg))
    ref_g = x + rb_mask(48, 1, x.dtype) * lv.dinv * (prob.f - ax)
    out_g = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, 1)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-12, atol=1e-12)


def test_bf16c_gsrb_close_to_f32():
    """BF16C smoother views (negative perf result — docs/BF16C.md — the
    flag stays default-OFF; this keeps the A/B path working): the
    bf16-coefficient GSRB half-sweep matches the f32 kernel to bf16
    rounding, and the bf16 (bj+16)-row windows stay legal."""
    K.INTERPRET = True
    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float32,
                       kernels="pallas")
    prob = init_problem_fv(64, dtype=jnp.float32)
    old, old_dim = K.BF16C, K.BF16C_MIN_DIM
    K.BF16C, K.BF16C_MIN_DIM = True, 64
    try:
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
    finally:
        K.BF16C, K.BF16C_MIN_DIM = old, old_dim
    lv = hier.levels[0]
    assert lv.kb16 is not None and lv.kb16[0].dtype == jnp.bfloat16
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((64, 64, 64)).astype(np.float32))
    # f32 reference through the same kernel (kb16 detached)
    import dataclasses as dc

    lv32 = dc.replace(lv, kb16=None)
    ref = K.fv4_gsrb_sweep_pallas(lv32, x, prob.f, cfg, 0)
    out = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, 0)
    assert out.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out - ref))) / scale
    assert err < 5e-3, err  # bf16 coefficient rounding, not a bug
    # and the f32 path is genuinely different data (sanity of the A/B)
    assert err > 0.0


@pytest.mark.parametrize("prediff", [False, True])
def test_fv4_subtile_matches_xla(setup, monkeypatch, prediff):
    """Sub-tiled masked kernel (SUBTILE) vs the XLA path for all three
    modes. Forced (24, 16) tiles with si=8: 2 i-tiles x 3 sub-tiles
    exercise the domain-first / interior / domain-last VIRTUAL sub-tile
    branches (including the window-clip compensation on the first/last
    tiles), 3 j-tiles the interior-j branch."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    import dataclasses as dc
    if not prediff:
        lv = dc.replace(lv, kgd=None)
    else:
        assert lv.kgd is not None
    monkeypatch.setattr(K, "SUBTILE", True)
    monkeypatch.setattr(K, "tile_shape_subtile",
                        lambda n, prediff=None, si=None: (24, 16))
    xc = dataclasses_xla(cfg)
    ax = op.apply_op(lv, x, xc)
    out = K.fv4_apply_pallas(lv, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ax),
                               rtol=1e-12, atol=1e-10)
    out_r = K.fv4_residual_pallas(lv, x, prob.f, cfg)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(prob.f - ax),
                               rtol=1e-12, atol=1e-10)
    ref_g = x + rb_mask(48, 1, x.dtype) * lv.dinv * (prob.f - ax)
    out_g = K.fv4_gsrb_sweep_pallas(lv, x, prob.f, cfg, 1)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-12, atol=1e-12)


def test_restrict_ik_pallas_matches_einsum():
    """Standalone restriction kernel (kernels/restrict.py): fused i+k
    halvings + the outside j einsum == the 3-einsum restrict_cell."""
    from hpgmg_tpu.kernels import restrict as R
    from hpgmg_tpu.ops.transfer import restrict_cell

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 64, 64)))
    out = R.restrict_j_einsum(R.restrict_ik_pallas(x))
    assert out.shape == (32, 32, 32)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(restrict_cell(x)),
                               rtol=1e-13, atol=1e-13)
    # dispatch helper: fast == slow
    np.testing.assert_allclose(np.asarray(R.restrict_cell_auto(x, True)),
                               np.asarray(R.restrict_cell_auto(x, False)),
                               rtol=1e-13, atol=1e-13)


@pytest.fixture()
def fused_restrict_on():
    from hpgmg_tpu.kernels import restrict as R

    old = R.FUSED_RESTRICT
    R.FUSED_RESTRICT = True
    yield R
    R.FUSED_RESTRICT = old


def test_use_pallas_restrict_gates(setup, fused_restrict_on):
    """The restriction-kernel gate: size floor, sharded and xla opt-outs."""
    import dataclasses as dc

    R = fused_restrict_on
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]  # dim 48 < the 64 auto floor
    assert not R.use_pallas_restrict(cfg, lv)
    lv64 = dc.replace(lv, dim=64)
    assert R.use_pallas_restrict(cfg, lv64)  # INTERPRET on via fixture
    assert not R.use_pallas_restrict(dc.replace(cfg, kernels="xla"), lv64)
    assert not R.use_pallas_restrict(cfg, dc.replace(lv64, ksharded=True))
    R.FUSED_RESTRICT = False
    assert not R.use_pallas_restrict(cfg, lv64)


@pytest.mark.parametrize("prediff", [False, True])
def test_fused_restrict_residual_matches_pair(setup, fused_restrict_on,
                                              prediff):
    """mode='fres' (fused residual+restriction) == restrict_cell of the
    XLA residual, with and without the PREDIFF operands."""
    import dataclasses as dc

    from hpgmg_tpu.ops.transfer import restrict_cell

    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    if not prediff:
        lv = dc.replace(lv, kgd=None)
    else:
        assert lv.kgd is not None
    pcfg = dc.replace(cfg, kernels="pallas")  # lift the 64^3 auto floor
    ref = restrict_cell(prob.f - op.apply_op(lv, x, dataclasses_xla(cfg)))
    out = op.restrict_residual(lv, x, prob.f, pcfg)
    assert out is not None and out.shape == (24, 24, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    # the unfused combination agrees too (vcycle fallback path)
    unfused = restrict_cell(K.fv4_residual_pallas(lv, x, prob.f, pcfg))
    np.testing.assert_allclose(np.asarray(unfused), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_fused_restrict_residual_gates(setup, fused_restrict_on):
    """restrict_residual returns None off the masked Dirichlet kernel
    path (xla mode, flag off) so vcycle runs the separate phases."""
    import dataclasses as dc

    R = fused_restrict_on
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    assert op.restrict_residual(lv, x, prob.f,
                                dc.replace(cfg, kernels="xla")) is None
    # auto floor: 48 < 64
    assert op.restrict_residual(lv, x, prob.f, cfg) is None
    R.FUSED_RESTRICT = False
    assert op.restrict_residual(
        lv, x, prob.f, dc.replace(cfg, kernels="pallas")) is None
