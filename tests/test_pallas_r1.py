"""Radius-1 Pallas kernels (fv7pt / fv2 / 27pt) vs the XLA reference path.

Interpreter-mode parity (CPU), mirroring tests/test_pallas_kernels.py for
the fv4 family: edge vs interior tiles on both tiled axes, all GSRB
parities, and a whole-solve identical-convergence smoke — the reference's
operators.test.c A/B discipline applied to the 2nd-order suites.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hpgmg_tpu.kernels.stencils as K
import hpgmg_tpu.kernels.stencils_r1 as K1
from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.core.level import rb_mask
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.fv import init_problem_fv

SUITES = ["fv7pt", "fv2", "27pt"]


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    yield
    K.INTERPRET = False


def xla_cfg(cfg):
    return dataclasses.replace(cfg, kernels="xla")


@pytest.fixture(scope="module", params=SUITES)
def setup(request):
    name = request.param
    cfg = SolverConfig(op=name, a=1.0 if name == "27pt" else 0.0,
                       dtype=jnp.float64)
    # n=48 -> (16, 24) tiles: first/interior/last i tiles, first/last j
    prob = init_problem_fv(48, dtype=jnp.float64)
    # force the double-sweep views on at build (incl. for 27pt, which
    # the default policy excludes as a hardware-measured loss) so the
    # gsrb2 tests can drive the kernel directly
    old, old_v = K1.GSRB2, K1.GSRB2_VAR7_ONLY
    K1.GSRB2, K1.GSRB2_VAR7_ONLY = True, False
    try:
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
    finally:
        K1.GSRB2, K1.GSRB2_VAR7_ONLY = old, old_v
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    return cfg, prob, hier, get_suite(name), x


def test_views_and_gating(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    assert lv.kernel_suite == ("27pt" if op.name == "27pt" else "var7")
    assert lv.kdinv is not None
    if op.name != "27pt":
        n = lv.dim
        assert lv.kbi.shape == (n + 1, n, n)
        assert lv.kbj.shape == (n, n + 8, n)
        assert lv.kbk.shape == (n, n, n)
        assert lv.kbk_top.shape == (n, n, 1)
    # auto applies the >=64 floor at 48^3; forcing selects the kernel
    assert not K1.use_pallas_r1(cfg, lv)
    assert K1.use_pallas_r1(dataclasses.replace(cfg, kernels="pallas"), lv)
    assert not K1.use_pallas_r1(xla_cfg(cfg), lv)
    # the fv4 gate must not misread radius-1 views
    assert not K.use_pallas(dataclasses.replace(cfg, kernels="pallas"), lv)
    # tiny levels never get the kernel marker
    assert all(l.kernel_suite is None for l in hier.levels
               if l.dim < K._MIN_DIM)


def test_apply_matches_xla(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ref = op.apply_op(lv, x, xla_cfg(cfg))
    out = K1.r1_apply_pallas(lv, x, cfg, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_residual_matches_xla(setup):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ref = prob.f - op.apply_op(lv, x, xla_cfg(cfg))
    out = K1.r1_residual_pallas(lv, x, prob.f, cfg, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("parity", [0, 1])
def test_gsrb_sweep_matches_xla(setup, parity):
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    ax = op.apply_op(lv, x, xla_cfg(cfg))
    mask = rb_mask(lv.dim, parity, x.dtype)
    ref = x + mask * lv.dinv * (prob.f - ax)
    out = K1.r1_gsrb_sweep_pallas(lv, x, prob.f, cfg, parity, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_apply_interior_j_tiles(setup, monkeypatch):
    """Force (8, 8) tiles so interior-j windows (the clamped mid case on
    the sublane axis) are exercised too."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    monkeypatch.setattr(K1, "tile_shape_r1", lambda n, var7=True: (8, 8))
    ref = op.apply_op(lv, x, xla_cfg(cfg))
    out = K1.r1_apply_pallas(lv, x, cfg, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("name", SUITES)
def test_periodic_apply_and_gsrb_match_xla(name):
    """Periodic BCs through the ext-mode kernel (i/j wrap materialized by
    XLA, k wraps in-kernel) vs the XLA wrap fill."""
    cfg = SolverConfig(op=name, a=1.0 if name == "27pt" else 0.0,
                       dtype=jnp.float64, bc=BC.PERIODIC,
                       kernels="pallas")
    prob = init_problem_fv(48, dtype=jnp.float64, periodic=True)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    op = get_suite(name)
    lv = hier.levels[0]
    assert K1.use_pallas_r1(cfg, lv)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    ref = op.apply_op(lv, x, xla_cfg(cfg))
    out = K1.r1_apply_pallas(lv, x, cfg, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    mask = rb_mask(lv.dim, 1, x.dtype)
    ref_g = x + mask * lv.dinv * (prob.f - ref)
    out_g = K1.r1_gsrb_sweep_pallas(lv, x, prob.f, cfg, 1, op.taps_key)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-12, atol=1e-10)


@pytest.mark.parametrize("name", SUITES)
def test_solve_identical_convergence(name):
    """Whole-solve A/B: forced-Pallas vs XLA F-cycle convergence match
    (operators.test.c identical-convergence smoke) at 32^3."""
    from hpgmg_tpu.solve.mg import fmg_solve

    a = 1.0 if name == "27pt" else 0.0
    base_cfg = SolverConfig(op=name, a=a, dtype=jnp.float64)
    prob = init_problem_fv(32, dtype=jnp.float64)
    res = {}
    for kern in ("pallas", "xla"):
        cfg = dataclasses.replace(base_cfg, kernels=kern)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        op = get_suite(name)
        if kern == "pallas":
            assert K1.use_pallas_r1(cfg, hier.levels[0])
        u, norm_r, norm_f = fmg_solve(op, hier, prob.f, cfg)
        res[kern] = (np.asarray(u), float(norm_r) / float(norm_f))
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0],
                               rtol=1e-10, atol=1e-12)
    assert abs(res["pallas"][1] - res["xla"][1]) < 1e-12


@pytest.mark.parametrize("name", SUITES)
def test_solve_identical_convergence_gsrb2(name):
    """Whole-solve A/B with the fused double-sweep smoother ON: the
    GSRB2 F-cycle must converge identically to the XLA one (all levels,
    rebuild probes, mixed eligible/ineligible-level routing)."""
    from hpgmg_tpu.solve.mg import fmg_solve

    a = 1.0 if name == "27pt" else 0.0
    base_cfg = SolverConfig(op=name, a=a, dtype=jnp.float64)
    prob = init_problem_fv(48, dtype=jnp.float64)
    res = {}
    old, old_v = K1.GSRB2, K1.GSRB2_VAR7_ONLY
    try:
        K1.GSRB2_VAR7_ONLY = False
        for kern in ("pallas", "xla"):
            K1.GSRB2 = kern == "pallas"
            cfg = dataclasses.replace(base_cfg, kernels=kern)
            hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k,
                                   cfg, alpha=prob.alpha)
            op = get_suite(name)
            if kern == "pallas":
                assert hier.levels[0].k2 is not None
            u, norm_r, norm_f = fmg_solve(op, hier, prob.f, cfg)
            res[kern] = (np.asarray(u), float(norm_r) / float(norm_f))
    finally:
        K1.GSRB2, K1.GSRB2_VAR7_ONLY = old, old_v
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0],
                               rtol=1e-10, atol=1e-12)
    assert abs(res["pallas"][1] - res["xla"][1]) < 1e-12


def test_slab_call_matches_xla(setup):
    """r1_call_slab with BC-fill slabs (single_chip_slabs_r1) == the XLA
    path on one whole-domain block — the distributed slab fast path's
    per-shard mechanism (stencils.single_chip_slabs / fv4 analog),
    apply + gsrb modes."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    b_h2inv = cfg.b * lv.h2inv
    var7 = op.name != "27pt"
    suite = "var7" if var7 else "27pt"
    const_a = 0.0 if var7 else cfg.a
    assert K1.tile_shape_slab_r1(48, 48, 48, var7) is not None
    slabs = K1.single_chip_slabs_r1(x, cfg.bc, op.taps_key)
    views = ((lv.kbi, lv.kbj, lv.kbk, lv.kbk_top) if var7
             else (None, None, None, None))
    out = K1.r1_call_slab(x, *slabs, *views, None, None, "apply",
                          b_h2inv, suite, op.taps_key, const_a=const_a)
    ref = op.apply_op(lv, x, xla_cfg(cfg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    mask = rb_mask(lv.dim, 1, x.dtype)
    refg = x + mask * lv.dinv * (prob.f - ref)
    outg = K1.r1_call_slab(x, *slabs, *views, prob.f, lv.kdinv[1],
                           "gsrb", b_h2inv, suite, op.taps_key,
                           const_a=const_a)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(refg),
                               rtol=1e-12, atol=1e-10)


def test_gsrb2_matches_two_half_sweeps(setup):
    """r1_gsrb2_pallas (fused red+black double sweep, one launch) == two
    XLA half-sweeps — the GSRB2 fast path's correctness oracle (same
    identical-convergence discipline as operators.test.c)."""
    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    assert lv.k2 is not None  # GSRB2-eligible at 48^3
    cfgx = xla_cfg(cfg)

    def half(x, s):
        ax = op.apply_op(lv, x, cfgx)
        mask = rb_mask(lv.dim, s, x.dtype)
        return x + mask * lv.dinv * (prob.f - ax)

    ref = half(half(x, 0), 1)
    rhse = K1.pad_rhs_gsrb2(prob.f)
    out = K1.r1_gsrb2_pallas(lv, x, rhse, cfg, op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_gsrb2_helmholtz_matches_xla():
    """GSRB2 with the Helmholtz a*alpha*x term (alpha rides as a padded
    k2 operand)."""
    cfg = SolverConfig(op="fv7pt", a=0.9, b=1.0, helmholtz=True,
                       dtype=jnp.float64, kernels="pallas")
    prob = init_problem_fv(48, dtype=jnp.float64)
    old = K1.GSRB2
    K1.GSRB2 = True
    try:
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
    finally:
        K1.GSRB2 = old
    lv = hier.levels[0]
    op = get_suite("fv7pt")
    assert lv.k2 is not None and lv.k2[1] is not None
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    cfgx = xla_cfg(cfg)

    def half(x, s):
        ax = op.apply_op(lv, x, cfgx)
        mask = rb_mask(lv.dim, s, x.dtype)
        return x + mask * lv.dinv * (prob.f - ax)

    ref = half(half(x, 0), 1)
    out = K1.r1_gsrb2_pallas(lv, x, K1.pad_rhs_gsrb2(prob.f), cfg,
                             op.taps_key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_gsrb2_smoother_wiring(setup):
    """The gsrb smoother routes through the double-sweep kernel when
    GSRB2 is on (k2 attached, even half-sweep count) and matches the
    XLA smoother; flipping the flag falls back to half-sweep launches
    with identical results."""
    from hpgmg_tpu.solve.smoothers import gsrb

    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    cfgp = dataclasses.replace(cfg, kernels="pallas")
    ref = gsrb(op, lv, x, prob.f, xla_cfg(cfg))
    old = K1.GSRB2
    try:
        K1.GSRB2 = True
        out2 = gsrb(op, lv, x, prob.f, cfgp)
        K1.GSRB2 = False
        out1 = gsrb(op, lv, x, prob.f, cfgp)
    finally:
        K1.GSRB2 = old
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-13, atol=1e-13)


def test_slab_call_periodic_matches_xla():
    """Periodic slab mode: wrap slabs + in-kernel k wrap == XLA."""
    name = "fv7pt"
    cfg = SolverConfig(op=name, a=0.0, dtype=jnp.float64,
                       kernels="pallas", bc=BC.PERIODIC)
    prob = init_problem_fv(48, dtype=jnp.float64, periodic=True)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
    lv = hier.levels[0]
    op = get_suite(name)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((48, 48, 48)))
    slabs = K1.single_chip_slabs_r1(x, BC.PERIODIC, op.taps_key)
    out = K1.r1_call_slab(x, *slabs, lv.kbi, lv.kbj, lv.kbk, lv.kbk_top,
                          None, None, "apply", cfg.b * lv.h2inv, "var7",
                          op.taps_key, kperiodic=True)
    ref = op.apply_op(lv, x, xla_cfg(cfg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-10)


def test_fused_restrict_residual_matches_pair(setup):
    """mode='fres' (fused residual+restriction, kernels/restrict.py) ==
    restrict_cell of the XLA residual, for all three radius-1 suites."""
    from hpgmg_tpu.kernels import restrict as R
    from hpgmg_tpu.ops.transfer import restrict_cell

    cfg, prob, hier, op, x = setup
    lv = hier.levels[0]
    pcfg = dataclasses.replace(cfg, kernels="pallas")  # lift the 64 floor
    ref = restrict_cell(prob.f - op.apply_op(lv, x, xla_cfg(cfg)))
    old = R.FUSED_RESTRICT
    R.FUSED_RESTRICT = True
    try:
        out = op.restrict_residual(lv, x, prob.f, pcfg)
    finally:
        R.FUSED_RESTRICT = old
    assert out is not None and out.shape == (24, 24, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    # flag off / xla mode: the fused path declines
    R.FUSED_RESTRICT = False
    try:
        assert op.restrict_residual(lv, x, prob.f, pcfg) is None
    finally:
        R.FUSED_RESTRICT = old
    assert op.restrict_residual(lv, x, prob.f, xla_cfg(cfg)) is None
