"""Fused coarse-ladder (tail) V-cycle kernels vs the unfused path.

Interpreter-mode parity on CPU (the pattern of test_pallas_kernels.py);
the on-chip whole-solve check is bench/ladder_sweep --tail A/B.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import hpgmg_tpu.kernels.stencils as K
import hpgmg_tpu.kernels.tail as T
from hpgmg_tpu.core.config import BC, BottomSolver, SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.fv import init_problem_fv
from hpgmg_tpu.solve.mg import fmg_solve, vcycle


@pytest.fixture(autouse=True)
def interpret_mode():
    K.INTERPRET = True
    old = T.TAIL_FUSE
    T.TAIL_FUSE = True   # default OFF until the on-chip A/B; tests force it
    yield
    K.INTERPRET = False
    T.TAIL_FUSE = old


def _setup(n, dtype=jnp.float64, **kw):
    kw.setdefault("a", 0.0)
    cfg = SolverConfig(op="fv4", b=1.0, dtype=dtype,
                       bottom=BottomSolver.DIRECT, **kw)
    prob = init_problem_fv(n, dtype=dtype)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    return cfg, prob, hier


def test_gating():
    cfg, prob, hier = _setup(32)
    op = get_suite("fv4")
    levels = hier.levels
    assert T.use_tail(op, cfg, levels, 0)          # 32-rooted subtree
    # the fusible span covers exactly the dims >= 8; deeper levels (4, 2)
    # recurse unfused below it
    assert T.tail_span(levels, 0) == 3, [lv.dim for lv in levels]
    assert all(lv.kdinv is not None for lv in levels[:3])
    # oversize root: only the sub-ladder qualifies
    cfg2, _, hier2 = _setup(64)
    assert not T.use_tail(op, cfg2, hier2.levels, 0)
    assert T.use_tail(op, cfg2, hier2.levels, 1)
    # non-fv4 / periodic / xla-forced: no
    assert not T.use_tail(get_suite("fv7pt"), cfg, levels, 0)
    assert not T.use_tail(op, dataclasses.replace(cfg, bc=BC.PERIODIC),
                          levels, 0)
    assert not T.use_tail(op, dataclasses.replace(cfg, kernels="xla"),
                          levels, 0)


def test_tail_vcycle_parity():
    """One fused V-cycle == the unfused V-cycle (same smooths, transfers,
    bottom) to fp-reassociation tolerance, from a nonzero iterate."""
    cfg, prob, hier = _setup(32)
    op = get_suite("fv4")
    levels = hier.levels
    rng = np.random.default_rng(3)
    e0 = jnp.asarray(rng.standard_normal((32, 32, 32)))
    rhs = prob.f

    assert T.use_tail(op, cfg, levels, 0)
    fused = T.tail_vcycle(op, levels, 0, e0, rhs, cfg)

    old = T.TAIL_FUSE
    T.TAIL_FUSE = False
    try:
        plain = vcycle(op, levels, 0, e0, rhs, cfg)
    finally:
        T.TAIL_FUSE = old
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-11, atol=1e-11)


def test_fcycle_with_tail_converges():
    """Full F-cycle with the fused tail under a 64^3 root reaches the
    same discretization-error residual as the unfused solve."""
    cfg, prob, hier = _setup(64)
    op = get_suite("fv4")
    u1, nr1, nf1 = fmg_solve(op, hier, prob.f, cfg)
    old = T.TAIL_FUSE
    T.TAIL_FUSE = False
    try:
        u2, nr2, nf2 = fmg_solve(op, hier, prob.f, cfg)
    finally:
        T.TAIL_FUSE = old
    rel1 = float(nr1) / float(nf1)
    rel2 = float(nr2) / float(nf2)
    # one F-cycle reaches discretization error (~7.2e-5 at 64^3; the r4
    # on-chip f32 run measured 7.43e-5 — docs/FLOOR128_r04.md batch d)
    assert rel1 < 1e-4, rel1
    assert abs(rel1 - rel2) < 0.1 * rel2, (rel1, rel2)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-9, atol=1e-10)


def test_tail_helmholtz_parity():
    """The alpha operand rides the tail kernels too (operators.fv4.c:87)."""
    cfg, prob, hier = _setup(32, a=1.0, helmholtz=True)
    op = get_suite("fv4")
    levels = hier.levels
    assert T.use_tail(op, cfg, levels, 0)
    rng = np.random.default_rng(5)
    e0 = jnp.asarray(rng.standard_normal((32, 32, 32)))
    fused = T.tail_vcycle(op, levels, 0, e0, prob.f, cfg)
    old = T.TAIL_FUSE
    T.TAIL_FUSE = False
    try:
        plain = vcycle(op, levels, 0, e0, prob.f, cfg)
    finally:
        T.TAIL_FUSE = old
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=1e-11, atol=1e-11)


def test_one_launch_matches_split():
    """TAIL_ONE_LAUNCH (descent + in-kernel DIRECT bottom + climb in ONE
    kernel, tail_v_call) == the split down/XLA-bottom/up path, and the
    full F-cycle converges identically (solvers.c DIRECT +
    mg.c:1135-1164 in one launch)."""
    cfg, prob, hier = _setup(32, min_coarse_dim=8)
    op = get_suite("fv4")
    levels = hier.levels
    assert levels[-1].dim == 8 and levels[-1].bottom_ainv is not None
    assert T.tail_span(levels, 0) == 2, [lv.dim for lv in levels]
    rng = np.random.default_rng(7)
    e0 = jnp.asarray(rng.standard_normal((32, 32, 32)))
    split = T.tail_vcycle(op, levels, 0, e0, prob.f, cfg)
    old = T.TAIL_ONE_LAUNCH
    T.TAIL_ONE_LAUNCH = True
    try:
        one = T.tail_vcycle(op, levels, 0, e0, prob.f, cfg)
        u1, nr1, nf1 = fmg_solve(op, hier, prob.f, cfg)
    finally:
        T.TAIL_ONE_LAUNCH = old
    np.testing.assert_allclose(np.asarray(one), np.asarray(split),
                               rtol=1e-11, atol=1e-11)
    u2, nr2, nf2 = fmg_solve(op, hier, prob.f, cfg)
    rel1, rel2 = float(nr1) / float(nf1), float(nr2) / float(nf2)
    # the truncated [32,16,8] ladder's one-F-cycle floor is ~1e-3 (fewer
    # V levels than the full ladder); the check that matters is that the
    # one-launch and split paths land on the SAME floor and iterate
    assert rel1 < 2e-3, rel1
    assert abs(rel1 - rel2) < 0.1 * rel2, (rel1, rel2)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-9, atol=1e-10)
