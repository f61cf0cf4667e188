"""Operator-suite tests for fv7pt: truncation order, Dinv, solver oracles.

The convergence oracles mirror the reference's embedded verification
(SURVEY.md §4.2): ~1 digit of residual reduction per V-cycle, rtol=1e-10
reached within 20 V-cycles, and a single F-cycle reaching discretization
error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core.config import BC, BottomSolver, Smoother, SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy, level_dims
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.solve.mg import fmg_solve, mg_solve, richardson_error
from hpgmg_tpu.core import blas


def make_cfg(**kw):
    kw.setdefault("op", "fv7pt")
    kw.setdefault("dtype", jnp.float64)
    kw.setdefault("a", 0.0)  # Poisson (hpgmg-fv.c:290)
    return SolverConfig(**kw)


def setup(n, cfg, periodic=False):
    prob = init_problem_p6(n, dtype=cfg.dtype, periodic=periodic,
                           a=cfg.a, b=cfg.b, helmholtz=cfg.helmholtz)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    return prob, hier


class TestLadder:
    def test_level_dims(self):
        assert level_dims(128, 2) == [128, 64, 32, 16, 8, 4, 2]
        assert level_dims(96, 2) == [96, 48, 24, 12, 6, 3]
        assert level_dims(2, 2) == [2]


class TestApplyOp:
    @pytest.mark.parametrize("bc", [BC.DIRICHLET, BC.PERIODIC])
    def test_truncation_order_2(self, bc):
        """||A u_true - f||_max -> O(h^2) away from the boundary: the 7pt
        stencil is 2nd order. (At Dirichlet boundary cells the linear-BC
        ghost makes the *local truncation* O(1) on an O(h) strip — the
        standard cell-centered result; global solution error stays O(h^2),
        which TestFMG checks.)"""
        cfg = make_cfg(bc=bc)
        op = get_suite("fv7pt")
        errs = []
        for n in (16, 32):
            prob, hier = setup(n, cfg, periodic=(bc == BC.PERIODIC))
            r = op.residual(hier.finest, prob.u_true, prob.f, cfg)
            if bc == BC.PERIODIC:
                r = r - blas.mean(r)
            else:
                strip = n // 8  # exclude the boundary strip (fixed fraction)
                r = r[strip:-strip, strip:-strip, strip:-strip]
            errs.append(float(blas.norm(r)))
        order = np.log2(errs[0] / errs[1])
        assert 1.6 < order < 2.8, (errs, order)

    def test_symmetry(self):
        """A is symmetric: dot(Au, v) == dot(u, Av)."""
        cfg = make_cfg()
        op = get_suite("fv7pt")
        _, hier = setup(8, cfg)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((8, 8, 8)))
        v = jnp.asarray(rng.standard_normal((8, 8, 8)))
        au = op.apply_op(hier.finest, u, cfg)
        av = op.apply_op(hier.finest, v, cfg)
        np.testing.assert_allclose(float(blas.dot(au, v)),
                                   float(blas.dot(u, av)), rtol=1e-12)

    def test_dinv_matches_operator_diagonal(self):
        """1/Dinv == A e_ijk at ijk (probe the diagonal directly)."""
        cfg = make_cfg()
        op = get_suite("fv7pt")
        _, hier = setup(4, cfg)
        lv = hier.finest
        for idx in [(0, 0, 0), (1, 2, 3), (3, 3, 3), (0, 2, 2)]:
            e = jnp.zeros((4, 4, 4), jnp.float64).at[idx].set(1.0)
            diag = float(op.apply_op(lv, e, cfg)[idx])
            np.testing.assert_allclose(diag, 1.0 / float(lv.dinv[idx]),
                                       rtol=1e-12, err_msg=str(idx))

    def test_lambda_max_bounds_spectrum(self):
        """Gershgorin bound dominates ||D^{-1}A x|| / ||x|| for random x."""
        cfg = make_cfg()
        op = get_suite("fv7pt")
        _, hier = setup(8, cfg)
        lv = hier.finest
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 8, 8)))
        for _ in range(20):  # power iteration
            y = lv.dinv * op.apply_op(lv, x, cfg)
            x = y / blas.norm2(y)
        rayleigh = float(blas.dot(x, lv.dinv * op.apply_op(lv, x, cfg)))
        assert rayleigh <= float(lv.lambda_max) * (1 + 1e-10)
        assert rayleigh > 0.5 * float(lv.lambda_max)  # bound is not wildly loose


class TestVCycleConvergence:
    @pytest.mark.parametrize("smoother", [Smoother.GSRB, Smoother.CHEBYSHEV,
                                          Smoother.JACOBI, Smoother.L1JACOBI,
                                          Smoother.SYMGS])
    def test_vcycle_reaches_rtol(self, smoother):
        cfg = make_cfg(smoother=smoother)
        prob, hier = setup(16, cfg)
        u, history = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
        assert history[-1] < 1e-10, history
        assert len(history) <= 15, history

    def test_gsrb_one_digit_per_cycle(self):
        """~1 digit of residual reduction per V-cycle (reference README)."""
        cfg = make_cfg()
        prob, hier = setup(16, cfg)
        _, history = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
        # average reduction factor per cycle over the first 8 cycles
        hist = history[:8]
        factors = [hist[i + 1] / hist[i] for i in range(len(hist) - 1)]
        assert np.mean(factors) < 0.2, history

    def test_periodic_poisson(self):
        """Periodic pure Poisson: the discrete mean of the analytic F is
        O(h^2) nonzero, which makes the problem inconsistent (the reference
        warns about exactly this, hpgmg-fv.c:296-302) — project it out to
        get a solvable system, then V-cycles must reach rtol."""
        cfg = make_cfg(bc=BC.PERIODIC)
        prob, hier = setup(16, cfg, periodic=True)
        from hpgmg_tpu.core import blas as _blas

        f = prob.f - _blas.mean(prob.f)
        u, history = mg_solve(get_suite("fv7pt"), hier, f, cfg)
        assert history[-1] < 1e-9, history

    @pytest.mark.parametrize("bottom", [BottomSolver.CG, BottomSolver.SMOOTH])
    def test_bottom_solvers(self, bottom):
        cfg = make_cfg(bottom=bottom)
        prob, hier = setup(16, cfg)
        _, history = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
        assert history[-1] < 1e-10, history


class TestFMG:
    def test_fcycle_reaches_discretization_error(self):
        """One F-cycle -> solution error at discretization level; the error
        vs the analytic solution converges at order ~2 (problem.p6 is
        pointwise 2nd-order for the 7pt stencil)."""
        cfg = make_cfg()
        op = get_suite("fv7pt")
        errs = {}
        for n in (16, 32):
            prob, hier = setup(n, cfg)
            u, norm_r, norm_f = jax.jit(
                lambda hier, f: fmg_solve(op, hier, f, cfg))(hier, prob.f)
            errs[n] = float(blas.norm(u - prob.u_true))
            assert float(norm_r) / float(norm_f) < 0.05
        order = np.log2(errs[16] / errs[32])
        assert 1.6 < order < 2.6, (errs, order)

    def test_fcycle_then_vcycles_match_mgsolve_error(self):
        """V-cycles after the F-cycle improve r but not e (t220-fmg.sh
        headline property)."""
        cfg = make_cfg(post_f_vcycles=2)
        op = get_suite("fv7pt")
        prob, hier = setup(16, cfg)
        u, norm_r, norm_f = fmg_solve(op, hier, prob.f, cfg)
        e_fmg = float(blas.norm(u - prob.u_true))
        u2, history = mg_solve(op, hier, prob.f, cfg)
        e_mg = float(blas.norm(u2 - prob.u_true))
        assert e_fmg < 2.0 * e_mg + 1e-12, (e_fmg, e_mg)

    def test_richardson_order(self):
        """Richardson analysis across h/2h/4h solves gives order ~2
        (mg.c:1113-1131; richardson_error)."""
        cfg = make_cfg()
        op = get_suite("fv7pt")
        sols = []
        for n in (64, 32, 16):
            prob, hier = setup(n, cfg)
            u, _, _ = fmg_solve(op, hier, prob.f, cfg)
            sols.append(u)
        _, order = richardson_error(op, *sols)
        assert 1.5 < float(order) < 2.6, float(order)
