"""Helmholtz mode, the sine problem, and fv4 sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core import blas
from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.problems.sine import init_problem_sine
from hpgmg_tpu.solve.mg import fmg_solve, mg_solve

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


class TestHelmholtz:
    def test_fv7pt_helmholtz_converges(self):
        """USE_HELMHOLTZ mode: a=1, b=1 with the alpha term
        (operators.7pt.c:50-62; hpgmg-fv.c:287)."""
        cfg = SolverConfig(op="fv7pt", helmholtz=True, a=1.0, b=1.0,
                           dtype=jnp.float64)
        prob = init_problem_p6(16, dtype=jnp.float64, a=1.0, b=1.0,
                               helmholtz=True)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        u, history = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
        assert history[-1] < 1e-10, history
        # Helmholtz solution error order ~2 vs the pointwise analytic u
        err = float(blas.norm(u - prob.u_true))
        assert err < 5e-4, err


class TestSineProblem:
    def test_fv7pt_sine_solves(self):
        """The sine problem (problem.sine.c): sharper than p6 — needs
        enough resolution; check convergence and error behavior."""
        cfg = SolverConfig(op="fv7pt", a=0.0, dtype=jnp.float64)
        prob = init_problem_sine(32, dtype=jnp.float64)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        u, history = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
        assert history[-1] < 1e-10, history

    def test_error_decreases_with_resolution(self):
        cfg = SolverConfig(op="fv7pt", a=0.0, dtype=jnp.float64)
        errs = []
        for n in (32, 64):
            prob = init_problem_sine(n, dtype=jnp.float64)
            hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k,
                                   cfg, alpha=prob.alpha)
            u, _ = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
            errs.append(float(blas.norm(u - prob.u_true))
                        / float(blas.norm(prob.u_true)))
        assert errs[1] < 0.5 * errs[0], errs


@requires_8dev
class TestFV4Sharded:
    def test_fv4_fcycle_sharded_matches_serial(self):
        """The benchmark operator solves identically on a 2x2x2 mesh
        (t220-style serial==parallel invariant for fv4)."""
        from hpgmg_tpu.parallel.mesh import (active_mesh, make_mesh,
                                             shard_array, shard_hierarchy)
        from hpgmg_tpu.problems.fv import init_problem_fv

        cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64)
        prob = init_problem_fv(32, dtype=jnp.float64)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        op = get_suite("fv4")
        u_ser, r_ser, _ = jax.jit(
            lambda h, f: fmg_solve(op, h, f, cfg))(hier, prob.f)

        mesh = make_mesh()
        hier_s = shard_hierarchy(mesh, hier)
        f_s = shard_array(mesh, prob.f)
        with active_mesh(mesh):
            u_par, r_par, _ = jax.jit(
                lambda h, f: fmg_solve(op, h, f, cfg))(hier_s, f_s)
        np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(float(r_par), float(r_ser), rtol=1e-9)


class TestP4Problem:
    def test_p4_fields_and_order(self):
        """problem.p4.c: quartic manufactured solution; the 7pt solve error
        converges at ~2nd order, and the TEST_ERROR driver mode
        (hpgmg-fv.c:317-348) reports it."""
        from hpgmg_tpu.bench.driver import run_test_error
        from hpgmg_tpu.problems.p4 import init_problem_p4

        prob = init_problem_p4(16, dtype=jnp.float64)
        assert prob.beta_i.shape == (17, 16, 16)
        # u vanishes on the Dirichlet boundary: X(0)=X(1)=0
        assert float(jnp.abs(prob.u_true[0]).max()) < 4e-3  # cell centers
        cfg = SolverConfig(op="fv7pt", a=0.0, dtype=jnp.float64)
        rows = run_test_error(32, cfg, problem="p4", levels=2,
                              verbose=False)
        (n1, e1, _), (n2, e2, _) = rows
        assert (n1, n2) == (32, 16)
        order = float(np.log2(e2 / e1))
        assert 1.4 < order < 2.6, rows

    def test_p4_periodic_zero_mean(self):
        """Periodic shift -1/30 makes the rhs integrate to ~0
        (problem.p4.c:44-47 rationale)."""
        from hpgmg_tpu.problems.p4 import init_problem_p4

        prob = init_problem_p4(16, dtype=jnp.float64, periodic=True)
        assert abs(float(prob.f.mean())) < 2e-3
