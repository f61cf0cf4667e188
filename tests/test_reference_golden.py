"""Cross-validation against the reference's OWN expected output tables.

The reference FE test suite asserts exact stdout (test_expect_stdout,
finite-element/test/hpgmg-sharness.sh:28-46). These tests encode the same
expected numbers — from t220-fmg.sh, t230-fmg-poisson2.sh and
t120-poissonksp.sh — and assert the f64 FE path reproduces them, so a
drift from PETSc's math (not just from yesterday's build) fails the suite.
The reference prints 3 significant digits, so rtol 5e-3 is the print
quantization plus a little fp-ordering slack.
"""

import numpy as np
import pytest

from hpgmg_tpu.fe.fas import run_fmg, run_ksp
from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.op import get_fe_op


def _check_table(results, expected):
    got = [(s["rel_e"], s["rel_r"]) for _, s in results]
    for (ge, gr), (ee, er) in zip(got, expected):
        np.testing.assert_allclose(ge, ee, rtol=5e-3)
        np.testing.assert_allclose(gr, er, rtol=5e-3)


class TestT220FMGPoisson1:
    """t220-fmg.sh:8-14: hpgmg-fe fmg -op_type poisson1 -M 8,16,24
    -smooth 3,3 -mg_eig_target 2,0.2 -poisson_solution sine."""

    def test_golden_table(self):
        grid = FEGrid(M=(8, 16, 24), degree=1, L=(8/24, 16/24, 1.0))
        _, _, _, results = run_fmg(
            grid, get_fe_op("poisson1"), solution="sine", pre=3, post=3,
            num_vcycles=2, monitor=False, eig=(0.2, 2.0))
        _check_table(results, [
            (2.26e-02, 3.37e-02),   # F(3,3) 0
            (2.58e-02, 2.05e-03),   # V(3,3) 1
            (2.60e-02, 1.25e-04),   # V(3,3) 2
        ])


class TestT230FMGPoisson2:
    """t230-fmg-poisson2.sh:8-14: hpgmg-fe fmg -op_type poisson2 -M 4,4,6
    -smooth 4,3 (default wave solution, default eig target [0.4, 1.4])."""

    def test_golden_table(self):
        grid = FEGrid(M=(4, 4, 6), degree=2, L=(4/6, 4/6, 1.0))
        _, _, _, results = run_fmg(
            grid, get_fe_op("poisson2"), solution="wave", pre=4, post=3,
            num_vcycles=2, monitor=False)
        _check_table(results, [
            (9.08e-03, 3.35e-04),   # F(4,3) 0
            (9.17e-03, 8.27e-07),   # V(4,3) 1
            (9.17e-03, 5.54e-09),   # V(4,3) 2
        ])


class TestT120PoissonKSP:
    """t120-poissonksp.sh: test-kspsolve -op_type poisson1 -M 8,12,16
    -ksp_type chebyshev -ksp_chebyshev_eigenvalues 0.2,2 -pc_type jacobi -L 1,1,1
    -poisson_solution sine -> 'converged ... iterations 17' and
    '|v-u|_2/|u|_2 = 0.0393766'."""

    def test_ksp_chebyshev_golden(self):
        grid = FEGrid(M=(8, 12, 16), degree=1, L=(1.0, 1.0, 1.0))
        _, its, err = run_ksp(grid, get_fe_op("poisson1"), solution="sine",
                              ksp_type="chebyshev", rtol=1e-5,
                              eig=(0.2, 2.0), monitor=False)
        np.testing.assert_allclose(err, 0.0393766, rtol=1e-4)
        # PETSc counts 17 with the same tolerance; allow one-off from
        # convergence-test ordering
        assert 15 <= its <= 19, its

    def test_ksp_matches_fas_solution(self):
        """The standalone KSP solve and the FAS F-cycle agree on the fine
        grid (cross-check between the two solve paths). Uses the default
        isotropic-element domain L = M/M_max — with L=(1,1,1) the elements
        are 2:1 anisotropic and the fixed [0.4,1.4] Chebyshev interval
        (the reference default, fmg.c:92-93) legitimately diverges, which
        is exactly why the reference defaults L that way (fmg.c:61)."""
        grid = FEGrid(M=(8, 12, 16), degree=1, L=(8 / 16, 12 / 16, 1.0))
        op = get_fe_op("poisson1")
        v, _, _ = run_ksp(grid, op, solution="sine", ksp_type="cg",
                          rtol=1e-10, monitor=False)
        u, _, _, _ = run_fmg(grid, op, solution="sine", pre=3, post=3,
                             num_vcycles=6, monitor=False)
        # both converge to the same discrete solution
        rel = float(np.linalg.norm(np.asarray(u - v))
                    / np.linalg.norm(np.asarray(v)))
        assert rel < 1e-6, rel
