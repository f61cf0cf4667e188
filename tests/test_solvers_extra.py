"""MGPCG, FMGSolve2, and CA-Krylov bottom-solver tests."""

import jax.numpy as jnp
import pytest

from hpgmg_tpu.core.config import BottomSolver, SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.solve.mg import fmg_solve2, mg_solve, mgpcg


def setup(n=16, **kw):
    kw.setdefault("op", "fv7pt")
    kw.setdefault("dtype", jnp.float64)
    kw.setdefault("a", 0.0)
    cfg = SolverConfig(**kw)
    prob = init_problem_p6(n, dtype=cfg.dtype, a=0.0)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    return cfg, prob, hier


class TestMGPCG:
    def test_converges(self):
        """MG-preconditioned CG reaches rtol in few iterations
        (mg.c:1500-1607; typically faster than plain V-cycles)."""
        cfg, prob, hier = setup(16)
        op = get_suite(cfg.op)
        x, history = mgpcg(op, hier, prob.f, cfg)
        assert history[-1] < 1e-10, history
        assert len(history) <= 12, history


class TestFMGSolve2:
    def test_iterated_fcycles_converge(self):
        """Residual-correction F-cycles: each F-cycle multiplies the
        residual down; reaches rtol in a handful of cycles."""
        cfg, prob, hier = setup(16)
        op = get_suite(cfg.op)
        u, history = fmg_solve2(op, hier, prob.f, cfg)
        assert history[-1] < 1e-10, history
        assert len(history) <= 10, history  # ~x25 reduction per F-cycle


class TestCAKrylov:
    @pytest.mark.parametrize("bottom", [BottomSolver.CABICGSTAB,
                                        BottomSolver.CACG])
    def test_bottom_converges(self, bottom):
        """s-step bottom solvers drive full MGSolve to rtol like the
        classical ones (cabicgstab.c/cacg.c)."""
        cfg, prob, hier = setup(16, bottom=bottom)
        op = get_suite(cfg.op)
        u, history = mg_solve(op, hier, prob.f, cfg)
        assert history[-1] < 1e-10, history

    def test_telescoping_matches_fixed_s(self):
        """Telescoping (s=1,2,4...) and fixed s=4 solve equally well."""
        import numpy as np

        cfg1, prob, hier = setup(16, bottom=BottomSolver.CABICGSTAB,
                                 cabicgstab_telescoping=True)
        cfg2 = SolverConfig(op="fv7pt", dtype=jnp.float64, a=0.0,
                            bottom=BottomSolver.CABICGSTAB,
                            cabicgstab_telescoping=False)
        op = get_suite("fv7pt")
        u1, h1 = mg_solve(op, hier, prob.f, cfg1)
        u2, h2 = mg_solve(op, hier, prob.f, cfg2)
        assert h1[-1] < 1e-10 and h2[-1] < 1e-10, (h1, h2)
