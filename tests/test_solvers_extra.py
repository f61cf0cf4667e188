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


class TestFMGSolve2DD:
    def test_compensated_breaks_f32_floor(self):
        """fmg_solve2_dd (double-f32 fine iterate) converges well below
        the plain-f32 FMGSolve2 plateau at the same grid — the
        mixed-precision answer to the mg.c:1221 rtol oracle without f64
        kernels (VERDICT r4 missing #3)."""
        from hpgmg_tpu.solve.mg import fmg_solve2_dd

        cfg, prob, hier = setup(32, op="fv4", dtype=jnp.float32, rtol=1e-8)
        op = get_suite(cfg.op)
        _, hist_plain = fmg_solve2(op, hier, prob.f, cfg, max_fcycles=10)
        u_hi, u_lo, hist_dd = fmg_solve2_dd(op, hier, prob.f, cfg,
                                            max_fcycles=10)
        floor_plain = min(hist_plain)
        floor_dd = min(hist_dd)
        assert floor_dd < 1e-6, hist_dd
        assert floor_dd < floor_plain / 5, (hist_plain, hist_dd)
        # u_lo really is a sub-ulp correction of u_hi, not a second iterate
        import numpy as np

        assert float(jnp.max(jnp.abs(u_lo))) < 1e-5 * max(
            float(jnp.max(jnp.abs(u_hi))), 1e-30)
        assert np.isfinite(hist_dd).all()


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

    @pytest.mark.parametrize("bottom", [BottomSolver.CABICGSTAB,
                                        BottomSolver.CACG])
    def test_f32_scaled_basis_no_overflow(self, bottom):
        """In f32 the RAW monomial basis overflows: A^8 at an fv4 bottom
        has ||A||^8 ~ 1e18 and the Gram squares it past f32 max, which
        poisoned the whole F-cycle with NaN (found via the dryrun's
        rel_res=-inf, round 5). The scaled basis (ca_krylov.py module
        docstring) must keep the solve finite and convergent — this is
        the production-dtype path the reference never exercises (it is
        f64-only)."""
        import numpy as np

        from hpgmg_tpu.solve.mg import fmg_solve

        cfg = SolverConfig(op="fv4", a=0.0, b=1.0, dtype=jnp.float32,
                           bottom=bottom, min_coarse_dim=4)
        prob = init_problem_p6(32, dtype=jnp.float32, a=0.0)
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                               alpha=prob.alpha)
        op = get_suite(cfg.op)
        u, nr, nf = fmg_solve(op, hier, prob.f, cfg)
        rel = float(nr) / float(nf)
        assert np.isfinite(rel), rel
        assert rel < 1e-2, rel  # one F-cycle reaches discretization error

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


class TestUCycle:
    def test_truncated_ladder_is_ucycle(self):
        """The reference's legacy U-cycle truncates the ladder instead of
        coarsening to 1^3 (mg.c:878-893); here that is expressed by
        raising min_coarse_dim (config.py CycleType note). Golden check:
        the truncated ladder really is shorter, still contracts the
        residual every V-cycle (~1 digit each), and converges to the same
        solution as the full ladder."""
        import numpy as np
        from hpgmg_tpu.solve.mg import mg_solve

        cfg_full, prob, hier_full = setup(32, bottom=BottomSolver.BICGSTAB)
        cfg_u, _, hier_u = setup(32, bottom=BottomSolver.BICGSTAB,
                                 min_coarse_dim=8)
        assert hier_u.num_levels < hier_full.num_levels
        assert hier_u.levels[-1].dim == 8

        op = get_suite(cfg_full.op)
        u_full, hist_full = mg_solve(op, hier_full, prob.f, cfg_full)
        u_u, hist_u = mg_solve(op, hier_u, prob.f, cfg_u)

        # both reach rtol; the U-cycle does not need more than ~2 extra
        # cycles (the 8^3 bottom is solved exactly enough by BiCGStab)
        assert hist_full[-1] < 1e-10 and hist_u[-1] < 1e-10
        assert len(hist_u) <= len(hist_full) + 2, (hist_u, hist_full)
        # per-cycle contraction ~1 digit on the truncated ladder too
        rates = [hist_u[i + 1] / hist_u[i] for i in range(len(hist_u) - 1)]
        assert max(rates) < 0.25, hist_u
        # same discrete solution (same operator, same rtol)
        np.testing.assert_allclose(np.asarray(u_u), np.asarray(u_full),
                                   rtol=1e-8, atol=1e-9)
