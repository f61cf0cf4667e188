"""Golden convergence tables (the reference's test_expect_stdout analog).

The FE sharness suite diffs exact stdout blocks (hpgmg-sharness.sh:28-46);
floating-point tables are not bitwise stable across XLA versions
(SURVEY.md §7 hard part #7), so these assert the recorded values to a
relative tolerance instead. Any numerical regression in the operators,
smoothers, transfers or cycles moves these digits.

Values recorded on CPU/float64 (jax 0.9.0).
"""

import jax.numpy as jnp
import numpy as np

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.fe.fas import (build_fe_levels, diagnostics, fas_fcycle,
                              fas_vcycle)
from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.op import get_fe_op
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.solve.mg import fmg_solve, mg_solve

RTOL = 2e-3  # tolerant to XLA reduction-order changes, tight enough to
# catch any real numerical change

GOLDEN_FV7PT16_HISTORY = [
    1.894273e-01, 3.593257e-03, 1.532264e-04, 1.708253e-05, 1.374602e-06,
    1.184548e-07, 9.985593e-09, 8.446429e-10, 7.131994e-11,
]
GOLDEN_FV7PT16_FCYCLE_REL = 1.731189e-02

# (r_2, e_max, e_L2) after the F-cycle and after one trailing V-cycle
GOLDEN_FE_Q2_M8_F = (1.168401e-03, 1.023855e-02, 7.655858e-03)
GOLDEN_FE_Q2_M8_V1 = (2.944131e-05, 1.021663e-02, 7.789023e-03)


def test_fv7pt_mgsolve_golden_history():
    cfg = SolverConfig(op="fv7pt", a=0.0, dtype=jnp.float64)
    prob = init_problem_p6(16, dtype=jnp.float64, a=0.0)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    _, hist = mg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
    assert len(hist) == len(GOLDEN_FV7PT16_HISTORY), hist
    np.testing.assert_allclose(hist, GOLDEN_FV7PT16_HISTORY, rtol=RTOL)


def test_fv7pt_fcycle_golden():
    cfg = SolverConfig(op="fv7pt", a=0.0, dtype=jnp.float64)
    prob = init_problem_p6(16, dtype=jnp.float64, a=0.0)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    _, nr, nf = fmg_solve(get_suite("fv7pt"), hier, prob.f, cfg)
    np.testing.assert_allclose(float(nr) / float(nf),
                               GOLDEN_FV7PT16_FCYCLE_REL, rtol=RTOL)


def test_fe_q2_golden_table():
    """The t220/t230 analog: F(2,3) then V(2,3) — e stays, r drops ~40x."""
    op = get_fe_op("poisson2")
    g = FEGrid(M=(8, 8, 8), degree=2)
    levels = build_fe_levels(g, op)
    f = op.forcing(levels[0].grid, levels[0].coords, "sine")
    u = fas_fcycle(op, levels, 0, f)
    got_f = [float(x) for x in diagnostics(op, levels[0], f, u, "sine")]
    np.testing.assert_allclose(got_f, GOLDEN_FE_Q2_M8_F, rtol=RTOL)
    u = fas_vcycle(op, levels, 0, f, u)
    got_v = [float(x) for x in diagnostics(op, levels[0], f, u, "sine")]
    np.testing.assert_allclose(got_v, GOLDEN_FE_Q2_M8_V1, rtol=RTOL)
