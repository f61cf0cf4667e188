from hpgmg_tpu.solve.mg import MGSolver, fmg_solve, mg_solve, vcycle
from hpgmg_tpu.solve.smoothers import smooth

__all__ = ["MGSolver", "fmg_solve", "mg_solve", "vcycle", "smooth"]
