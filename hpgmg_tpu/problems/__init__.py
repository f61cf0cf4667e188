from hpgmg_tpu.problems.p4 import init_problem_p4
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.problems.sine import init_problem_sine

__all__ = ["init_problem_p4", "init_problem_p6", "init_problem_sine"]
