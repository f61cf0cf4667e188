from hpgmg_tpu.problems.p6 import init_problem_p6

__all__ = ["init_problem_p6"]
