from hpgmg_tpu.core.config import BC, Smoother, BottomSolver, CycleType, SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.core.hierarchy import Hierarchy, build_hierarchy

__all__ = [
    "BC",
    "Smoother",
    "BottomSolver",
    "CycleType",
    "SolverConfig",
    "Level",
    "Hierarchy",
    "build_hierarchy",
]
