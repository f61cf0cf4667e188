"""hpgmg_tpu — a TPU-native full-multigrid (FMG) solver framework.

A from-scratch JAX/XLA/Pallas rebuild of the HPGMG benchmark suite
(reference: hpgmg/hpgmg). Two solver families:

* finite-volume (``hpgmg_tpu.ops`` / ``hpgmg_tpu.solve``): cell-centered
  geometric multigrid for the variable-coefficient Poisson/Helmholtz
  equation, with GSRB/Chebyshev/Jacobi smoothers, V/F/FMG cycles and
  Krylov bottom solvers (metric: DOF/s).
* finite-element (``hpgmg_tpu.fe``): Q1/Q2 FAS full multigrid with
  matrix-free tensor-product element kernels (metrics: MEq/s, GF).

Design stance (see SURVEY.md §7): levels are dense global arrays sharded
over a ``jax.sharding.Mesh``; ghost exchange is XLA-partitioned padding /
``shard_map`` collectives instead of MPI pack/unpack programs; every cycle
is a single traced XLA program.
"""

__version__ = "0.1.0"

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
