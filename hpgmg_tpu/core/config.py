"""Runtime solver configuration.

The reference FV code selects smoother / bottom solver / cycle type at
*compile* time via ``configure`` defines (reference: hpgmgconf.py:36-43,
118-131); the FE code uses a runtime PETSc options database. Following
SURVEY.md §5 ("the TPU build should follow the FE style"), everything here
is one frozen runtime config object. It is hashable so it can be a static
argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp


class BC(enum.Enum):
    """Boundary condition (reference: level.h:24-25 — Dirichlet/periodic only)."""

    DIRICHLET = "dirichlet"  # homogeneous Dirichlet (u = 0 on the physical boundary)
    PERIODIC = "periodic"


class Smoother(enum.Enum):
    GSRB = "gsrb"  # red-black Gauss-Seidel, the GSRB_FP masked variant (gsrb.c:78-87)
    CHEBYSHEV = "chebyshev"  # degree-4 polynomial (chebyshev.c:8-100)
    JACOBI = "jacobi"  # weighted omega=2/3 (jacobi.c:8-65)
    L1JACOBI = "l1jacobi"  # L1-weighted Jacobi (operators.test/l1jacobi.c)
    SYMGS = "symgs"  # symmetric red-black GS (operators.test/symgs.c)


class BottomSolver(enum.Enum):
    BICGSTAB = "bicgstab"  # Saad Alg 7.7 w/ diagonal preconditioning (bicgstab.c)
    CG = "cg"  # solvers/cg.c
    CABICGSTAB = "cabicgstab"  # s-step communication-avoiding (cabicgstab.c)
    CACG = "cacg"  # s-step CG (cacg.c)
    SMOOTH = "smooth"  # smooth until converged (solvers.c fallback)
    # TPU-native addition: the coarsest grid is tiny (<= MAX_COARSE_DIM^3 =
    # 1331 unknowns, hpgmg-fv.c:181) and replicated on every chip, so a
    # dense inverse precomputed at MGBuild time turns the latency-bound
    # Krylov while_loop into ONE small MXU matvec. It is also an *exact*
    # bottom solve (better than the reference's 1e-3 reduction).
    DIRECT = "direct"


class CycleType(enum.Enum):
    """--fv-cycle choices (hpgmgconf.py:36-43). The reference's legacy
    "U" (truncated V-cycle, mg.c:878-893) is expressed here by raising
    ``min_coarse_dim`` — a V-cycle on a truncated ladder IS the U-cycle,
    so it needs no third enum value."""

    V = "V"
    F = "F"


# Number of GSRB smooths per pre/post smooth application: "RBRB" means
# NUM_SMOOTHS=2 -> 4 half-sweeps (reference: operators.7pt.c:257).
_DEFAULT_NUM_SMOOTHS = {
    Smoother.GSRB: 2,
    Smoother.CHEBYSHEV: 1,
    Smoother.JACOBI: 6,
    Smoother.L1JACOBI: 8,
    Smoother.SYMGS: 2,
}


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static configuration of one multigrid solve.

    a, b: Helmholtz coefficients of ``a*alpha*u - b*div(beta grad u) = f``.
        The reference benchmark runs with a=1, b=1 but the Poisson build
        drops the ``a*alpha`` term entirely (operators.7pt.c:63-75); we use
        ``helmholtz`` to select that behavior at trace time.
    """

    op: str = "fv4"  # operator suite name: fv7pt | fv2 | fv4 | 27pt
    bc: BC = BC.DIRICHLET
    helmholtz: bool = False  # False => pure Poisson (alpha term dropped)
    a: float = 1.0
    b: float = 1.0

    smoother: Smoother = Smoother.GSRB
    # None => the operator suite's reference default (e.g. GSRB is
    # NUM_SMOOTHS=2 for 7pt but 3 for fv2/fv4 — operators.*.c smoother wiring)
    num_smooths: Optional[int] = None
    chebyshev_degree: Optional[int] = None  # None => suite default (4 or 6)

    bottom: BottomSolver = BottomSolver.DIRECT
    bottom_rtol: float = 1e-3  # MG_DEFAULT_BOTTOM_NORM (mg.h:18-19)
    bottom_max_iters: int = 200  # jMax in bicgstab.c:26
    cabicgstab_telescoping: bool = True  # s=1,2,4 telescoping (cabicgstab.c:50-54)

    cycle: CycleType = CycleType.F
    max_vcycles: int = 20  # MGSolve cap (mg.c:1176)
    post_f_vcycles: int = 0  # F-cycle does no trailing V-cycles by default (mg.c:1246)
    rtol: float = 1e-10  # MGSolve/FMGSolve convergence target (hpgmg-fv.c)

    min_coarse_dim: int = 2  # coarsen while dims even and > this
    kernels: str = "auto"  # "auto" | "xla" | "pallas" (see kernels/stencils.py)
    dtype: jnp.dtype = dataclasses.field(default=jnp.float32)
    # dtype used for dot/mean accumulation; max-norms are dtype-exact anyway.
    reduce_dtype: Optional[jnp.dtype] = None

    def resolved_num_smooths(self, suite=None) -> int:
        if self.num_smooths is not None:
            return self.num_smooths
        if suite is not None and self.smoother == Smoother.GSRB:
            return getattr(suite, "gsrb_num_smooths",
                           _DEFAULT_NUM_SMOOTHS[self.smoother])
        return _DEFAULT_NUM_SMOOTHS[self.smoother]

    def resolved_chebyshev_degree(self, suite=None) -> int:
        if self.chebyshev_degree is not None:
            return self.chebyshev_degree
        return getattr(suite, "chebyshev_degree", 4) if suite is not None else 4

    def __post_init__(self):
        # normalize dtypes so the dataclass hashes/compares consistently
        object.__setattr__(self, "dtype", jnp.dtype(self.dtype))
        if self.reduce_dtype is not None:
            object.__setattr__(self, "reduce_dtype", jnp.dtype(self.reduce_dtype))

    def __hash__(self):
        return hash((self.op, self.bc, self.helmholtz, self.a, self.b,
                     self.smoother, self.num_smooths, self.chebyshev_degree,
                     self.bottom, self.bottom_rtol, self.bottom_max_iters,
                     self.cycle, self.max_vcycles, self.post_f_vcycles,
                     self.rtol, self.min_coarse_dim, self.kernels,
                     str(self.dtype), str(self.reduce_dtype),
                     self.cabicgstab_telescoping))
