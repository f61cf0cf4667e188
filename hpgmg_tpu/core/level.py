"""Level representation.

The reference decomposes each level into equal-size boxes with ghost zones,
distributed over MPI ranks (level.h:97-200, level.c:1075-1258). On TPU the
whole level is ONE dense global array per field, sharded over the device
mesh by XLA/GSPMD; ghost zones are never stored — they are materialized
functionally (pad/slice inside the traced program), and the SPMD
partitioner turns them into halo collectives. Box lists, blockCopy
mini-programs (level.h:65-93) and the red-black FP mask plane
(level.c:1213-1241) all disappear into the compiler.

Face-centered coefficients are stored as true face arrays: ``beta_i`` has
shape ``(n+1, n, n)`` — entry ``[i,j,k]`` is the low-i face of cell
``(i,j,k)`` — matching the reference's cell-indexed-with-high-face layout
(problem.fv.c / problem.p6.c initialize ``0..dim`` inclusive).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Level:
    """One grid level: static geometry + operator coefficient fields.

    Solution/rhs/residual vectors are NOT stored here — the solver is
    functional and threads them through as values. This mirrors splitting
    the reference's ``level_type`` vector table (defines.h) into coefficient
    state (set up once by ``rebuild_operator``) and per-solve temporaries.
    """

    # -- static metadata (not traced) --
    dim: int = dataclasses.field(metadata=dict(static=True))
    h: float = dataclasses.field(metadata=dict(static=True))
    depth: int = dataclasses.field(metadata=dict(static=True))  # 0 = finest

    # -- coefficient fields (traced pytree leaves) --
    beta_i: jax.Array  # (n+1, n, n) face-centered coefficient, i-faces
    beta_j: jax.Array  # (n, n+1, n)
    beta_k: jax.Array  # (n, n, n+1)
    alpha: Optional[jax.Array] = None  # (n, n, n); None for pure Poisson
    dinv: Optional[jax.Array] = None  # (n, n, n) 1/diag(A)
    l1inv: Optional[jax.Array] = None  # (n, n, n) L1-Jacobi weights
    # scalar: Gershgorin bound on the dominant eigenvalue of D^{-1}A
    # (operators.7pt.c:220, rebuild.c Gershgorin probes)
    lambda_max: Optional[jax.Array] = None
    # (dim^3, dim^3) dense (pseudo)inverse of the bottom operator for the
    # DIRECT bottom solver; None on non-bottom levels
    bottom_ainv: Optional[jax.Array] = None
    # lane-aligned kernel-layout views of the face coefficients (trailing
    # dim exactly n — see kernels/stencils.py:kernel_beta_views); populated
    # by rebuild_operator on levels eligible for the Pallas path
    kbi: Optional[jax.Array] = None  # (n+1, n+2, n)
    kbj: Optional[jax.Array] = None  # (n+2, n+1, n)
    kbk: Optional[jax.Array] = None  # (n+2, n+2, n) low k-faces
    kbk_top: Optional[jax.Array] = None  # (n+2, n+2, 1) top face plane
    # (red, black) dinv with the GSRB parity mask pre-folded in (zeros at
    # non-updated cells) — the GSRB_FP mask plane (level.c:1213-1241)
    # moved to build time
    kdinv: Optional[tuple] = None
    # sweep-invariant mixed-flux operands: the 6 tangential central
    # differences of the face coefficients (+ 2 k-top planes), with the
    # 0.25 mixed-flux factor folded in, in kernel layout — recomputing
    # them every half-sweep is pure VPU op count, the binding constraint
    # (docs/GSRB_VPU.md). Built by kernel_beta_prediff when
    # kernels/stencils.py:PREDIFF is on; ordered
    # (dij, dik, dji, djk, dki, dkj, dki_top, dkj_top).
    kgd: Optional[tuple] = None
    # pre-padded operand views for the fused red+black double-sweep
    # kernels: one exact halo ring baked in at build time so every
    # tile's window is offset-exact (no alignment blends). Ordered
    # (k2d0, k2alpha, k2bi, k2bj, k2bk, k2bk_top). Radius-1 suites
    # (kernels/stencils_r1.py GSRB2, kernel_suite set): +1 ring, beta
    # entries None for 27pt. fv4 (kernels/stencils.py GSRB2_FV4,
    # kernel_suite None): +2 ring for kdinv0/alpha only — the beta
    # rings ride the i-padded kbi/kbj/kbk views, so the last four
    # entries are None. k2alpha is None unless Helmholtz.
    k2: Optional[tuple] = None
    # SMOOTHER-ONLY bf16 copies of the fv4 GSRB coefficient operands
    # (kernels/stencils.py BF16C): the kernel is HBM-bound at 512^3 and
    # the coefficient streams are ~55% of its traffic; apply/residual
    # keep the f32 views (they set the discretization accuracy — the
    # smoother is approximate by construction). Ordered
    # (kbi, kbj, kbk, kbk_top, kdinv0, kdinv1[, kgd x8]), j-padded to
    # n+16 for the bf16 sublane granularity (16).
    kb16: Optional[tuple] = None
    # static: the kernel views above are PER-SHARD stacked views built by
    # shard_hierarchy for the distributed fast path
    # (parallel/shard_kernels.py) rather than single-chip global views
    ksharded: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # static: which kernel family the k* views above are laid out for —
    # None = the fv4 layouts of kernels/stencils.py (historical default);
    # "var7"/"27pt" = the radius-1 layouts of kernels/stencils_r1.py.
    # Keeps the radius-1 gates from misreading fv4-layout views.
    kernel_suite: Optional[str] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def shape(self):
        return (self.dim, self.dim, self.dim)

    @property
    def dtype(self):
        """Solve dtype, robust to slimmed levels (slim_hierarchy may drop
        beta_*/dinv on levels served entirely by the Pallas kernels)."""
        for f in (self.beta_i, self.dinv, self.kbi):
            if f is not None:
                return f.dtype
        return self.kdinv[0].dtype

    @property
    def h2inv(self) -> float:
        return 1.0 / (self.h * self.h)

    @property
    def ncells(self) -> int:
        return self.dim ** 3

    def with_operator_data(self, dinv, l1inv, lambda_max) -> "Level":
        return dataclasses.replace(self, dinv=dinv, l1inv=l1inv, lambda_max=lambda_max)


def rb_mask(n: int, sweep_parity, dtype) -> jax.Array:
    """Red-black mask: 1.0 where the cell is updated on this half-sweep.

    The reference precomputes a 1.0/0.0 FP plane (GSRB_FP, gsrb.c:78-87,
    level.c:1213-1241) because CPUs can't vectorize the branch; on TPU we
    regenerate it with iota (pure VPU work, no HBM traffic). A cell (i,j,k)
    is updated on sweep s iff (i+j+k) % 2 == s % 2 (gsrb.c:55,113 with
    box.low = 0 in global coordinates).

    ``sweep_parity`` may be a Python int or a traced scalar.
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    parity = (ii + jj + kk) & 1
    return (parity == (sweep_parity & 1)).astype(dtype)
