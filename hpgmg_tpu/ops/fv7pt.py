"""2nd-order variable-coefficient 7-point operator suite.

Rebuild of the reference ``operators.7pt.c``:

* stencil: A(u) = a*alpha*u - b * div(beta grad u) discretized with a
  7-point variable-coefficient flux stencil, radius 1
  (operators.7pt.c:49-89); the Poisson build drops the alpha term.
* rebuild_operator: analytic Dinv / L1inv / Gershgorin dominant-eigenvalue
  bound with boundary-validity factors folding the linear Dirichlet BC
  into the diagonal (operators.7pt.c:95-252).
* transfers: piecewise-constant V-cycle interpolation, trilinear F-cycle
  interpolation (operators.7pt.c:280-281).

TPU notes: the stencil is expressed as shifted slices of a ghost-padded
array; XLA fuses the 6 flux terms into one VPU pass, and on a sharded
array the pad/slice pattern becomes an ICI halo exchange inserted by the
SPMD partitioner.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.ops import base
from hpgmg_tpu.ops.bc import ghost_fill_linear


def beta_laplacian(level: Level, xg: jax.Array) -> jax.Array:
    """Sum of the six variable-coefficient flux differences.

    ``xg`` is the solution padded by one ghost layer; ``beta_*`` are
    face arrays (beta_i: (n+1, n, n), entry [i] = low-i face of cell i).
    """
    c = xg[1:-1, 1:-1, 1:-1]
    bi, bj, bk = level.beta_i, level.beta_j, level.beta_k
    return (
        bi[1:, :, :] * (xg[2:, 1:-1, 1:-1] - c)
        + bi[:-1, :, :] * (xg[:-2, 1:-1, 1:-1] - c)
        + bj[:, 1:, :] * (xg[1:-1, 2:, 1:-1] - c)
        + bj[:, :-1, :] * (xg[1:-1, :-2, 1:-1] - c)
        + bk[:, :, 1:] * (xg[1:-1, 1:-1, 2:] - c)
        + bk[:, :, :-1] * (xg[1:-1, 1:-1, :-2] - c)
    )


def _valid_masks(n: int, bc: BC, dtype):
    """Per-axis low/high neighbor-validity factors (operators.7pt.c:158-172).

    For Dirichlet, a neighbor outside the domain is "invalid": the linear
    BC ghost equals minus the interior value, which folds into the diagonal
    as a factor (valid - 2).
    """
    if bc == BC.PERIODIC:
        one = jnp.ones((n,), dtype)
        return one, one
    idx = jnp.arange(n)
    lo = (idx > 0).astype(dtype)
    hi = (idx < n - 1).astype(dtype)
    return lo, hi


@base.register("fv7pt")
class FV7pt(base.RadiusOneKernelMixin, base.OperatorSuite):
    name = "fv7pt"
    radius = 1
    interpolation_vcycle = "p0"
    interpolation_fcycle = "p1"
    bc_order = 1
    taps_key = "p1"

    def apply_op(self, level: Level, x: jax.Array, cfg: SolverConfig) -> jax.Array:
        out = self.r1_fast_apply(level, x, cfg)
        if out is not None:
            return out
        xg = ghost_fill_linear(x, cfg.bc, radius=1)
        ax = -cfg.b * level.h2inv * beta_laplacian(level, xg)
        if cfg.helmholtz:
            ax = cfg.a * level.alpha * x + ax
        return ax

    def rebuild_operator(self, level: Level, cfg: SolverConfig) -> Level:
        n = level.dim
        dtype = level.beta_i.dtype
        vlo_i, vhi_i = _valid_masks(n, cfg.bc, dtype)
        vlo = [m.reshape([-1 if a == ax else 1 for ax in range(3)])
               for a, m in ((0, vlo_i), (1, vlo_i), (2, vlo_i))]
        vhi = [m.reshape([-1 if a == ax else 1 for ax in range(3)])
               for a, m in ((0, vhi_i), (1, vhi_i), (2, vhi_i))]

        bi_lo, bi_hi = level.beta_i[:-1], level.beta_i[1:]
        bj_lo, bj_hi = level.beta_j[:, :-1], level.beta_j[:, 1:]
        bk_lo, bk_hi = level.beta_k[:, :, :-1], level.beta_k[:, :, 1:]

        bh2 = cfg.b * level.h2inv
        # diagonal: each face term contributes -beta*(valid - 2) * b*h2inv
        aii = -bh2 * (
            bi_lo * (vlo[0] - 2.0) + bi_hi * (vhi[0] - 2.0)
            + bj_lo * (vlo[1] - 2.0) + bj_hi * (vhi[1] - 2.0)
            + bk_lo * (vlo[2] - 2.0) + bk_hi * (vhi[2] - 2.0)
        )
        if cfg.helmholtz:
            aii = aii + cfg.a * level.alpha

        # Gershgorin radius: sum of |off-diagonal| entries
        sum_abs = jnp.abs(jnp.asarray(bh2, dtype)) * (
            jnp.abs(bi_lo * vlo[0]) + jnp.abs(bi_hi * vhi[0])
            + jnp.abs(bj_lo * vlo[1]) + jnp.abs(bj_hi * vhi[1])
            + jnp.abs(bk_lo * vlo[2]) + jnp.abs(bk_hi * vhi[2])
        )

        dinv = 1.0 / aii
        lam = jnp.max((aii + sum_abs) / aii)
        # Baker et al. eq 6.5 switch (operators.7pt.c:221-224)
        l1inv = jnp.where(aii >= 1.5 * sum_abs, 1.0 / aii, 1.0 / (aii + 0.5 * sum_abs))
        lv = dataclasses.replace(level, dinv=dinv, l1inv=l1inv, lambda_max=lam)
        return self._attach_r1_kdinv(self._attach_r1_views(lv, cfg), cfg)
