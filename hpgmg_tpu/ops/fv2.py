"""2nd-order volume-averaged operator suite (reference operators.fv2.c).

Same 7-point variable-coefficient flux stencil as fv7pt
(operators.fv2.c:55-92) but with:

* quadratic volume-averaged Dirichlet BCs (apply_BCs_v2)
* black-box Dinv rebuild with 2 colors/dim (operators.fv2.c:122)
* v2 interpolation for both V- and F-cycles (operators.fv2.c:155-156)
* GSRB NUM_SMOOTHS=3 (operators.fv2.c:132)
* the cell-averaged sine problem (problem.fv.c)
"""

from __future__ import annotations

import jax

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.ops import base
from hpgmg_tpu.ops.bc_fv import ghost_fill_fv
from hpgmg_tpu.ops.fv7pt import beta_laplacian
from hpgmg_tpu.ops.rebuild import rebuild_blackbox


@base.register("fv2")
class FV2(base.RadiusOneKernelMixin, base.OperatorSuite):
    name = "fv2"
    radius = 1
    interpolation_vcycle = "v2"
    interpolation_fcycle = "v2"
    bc_order = 2
    gsrb_num_smooths = 3
    chebyshev_degree = 6  # operators.fv2.c:136
    taps_key = "v2"

    def apply_op(self, level: Level, x: jax.Array, cfg: SolverConfig) -> jax.Array:
        out = self.r1_fast_apply(level, x, cfg)
        if out is not None:
            return out
        xg = ghost_fill_fv(x, cfg.bc, order=2, radius=1)
        ax = -cfg.b * level.h2inv * beta_laplacian(level, xg)
        if cfg.helmholtz:
            ax = cfg.a * level.alpha * x + ax
        return ax

    def rebuild_operator(self, level: Level, cfg: SolverConfig) -> Level:
        # attach the kernel views BEFORE the probe loop so the colored
        # probes run through the kernel on eligible levels
        lv = self._attach_r1_views(level, cfg)
        return self._attach_r1_kdinv(rebuild_blackbox(self, lv, cfg,
                                                      colors=2), cfg)
