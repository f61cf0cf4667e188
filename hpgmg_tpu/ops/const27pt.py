"""4th-order constant-coefficient dense 27-point suite (operators.27pt.c).

A(u) = a*u - b*h2inv * (sum of 27 neighbors weighted {-128, 14, 3, 1}/30
for {center, face, edge, corner}) (operators.27pt.c:48-92). Cell-centered
quadratic BCs (apply_BCs_p2), p2 interpolation both cycles, black-box
rebuild with 2 colors, GSRB NUM_SMOOTHS=2, problem.p6. The beta arrays are
carried but unused (constant coefficient).
"""

from __future__ import annotations

import jax

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.ops import base
from hpgmg_tpu.ops.bc import ghost_fill_quadratic_fd
from hpgmg_tpu.ops.rebuild import rebuild_blackbox

C0 = -128.0 / 30.0
C1 = 14.0 / 30.0
C2 = 3.0 / 30.0
C3 = 1.0 / 30.0


@base.register("27pt")
class Const27pt(base.RadiusOneKernelMixin, base.OperatorSuite):
    name = "27pt"
    radius = 1
    interpolation_vcycle = "p2"
    interpolation_fcycle = "p2"
    bc_order = 2
    gsrb_num_smooths = 2
    chebyshev_degree = 4
    taps_key = "27pt"
    r1_var7 = False

    def apply_op(self, level: Level, x: jax.Array, cfg: SolverConfig) -> jax.Array:
        out = self.r1_fast_apply(level, x, cfg)
        if out is not None:
            return out
        n = level.dim
        xg = ghost_fill_quadratic_fd(x, cfg.bc, radius=1)

        def sh(di, dj, dk):
            return xg[1 + di:1 + di + n, 1 + dj:1 + dj + n, 1 + dk:1 + dk + n]

        face = edge = corner = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    m = abs(di) + abs(dj) + abs(dk)
                    if m == 0:
                        continue
                    t = sh(di, dj, dk)
                    if m == 1:
                        face = t if face is None else face + t
                    elif m == 2:
                        edge = t if edge is None else edge + t
                    else:
                        corner = t if corner is None else corner + t

        lap = C0 * x + C1 * face + C2 * edge + C3 * corner
        return cfg.a * x - cfg.b * level.h2inv * lap

    def rebuild_operator(self, level: Level, cfg: SolverConfig) -> Level:
        # mark the level for the kernel BEFORE the probe loop (the dense
        # 27pt body reads no coefficient operands, so the "views" are
        # just the kernel_suite marker)
        lv = self._attach_r1_views(level, cfg)
        return self._attach_r1_kdinv(rebuild_blackbox(self, lv, cfg,
                                                      colors=2), cfg)
