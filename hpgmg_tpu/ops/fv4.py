"""4th-order variable-coefficient operator suite (reference operators.fv4.c)
— the official HPGMG-500 benchmark operator.

A(u) = -b * div(beta grad u) discretized to 4th order on cell averages
(operators.fv4.c:87-114): per face a 4-wide high-order flux
``beta_f * (15*(u_n - u_c) - (u_nn - u_opp)) / 12`` plus 12
mixed-derivative correction terms ``(dbeta_tangential) * (cross second
difference) / 48`` that need the face coefficients at tangential
neighbors. Radius 2; quartic volume-averaged BCs (apply_BCs_v4);
black-box Dinv rebuild with 4 colors/dim (operators.fv4.c:169);
v2 interpolation for V-cycles, v4 for F-cycles (operators.fv4.c:204-205);
GSRB NUM_SMOOTHS=3, Chebyshev degree 6.

Representation notes (TPU): ``rebuild_operator`` stores the face
coefficients *tangentially extended by one ghost layer*
(beta_i: (n+1, n+2, n+2)) — the extrapolate_betas analog
(boundary_fv.c:573-681) done once per level so the hot stencil reads no
out-of-bounds coefficients. The solution ghosts are materialized per
apply via the separable quartic extension in ops/bc_fv.py.
"""

from __future__ import annotations

import dataclasses

import jax

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level
from hpgmg_tpu.ops import base
from hpgmg_tpu.ops.bc_fv import extend_beta_tangential, ghost_fill_fv
from hpgmg_tpu.ops.rebuild import rebuild_blackbox

TWELFTH = 1.0 / 12.0


def _shift(xg, di, dj, dk, n):
    """Interior-sized view of xg (padded by 2) shifted by (di, dj, dk)."""
    return xg[2 + di:2 + di + n, 2 + dj:2 + dj + n, 2 + dk:2 + dk + n]


def _tang(axis, t):
    """Offsets for the face accessors: the two tangential axes in ascending
    axis order."""
    others = [ax for ax in range(3) if ax != axis]
    off = [0, 0]
    off[others.index(t)] = 1
    return off


def stencil_ax(sh, bi, bj, bk):
    """The fv4 stencil combination (operators.fv4.c:87-114) in terms of
    accessor callables, shared verbatim between the XLA slicing path and
    the Pallas VMEM-tile kernel (kernels/stencils.py):

    * ``sh(di, dj, dk)``: solution shifted view (cell-sized)
    * ``bi(f, dj=0, dk=0)`` etc: face coefficient views, f in {0 (low),
      1 (high)}, with tangential shifts

    Returns TWELFTH*main + 0.25*TWELFTH*mixed (caller applies -b*h2inv).
    """
    c = sh(0, 0, 0)
    main = (
        bi(0) * (15.0 * (sh(-1, 0, 0) - c) - (sh(-2, 0, 0) - sh(+1, 0, 0)))
        + bi(1) * (15.0 * (sh(+1, 0, 0) - c) - (sh(+2, 0, 0) - sh(-1, 0, 0)))
        + bj(0) * (15.0 * (sh(0, -1, 0) - c) - (sh(0, -2, 0) - sh(0, +1, 0)))
        + bj(1) * (15.0 * (sh(0, +1, 0) - c) - (sh(0, +2, 0) - sh(0, -1, 0)))
        + bk(0) * (15.0 * (sh(0, 0, -1) - c) - (sh(0, 0, -2) - sh(0, 0, +1)))
        + bk(1) * (15.0 * (sh(0, 0, +1) - c) - (sh(0, 0, +2) - sh(0, 0, -1)))
    )

    def cross(face_fn, axis, f, t):
        s = 2 * f - 1
        ea = [0, 0, 0]
        ea[axis] = s
        et = [0, 0, 0]
        et[t] = 1
        off = _tang(axis, t)
        dbeta = face_fn(f, *off) - face_fn(f, *[-v for v in off])
        return dbeta * (
            sh(ea[0] + et[0], ea[1] + et[1], ea[2] + et[2])
            - sh(*et)
            - sh(ea[0] - et[0], ea[1] - et[1], ea[2] - et[2])
            + sh(-et[0], -et[1], -et[2])
        )

    mixed = 0.0
    for axis, face_fn in ((0, bi), (1, bj), (2, bk)):
        for f in (0, 1):
            for t in [ax for ax in range(3) if ax != axis]:
                mixed = mixed + cross(face_fn, axis, f, t)

    return TWELFTH * main + 0.25 * TWELFTH * mixed


@base.register("fv4")
class FV4(base.OperatorSuite):
    name = "fv4"
    radius = 2
    interpolation_vcycle = "v2"
    interpolation_fcycle = "v4"
    bc_order = 4
    gsrb_num_smooths = 3
    chebyshev_degree = 6

    def apply_op(self, level: Level, x: jax.Array, cfg: SolverConfig) -> jax.Array:
        from hpgmg_tpu.kernels.stencils import fv4_apply_pallas, use_pallas
        from hpgmg_tpu.parallel.mesh import get_active_mesh
        from hpgmg_tpu.parallel.shard_kernels import (fv4_sharded,
                                                      use_pallas_sharded)

        if use_pallas_sharded(cfg, level):
            return fv4_sharded(get_active_mesh(), level, x, None, cfg,
                               "apply")
        if use_pallas(cfg, level, x):
            return fv4_apply_pallas(level, x, cfg)

        n = level.dim
        xg = ghost_fill_fv(x, cfg.bc, order=4, radius=2)

        def sh(di=0, dj=0, dk=0):
            return _shift(xg, di, dj, dk, n)

        # face-coefficient views; level.beta_* are tangentially extended by
        # one ghost (see rebuild_operator), so [1:...] on tangential axes is
        # the domain core and the +-1 shifts stay in bounds.
        bie = level.beta_i  # (n+1, n+2, n+2)
        bje = level.beta_j  # (n+2, n+1, n+2)
        bke = level.beta_k  # (n+2, n+2, n+1)

        def bi(f, dj=0, dk=0):  # f in {0 (low), 1 (high)} relative face
            return bie[f:f + n, 1 + dj:1 + dj + n, 1 + dk:1 + dk + n]

        def bj(f, di=0, dk=0):
            return bje[1 + di:1 + di + n, f:f + n, 1 + dk:1 + dk + n]

        def bk(f, di=0, dj=0):
            return bke[1 + di:1 + di + n, 1 + dj:1 + dj + n, f:f + n]

        ax_out = -cfg.b * level.h2inv * stencil_ax(sh, bi, bj, bk)
        if cfg.helmholtz:
            ax_out = cfg.a * level.alpha * sh() + ax_out
        return ax_out

    def kernel_active(self, cfg: SolverConfig, level: Level) -> bool:
        from hpgmg_tpu.kernels.stencils import use_pallas
        from hpgmg_tpu.parallel.shard_kernels import use_pallas_sharded

        return use_pallas(cfg, level) or use_pallas_sharded(cfg, level)

    def gsrb_sweep(self, level: Level, x, rhs, cfg: SolverConfig,
                   nsweeps: int):
        """Fused GSRB half-sweeps via the Pallas kernel (unrolled so the
        red/black parity is static per kernel — two compiled variants).
        On mesh-sharded levels each half-sweep is an exchange-then-kernel
        shard_map region (gsrb.c:24-41's per-sweep exchange_boundary)."""
        from hpgmg_tpu.kernels.stencils import (fv4_gsrb_sweep_pallas,
                                                use_pallas)
        from hpgmg_tpu.parallel.mesh import get_active_mesh
        from hpgmg_tpu.parallel.shard_kernels import (fv4_sharded,
                                                      use_pallas_sharded)

        if use_pallas_sharded(cfg, level):
            mesh = get_active_mesh()
            for s in range(nsweeps):
                x = fv4_sharded(mesh, level, x, rhs, cfg, "gsrb", s & 1)
            return x
        if not use_pallas(cfg, level, x):
            return NotImplemented
        import hpgmg_tpu.kernels.stencils as K

        if (K.GSRB2_FV4 and getattr(level, "k2", None) is not None
                and nsweeps % 2 == 0
                and not (cfg.bc == BC.PERIODIC or K.SINGLE_EXT)):
            # fused red+black double sweeps: one launch + one operand
            # stream per FULL sweep; rhs padded once per smooth call
            rhse = K.pad_rhs_gsrb2_fv4(rhs)
            for _ in range(nsweeps // 2):
                x = K.fv4_gsrb2_pallas(level, x, rhse, cfg)
            return x
        for s in range(nsweeps):
            x = fv4_gsrb_sweep_pallas(level, x, rhs, cfg, s & 1)
        return x

    def restrict_residual(self, level: Level, x, rhs, cfg: SolverConfig):
        """Fused residual+restriction through the masked Dirichlet kernel
        (mode='fres'); None routes the caller to the separate phases
        (sharded levels, periodic/ext mode, XLA path)."""
        import hpgmg_tpu.kernels.restrict as R
        import hpgmg_tpu.kernels.stencils as K

        if not R.FUSED_RESTRICT or level.dim > R.FUSED_RESTRICT_MAX_DIM:
            return None
        if cfg.bc == BC.PERIODIC or K.SINGLE_EXT or K.SUBTILE:
            return None
        if not K.use_pallas(cfg, level, x):
            return None
        return K.fv4_restrict_residual_pallas(level, x, rhs, cfg)

    def residual(self, level: Level, x, rhs, cfg: SolverConfig):
        from hpgmg_tpu.kernels.stencils import (fv4_residual_pallas,
                                                use_pallas)
        from hpgmg_tpu.parallel.mesh import get_active_mesh
        from hpgmg_tpu.parallel.shard_kernels import (fv4_sharded,
                                                      use_pallas_sharded)

        if use_pallas_sharded(cfg, level):
            return fv4_sharded(get_active_mesh(), level, x, rhs, cfg,
                               "residual")
        if use_pallas(cfg, level, x):
            return fv4_residual_pallas(level, x, rhs, cfg)
        return rhs - self.apply_op(level, x, cfg)

    def rebuild_operator(self, level: Level, cfg: SolverConfig) -> Level:
        from hpgmg_tpu.kernels.stencils import (kernel_beta_views,
                                                kernel_views_eligible)

        # extend betas tangentially once per level (extrapolate_betas analog)
        lv = dataclasses.replace(
            level,
            beta_i=extend_beta_tangential(level.beta_i, 0, cfg.bc),
            beta_j=extend_beta_tangential(level.beta_j, 1, cfg.bc),
            beta_k=extend_beta_tangential(level.beta_k, 2, cfg.bc),
        )
        # Attach the lane-aligned Pallas coefficient views BEFORE the
        # blackbox probes so the probe applies run through the kernel on
        # eligible levels (the fori_loop body traces ONE kernel call). The
        # XLA apply at 512^3 materializes ~25 shifted copies of the
        # ghost-extended array (~13.7 GB of temporaries — measured: the
        # standalone XLA apply compile needs 15.81G of 15.75G HBM), which
        # both OOMs the build at 512 and leaves the device unable to
        # launch Mosaic kernels afterwards.
        if kernel_views_eligible(cfg, level.dim):
            from hpgmg_tpu.kernels import stencils

            kbi, kbj, kbk, kbk_top = kernel_beta_views(
                lv.beta_i, lv.beta_j, lv.beta_k)
            lv = dataclasses.replace(lv, kbi=kbi, kbj=kbj, kbk=kbk,
                                     kbk_top=kbk_top)
            if stencils.prediff_active(level.dim):
                lv = dataclasses.replace(
                    lv, kgd=stencils.kernel_beta_prediff(
                        lv.beta_i, lv.beta_j, lv.beta_k))
        lv = rebuild_blackbox(self, lv, cfg, colors=4)
        from hpgmg_tpu.kernels import tail as _tail

        if lv.kbi is not None or (
                _tail._TAIL_MIN_DIM <= lv.dim <= _tail.TAIL_MAX_DIM):
            from hpgmg_tpu.core.level import rb_mask

            # GSRB parity masks folded into dinv (the GSRB_FP plane,
            # gsrb.c:78-87, moved to build time). Small levels get the
            # pair too — the fused tail V-cycle kernels (kernels/tail.py)
            # read it even where the tiled kernel views don't attach.
            kdinv = tuple(rb_mask(lv.dim, p, lv.dinv.dtype) * lv.dinv
                          for p in (0, 1))
            lv = dataclasses.replace(lv, kdinv=kdinv)
        if lv.kbi is not None:
            from hpgmg_tpu.kernels import stencils

            # fused double-sweep ring operands (GSRB2_FV4): only the
            # red-parity dinv (and alpha) need padded ring copies — the
            # beta rings ride the i-padded kbi/kbj/kbk views above
            if stencils.gsrb2_fv4_eligible(cfg, lv.dim):
                lv = dataclasses.replace(lv, k2=stencils.fv4_gsrb2_views(
                    kdinv[0], lv.alpha if cfg.helmholtz else None))

            # smoother-only bf16 coefficient copies (BF16C; masked
            # Dirichlet single-chip mode — the ext/periodic/sharded
            # paths keep f32 operands)
            if (cfg.bc == BC.DIRICHLET
                    and stencils.bf16c_active(lv.dim, lv.dinv.dtype)):
                lv = dataclasses.replace(lv, kb16=stencils.kernel_views_bf16(
                    lv.kbi, lv.kbj, lv.kbk, lv.kbk_top, kdinv, lv.kgd))
        return lv
