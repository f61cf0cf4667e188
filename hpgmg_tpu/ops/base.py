"""Operator-suite protocol.

The reference compiles exactly one operator suite into the binary
(operators.7pt.c / operators.fv2.c / operators.fv4.c / operators.27pt.c;
wiring in finite-volume/source/local.mk). Each suite provides the stencil,
its radius, the ``rebuild_operator`` that derives Dinv/L1inv/lambda_max
from the coefficients, and the choice of inter-level interpolation for
V- vs F-cycles (operators.h:14-51). Here suites are plain objects selected
at runtime; everything they produce is traced into one XLA program.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax

from hpgmg_tpu.core.config import BC, SolverConfig
from hpgmg_tpu.core.level import Level


class OperatorSuite:
    """Base class; concrete suites override the stencil and rebuild."""

    name: str = "?"
    radius: int = 1
    # names into hpgmg_tpu.ops.transfer interpolation registry
    interpolation_vcycle: str = "p0"
    interpolation_fcycle: str = "p1"
    # BC order used when materializing ghosts for the stencil
    bc_order: int = 1

    def apply_op(self, level: Level, x: jax.Array, cfg: SolverConfig) -> jax.Array:
        """A(x) over the level interior; fills ghosts internally."""
        raise NotImplementedError

    def residual(self, level: Level, x: jax.Array, rhs: jax.Array,
                 cfg: SolverConfig) -> jax.Array:
        """rhs - A(x) (operators/residual.c:9-51)."""
        return rhs - self.apply_op(level, x, cfg)

    def rebuild_operator(self, level: Level, cfg: SolverConfig) -> Level:
        """Compute Dinv, L1inv and the dominant-eigenvalue bound for a level
        whose coefficients (alpha/beta) are already set.

        Returns the level with ``dinv``/``l1inv``/``lambda_max`` populated.
        """
        raise NotImplementedError

    def kernel_active(self, cfg: SolverConfig, level: Level) -> bool:
        """True when this suite's apply/residual/GSRB on ``level`` run
        through a fused Pallas kernel (so the XLA-path ghost-extended
        views are dead weight — see core/hierarchy.py:slim_hierarchy)."""
        return False

    def restrict_residual(self, level: Level, x, rhs, cfg: SolverConfig):
        """Fused restrict(residual(...)) — the V-cycle's back-to-back pair
        (residual.c:9-51 feeding restriction.c:104) — or None when no
        fused fast path serves this level (the caller then runs the two
        phases separately)."""
        return None


class RadiusOneKernelMixin:
    """Shared Pallas fast-path wiring for the radius-1 suites
    (kernels/stencils_r1.py). A suite mixes this in, sets ``taps_key``
    (its Dirichlet ghost formula) and calls ``_attach_r1_views`` /
    ``_attach_r1_kdinv`` from its ``rebuild_operator``; its ``apply_op``
    starts with the ``use_pallas_r1`` gate."""

    taps_key: str = "p1"
    r1_var7: bool = True  # False: the dense 27pt body (no beta operands)

    def kernel_active(self, cfg: SolverConfig, level: Level) -> bool:
        from hpgmg_tpu.kernels.stencils_r1 import use_pallas_r1
        from hpgmg_tpu.parallel.shard_kernels import use_pallas_r1_sharded

        return (use_pallas_r1(cfg, level)
                or use_pallas_r1_sharded(cfg, level))

    def r1_fast_apply(self, level: Level, x, cfg: SolverConfig):
        """Ax through a radius-1 kernel path (single-chip masked/ext or
        distributed shard_map), or None when no fast path serves."""
        from hpgmg_tpu.kernels.stencils_r1 import (r1_apply_pallas,
                                                   use_pallas_r1)
        from hpgmg_tpu.parallel.shard_kernels import (get_mesh_for_level,
                                                      r1_sharded)

        if use_pallas_r1(cfg, level):
            return r1_apply_pallas(level, x, cfg, self.taps_key)
        mesh = get_mesh_for_level(cfg, level)
        if mesh is not None:
            return r1_sharded(mesh, level, x, None, cfg, "apply",
                              self.taps_key)
        return None

    def residual(self, level: Level, x, rhs, cfg: SolverConfig):
        from hpgmg_tpu.kernels.stencils_r1 import (r1_residual_pallas,
                                                   use_pallas_r1)
        from hpgmg_tpu.parallel.shard_kernels import (get_mesh_for_level,
                                                      r1_sharded)

        if use_pallas_r1(cfg, level):
            return r1_residual_pallas(level, x, rhs, cfg, self.taps_key)
        mesh = get_mesh_for_level(cfg, level)
        if mesh is not None:
            return r1_sharded(mesh, level, x, rhs, cfg, "residual",
                              self.taps_key)
        return rhs - self.apply_op(level, x, cfg)

    def restrict_residual(self, level: Level, x, rhs, cfg: SolverConfig):
        """Fused residual+restriction through the masked Dirichlet
        radius-1 kernel (mode='fres'); None routes the caller to the
        separate phases (sharded/periodic/XLA paths)."""
        import hpgmg_tpu.kernels.restrict as R
        from hpgmg_tpu.kernels.stencils_r1 import (
            r1_restrict_residual_pallas, use_pallas_r1)

        if (not R.FUSED_RESTRICT or level.dim > R.FUSED_RESTRICT_MAX_DIM
                or cfg.bc == BC.PERIODIC):
            return None
        if not use_pallas_r1(cfg, level):
            return None
        return r1_restrict_residual_pallas(level, x, rhs, cfg,
                                           self.taps_key)

    def gsrb_sweep(self, level: Level, x, rhs, cfg: SolverConfig,
                   nsweeps: int):
        """Fused GSRB half-sweeps (unrolled: parity is static per launch,
        carried by which pre-masked kdinv field rides along)."""
        from hpgmg_tpu.kernels.stencils_r1 import (r1_gsrb_sweep_pallas,
                                                   use_pallas_r1)
        from hpgmg_tpu.parallel.shard_kernels import (get_mesh_for_level,
                                                      r1_sharded)

        if level.kdinv is None:
            return NotImplemented
        if use_pallas_r1(cfg, level):
            import hpgmg_tpu.kernels.stencils_r1 as _K1

            if (_K1.GSRB2 and level.k2 is not None
                    and nsweeps % 2 == 0):
                # fused red+black double sweeps: one launch + one
                # operand stream per FULL sweep; rhs padded once
                rhse = _K1.pad_rhs_gsrb2(rhs)
                for _ in range(nsweeps // 2):
                    x = _K1.r1_gsrb2_pallas(level, x, rhse, cfg,
                                            self.taps_key)
                return x
            for s in range(nsweeps):
                x = r1_gsrb_sweep_pallas(level, x, rhs, cfg, s & 1,
                                         self.taps_key)
            return x
        mesh = get_mesh_for_level(cfg, level)
        if mesh is not None:
            import hpgmg_tpu.kernels.stencils_r1 as _K1

            if (_K1.GSRB2 and getattr(level, "k2", None) is not None
                    and nsweeps % 2 == 0):
                # distributed fused double sweeps: one 2-deep slab
                # exchange + one launch per FULL sweep; rhs ring
                # exchanged once per smooth call
                from hpgmg_tpu.parallel.shard_kernels import (
                    r1_gsrb2_rhs_sharded, r1_gsrb2_sharded)

                rhs2 = r1_gsrb2_rhs_sharded(mesh, rhs)
                for _ in range(nsweeps // 2):
                    x = r1_gsrb2_sharded(mesh, level, x, rhs2, cfg,
                                         self.taps_key)
                return x
            for s in range(nsweeps):
                x = r1_sharded(mesh, level, x, rhs, cfg, "gsrb",
                               self.taps_key, parity=s & 1)
            return x
        return NotImplemented

    def _attach_r1_views(self, level: Level, cfg: SolverConfig) -> Level:
        """Mark the level for the radius-1 kernels (and attach the
        lane-aligned coefficient views for the variable-beta suites).
        Call BEFORE any black-box probe loop so the probe applies run
        in-kernel on eligible levels (the fv4 512^3 lesson — ops/fv4.py
        rebuild_operator)."""
        import dataclasses

        from hpgmg_tpu.kernels.stencils_r1 import (r1_beta_views,
                                                   r1_views_eligible)

        if not r1_views_eligible(cfg, level.dim, self.r1_var7):
            return level
        if not self.r1_var7:
            return dataclasses.replace(level, kernel_suite="27pt")
        kbi, kbj, kbk, kbk_top = r1_beta_views(
            level.beta_i, level.beta_j, level.beta_k)
        return dataclasses.replace(level, kbi=kbi, kbj=kbj, kbk=kbk,
                                   kbk_top=kbk_top, kernel_suite="var7")

    def _attach_r1_kdinv(self, level: Level,
                         cfg: SolverConfig = None) -> Level:
        """Fold the GSRB parity masks into dinv (GSRB_FP at build time);
        call after the rebuild has populated ``dinv``. With ``cfg`` also
        attaches the pre-padded double-sweep views (``Level.k2``) on
        GSRB2-eligible levels (kernels/stencils_r1.py)."""
        import dataclasses

        from hpgmg_tpu.core.level import rb_mask

        if level.kernel_suite is None or level.dinv is None:
            return level
        kdinv = tuple(rb_mask(level.dim, p, level.dinv.dtype) * level.dinv
                      for p in (0, 1))
        level = dataclasses.replace(level, kdinv=kdinv)
        from hpgmg_tpu.kernels.stencils_r1 import (gsrb2_eligible,
                                                   r1_gsrb2_views)

        if cfg is not None and gsrb2_eligible(cfg, level.dim,
                                              self.r1_var7):
            alpha = level.alpha if (cfg.helmholtz and self.r1_var7) else None
            k2 = r1_gsrb2_views(
                level.beta_i if self.r1_var7 else None,
                level.beta_j, level.beta_k, kdinv[0], alpha)
            level = dataclasses.replace(level, k2=k2)
        return level


_REGISTRY: Dict[str, Callable[[], OperatorSuite]] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


_SUITE_MODULES = {
    "fv7pt": "hpgmg_tpu.ops.fv7pt",
    "fv2": "hpgmg_tpu.ops.fv2",
    "fv4": "hpgmg_tpu.ops.fv4",
    "27pt": "hpgmg_tpu.ops.const27pt",
}


def get_suite(name: str) -> OperatorSuite:
    import importlib

    if name not in _REGISTRY:
        mod = _SUITE_MODULES.get(name)
        if mod is not None:
            importlib.import_module(mod)  # registers itself
    if name not in _REGISTRY:
        raise ValueError(f"unknown operator suite {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]()
