"""Multigrid hierarchy construction (MGBuild analog, mg.c:842-1108).

The reference's 6-case coarsening/agglomeration ladder (mg.c:894-952)
decides how boxes migrate onto fewer MPI ranks; on TPU the ladder is just
the list of level dims, and "agglomeration" is a sharding decision made in
``hpgmg_tpu.parallel`` (fine levels sharded over the mesh, coarse levels
replicated). Coefficients are restricted level-to-level exactly like
``rebuild_operator`` (operators.7pt.c:100-107: cell restriction for alpha,
face restriction for the betas), then each suite derives Dinv / L1inv /
lambda_max per level.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    levels: List[Level]

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def finest(self) -> Level:
        return self.levels[0]


def level_dims(fine_dim: int, min_coarse_dim: int) -> List[int]:
    """The coarsening ladder: halve while even and above the floor."""
    dims = [fine_dim]
    while dims[-1] % 2 == 0 and dims[-1] // 2 >= min_coarse_dim:
        dims.append(dims[-1] // 2)
    return dims


def build_hierarchy(beta_i, beta_j, beta_k, cfg: SolverConfig,
                    alpha: Optional[jax.Array] = None,
                    h: Optional[float] = None,
                    jit: bool = True,
                    _defer_direct: bool = False) -> Hierarchy:
    """Build all levels from fine-level coefficients.

    ``beta_*`` are face arrays (beta_i: (n+1, n, n)); ``alpha`` is cell-
    centered (required if cfg.helmholtz). ``h`` defaults to 1/n (unit cube).

    The whole build (coefficient restriction ladder + per-level operator
    rebuild, incl. the colors^3 black-box probes) traces into ONE XLA
    program by default — the MGBuild analog; eager execution would
    dispatch thousands of tiny kernels (rebuild.c:46 flags the same code
    as unoptimized in the reference).
    """
    if jit:
        if h is None:
            h = 1.0 / beta_i.shape[1]

        # XLA's TPU LuDecomposition is F32/C64-only, so the in-program
        # inverse of the DIRECT bottom cannot trace in f64 on TPU
        # (solvers.c:17-88 dispatch analog). Defer it: assemble the dense
        # bottom matrix in-program, invert on the HOST in numpy f64, and
        # device_put the result — MGBuild-time work either way.
        from hpgmg_tpu.core.config import BottomSolver

        defer_direct = (cfg.bottom == BottomSolver.DIRECT
                        and jnp.dtype(beta_i.dtype).itemsize > 4
                        and jax.default_backend() == "tpu")

        def _build(bi, bj, bk, al):
            return build_hierarchy(bi, bj, bk, cfg, alpha=al, h=h, jit=False,
                                   _defer_direct=defer_direct)

        hier = jax.jit(_build)(beta_i, beta_j, beta_k, alpha)
        if defer_direct:
            hier = _attach_host_direct_inverse(hier, cfg)
        return hier
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.ops.transfer import (restrict_cell, restrict_face_i,
                                        restrict_face_j, restrict_face_k)

    op = get_suite(cfg.op)
    n = beta_i.shape[1]
    assert beta_i.shape == (n + 1, n, n), beta_i.shape
    if h is None:
        h = 1.0 / n
    if cfg.helmholtz and alpha is None:
        alpha = jnp.ones((n, n, n), beta_i.dtype)

    dims = level_dims(n, cfg.min_coarse_dim)
    levels: List[Level] = []
    for depth, dim in enumerate(dims):
        if depth > 0:
            beta_i = restrict_face_i(beta_i)
            beta_j = restrict_face_j(beta_j)
            beta_k = restrict_face_k(beta_k)
            if alpha is not None:
                alpha = restrict_cell(alpha)
        lv = Level(dim=dim, h=h * (2 ** depth), depth=depth,
                   beta_i=beta_i, beta_j=beta_j, beta_k=beta_k, alpha=alpha)
        levels.append(op.rebuild_operator(lv, cfg))

    from hpgmg_tpu.core.config import BC, BottomSolver

    if cfg.bottom == BottomSolver.DIRECT:
        # assemble the dense bottom operator column-by-column with identity
        # probes and precompute its (pseudo)inverse — MGBuild-time work that
        # turns every bottom solve into one MXU matvec
        bot = levels[-1]
        m = bot.ncells
        assert m <= 16 ** 3, (
            f"DIRECT bottom solver wants a tiny coarsest grid, got {bot.dim}^3;"
            " lower min_coarse_dim or pick an iterative bottom solver")
        eye = jnp.eye(m, dtype=bot.beta_i.dtype).reshape(m, *bot.shape)
        cols = jax.vmap(lambda e: op.apply_op(bot, e, cfg).ravel())(eye)
        a_mat = cols.T  # apply of e_j forms column j
        if _defer_direct:
            # f64-on-TPU: stash the assembled matrix; the jit=True wrapper
            # inverts it on the host (_attach_host_direct_inverse)
            levels[-1] = dataclasses.replace(bot, bottom_ainv=a_mat)
        else:
            singular = cfg.bc == BC.PERIODIC and not cfg.helmholtz
            ainv = (jnp.linalg.pinv(a_mat) if singular
                    else jnp.linalg.inv(a_mat))
            levels[-1] = dataclasses.replace(bot, bottom_ainv=ainv)
    return Hierarchy(levels=levels)


def _attach_host_direct_inverse(hier: Hierarchy, cfg: SolverConfig):
    """Replace the deferred bottom matrix with its host-computed f64
    inverse (numpy). Keeps `--dtype float64 --bottom direct` working on
    TPU, where in-program LU is f32-only."""
    import numpy as np

    from hpgmg_tpu.core.config import BC

    bot = hier.levels[-1]
    a_np = np.asarray(jax.device_get(bot.bottom_ainv), dtype=np.float64)
    singular = cfg.bc == BC.PERIODIC and not cfg.helmholtz
    ainv_np = np.linalg.pinv(a_np) if singular else np.linalg.inv(a_np)
    ainv = jax.device_put(jnp.asarray(ainv_np, dtype=bot.bottom_ainv.dtype))
    levels = list(hier.levels)
    levels[-1] = dataclasses.replace(bot, bottom_ainv=ainv)
    return Hierarchy(levels=levels)


def slim_hierarchy(hier: Hierarchy, cfg: SolverConfig) -> Hierarchy:
    """Drop per-level fields that the configured solve will never read —
    the HBM audit for large single-chip grids (at 512^3 every retained
    n^3 f32 field costs 512 MB).

    * ``l1inv`` is only read by the L1-Jacobi smoother (smoothers.py).
    * On levels served by the Pallas fv4 kernels (``use_pallas``), the
      XLA-path ghost-extended ``beta_*`` views are dead (the kernels read
      the lane-aligned ``kbi/kbj/kbk`` views), and with the GSRB smoother
      the plain ``dinv`` is dead too (GSRB reads the parity-prefolded
      ``kdinv``; apply/residual read no diagonal).

    The bottom level always keeps ``dinv`` (the Krylov bottom solvers
    precondition with it). Call AFTER build and BEFORE solving; do not
    pass a slimmed hierarchy to ``shard_hierarchy`` (the per-shard kernel
    views are rebuilt from the beta views).
    """
    from hpgmg_tpu.core.config import Smoother
    from hpgmg_tpu.ops.base import get_suite

    from hpgmg_tpu.kernels import tail as _tail

    op = get_suite(cfg.op)
    new_levels = []
    for i, lv in enumerate(hier.levels):
        kw = {}
        if cfg.smoother != Smoother.L1JACOBI:
            kw["l1inv"] = None
        # levels the fused tail V-cycle may cover read the raw beta
        # views and the full kdinv pair in-kernel (kernels/tail.py
        # _level_operands) — keep them even when kernel-active
        tail_level = (_tail.TAIL_FUSE and getattr(op, "name", None) == "fv4"
                      and lv.dim <= _tail.TAIL_MAX_DIM)
        if (op.kernel_active(cfg, lv) and i < len(hier.levels) - 1
                and not tail_level):
            kw.update(beta_i=None, beta_j=None, beta_k=None)
            if cfg.smoother == Smoother.GSRB:
                kw["dinv"] = None
                if getattr(lv, "kb16", None) is not None:
                    # BF16C: GSRB reads the bf16 kdinv copies; the f32
                    # pair is dead (1 GB at 512^3). Requires the masked
                    # mode (stencils.SINGLE_EXT False) the views are
                    # gated to.
                    kw["kdinv"] = None
                elif (getattr(lv, "k2", None) is not None
                      and lv.kernel_suite is None):
                    # fv4 GSRB2: the double sweep reads the padded ring
                    # copy (k2[0]) for red and kdinv[1] for black — the
                    # unpadded kdinv[0] is dead (512 MB at 512^3)
                    kw["kdinv"] = (None, lv.kdinv[1])
        new_levels.append(dataclasses.replace(lv, **kw))
    return Hierarchy(levels=new_levels)
