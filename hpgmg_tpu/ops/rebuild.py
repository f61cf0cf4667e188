"""Operator-agnostic ("black box") rebuild of Dinv / L1inv / lambda_max.

Rebuild of ``operators/rebuild.c:47-209``: probe the operator (including
its boundary conditions) with colors^3 coloring vectors; the diagonal is
recovered from the probe's response at its own support, and the Gershgorin
row sum from the response elsewhere. colors must exceed the coupling
distance (4 for the fv4 stencil + quartic BCs, 2 for fv2 — rebuild.c:43-45)
so each row sees at most one probe point per color.

The reference flags this as unoptimized setup code (rebuild.c:46); here the
whole colors^3 probe loop traces into one XLA program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level


def color_vector(n: int, colors: int, ic, jc, kc, dtype):
    """1.0 where ((i+ic)%colors, (j+jc)%colors, (k+kc)%colors) == 0
    (misc.c:441-472). The color offsets may be traced scalars."""
    def axis_mask(c, axis):
        idx = jnp.arange(n)
        m = ((idx + c) % colors == 0).astype(dtype)
        shape = [1, 1, 1]
        shape[axis] = n
        return m.reshape(shape)

    return (axis_mask(ic, 0) * axis_mask(jc, 1) * axis_mask(kc, 2))


def rebuild_blackbox(op, level: Level, cfg: SolverConfig,
                     colors: int) -> Level:
    n = level.dim
    colors = min(colors, n)
    dtype = level.beta_i.dtype

    # one fori_loop iteration per color probe: keeps the traced graph at a
    # single apply_op instead of colors^3 unrolled copies (compile time)
    def body(c, carry):
        aii, sum_abs = carry
        ic = c % colors
        jc = (c // colors) % colors
        kc = c // (colors * colors)
        x = color_vector(n, colors, ic, jc, kc, dtype)
        ax = op.apply_op(level, x, cfg)
        return (aii + x * ax, sum_abs + jnp.abs((1.0 - x) * ax))

    aii, sum_abs = jax.lax.fori_loop(
        0, colors ** 3,
        body,
        (jnp.zeros(level.shape, dtype), jnp.zeros(level.shape, dtype)),
    )

    # failure guard (rebuild.c:164-167)
    fallback = cfg.a + cfg.b * level.h2inv
    aii = jnp.where(aii == 0.0, fallback, aii)

    lam = jnp.max((aii + sum_abs) / aii)
    l1inv = jnp.where(aii >= 1.5 * sum_abs, 1.0 / aii,
                      1.0 / (aii + 0.5 * sum_abs))
    return dataclasses.replace(level, dinv=1.0 / aii, l1inv=l1inv,
                               lambda_max=lam)
