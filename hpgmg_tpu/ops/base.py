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

from hpgmg_tpu.core.config import SolverConfig
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
