"""Level-wide BLAS1 and reductions (reference: operators/misc.c).

The reference reduces across OpenMP blocks then MPI_Allreduce on the
level's subcommunicator (misc.c:239-287). Here reductions are plain jnp
reductions over the global array: on a sharded array XLA lowers them to
on-chip partial reduction + one ICI all-reduce — the subcommunicator
machinery is subsumed by the array's sharding.

Note ``norm`` is the **max** norm, matching misc.c:287.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def dot(u, v, reduce_dtype: Optional[jnp.dtype] = None):
    acc = reduce_dtype or u.dtype
    return jnp.sum((u * v).astype(acc)).astype(u.dtype)


def norm(u):
    """Max norm (misc.c:287 reduces with MPI_MAX)."""
    return jnp.max(jnp.abs(u))


def norm2(u, reduce_dtype: Optional[jnp.dtype] = None):
    return jnp.sqrt(dot(u, u, reduce_dtype))


def mean(u, reduce_dtype: Optional[jnp.dtype] = None):
    acc = reduce_dtype or u.dtype
    return (jnp.sum(u.astype(acc)) / u.size).astype(u.dtype)
