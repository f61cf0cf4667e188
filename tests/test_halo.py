"""Explicit shard_map halo exchange vs the functional ghost fill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core.config import BC
from hpgmg_tpu.ops.bc import ghost_fill_periodic
from hpgmg_tpu.parallel.halo import halo_exchange
from hpgmg_tpu.parallel.mesh import make_mesh, shard_array

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@requires_8dev
def test_periodic_halo_matches_functional_fill():
    """Each shard's exchanged block must equal the corresponding window of
    the globally ghost-filled array."""
    mesh = make_mesh()
    n = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n, n)))
    xs = shard_array(mesh, x)

    out = halo_exchange(mesh, xs, radius=1, bc=BC.PERIODIC)
    # out is the concatenation of per-shard extended blocks: global shape
    # (n + 2*shards) per axis with 2 shards/axis
    out_np = np.asarray(out)
    ref = np.asarray(ghost_fill_periodic(x, 1))  # (n+2)^3, ghosts global

    half = n // 2
    for si in range(2):
        for sj in range(2):
            for sk in range(2):
                blk = out_np[si * (half + 2):(si + 1) * (half + 2),
                             sj * (half + 2):(sj + 1) * (half + 2),
                             sk * (half + 2):(sk + 1) * (half + 2)]
                # expected window of x with wrap indexing
                lo_i, lo_j, lo_k = si * half, sj * half, sk * half
                idx_i = [(lo_i - 1 + t) % n for t in range(half + 2)]
                idx_j = [(lo_j - 1 + t) % n for t in range(half + 2)]
                idx_k = [(lo_k - 1 + t) % n for t in range(half + 2)]
                expect = np.asarray(x)[np.ix_(idx_i, idx_j, idx_k)]
                np.testing.assert_allclose(blk, expect, rtol=1e-14,
                                           err_msg=str((si, sj, sk)))


@requires_8dev
def test_dirichlet_halo_zero_at_boundary():
    mesh = make_mesh()
    n = 16
    x = jnp.ones((n, n, n))
    xs = shard_array(mesh, x)
    out = np.asarray(halo_exchange(mesh, xs, radius=1, bc=BC.DIRICHLET))
    # first shard's low-i ghost plane is at global row 0 of the extended
    # layout and must be zero (physical boundary)
    np.testing.assert_allclose(out[0, 1:-1, 1:-1], 0.0)
    # interior shard boundary ghosts carry neighbor data (ones)
    half = n // 2
    np.testing.assert_allclose(out[half + 2, 5, 5], 1.0)
