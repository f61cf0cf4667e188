"""Explicit shard_map halo exchange vs the functional ghost fill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

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


@requires_8dev
def test_explicit_apply_matches_implicit():
    """The explicit (shard_map+ppermute) 7pt apply equals the same stencil
    computed on the global array with implicit GSPMD halos."""
    from hpgmg_tpu.parallel.halo import apply_poisson7_explicit

    mesh = make_mesh()
    n = 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, n, n)))
    h2inv = float(n * n)

    def ref(xg):
        g = jnp.pad(xg, 1, mode="wrap")
        c = g[1:-1, 1:-1, 1:-1]
        neigh = (g[:-2, 1:-1, 1:-1] + g[2:, 1:-1, 1:-1]
                 + g[1:-1, :-2, 1:-1] + g[1:-1, 2:, 1:-1]
                 + g[1:-1, 1:-1, :-2] + g[1:-1, 1:-1, 2:])
        return -h2inv * (neigh - 6.0 * c)

    want = jax.jit(ref)(x)
    x_s = jax.device_put(x, NamedSharding(mesh, P("x", "y", "z")))
    got = jax.jit(lambda x: apply_poisson7_explicit(mesh, x, h2inv,
                                                    BC.PERIODIC))(x_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@requires_8dev
def test_explicit_jacobi_smoother_converges():
    """Explicit-communication Jacobi reduces the residual of the periodic
    constant-coefficient Poisson problem (a smoother built entirely on
    the hand-scheduled halo path)."""
    from hpgmg_tpu.parallel.halo import (apply_poisson7_explicit,
                                         jacobi_sweeps_explicit)

    mesh = make_mesh()
    n = 16
    h2inv = float(n * n)
    k = 2.0 * jnp.pi
    idx = (jnp.arange(n) + 0.5) / n
    u_true = (jnp.sin(k * idx)[:, None, None]
              * jnp.sin(k * idx)[None, :, None]
              * jnp.sin(k * idx)[None, None, :])
    sharding = NamedSharding(mesh, P("x", "y", "z"))
    u_true = jax.device_put(u_true, sharding)
    rhs = jax.jit(lambda u: apply_poisson7_explicit(mesh, u, h2inv))(u_true)
    x0 = jax.device_put(jnp.zeros((n, n, n)), sharding)

    def rnorm(x):
        r = rhs - apply_poisson7_explicit(mesh, x, h2inv)
        return jnp.sqrt(jnp.sum(r * r))

    x = jax.jit(lambda x, rhs: jacobi_sweeps_explicit(
        mesh, x, rhs, h2inv, 50))(x0, rhs)
    assert float(jax.jit(rnorm)(x)) < 0.5 * float(jax.jit(rnorm)(x0))
