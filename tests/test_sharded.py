"""Distributed-parity tests on an 8-virtual-device CPU mesh.

The reference's key distributed invariant: identical convergence numbers
serial vs parallel (t220-fmg.sh, t100-poisson.sh assert bitwise-identical
tables for 1 vs 4 ranks). Here: a solve on a 2x2x2 device mesh must match
the single-device solve to tight tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.hierarchy import build_hierarchy
from hpgmg_tpu.ops.base import get_suite
from hpgmg_tpu.parallel.mesh import (active_mesh, level_sharding, make_mesh,
                                     shard_array, shard_hierarchy)
from hpgmg_tpu.problems.p6 import init_problem_p6
from hpgmg_tpu.solve.mg import fmg_solve, mg_solve_fixed


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(n=32, dtype=jnp.float64):
    cfg = SolverConfig(op="fv7pt", a=0.0, dtype=dtype)
    prob = init_problem_p6(n, dtype=dtype, a=0.0)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    return cfg, hier, prob


@requires_8dev
def test_mesh_factorization():
    mesh = make_mesh()
    assert dict(mesh.shape) == {"x": 2, "y": 2, "z": 2}


@requires_8dev
def test_level_sharding_agglomeration():
    """Fine levels sharded, small levels replicated (>= 8 cells/chip)."""
    mesh = make_mesh()
    from jax.sharding import PartitionSpec as P

    assert level_sharding(mesh, 32).spec == P("x", "y", "z")
    assert level_sharding(mesh, 16).spec == P("x", "y", "z")
    assert level_sharding(mesh, 8).spec == P()  # 4 cells/chip < 8 -> replicate
    assert level_sharding(mesh, 2).spec == P()


@requires_8dev
def test_level_sharding_intermediate_stage():
    """The graduated agglomeration ladder (mg.c:894-952's 8:1-then-1-rank
    analog): on an asymmetric mesh, mid-ladder levels drop sharded axes
    ONE AT A TIME (a sub-mesh stage) before going fully replicated —
    not a binary sharded/replicated split. On the 4x2x1 kernel mesh the
    16^3 level keeps the y axis sharded while x (16/4 = 4 < 8 cells)
    agglomerates."""
    from jax.sharding import PartitionSpec as P

    from hpgmg_tpu.parallel.mesh import make_mesh_ij

    mesh = make_mesh_ij()
    assert dict(mesh.shape) == {"x": 4, "y": 2, "z": 1}
    assert level_sharding(mesh, 64).spec == P("x", "y", None)
    assert level_sharding(mesh, 32).spec == P("x", "y", None)
    # intermediate sub-mesh stage: x agglomerated, y still sharded
    assert level_sharding(mesh, 16).spec == P(None, "y", None)
    assert level_sharding(mesh, 8).spec == P()


@requires_8dev
def test_fcycle_sharded_matches_serial():
    cfg, hier, prob = _setup(32)
    op = get_suite(cfg.op)

    u_ser, r_ser, f_ser = jax.jit(
        lambda hier, f: fmg_solve(op, hier, f, cfg))(hier, prob.f)

    mesh = make_mesh()
    hier_s = shard_hierarchy(mesh, hier)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        u_par, r_par, f_par = jax.jit(
            lambda hier, f: fmg_solve(op, hier, f, cfg))(hier_s, f_s)

    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(float(r_par), float(r_ser), rtol=1e-10)


@requires_8dev
def test_vcycles_sharded_match_serial():
    cfg, hier, prob = _setup(32)
    op = get_suite(cfg.op)
    u_ser, rel_ser = jax.jit(
        lambda hier, f: mg_solve_fixed(op, hier, f, cfg, num_cycles=3))(
            hier, prob.f)

    mesh = make_mesh()
    hier_s = shard_hierarchy(mesh, hier)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        u_par, rel_par = jax.jit(
            lambda hier, f: mg_solve_fixed(op, hier, f, cfg, num_cycles=3))(
                hier_s, f_s)

    np.testing.assert_allclose(np.asarray(rel_par), np.asarray(rel_ser),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                               rtol=1e-12, atol=1e-14)


@requires_8dev
def test_fv4_chebyshev_fcycle_sharded_matches_serial():
    """The benchmark operator (fv4, sin^7 problem) + Chebyshev smoother +
    CABiCGStab bottom, sharded == serial — covers the high-order stencil,
    its v2/v4 transfers, and the CA-Krylov Gram reduction on the mesh."""
    from hpgmg_tpu.core.config import BottomSolver, Smoother
    from hpgmg_tpu.problems.fv import init_problem_fv

    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float64,
                       smoother=Smoother.CHEBYSHEV,
                       bottom=BottomSolver.CABICGSTAB)
    prob = init_problem_fv(32, dtype=jnp.float64)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg,
                           alpha=prob.alpha)
    op = get_suite(cfg.op)
    u_ser, r_ser, _ = jax.jit(
        lambda hier, f: fmg_solve(op, hier, f, cfg))(hier, prob.f)

    mesh = make_mesh()
    hier_s = shard_hierarchy(mesh, hier)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        u_par, r_par, _ = jax.jit(
            lambda hier, f: fmg_solve(op, hier, f, cfg))(hier_s, f_s)
    np.testing.assert_allclose(np.asarray(u_par), np.asarray(u_ser),
                               rtol=1e-11, atol=1e-13)


@requires_8dev
def test_mgpcg_sharded_matches_serial():
    from hpgmg_tpu.solve.mg import mgpcg

    cfg, hier, prob = _setup(32)
    op = get_suite(cfg.op)
    _, hist_ser = mgpcg(op, hier, prob.f, cfg, max_iters=4)

    mesh = make_mesh()
    hier_s = shard_hierarchy(mesh, hier)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        _, hist_par = mgpcg(op, hier_s, f_s, cfg, max_iters=4)
    np.testing.assert_allclose(hist_par, hist_ser, rtol=1e-9)


@requires_8dev
def test_graft_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
