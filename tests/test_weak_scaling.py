"""Distribution-layer overhead tracking on the virtual mesh.

Wall-clock weak scaling on the CI host is meaningless twice over: the 8
virtual devices share ONE physical core (shards execute sequentially,
capping weak-eff at 1/8 by construction) and the box is contended (the
measured serialized efficiency swung 0.93 -> 0.15 between otherwise
identical runs). The committed wall-clock artifact lives in
docs/WEAK_r03.md, measured on a quiet machine; THIS test tracks the
deterministic part: the distributed program's total-FLOP overhead vs the
single-device program — what the distribution layer adds in redundant
work (replicated coarse levels, halo-region recompute). Communication
cost is tracked by the dryrun + sharded-parity tests; speedup needs real
chips.
"""

import jax
import jax.numpy as jnp
import pytest

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _flops(fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost["flops"])


@requires_8dev
def test_distributed_flop_overhead():
    from hpgmg_tpu.core.config import SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.parallel.mesh import (active_mesh, make_mesh, shard_array,
                                         shard_hierarchy)
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.mg import fmg_solve

    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float32)
    op = get_suite(cfg.op)
    prob = init_problem_fv(64, dtype=jnp.float32)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)

    serial = _flops(lambda h, f: fmg_solve(op, h, f, cfg), hier, prob.f)

    mesh = make_mesh()
    hier_s = shard_hierarchy(mesh, hier, cfg)
    f_s = shard_array(mesh, prob.f)
    with active_mesh(mesh):
        dist = _flops(lambda h, f: fmg_solve(op, h, f, cfg), hier_s, f_s)

    # cost_analysis on an SPMD program reports per-device flops; total
    # distributed work = 8 * per-device. Overhead comes from replicated
    # coarse levels (8x redundant below the agglomeration floor) and
    # halo-region recompute — together they must stay a small multiple of
    # the serial work for weak scaling to hold on real chips.
    overhead = 8.0 * dist / serial
    assert overhead < 2.0, (serial, dist, overhead)


@requires_8dev
def test_graduated_agglomeration_reduces_overhead():
    """The graduated agglomeration ladder (mesh.GRADUATED: axes drop out
    of a level's sharding one at a time) must not run MORE redundant
    per-device FLOPs than the binary sharded/replicated jump — the
    mid-ladder levels that keep partial sharding (e.g. 16^3 y-sharded on
    the 4x2x1 mesh) split their work instead of replicating it
    (mg.c:894-952's graduated 8:1 ladder; VERDICT r3 item 9)."""
    from hpgmg_tpu.core.config import SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.parallel import mesh as M
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.mg import fmg_solve

    cfg = SolverConfig(op="fv4", a=0.0, dtype=jnp.float32)
    op = get_suite(cfg.op)
    prob = init_problem_fv(64, dtype=jnp.float32)
    hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg)
    mesh = M.make_mesh_ij()

    def dist_flops(graduated: bool):
        old = M.GRADUATED
        M.GRADUATED = graduated
        try:
            hier_s = M.shard_hierarchy(mesh, hier, cfg)
            f_s = M.shard_array(mesh, prob.f)
            with M.active_mesh(mesh):
                return _flops(lambda h, f: fmg_solve(op, h, f, cfg),
                              hier_s, f_s)
        finally:
            M.GRADUATED = old

    grad, binary = dist_flops(True), dist_flops(False)
    # small slack: partition-induced bookkeeping can shift flop counts
    assert grad <= 1.02 * binary, (grad, binary)


@requires_8dev
def test_gsrb2_halves_exchange_rounds():
    """The distributed double-sweep schedule (slab2) must compile to
    FEWER collective-permutes per smooth than the per-half-sweep
    schedule — the deterministic form of its 'one exchange per full
    sweep' claim (6 half-sweeps x 4 permutes = 24 vs 3 sweeps x 4 + the
    once-per-smooth rhs ring = 16 before XLA merging)."""
    import dataclasses

    from hpgmg_tpu.core.config import SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy
    from hpgmg_tpu.kernels import stencils, stencils_r1
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.parallel.mesh import (active_mesh, make_mesh_ij,
                                         shard_array, shard_hierarchy)
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.smoothers import gsrb

    cfg = SolverConfig(op="fv2", a=0.0, dtype=jnp.float32,
                       kernels="pallas")
    op = get_suite("fv2")
    prob = init_problem_fv(64, dtype=jnp.float32)
    mesh = make_mesh_ij()

    def permute_count(gsrb2: bool):
        old_i, old_2 = stencils.INTERPRET, stencils_r1.GSRB2
        stencils.INTERPRET = True
        stencils_r1.GSRB2 = gsrb2
        try:
            hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k,
                                   cfg)
            hier_s = shard_hierarchy(mesh, hier, cfg)
            lv = hier_s.levels[0]
            if gsrb2:
                assert lv.k2 is not None
            x = shard_array(mesh, jnp.zeros_like(prob.f))
            r = shard_array(mesh, prob.f)
            with active_mesh(mesh):
                txt = jax.jit(
                    lambda lv, x, r: gsrb(op, lv, x, r, cfg)
                ).lower(lv, x, r).compile().as_text()
        finally:
            stencils.INTERPRET = old_i
            stencils_r1.GSRB2 = old_2
        return txt.count("collective-permute")

    half = permute_count(False)
    fused = permute_count(True)
    assert fused < half, (half, fused)
    assert fused <= 0.75 * half, (half, fused)
