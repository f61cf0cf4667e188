"""GSRB half-sweep micro-benchmark: masked vs pre-extended kernel paths.

Times K data-dependent GSRB smooths (6 half-sweeps each) chained inside
one jitted fori_loop (single launch; the axon tunnel adds ~28 ms/launch
and block_until_ready is unreliable — sync via host transfer).

Compares the two single-chip Dirichlet paths:
  masked — in-kernel ghost synthesis + first/last-tile mask blends
  ext    — ghosts pre-materialized by one fused XLA pad (the layout the
           periodic/sharded paths use); trades ~1.2x HBM reads for the
           removal of the boundary-blend VPU passes — the kernel is
           VPU-bound (CLAUDE.md), so this can win despite more traffic.

Usage: python -m hpgmg_tpu.bench.kernel_sweep [--sizes 128 256] [--reps 50]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp


def time_sweeps(n: int, ext: bool, reps: int, dtype=jnp.float32,
                mxu: bool = False, opname: str = "fv4",
                kernels: str = "auto", probe_main_only: bool = False,
                prediff: bool = False, roll_prim: bool = False,
                slab: bool = False, gsrb2: bool = False,
                bf16c: bool = False, subtile: bool = False,
                overlap: bool = False) -> float:
    """Seconds per HALF-sweep."""
    import hpgmg_tpu.kernels.stencils as K
    import hpgmg_tpu.kernels.stencils_r1 as K1
    from hpgmg_tpu.core.config import BottomSolver, SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy, slim_hierarchy
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.smoothers import gsrb

    cfg = SolverConfig(op=opname, a=1.0 if opname == "27pt" else 0.0,
                       b=1.0, dtype=dtype, kernels=kernels,
                       bottom=BottomSolver.DIRECT, min_coarse_dim=8)
    old_prediff = K.PREDIFF
    old_maxdim = K.PREDIFF_MAX_DIM
    old_gsrb2 = K1.GSRB2
    old_var7only = K1.GSRB2_VAR7_ONLY
    old_gsrb2_fv4 = K.GSRB2_FV4
    K.PREDIFF = prediff  # before build: rebuild_operator attaches kgd
    K1.GSRB2 = gsrb2  # before build: rebuild_operator attaches k2
    K.GSRB2_FV4 = gsrb2 and opname == "fv4"  # fv4 double-sweep A/B
    K1.GSRB2_VAR7_ONLY = False  # the A/B measures 27pt too when forced
    old_bf16c = K.BF16C
    old_bf16c_dim = K.BF16C_MIN_DIM
    K.BF16C = bf16c  # before build: rebuild_operator attaches kb16
    if bf16c:
        K.BF16C_MIN_DIM = min(K.BF16C_MIN_DIM, n)  # measure any size
    if prediff:
        K.PREDIFF_MAX_DIM = max(K.PREDIFF_MAX_DIM, n)  # measure for real
    prob = init_problem_fv(n, dtype=dtype)
    hier = slim_hierarchy(
        build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg), cfg)
    lv, f = hier.levels[0], prob.f
    del prob, hier
    if bf16c and prediff and lv.kb16 is not None:
        # the gsrb timing loop reads the bf16 kgd copies (kb16[6:14]);
        # keep the f32 kgd only as a presence marker by aliasing it to
        # the bf16 entries — at 512^3 the dead f32 copy is 3 GB and
        # tips the chip into RESOURCE_EXHAUSTED
        import dataclasses as _dc

        lv = _dc.replace(lv, kgd=lv.kb16[6:14])
    op = get_suite(opname)

    old = K.SINGLE_EXT
    old_mxu = K.MXU_JDIFF
    old_probe = K.PROBE_MAIN_ONLY
    old_roll = K.ROLL_PRIM
    old_subtile = K.SUBTILE
    K.SINGLE_EXT = ext
    K.MXU_JDIFF = mxu
    K.PROBE_MAIN_ONLY = probe_main_only
    K.ROLL_PRIM = roll_prim
    K.SUBTILE = subtile  # sub-tiled masked kernel (dispatch-time switch)
    nhalf = 2 * cfg.resolved_num_smooths(op)
    try:
        if slab and opname != "fv4":
            # radius-1 slab kernel, single-chip driven (the r1 sharded
            # fast path's per-shard mechanism, stencils_r1.r1_call_slab)
            import hpgmg_tpu.kernels.stencils_r1 as K1

            var7 = opname != "27pt"
            suite = "var7" if var7 else "27pt"
            const_a = 0.0 if var7 else cfg.a

            @jax.jit
            def chained(lv, x, rhs):
                views = ((lv.kbi, lv.kbj, lv.kbk, lv.kbk_top) if var7
                         else (None, None, None, None))

                def body(i, x):
                    slabs = K1.single_chip_slabs_r1(x, cfg.bc,
                                                    op.taps_key)
                    return K1.r1_call_slab(
                        x, *slabs, *views, rhs + 0.0 * x[0, 0, 0],
                        lv.kdinv[0], "gsrb", cfg.b * lv.h2inv, suite,
                        op.taps_key, const_a=const_a)

                return jax.lax.fori_loop(0, reps * nhalf, body, x)
        elif slab:
            # single-chip drive of the slab kernel (the sharded fast
            # path's per-shard cost, minus the ppermutes): BC-fill slabs
            # rebuilt from x every half-sweep, constant parity (cost-
            # equivalent: both parities share one compiled kernel).
            # overlap=True drives the two-pass interior/edge split
            # (fv4_call_overlap) — single-chip it measures the split's
            # pure overhead (extra launch + edge-grid enumeration); the
            # ppermute-hiding benefit needs real multi-chip ICI.
            call = K.fv4_call_overlap if overlap else K.fv4_call_slab
            if overlap:
                assert K.overlap_grid_shape(n, n, n) is not None, (
                    f"overlap needs >= 3 slab tiles per axis at n={n}")

            @jax.jit
            def chained(lv, x, rhs):
                def body(i, x):
                    ilo, ihi, jlo, jhi = K.single_chip_slabs(x, cfg.bc)
                    return call(
                        x, ilo, ihi, jlo, jhi, lv.kbi, lv.kbj, lv.kbk,
                        lv.kbk_top, rhs + 0.0 * x[0, 0, 0], lv.kdinv[0],
                        "gsrb", cfg.b * lv.h2inv, ipad=2)

                return jax.lax.fori_loop(0, reps * nhalf, body, x)
        else:
            @jax.jit
            def chained(lv, x, rhs):
                def body(i, x):
                    return gsrb(op, lv, x, rhs + 0.0 * x[0, 0, 0], cfg)

                return jax.lax.fori_loop(0, reps, body, x)

        x = jnp.zeros_like(f)
        _ = float(chained(lv, x, f)[0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        _ = float(chained(lv, x, f)[0, 0, 0])
        dt = time.perf_counter() - t0
    finally:
        K.SINGLE_EXT = old
        K.MXU_JDIFF = old_mxu
        K.PROBE_MAIN_ONLY = old_probe
        K.ROLL_PRIM = old_roll
        K.SUBTILE = old_subtile
        K.PREDIFF = old_prediff
        K.PREDIFF_MAX_DIM = old_maxdim
        K1.GSRB2 = old_gsrb2
        K1.GSRB2_VAR7_ONLY = old_var7only
        K.GSRB2_FV4 = old_gsrb2_fv4
        K.BF16C = old_bf16c
        K.BF16C_MIN_DIM = old_bf16c_dim
    return dt / (reps * nhalf)


def cost_model(opname: str, n: int, prediff: bool = False):
    """Analytic (ops_per_cell, hbm_bytes_per_cell) estimate for one GSRB
    half-sweep of the masked kernel — the roofline numerator for the
    achieved-rate lines. Ops: the documented VPU counts (~55/cell for the
    fv4 flux form incl. ghost/blend overhead, ~40 with PREDIFF — CLAUDE.md
    / docs/GSRB_VPU.md; ~28 for the radius-1 suites, ~88 for the dense
    27pt). Bytes: operand streams x f32, inflated by the tile window
    overlap actually selected at this size (windows re-read halo rows)."""
    import hpgmg_tpu.kernels.stencils as K
    import hpgmg_tpu.kernels.stencils_r1 as K1

    if opname == "fv4":
        ts = K.tile_shape(n, prediff)
        if ts is None:
            return None
        bi, bj = ts
        ops = 40.0 if prediff else 55.0
        x_ovl = (bi + 4) * (bj + 16) / (bi * bj)
        c_ovl = (bi + 2) * (bj + 8) / (bi * bj)
        streams = x_ovl + 3 * c_ovl + 3.0  # x + betas + rhs/dinv/out
        if prediff:
            streams += 6 * bi * (bj + 8) / (bi * bj)
        return ops, 4.0 * streams
    ts = K1.tile_shape_r1(n, opname != "27pt")
    if ts is None:
        return None
    bi, bj = ts
    var7 = opname != "27pt"
    ops = 28.0 if var7 else 88.0
    x_ovl = (bi + 2) * (bj + 16) / (bi * bj)
    c_ovl = (bi + 1) * (bj + 8) / (bi * bj)
    streams = x_ovl + (3 * c_ovl if var7 else 0.0) + 3.0
    return ops, 4.0 * streams


def _rates(opname, n, t, prediff=False):
    cm = cost_model(opname, n, prediff)
    if cm is None or t <= 0:
        return ""
    ops, bts = cm
    return (f" [~{ops * n ** 3 / t / 1e9:.0f} Gop/s"
            f" ~{bts * n ** 3 / t / 1e9:.0f} GB/s est]")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[128, 256])
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--mxu", action="store_true",
                   help="also time the MXU j-difference kernel variant")
    p.add_argument("--probe-main-only", action="store_true",
                   help="also time the main-flux-only probe (wrong "
                        "answers; measures VPU-op-count sensitivity)")
    p.add_argument("--prediff", action="store_true",
                   help="also time the precomputed-beta-difference "
                        "kernel (kgd operands; kernels/stencils.py "
                        "PREDIFF)")
    p.add_argument("--budget-mb", type=float, default=None,
                   help="override the tile-selection VMEM budget "
                        "(kernels/stencils.py _VMEM_BUDGET; also "
                        "_VMEM_BUDGET_512 when 512 is in --sizes)")
    p.add_argument("--budget-512-mb", type=float, default=None,
                   help="independently override the n>=512 "
                        "tile-selection budget (_VMEM_BUDGET_512, "
                        "default 60 MB) for mixed-size sweeps")
    p.add_argument("--vmem-limit-mb", type=float, default=None,
                   help="override the Mosaic scoped-vmem limit passed "
                        "via CompilerParams (_VMEM_LIMIT, default 100). "
                        "v5e tops out at 128; (16,128)@512 needs 124.2 "
                        "and hangs the compile helper — see CLAUDE.md")
    p.add_argument("--prediff-budget-mb", type=float, default=None,
                   help="override the PREDIFF tile-selection VMEM "
                        "budget (_VMEM_BUDGET_PREDIFF) — e.g. 92 lets "
                        "the prediff variant pick the wide (8,128) "
                        "tile at 512^3 (est ~90 MB, under the 100 MB "
                        "Mosaic limit) instead of (8,64)")
    p.add_argument("--prediff-max-dim", type=int, default=None,
                   help="override PREDIFF_MAX_DIM (default 256) so "
                        "--prediff can measure the prediff/gsrb2+prediff "
                        "variants at 512 despite the production cap")
    p.add_argument("--roll-prim", action="store_true",
                   help="also time the pltpu.roll lane-shift variant")
    p.add_argument("--slab", action="store_true",
                   help="also time the slab-operand kernel (the sharded "
                        "fast path's per-shard mechanism, single-chip "
                        "driven with BC-fill slabs)")
    p.add_argument("--overlap", action="store_true",
                   help="with --slab: also time the comm-overlap "
                        "two-pass split (fv4_call_overlap) — "
                        "single-chip this measures the split's pure "
                        "overhead vs the fused slab call")
    p.add_argument("--gsrb2", action="store_true",
                   help="also time the fused red+black double-sweep "
                        "kernel (radius-1 suites; stencils_r1.GSRB2)")
    p.add_argument("--subtile", action="store_true",
                   help="also time the sub-tiled masked fv4 kernel "
                        "(bigger streamed windows, sub-tile-sized "
                        "temporaries; kernels/stencils.py SUBTILE)")
    p.add_argument("--subtile-budget-mb", type=float, default=None,
                   help="override the subtile tile-selection VMEM "
                        "budget (_VMEM_BUDGET_SUBTILE, default 88 MB)")
    p.add_argument("--bf16c", action="store_true",
                   help="also time the bf16-coefficient-stream GSRB "
                        "variant (fv4; kernels/stencils.py BF16C)")
    p.add_argument("--op", default="fv4",
                   choices=["fv4", "fv7pt", "fv2", "27pt"])
    args = p.parse_args(argv)
    if args.budget_mb is not None:
        import hpgmg_tpu.kernels.stencils as K

        K._VMEM_BUDGET = int(args.budget_mb * 2 ** 20)
        # Only drag the (separately tuned, 60 MB) 512 budget along when the
        # sweep actually includes 512 — a mixed --sizes 128 512 sweep keeps
        # the 512 tuning unless --budget-512-mb overrides it explicitly.
        if any(s >= 512 for s in args.sizes) and args.budget_512_mb is None:
            K._VMEM_BUDGET_512 = int(args.budget_mb * 2 ** 20)
    if args.budget_512_mb is not None:
        import hpgmg_tpu.kernels.stencils as K

        K._VMEM_BUDGET_512 = int(args.budget_512_mb * 2 ** 20)
    if args.prediff_budget_mb is not None:
        import hpgmg_tpu.kernels.stencils as K

        K._VMEM_BUDGET_PREDIFF = int(args.prediff_budget_mb * 2 ** 20)
    if args.vmem_limit_mb is not None:
        import hpgmg_tpu.kernels.stencils as K

        K._VMEM_LIMIT = int(args.vmem_limit_mb * 2 ** 20)
    if args.prediff_max_dim is not None:
        import hpgmg_tpu.kernels.stencils as K

        K.PREDIFF_MAX_DIM = args.prediff_max_dim
    if args.subtile_budget_mb is not None:
        import hpgmg_tpu.kernels.stencils as K

        K._VMEM_BUDGET_SUBTILE = int(args.subtile_budget_mb * 2 ** 20)
    print(f"backend={jax.default_backend()} op={args.op}")
    if args.op != "fv4":
        # radius-1 family: Pallas masked kernel vs the XLA path
        for n in args.sizes:
            t_k = time_sweeps(n, ext=False, reps=args.reps, opname=args.op,
                              kernels="pallas")
            t_x = time_sweeps(n, ext=False, reps=args.reps, opname=args.op,
                              kernels="xla")
            line = (f"n={n:4d} pallas {t_k * 1e6:8.1f} us/half-sweep"
                    f"{_rates(args.op, n, t_k)} | "
                    f"xla {t_x * 1e6:8.1f} us | xla/pallas {t_x / t_k:5.2f}")
            if args.slab:
                t_s = time_sweeps(n, ext=False, reps=args.reps,
                                  opname=args.op, kernels="pallas",
                                  slab=True)
                line += (f" | slab {t_s * 1e6:8.1f} us "
                         f"(slab/masked {t_s / t_k:5.2f})")
            if args.gsrb2:
                t_2 = time_sweeps(n, ext=False, reps=args.reps,
                                  opname=args.op, kernels="pallas",
                                  gsrb2=True)
                line += (f" | gsrb2 {t_2 * 1e6:8.1f} us "
                         f"(gsrb2/masked {t_2 / t_k:5.2f})")
            print(line)
        return 0
    for n in args.sizes:
        t_mask = time_sweeps(n, ext=False, reps=args.reps)
        t_ext = time_sweeps(n, ext=True, reps=args.reps)
        line = (f"n={n:4d} masked {t_mask * 1e6:8.1f} us/half-sweep"
                f"{_rates('fv4', n, t_mask)} | "
                f"ext {t_ext * 1e6:8.1f} us | ext/masked "
                f"{t_ext / t_mask:5.2f}")
        if args.mxu:
            t_mxu = time_sweeps(n, ext=False, reps=args.reps, mxu=True)
            line += (f" | mxu {t_mxu * 1e6:8.1f} us "
                     f"(mxu/masked {t_mxu / t_mask:5.2f})")
        if args.probe_main_only:
            t_p = time_sweeps(n, ext=False, reps=args.reps,
                              probe_main_only=True)
            line += (f" | main-only {t_p * 1e6:8.1f} us "
                     f"(probe/masked {t_p / t_mask:5.2f})")
        if args.prediff:
            t_d = time_sweeps(n, ext=False, reps=args.reps, prediff=True)
            line += (f" | prediff {t_d * 1e6:8.1f} us "
                     f"(prediff/masked {t_d / t_mask:5.2f})")
        if args.bf16c:
            t_b = time_sweeps(n, ext=False, reps=args.reps, bf16c=True)
            line += (f" | bf16c {t_b * 1e6:8.1f} us "
                     f"(bf16c/masked {t_b / t_mask:5.2f})")
            if args.prediff:
                t_bd = time_sweeps(n, ext=False, reps=args.reps,
                                   bf16c=True, prediff=True)
                line += (f" | bf16c+prediff {t_bd * 1e6:8.1f} us "
                         f"({t_bd / t_mask:5.2f})")
        if args.roll_prim:
            t_r = time_sweeps(n, ext=False, reps=args.reps, roll_prim=True)
            line += (f" | roll-prim {t_r * 1e6:8.1f} us "
                     f"(roll/masked {t_r / t_mask:5.2f})")
        if args.slab:
            t_s = time_sweeps(n, ext=False, reps=args.reps, slab=True)
            line += (f" | slab {t_s * 1e6:8.1f} us "
                     f"(slab/masked {t_s / t_mask:5.2f})")
            if args.overlap:
                import hpgmg_tpu.kernels.stencils as K

                if K.overlap_grid_shape(n, n, n) is None:
                    line += " | overlap n/a (<3 tiles/axis)"
                else:
                    t_o = time_sweeps(n, ext=False, reps=args.reps,
                                      slab=True, overlap=True)
                    line += (f" | overlap {t_o * 1e6:8.1f} us "
                             f"(overlap/slab {t_o / t_s:5.2f})")
        if args.gsrb2:
            t_2 = time_sweeps(n, ext=False, reps=args.reps, gsrb2=True)
            line += (f" | gsrb2 {t_2 * 1e6:8.1f} us "
                     f"(gsrb2/masked {t_2 / t_mask:5.2f})")
            if args.prediff:
                # the honest <= 256 comparison: prediff half-sweeps are
                # the best-known config there, and gsrb2 can consume the
                # prediff operands itself (gsrb2+prediff)
                t_d = time_sweeps(n, ext=False, reps=args.reps,
                                  prediff=True)
                t_2d = time_sweeps(n, ext=False, reps=args.reps,
                                   gsrb2=True, prediff=True)
                line += (f" | gsrb2+prediff {t_2d * 1e6:8.1f} us "
                         f"(vs prediff {t_2d / t_d:5.2f})")
        if args.subtile:
            import hpgmg_tpu.kernels.stencils as K

            ts = K.tile_shape_subtile(n, prediff=False)
            t_st = time_sweeps(n, ext=False, reps=args.reps, subtile=True)
            line += (f" | subtile{ts} {t_st * 1e6:8.1f} us "
                     f"(subtile/masked {t_st / t_mask:5.2f})")
            if args.prediff:
                tsd = K.tile_shape_subtile(n, prediff=True)
                t_std = time_sweeps(n, ext=False, reps=args.reps,
                                    subtile=True, prediff=True)
                line += (f" | subtile+prediff{tsd} {t_std * 1e6:8.1f} us")
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
