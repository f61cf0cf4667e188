"""On-hardware A/B: XLA path vs Pallas kernel paths, whole-solve parity.

The reference's kernel-variant discipline is an identical-convergence
smoke test between implementations compiled into the same driver
(operators.test.c:182-197). TPU analog: run the SAME F-cycle through

  * the XLA slicing path (``kernels="xla"``),
  * the Pallas masked path (in-kernel ghost synthesis — the Dirichlet
    default),
  * the Pallas pre-extended path (``SINGLE_EXT`` — the layout the
    periodic and sharded paths use),

on real hardware at several sizes, and compare per-mode outputs
(apply / residual / one GSRB half-sweep) plus the final F-cycle
solution and residual. Interpret-mode CI covers the kernel logic; THIS
script covers Mosaic legalization/layout on the actual chip, which the
interpreter cannot see.

Usage:  python -m hpgmg_tpu.bench.ab_test [--sizes 64 128 256]
Output: one table row per (n, path); committed runs live in docs/AB_r*.txt.
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp


def _maxrel(a, b):
    scale = float(jnp.max(jnp.abs(b)))
    return float(jnp.max(jnp.abs(a - b))) / (scale or 1.0)


def run_ab(n: int, dtype=jnp.float32, periodic: bool = False,
           opname: str = "fv4"):
    import hpgmg_tpu.kernels.stencils as K
    from hpgmg_tpu.core.config import BC, BottomSolver, SolverConfig
    from hpgmg_tpu.core.hierarchy import build_hierarchy
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.problems.fv import init_problem_fv
    from hpgmg_tpu.solve.mg import fmg_solve

    bc = BC.PERIODIC if periodic else BC.DIRICHLET
    mk = lambda kernels: SolverConfig(  # noqa: E731
        op=opname, a=1.0 if opname == "27pt" else 0.0, b=1.0, bc=bc,
        bottom=BottomSolver.DIRECT,
        min_coarse_dim=8, dtype=dtype, kernels=kernels)
    cfg_x, cfg_p = mk("xla"), mk("pallas")
    op = get_suite(opname)

    prob = init_problem_fv(n, dtype=dtype, periodic=periodic)
    # base hierarchy with the double-sweep views OFF so the "pallas"
    # variant measures the half-sweep path even now that GSRB2 defaults
    # on (the "pallas-gsrb2" variant rebuilds with it forced on)
    import hpgmg_tpu.kernels.stencils_r1 as _K1
    _g_old, _g4_old = _K1.GSRB2, K.GSRB2_FV4
    _K1.GSRB2 = K.GSRB2_FV4 = False
    try:
        hier = build_hierarchy(prob.beta_i, prob.beta_j, prob.beta_k, cfg_p)
    finally:
        _K1.GSRB2, K.GSRB2_FV4 = _g_old, _g4_old
    f = prob.f
    x0 = f / (1.0 + float(jnp.max(jnp.abs(f))))
    lv0 = hier.levels[0]

    out = {}
    ref_apply = jax.jit(lambda lv, x: op.apply_op(lv, x, cfg_x))(lv0, x0)
    ref_res = jax.jit(lambda lv, x, r: op.residual(lv, x, r, cfg_x))(
        lv0, x0, f)
    ref_u, ref_r, ref_f = jax.jit(
        lambda h, f: fmg_solve(op, h, f, cfg_x))(hier, f)

    if opname != "fv4":
        # radius-1 family: Dirichlet masked path + the fused
        # double-sweep smoother (GSRB2 — affects gsrb/fcycle only)
        paths = [("pallas", None)] + (
            [("pallas-gsrb2", "gsrb2")] if not periodic else [])
    elif periodic:
        paths = [("pallas", False)]
    else:
        paths = [("pallas", False), ("pallas-ext", True),
                 ("pallas-gsrb2", "gsrb2")]
    for name, ext in paths:
        import hpgmg_tpu.kernels.stencils_r1 as K1

        old = K.SINGLE_EXT
        old2 = K1.GSRB2
        old3 = K1.GSRB2_VAR7_ONLY
        old4 = K.GSRB2_FV4
        hier_p = hier
        if ext == "gsrb2":
            K1.GSRB2 = True
            K1.GSRB2_VAR7_ONLY = False
            K.GSRB2_FV4 = opname == "fv4"
            hier_p = build_hierarchy(prob.beta_i, prob.beta_j,
                                     prob.beta_k, cfg_p)
            assert hier_p.levels[0].k2 is not None
            lv0_p = hier_p.levels[0]
        elif ext is not None:
            K.SINGLE_EXT = ext
        if ext != "gsrb2":
            lv0_p = lv0
        try:
            d_apply = _maxrel(jax.jit(
                lambda lv, x: op.apply_op(lv, x, cfg_p))(lv0_p, x0),
                ref_apply)
            d_res = _maxrel(jax.jit(
                lambda lv, x, r: op.residual(lv, x, r, cfg_p))(lv0_p, x0, f),
                ref_res)
            # one full GSRB smooth (6 half-sweeps) through each path
            from hpgmg_tpu.solve.smoothers import gsrb

            d_gs = _maxrel(
                jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_p))(
                    lv0_p, x0, f),
                jax.jit(lambda lv, x, r: gsrb(op, lv, x, r, cfg_x))(
                    lv0, x0, f))
            u, r, nf = jax.jit(
                lambda h, f: fmg_solve(op, h, f, cfg_p))(hier_p, f)
            d_u = _maxrel(u, ref_u)
            out[name] = dict(apply=d_apply, residual=d_res, gsrb=d_gs,
                             fcycle_u=d_u,
                             rel_res=float(r) / float(nf),
                             rel_res_xla=float(ref_r) / float(ref_f))
        finally:
            K.SINGLE_EXT = old
            K1.GSRB2 = old2
            K1.GSRB2_VAR7_ONLY = old3
            K.GSRB2_FV4 = old4
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--periodic", action="store_true")
    p.add_argument("--op", default="fv4",
                   choices=["fv4", "fv7pt", "fv2", "27pt"])
    args = p.parse_args(argv)
    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"op={args.op}")
    tol = 2e-5  # f32 roundoff between algebraically-equal formulations
    ok = True
    for n in args.sizes:
        res = run_ab(n, periodic=args.periodic, opname=args.op)
        for name, d in res.items():
            # gate on per-mode parity + identical convergence (the
            # reference's criterion, operators.test.c); fcycle_u is
            # reported but not gated — a whole f32 F-cycle amplifies
            # roundoff through the near-singular solve
            line_ok = (d["apply"] < tol and d["residual"] < tol
                       and d["gsrb"] < tol
                       and abs(d["rel_res"] - d["rel_res_xla"])
                       <= 0.3 * d["rel_res_xla"] + 1e-12)
            ok &= line_ok
            print(f"n={n:4d} {name:11s} apply={d['apply']:.2e} "
                  f"residual={d['residual']:.2e} gsrb={d['gsrb']:.2e} "
                  f"fcycle_u={d['fcycle_u']:.2e} "
                  f"rel_res={d['rel_res']:.3e} (xla {d['rel_res_xla']:.3e}) "
                  f"{'OK' if line_ok else 'MISMATCH'}")
    print("A/B:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
