"""On-hardware A/B for the restriction kernels (kernels/restrict.py).

Three comparisons per size, each timed as K data-dependent chained
iterations inside one jitted program (bench/timing.py discipline —
per-launch timing lies through the axon tunnel):

  transfer:  interp_v2(restrict(x)) += x  with the einsum restriction vs
             the Pallas i+k kernel + j einsum (restrict_cell_auto fast)
  pair:      smooth-free V-cycle segment residual -> restrict -> interp
             with the separate phases vs the fused mode='fres' kernel

The chained op is shape-preserving (fine -> coarse -> fine) so the
carry threads; the interpolation is common to both arms, so the delta
is the restriction/residual part. Decision feeds
kernels/restrict.py:FUSED_RESTRICT (docs/RESTRICT_r04.md).

Reference anatomy being fused: operators/residual.c:9-51 feeding
restriction.c:104 inside mg.c:1135's V-cycle.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from jax import lax


def restrict_conv(x):
    """restrict_cell via a stride-2 single-channel 3D conv (MXU conv
    emitter candidate)."""
    w = jnp.full((1, 1, 2, 2, 2), 0.125, x.dtype)
    return lax.conv_general_dilated(
        x[None, None], w, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))[0, 0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[128, 256, 512])
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--op", default="fv4")
    args = p.parse_args(argv)

    import hpgmg_tpu.kernels.restrict as R
    import hpgmg_tpu.ops.transfer as T
    from hpgmg_tpu.bench.driver import _build
    from hpgmg_tpu.bench.timing import _time_fn
    from hpgmg_tpu.core.config import SolverConfig
    from hpgmg_tpu.ops.base import get_suite
    from hpgmg_tpu.ops.transfer import (get_interpolation, restrict_cell,
                                        restrict_pool)

    print(f"backend={jax.default_backend()} op={args.op}")
    op = get_suite(args.op)
    interp = get_interpolation(op.interpolation_vcycle)

    for n in args.sizes:
        cfg = SolverConfig(op=args.op)
        hier, f = _build(n, cfg)
        lv = hier.levels[0]
        x = jnp.zeros(lv.shape, lv.dtype)
        bc = cfg.bc

        def t_transfer(fast):
            return _time_fn(
                lambda c: interp(R.restrict_cell_auto(c, fast), 1.0, c, bc),
                x, reps=args.reps)

        def t_pair(mode):
            # lv/f ride as traced args (closure constants become XLA
            # literals; at 256^3+ the inlined level views overflow the
            # remote-compile request limit — HTTP 413)
            if mode == "fres":
                def fn(c, lv, f):
                    rr = op.restrict_residual(lv, c, f, cfg)
                    assert rr is not None, "fres path refused (gates)"
                    return interp(rr, 1.0, c, bc)
            else:
                rfn = restrict_pool if mode == "pool" else restrict_cell
                def fn(c, lv, f):
                    t = op.residual(lv, c, f, cfg)
                    return interp(rfn(t), 1.0, c, bc)
            return _time_fn(fn, x, lv, f, reps=args.reps)

        def t_variant(fn):
            try:
                return _time_fn(lambda c: interp(fn(c), 1.0, c, bc),
                                x, reps=args.reps)
            except Exception as e:  # e.g. a conv emitter refusing 3D
                print(f"  variant failed: {type(e).__name__}: {e}")
                return float("nan")

        old = (R.FUSED_RESTRICT, R.FUSED_RESTRICT_MAX_DIM)
        oldp = T.RESTRICT_POOL
        try:
            R.FUSED_RESTRICT = True
            R.FUSED_RESTRICT_MAX_DIM = 1 << 30
            tr_fast = t_transfer(True)
            pair_fused = t_pair("fres")
            # einsum baselines: pool auto-dispatch off
            R.FUSED_RESTRICT, T.RESTRICT_POOL = False, False
            tr_slow = t_transfer(False)
            pair_sep = t_pair("einsum")
        finally:
            R.FUSED_RESTRICT, R.FUSED_RESTRICT_MAX_DIM = old
            T.RESTRICT_POOL = oldp
        pair_pool = t_pair("pool")
        tr_pool = t_variant(restrict_pool)
        # the conv emitter pads bf16[1,512,512,1,8,64] 32x -> 16 GB HBM
        # OOM at 512^3 (measured); it already loses 2.4x at 256
        tr_conv = t_variant(restrict_conv) if n <= 256 else float("nan")
        print(f"n={n:4d} transfer_v einsum {tr_slow*1e6:9.1f} us | "
              f"kernel {tr_fast*1e6:9.1f} us (ratio {tr_fast/tr_slow:5.2f})"
              f" | pool {tr_pool*1e6:9.1f} us | conv {tr_conv*1e6:9.1f} us"
              f" | res+restr sep {pair_sep*1e6:9.1f} us | "
              f"sep-pool {pair_pool*1e6:9.1f} us "
              f"(ratio {pair_pool/pair_sep:5.2f}) | "
              f"fres {pair_fused*1e6:9.1f} us "
              f"(ratio {pair_fused/pair_sep:5.2f})")


if __name__ == "__main__":
    main()
