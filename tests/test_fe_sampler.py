"""FE sampler grid-size selection (t60-sample.sh / TestSampler analog)."""

import jax.numpy as jnp

from hpgmg_tpu.fe.op import get_fe_op
from hpgmg_tpu.fe.sampler import (fcycle_flops, sample_grid_range,
                                  sample_on_grid, thin_samples)


def test_grid_range_enumeration():
    """Sizes come from the coarse seeds x 8^level with per-device element
    counts inside [min, max] (sampler.c:54-76)."""
    sizes = sample_grid_range(8, 512, (1, 1, 1))
    assert (2, 2, 2) in sizes
    assert (4, 4, 4) in sizes
    assert all(8 <= m[0] * m[1] * m[2] <= 512 for m in sizes)
    # monotone in volume
    vols = [m[0] * m[1] * m[2] for m in sizes]
    assert vols == sorted(vols)


def test_thinning_keeps_extremes():
    sizes = sample_grid_range(8, 100000, (1, 1, 1))
    thin = thin_samples(sizes, 5)
    assert len(thin) == 5
    assert thin[0] == sizes[0] and thin[-1] == sizes[-1]


def test_flop_count_positive_and_scales():
    from hpgmg_tpu.fe.grid import FEGrid

    f1 = fcycle_flops(FEGrid(M=(4, 4, 4), degree=2))
    f2 = fcycle_flops(FEGrid(M=(8, 8, 8), degree=2))
    assert f1 > 0 and 7 < f2 / f1 < 9  # ~8x elements


def test_sample_on_grid_runs():
    r = sample_on_grid(get_fe_op("poisson2"), (2, 2, 2), degree=2,
                       dtype=jnp.float64, repeat=1, mintime=0.0)
    assert r.seconds > 0 and r.meq_per_s > 0 and r.gflops > 0
