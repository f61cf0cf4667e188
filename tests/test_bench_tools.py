"""Interpret-mode smokes for the on-hardware bench tools.

kernel_sweep and ab_test are hardware tools (they measure Mosaic
kernels on the chip), but their drive logic — operand plumbing, variant
flags, hierarchy rebuild per path — is backend-independent and rots
silently without CI. These smokes run each tool's core function once in
interpreter mode on tiny grids; timings are meaningless, only "runs and
agrees" is asserted.
"""

import jax
import jax.numpy as jnp
import pytest

from hpgmg_tpu.kernels import stencils


@pytest.fixture(autouse=True)
def interpret_mode():
    old = stencils.INTERPRET
    stencils.INTERPRET = True
    yield
    stencils.INTERPRET = old


@pytest.mark.parametrize("variant", ["pallas", "slab", "gsrb2"])
def test_kernel_sweep_r1_variants(variant):
    from hpgmg_tpu.bench.kernel_sweep import time_sweeps

    t = time_sweeps(32, ext=False, reps=1, opname="fv7pt",
                    kernels="pallas", slab=variant == "slab",
                    gsrb2=variant == "gsrb2")
    assert t > 0.0


def test_kernel_sweep_fv4_masked_and_slab():
    from hpgmg_tpu.bench.kernel_sweep import time_sweeps

    assert time_sweeps(32, ext=False, reps=1) > 0.0
    assert time_sweeps(32, ext=False, reps=1, slab=True) > 0.0


def test_ab_test_r1_paths():
    """run_ab covers the masked and GSRB2 paths for a radius-1 op and
    both must pass the tool's own parity gates."""
    from hpgmg_tpu.bench.ab_test import run_ab

    res = run_ab(32, opname="fv2")
    assert set(res) == {"pallas", "pallas-gsrb2"}
    for d in res.values():
        assert d["apply"] < 2e-5 and d["gsrb"] < 2e-5
        assert abs(d["rel_res"] - d["rel_res_xla"]) <= (
            0.3 * d["rel_res_xla"] + 1e-12)


def test_cli_driver_modes(capsys):
    """--driver fmg2/mgpcg run the two extra reference solve drivers
    (mg.c:1348-1495, mg.c:1500-1607) end-to-end from the CLI."""
    from hpgmg_tpu.bench.cli import main

    main(["--n", "16", "--op", "fv7pt", "--driver", "mgpcg",
          "--dtype", "float64"])
    out = capsys.readouterr().out
    assert "mgpcg:" in out and "rel_res=" in out
    main(["--n", "16", "--op", "fv7pt", "--driver", "fmg2",
          "--dtype", "float64"])
    out = capsys.readouterr().out
    assert "fmg2:" in out


def test_cli_test_error_mode(capsys):
    """--test-error reports error vs the analytic solution (TEST_ERROR,
    hpgmg-fv.c:317-348) with a ~2nd-order trend for fv7pt."""
    from hpgmg_tpu.bench.cli import main

    main(["--n", "16", "--op", "fv7pt", "--test-error", "--problem",
          "p4", "--dtype", "float64", "--dynamic-range", "2"])
    out = capsys.readouterr().out
    assert "error_max=" in out and "observed order" in out


def test_kernel_sweep_vmem_flags(monkeypatch):
    """--budget-mb must cover BOTH tile-selection budgets (the 512-size
    one silently kept its default before) and --vmem-limit-mb must reach
    the Mosaic CompilerParams limit; with budget 110 the 512 tile pick
    becomes (16,128)."""
    from hpgmg_tpu.bench import kernel_sweep as S

    calls = []
    monkeypatch.setattr(
        S, "time_sweeps", lambda n, **kw: calls.append(n) or 1e-3)
    monkeypatch.setattr(stencils, "_VMEM_BUDGET", stencils._VMEM_BUDGET)
    monkeypatch.setattr(stencils, "_VMEM_BUDGET_512",
                        stencils._VMEM_BUDGET_512)
    monkeypatch.setattr(stencils, "_VMEM_LIMIT", stencils._VMEM_LIMIT)
    S.main(["--sizes", "512", "--reps", "1",
            "--budget-mb", "110", "--vmem-limit-mb", "127"])
    assert stencils._VMEM_BUDGET == int(110 * 2 ** 20)
    assert stencils._VMEM_BUDGET_512 == int(110 * 2 ** 20)
    assert stencils._VMEM_LIMIT == int(127 * 2 ** 20)
    assert stencils.tile_shape(512, prediff=False) == (16, 128)
    assert calls == [512, 512]  # masked + ext, no hardware touched


def test_kernel_sweep_budget_512_independent(monkeypatch):
    """A mixed-size sweep must NOT drag the tuned 60 MB 512 budget down
    to --budget-mb (ADVICE r3); --budget-512-mb overrides it explicitly."""
    from hpgmg_tpu.bench import kernel_sweep as S

    monkeypatch.setattr(
        S, "time_sweeps", lambda n, **kw: 1e-3)
    monkeypatch.setattr(stencils, "_VMEM_BUDGET", stencils._VMEM_BUDGET)
    monkeypatch.setattr(stencils, "_VMEM_BUDGET_512",
                        stencils._VMEM_BUDGET_512)
    before_512 = stencils._VMEM_BUDGET_512
    S.main(["--sizes", "128", "--reps", "1", "--budget-mb", "28"])
    assert stencils._VMEM_BUDGET == int(28 * 2 ** 20)
    assert stencils._VMEM_BUDGET_512 == before_512  # untouched: no 512 size
    S.main(["--sizes", "128", "512", "--reps", "1",
            "--budget-mb", "28", "--budget-512-mb", "55"])
    assert stencils._VMEM_BUDGET == int(28 * 2 ** 20)
    assert stencils._VMEM_BUDGET_512 == int(55 * 2 ** 20)


def test_kernel_sweep_prediff_max_dim_flag(monkeypatch):
    """--prediff-max-dim lifts the production cap so --prediff variants
    are measurable at 512 (gsrb2+prediff A/B, docs/GSRB2_FV4_r04.md)."""
    from hpgmg_tpu.bench import kernel_sweep as S

    monkeypatch.setattr(S, "time_sweeps", lambda n, **kw: 1e-3)
    monkeypatch.setattr(stencils, "PREDIFF_MAX_DIM",
                        stencils.PREDIFF_MAX_DIM)
    S.main(["--sizes", "512", "--reps", "1", "--prediff-max-dim", "512"])
    assert stencils.PREDIFF_MAX_DIM == 512


def test_measure_breakdown_rows():
    """The per-level breakdown times the REAL restrict->interp round
    trips (transfer_v / transfer_f) — an earlier version padded and
    strided-sliced to keep carry shapes, which at 512^3 cost more than
    the ops being measured."""
    from hpgmg_tpu.bench.driver import _build
    from hpgmg_tpu.bench.timing import format_breakdown, measure_breakdown
    from hpgmg_tpu.core.config import SolverConfig

    cfg = SolverConfig(op="fv4")
    hier, _ = _build(16, cfg)
    rows = measure_breakdown(hier, cfg, reps=1)
    assert {"smooth", "residual", "blas1", "transfer_v",
            "transfer_f"} <= set(rows[0])
    assert "bottom" in rows[-1]
    table = format_breakdown(rows)
    assert "transfer_v" in table and "transfer_f" in table


def test_ladder_sweep_smoke(capsys):
    """ladder_sweep drives whole-solve benchmarks across min_coarse_dim
    variants (the DIRECT bottom makes ladder depth a free parameter);
    both ladder arms must solve to the same residual regime."""
    from hpgmg_tpu.bench.ladder_sweep import main

    main(["--sizes", "32", "--coarse", "8", "16", "--seconds", "0.01",
          "--no-fres"])
    out = capsys.readouterr().out
    assert "coarse= 8" in out and "coarse=16" in out
    rels = [float(line.split("rel_res=")[1])
            for line in out.splitlines() if "rel_res=" in line]
    assert len(rels) == 2 and all(r < 2e-3 for r in rels)


def test_restrict_sweep_smoke(capsys):
    """restrict_sweep drives both arms of both A/Bs (einsum vs kernel
    restriction; separate vs fused residual+restrict) in interpret mode.
    n=64 so the fres gates pass under the auto floor."""
    from hpgmg_tpu.bench.restrict_sweep import main

    main(["--sizes", "64", "--reps", "1"])
    out = capsys.readouterr().out
    assert "fres" in out and "transfer_v" in out and "sep-pool" in out
