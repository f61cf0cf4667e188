"""Contract test for the headline benchmark artifact (bench.py).

The driver captures bench.py's one JSON line as BENCH_r{N}.json; nothing
else guards its shape or the physics it reports. This test runs the real
bench entry point on the CPU backend at a small grid and asserts:

* the JSON schema the driver expects (metric/value/unit/vs_baseline);
* the F-cycle reached the f32 discretization-error regime
  (rel_residual <= 1e-3 — the mg.c:1221 rtol-oracle analog for f32);
* the Richardson order stays >= 3.0 (the fv4 operator is 4th-order,
  mg.c:1113-1131; a drop below 3 means a transfer/restriction
  regression like the r4 pooled-restriction question, VERDICT r4 #3).

bench.py additionally self-reports a "warnings" list when either bound
fails, so a driver-captured artifact can't silently degrade.
"""

import importlib
import io
import json
import sys


def test_bench_json_contract(monkeypatch, capsys):
    monkeypatch.setenv("HPGMG_BENCH_SKIP_PROBE", "1")
    monkeypatch.setenv("HPGMG_BENCH_N", "64")
    monkeypatch.setenv("HPGMG_BENCH_BICGSTAB", "1")
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    assert bench.main() == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)

    # driver schema
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, f"missing {key} in bench JSON"
    assert out["unit"] == "DOF/s"
    assert out["value"] > 0
    assert out["metric"].startswith("fv4_fcycle_dof_per_s")

    # physics contract
    assert out["rel_residual"] <= 1e-3, out
    assert out["richardson_order"] >= 3.0, out
    assert "warnings" not in out, out["warnings"]

    # protocol companion (reference's own bottom solver)
    assert out["bicgstab_dof_per_s"] > 0
