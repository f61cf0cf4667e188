"""Golden tests for the FE test-* CLI actions (t010-grid.sh /
t030-feinject.sh analogs): exact expected stdout, the sharness
``test_expect_stdout`` discipline (hpgmg-sharness.sh:28-46)."""

import io
from contextlib import redirect_stdout

from hpgmg_tpu.fe.cli import main


def run_action(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    assert rc == 0
    return buf.getvalue()


def test_grid_ladder_golden():
    out = run_action(["test-grid", "-M", "4,8,8"])
    assert out.splitlines() == [
        "Level 0: M [4 8 8]  nodes [9 17 17]  neq 1575",
        "Level 1: M [2 4 4]  nodes [5 9 9]  neq 147",
        "Level 2: M [1 2 2]  nodes [3 5 5]  neq 9",
    ]


def test_feinject_values_encode_coordinates():
    """u = 1e6 x + 1e3 y + z injected to the coarse grid must reproduce
    each coarse node's own coordinates (TestFEInject's oracle,
    fefas-test.c:210-268)."""
    out = run_action(["test-feinject", "-M", "4,4,4",
                      "-op_type", "poisson1"])
    lines = [ln for ln in out.splitlines() if ln.startswith("coarse")]
    assert len(lines) == 3 ** 3  # Q1 coarse grid of M=2^3 -> 3^3 nodes
    for ln in lines:
        val = float(ln.split("=")[1].split("at")[0])
        x, y, z = (float(t) for t in ln.split("at")[1].split())
        assert abs(val - (1e6 * x + 1e3 * y + z)) < 1e-6, ln


def test_fespace_numbering_is_lexicographic():
    out = run_action(["test-fespace", "-M", "2,2,2",
                      "-op_type", "poisson1"])
    lines = [ln for ln in out.splitlines() if ln.startswith("u[")]
    assert len(lines) == 3 ** 3
    # numbering is dense 0..N-1 in lexicographic node order
    ids = [int(ln.split("[")[1].split("]")[0]) for ln in lines]
    assert ids == list(range(3 ** 3))
