"""FE path tests, mirroring the reference sharness ladder (SURVEY.md §4.1):
transfer exactness (t030/t040/t045), operator apply (t100), diagonal
(t110), and the headline FMG property (t220/t230): one F-cycle reaches
discretization error with e_L2 rate ~ degree+1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.fe.fas import (build_fe_levels, cg, diagnostics, fas_fcycle,
                              fas_vcycle, run_fmg)
from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.op import get_fe_op
from hpgmg_tpu.fe.solutions import get_solution


def nodal_poly(grid, exps=(1, 1, 1), dtype=jnp.float64):
    """Polynomial field x^a y^b z^c evaluated at the nodes."""
    X = grid.node_coords(dtype)
    return X[0] ** exps[0] * X[1] ** exps[1] * X[2] ** exps[2]


class TestGrid:
    def test_nodes_and_levels(self):
        g = FEGrid(M=(8, 8, 8), degree=2)
        assert g.nodes == (17, 17, 17)
        assert g.num_levels() == 4  # 8 -> 4 -> 2 -> 1
        g = FEGrid(M=(8, 16, 24), degree=1)
        assert g.nodes == (9, 17, 25)
        assert g.num_levels() == 4  # coarsest (1, 2, 3)

    def test_extract_assemble_roundtrip_counts(self):
        """assemble(extract(1)) counts element multiplicity: interior nodes
        shared by 8 elements (Q1) get 8."""
        g = FEGrid(M=(4, 4, 4), degree=1)
        ones = jnp.ones(g.nodes)
        E = g.extract_elements(ones)
        assert E.shape == (2, 2, 2, 4, 4, 4)  # local leads, batch trails
        v = g.assemble_add(E)
        assert float(v[2, 2, 2]) == 8.0
        assert float(v[0, 0, 0]) == 1.0
        assert float(v[0, 2, 2]) == 4.0

    @pytest.mark.parametrize("degree", [1, 2])
    def test_extract_values(self, degree):
        g = FEGrid(M=(4, 4, 4), degree=degree)
        u = nodal_poly(g)
        E = g.extract_elements(u)
        p = degree
        # element (1,2,3), local node (i,j,k) == global node (p*1+i, ...)
        for (i, j, k) in [(0, 0, 0), (p, p, p), (0, p, 1 % (p + 1))]:
            np.testing.assert_allclose(
                float(E[i, j, k, 1, 2, 3]),
                float(u[p * 1 + i, p * 2 + j, p * 3 + k]), rtol=1e-14)


class TestTransfers:
    @pytest.mark.parametrize("degree", [1, 2])
    def test_interpolation_polynomial_exactness(self, degree):
        """P reproduces polynomials of total degree <= p per axis
        (t040-feinterp analog)."""
        gf = FEGrid(M=(8, 8, 8), degree=degree)
        gc = gf.coarsen()
        for exps in [(0, 0, 0), (1, 0, 0), (1, 1, 0),
                     (degree, degree, degree)]:
            uc = nodal_poly(gc, exps)
            uf = gf.interpolate(gc, uc)
            np.testing.assert_allclose(np.asarray(uf),
                                       np.asarray(nodal_poly(gf, exps)),
                                       atol=1e-13,
                                       err_msg=f"deg={degree} exps={exps}")

    @pytest.mark.parametrize("degree", [1, 2])
    def test_inject_decimates(self, degree):
        gf = FEGrid(M=(8, 8, 8), degree=degree)
        gc = gf.coarsen()
        uf = nodal_poly(gf, (degree, 1, 0))
        uc = gf.inject(uf)
        np.testing.assert_allclose(np.asarray(uc),
                                   np.asarray(nodal_poly(gc, (degree, 1, 0))),
                                   rtol=1e-13)

    @pytest.mark.parametrize("degree", [1, 2])
    def test_restrict_is_interp_transpose(self, degree):
        """<P uc, vf> == <uc, R vf> exactly (t045-ferestrict analog)."""
        gf = FEGrid(M=(4, 4, 4), degree=degree)
        gc = gf.coarsen()
        rng = np.random.default_rng(0)
        uc = jnp.asarray(rng.standard_normal(gc.nodes))
        vf = jnp.asarray(rng.standard_normal(gf.nodes))
        lhs = float(jnp.sum(gf.interpolate(gc, uc) * vf))
        rhs = float(jnp.sum(uc * gf.restrict(gc, vf)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


class TestOp:
    @pytest.mark.parametrize("name,degree", [("poisson1", 1),
                                             ("poisson2", 2),
                                             ("poisson2affine", 2)])
    def test_residual_of_interpolant_converges(self, name, degree):
        """||A u_I - F|| -> 0 under refinement (t100-poisson analog): the
        nodal interpolant of the analytic solution nearly solves the
        discrete system."""
        op = get_fe_op(name)
        rs = []
        for m in (4, 8):
            g = FEGrid(M=(m, m, m), degree=degree)
            X = g.node_coords()
            u = op.solution_nodes(g, X, "sine")
            f = op.forcing(g, X, "sine")
            r = f - op.apply(g, X, u)
            rs.append(float(jnp.linalg.norm(r.ravel())
                            / jnp.linalg.norm(f.ravel())))
        assert rs[1] < rs[0] * 0.6, rs

    @pytest.mark.parametrize("name", ["poisson1", "poisson2"])
    def test_apply_symmetric(self, name):
        op = get_fe_op(name)
        g = FEGrid(M=(4, 4, 4), degree=op.degree)
        X = g.node_coords()
        rng = np.random.default_rng(1)
        u = g.zero_boundaries(jnp.asarray(rng.standard_normal(g.nodes)))
        v = g.zero_boundaries(jnp.asarray(rng.standard_normal(g.nodes)))
        d1 = float(jnp.sum(op.apply(g, X, u) * v))
        d2 = float(jnp.sum(u * op.apply(g, X, v)))
        np.testing.assert_allclose(d1, d2, rtol=1e-12)

    @pytest.mark.parametrize("name", ["poisson1", "poisson2",
                                      "poisson2affine"])
    def test_diagonal_matches_probe(self, name):
        """diag(A) matches one-hot probes of the assembled operator
        (t110-poissondiag analog)."""
        op = get_fe_op(name)
        g = FEGrid(M=(2, 2, 2), degree=op.degree)
        X = g.node_coords()
        d = op.diagonal(g, X)
        # probe interior nodes only (boundary rows are identity)
        for idx in [(1, 1, 1)] + ([(1, 2, 1), (3, 2, 1)]
                                  if op.degree == 2 else []):
            e = jnp.zeros(g.nodes).at[idx].set(1.0)
            probe = float(op.apply(g, X, e)[idx])
            np.testing.assert_allclose(probe, float(d[idx]), rtol=1e-12,
                                       err_msg=str(idx))

    def test_affine_matches_full_metric(self):
        """poisson2affine == poisson2 on the uniform grid."""
        op2 = get_fe_op("poisson2")
        opa = get_fe_op("poisson2affine")
        g = FEGrid(M=(4, 4, 4), degree=2)
        X = g.node_coords()
        rng = np.random.default_rng(2)
        u = g.zero_boundaries(jnp.asarray(rng.standard_normal(g.nodes)))
        np.testing.assert_allclose(np.asarray(op2.apply(g, X, u)),
                                   np.asarray(opa.apply(g, X, u)),
                                   rtol=1e-11, atol=1e-12)


class TestFAS:
    @pytest.mark.parametrize("name,degree,rate_lo",
                             [("poisson1", 1, 1.6), ("poisson2", 2, 2.5)])
    def test_fmg_discretization_error_and_rate(self, name, degree, rate_lo):
        """One F-cycle reaches discretization error; e_L2 improves at
        ~order degree+1 per refinement (t220/t230 headline property;
        reference golden: Q2 e rates ~3.0, README.md:82-87)."""
        op = get_fe_op(name)
        stats = {}
        for m in (4, 8):
            g = FEGrid(M=(m, m, m), degree=degree)
            levels = build_fe_levels(g, op)
            f = op.forcing(levels[0].grid, levels[0].coords, "sine")
            u = jax.jit(lambda levels, f: fas_fcycle(op, levels, 0, f))(
                levels, f)
            r2, emax, el2 = [float(x) for x in
                             diagnostics(op, levels[0], f, u, "sine")]
            stats[m] = (r2, emax, el2)
        rate = np.log2(stats[4][2] / stats[8][2])
        assert rate > rate_lo, stats
        # V-cycles after F improve r, not e (t220 second table)
        g = FEGrid(M=(8, 8, 8), degree=degree)
        levels = build_fe_levels(g, op)
        f = op.forcing(levels[0].grid, levels[0].coords, "sine")
        u = fas_fcycle(op, levels, 0, f)
        r0, e0, _ = [float(x) for x in diagnostics(op, levels[0], f, u, "sine")]
        u = fas_vcycle(op, levels, 0, f, u)
        r1, e1, _ = [float(x) for x in diagnostics(op, levels[0], f, u, "sine")]
        assert r1 < 0.3 * r0, (r0, r1)
        assert abs(e1 - e0) < 0.3 * e0 + 1e-12, (e0, e1)

    @pytest.mark.parametrize("solution", ["wave", "hump"])
    def test_other_solutions(self, solution):
        op = get_fe_op("poisson2")
        g = FEGrid(M=(4, 4, 4), degree=2)
        levels = build_fe_levels(g, op)
        f = op.forcing(levels[0].grid, levels[0].coords, solution)
        u = fas_fcycle(op, levels, 0, f)
        r2, emax, el2 = [float(x) for x in
                         diagnostics(op, levels[0], f, u, solution)]
        assert r2 < 0.05, (r2, emax, el2)

    def test_anisotropic_grid(self):
        """-M 8,16,24-style anisotropic grids (t220 uses -M 8,16,24)."""
        op = get_fe_op("poisson1")
        g = FEGrid(M=(2, 4, 6), degree=1,
                   L=(2 / 6, 4 / 6, 1.0))  # L scaled like fmg.c:60-63
        levels = build_fe_levels(g, op)
        f = op.forcing(levels[0].grid, levels[0].coords, "sine")
        u = fas_fcycle(op, levels, 0, f)
        r2, _, _ = [float(x) for x in diagnostics(op, levels[0], f, u, "sine")]
        assert r2 < 0.2, r2

    def test_coarsest_cg_solves(self):
        """CG on a small level. Note the hierarchy bottoms out at M=1 where
        ALL nodes are boundary (0 equations, f == 0) — CG must be a no-op
        there without NaNs; the 2^3 level has real equations to solve."""
        op = get_fe_op("poisson1")
        g = FEGrid(M=(2, 2, 2), degree=1)
        levels = build_fe_levels(g, op)
        # trivial bottom: must not produce NaN
        Lb = levels[-1]
        fb = op.forcing(Lb.grid, Lb.coords, "sine")
        ub = cg(op, Lb, fb, jnp.zeros(Lb.grid.nodes, fb.dtype), max_iters=5)
        assert not bool(jnp.isnan(ub).any())
        # real solve on the 2^3 level
        L = levels[0]
        f = op.forcing(L.grid, L.coords, "sine")
        u = cg(op, L, f, jnp.zeros(L.grid.nodes, f.dtype), max_iters=50)
        r = f - op.apply(L.grid, L.coords, u)
        rel = float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(f.ravel()))
        assert rel < 1e-8, rel


class TestFEOptions:
    def test_added_quadrature_points(self):
        """-add_quad_pts (fmg.c:71, TestAddedQuadPts analog): extra Gauss
        points change nothing qualitative for affine geometry."""
        op = get_fe_op("poisson2")
        g = FEGrid(M=(4, 4, 4), degree=2, addquadpts=1)
        assert g.ref.Q == 4
        levels = build_fe_levels(g, op)
        f = op.forcing(levels[0].grid, levels[0].coords, "sine")
        u = fas_fcycle(op, levels, 0, f)
        r2, emax, el2 = [float(x) for x in
                         diagnostics(op, levels[0], f, u, "sine")]
        assert r2 < 0.05 and el2 < 0.1, (r2, emax, el2)

    def test_coordinate_distortion(self):
        """-coord_distort (fmg.c:70, DMCoordDistort analog): the FMG cycle
        still converges on a smoothly distorted mesh (non-affine metric)."""
        op = get_fe_op("poisson2")
        g = FEGrid(M=(4, 4, 4), degree=2)
        levels = build_fe_levels(g, op, distort=0.05)
        f = op.forcing(levels[0].grid, levels[0].coords, "sine")
        u = fas_fcycle(op, levels, 0, f)
        r2, emax, el2 = [float(x) for x in
                         diagnostics(op, levels[0], f, u, "sine")]
        assert r2 < 0.1 and el2 < 0.2, (r2, emax, el2)


    def test_distortion_matches_reference_formula(self):
        """node_coords(distort=0.05) reproduces DMCoordDistort
        (fmg.c:396-419) exactly: theta = 0.1*cos^2(pi*r/2)*sin(pi*z)
        swirl about the (x,y) center, z fixed, boundaries fixed."""
        import math

        import numpy as np

        from hpgmg_tpu.fe.grid import FEGrid

        g = FEGrid(M=(4, 4, 4), degree=2)
        X = np.asarray(g.node_coords(distort=0.05))
        undistorted = np.asarray(g.node_coords())
        nx, ny, nz = g.nodes
        for idx in [(0, 0, 0), (2, 3, 4), (4, 4, 4), (nx - 1, 0, 3),
                    (3, 3, 3), (1, 7, 5)]:
            i, j, k = (min(a, s - 1) for a, s in zip(idx, (nx, ny, nz)))
            x, y, z = (undistorted[d, i, j, k] for d in range(3))
            r = min(math.sqrt((2 * x - 1) ** 2 + (2 * y - 1) ** 2), 1.0)
            theta = 0.1 * math.cos(math.pi * r / 2) ** 2 \
                * math.sin(math.pi * z)
            newx = 0.5 + math.cos(theta) * (x - 0.5) \
                - math.sin(theta) * (y - 0.5)
            newy = 0.5 + math.sin(theta) * (x - 0.5) \
                + math.cos(theta) * (y - 0.5)
            assert abs(X[0, i, j, k] - newx) < 1e-12
            assert abs(X[1, i, j, k] - newy) < 1e-12
            assert abs(X[2, i, j, k] - z) < 1e-15
        # domain boundary nodes do not move (r == 1 or sin(pi z) == 0)
        assert np.allclose(X[:, 0, :, :], undistorted[:, 0, :, :])
        assert np.allclose(X[:, :, :, 0], undistorted[:, :, :, 0])
        assert np.allclose(X[:, :, :, -1], undistorted[:, :, :, -1])
        # interior nodes do move
        assert not np.allclose(X[0], undistorted[0])
