"""Unit tests for ghost fill and inter-level transfers.

Mirrors the reference FE test ladder t030/t040/t045 (inject/interp/restrict
exactness) applied to the FV transfer kernels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hpgmg_tpu.core.config import BC
from hpgmg_tpu.ops.bc import ghost_fill_linear
from hpgmg_tpu.ops.transfer import (get_interpolation, restrict_cell,
                                    restrict_face_i, restrict_face_j,
                                    restrict_face_k)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape))


class TestGhostFill:
    def test_dirichlet_face_edge_corner_signs(self):
        """faces -1, edges +1, corners -1 (boundary_fd.c:27-29)."""
        x = _rand((4, 4, 4))
        g = ghost_fill_linear(x, BC.DIRICHLET, 1)
        assert g.shape == (6, 6, 6)
        np.testing.assert_allclose(g[0, 1:-1, 1:-1], -x[0])  # low-i face
        np.testing.assert_allclose(g[-1, 1:-1, 1:-1], -x[-1])  # high-i face
        np.testing.assert_allclose(g[0, 0, 1:-1], x[0, 0])  # edge: ++
        np.testing.assert_allclose(g[0, 0, 0], -x[0, 0, 0])  # corner: -
        np.testing.assert_allclose(g[1:-1, 1:-1, 1:-1], x)

    def test_dirichlet_zero_at_boundary(self):
        """Cell + ghost average to zero on the physical face."""
        x = _rand((8, 8, 8), 1)
        g = ghost_fill_linear(x, BC.DIRICHLET, 1)
        face_value = 0.5 * (g[0, 1:-1, 1:-1] + g[1, 1:-1, 1:-1])
        np.testing.assert_allclose(face_value, 0.0, atol=1e-14)

    def test_periodic_wrap(self):
        x = _rand((4, 4, 4), 2)
        g = ghost_fill_linear(x, BC.PERIODIC, 1)
        np.testing.assert_allclose(g[0, 1:-1, 1:-1], x[-1])
        np.testing.assert_allclose(g[-1, 1:-1, 1:-1], x[0])
        np.testing.assert_allclose(g[0, 0, 0], x[-1, -1, -1])

    def test_radius2(self):
        x = _rand((4, 4, 4), 3)
        g = ghost_fill_linear(x, BC.DIRICHLET, 2)
        assert g.shape == (8, 8, 8)
        np.testing.assert_allclose(g[1, 2:-2, 2:-2], -x[0])
        np.testing.assert_allclose(g[0, 2:-2, 2:-2], -x[1])


class TestRestriction:
    def test_cell_average(self):
        xf = _rand((8, 8, 8), 4)
        xc = restrict_cell(xf)
        assert xc.shape == (4, 4, 4)
        np.testing.assert_allclose(
            xc[1, 2, 3], np.mean(np.asarray(xf[2:4, 4:6, 6:8])), rtol=1e-14)

    def test_cell_preserves_constants(self):
        xf = jnp.full((8, 8, 8), 3.25)
        np.testing.assert_allclose(restrict_cell(xf), 3.25)

    def test_pool_matches_einsum(self):
        """reduce_window restriction (the TPU >=256^3 dispatch in
        restrict_cell) is the same 8->1 average as the einsum form."""
        from hpgmg_tpu.ops.transfer import restrict_pool

        xf = _rand((16, 8, 12), 11)
        np.testing.assert_allclose(restrict_pool(xf), restrict_cell(xf),
                                   rtol=1e-13)

    @pytest.mark.parametrize("axis,fn", [(0, restrict_face_i),
                                         (1, restrict_face_j),
                                         (2, restrict_face_k)])
    def test_face_average(self, axis, fn):
        shape = [8, 8, 8]
        shape[axis] = 9
        bf = _rand(tuple(shape), 5 + axis)
        bc = fn(bf)
        expect_shape = [4, 4, 4]
        expect_shape[axis] = 5
        assert bc.shape == tuple(expect_shape)
        # coarse face (0,0,0) averages the 4 fine faces at even plane 0
        sl = [slice(0, 2), slice(0, 2), slice(0, 2)]
        sl[axis] = 0
        np.testing.assert_allclose(
            bc[0, 0, 0], np.mean(np.asarray(bf[tuple(sl)])), rtol=1e-14)


class TestInterpolation:
    def test_p0_injection(self):
        xc = _rand((4, 4, 4), 7)
        xf = get_interpolation("p0")(xc, 0.0, None, BC.DIRICHLET)
        assert xf.shape == (8, 8, 8)
        np.testing.assert_allclose(xf[2, 3, 5], xc[1, 1, 2])
        np.testing.assert_allclose(xf[3, 3, 4], xc[1, 1, 2])

    def test_p0_prescale_accumulates(self):
        xc = jnp.ones((2, 2, 2))
        base = jnp.full((4, 4, 4), 2.0)
        out = get_interpolation("p0")(xc, 1.0, base, BC.DIRICHLET)
        np.testing.assert_allclose(out, 3.0)

    def test_p1_weights_interior(self):
        """Fine cell gets 27/64, 9/64, 3/64, 1/64 from its coarse neighbors
        (interpolation_p1.c:54-62)."""
        xc = jnp.zeros((4, 4, 4)).at[1, 1, 1].set(1.0)
        xf = get_interpolation("p1")(xc, 0.0, None, BC.DIRICHLET)
        # odd,odd,odd child of coarse (1,1,1) looks forward: center weight
        np.testing.assert_allclose(xf[3, 3, 3], 27.0 / 64.0)
        np.testing.assert_allclose(xf[2, 3, 3], 27.0 / 64.0)
        # neighbor coarse cell (2,1,1)'s even child pulls 9/64... check a
        # child of coarse (2,1,1): fine (4,3,3) is even-i -> looks to i-1
        np.testing.assert_allclose(xf[4, 3, 3], 9.0 / 64.0)
        np.testing.assert_allclose(xf[4, 4, 3], 3.0 / 64.0)
        np.testing.assert_allclose(xf[4, 4, 4], 1.0 / 64.0)

    def test_p1_reproduces_linear_periodic_constants(self):
        """Trilinear interpolation is exact on constants (periodic BC)."""
        xc = jnp.full((4, 4, 4), 1.7)
        xf = get_interpolation("p1")(xc, 0.0, None, BC.PERIODIC)
        np.testing.assert_allclose(xf, 1.7, rtol=1e-14)

    def test_p1_linear_exactness_interior(self):
        """Exact on linear fields away from the boundary."""
        n = 8
        idx = jnp.arange(n) + 0.5
        xc = (idx[:, None, None] + 2.0 * idx[None, :, None]
              + 3.0 * idx[None, None, :])
        xf = get_interpolation("p1")(xc, 0.0, None, BC.DIRICHLET)
        # fine cell center in coarse index units: (i_f + 0.5) / 2
        idxf = (jnp.arange(2 * n) + 0.5) / 2.0
        expect = (idxf[:, None, None] + 2.0 * idxf[None, :, None]
                  + 3.0 * idxf[None, None, :])
        np.testing.assert_allclose(xf[2:-2, 2:-2, 2:-2],
                                   expect[2:-2, 2:-2, 2:-2], rtol=1e-13)

    def test_v2_constant_exact_periodic(self):
        xc = jnp.full((4, 4, 4), -2.5)
        xf = get_interpolation("v2")(xc, 0.0, None, BC.PERIODIC)
        np.testing.assert_allclose(xf, -2.5, rtol=1e-14)
