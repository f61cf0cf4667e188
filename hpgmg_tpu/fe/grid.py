"""FE grid: node fields, element gather/scatter, inter-grid transfers.

Rebuild of the reference Grid/DM layer (finite-element/grid.c). The
reference distributes an element range per rank with PetscSF halos
(grid.c:166-292, 1037-1109); here a level is ONE global node array per
field, shape (Nx, Ny, Nz) with N = degree*M + 1, and all the SF machinery
(halo bcast, injection SFs, C-point fringes) disappears into XLA slicing —
sharded arrays get their halos from the SPMD partitioner.

Key kernels:

* extract_elements (DMFEExtractElements, grid.c:936): node array ->
  batched element tensor (P, P, P, Mx, My, Mz) via P^3 strided slices
  (local indices lead, element batch trails: the TPU analog of the
  reference's ne-innermost SIMD ordering).
* assemble_add (DMFESetElements ADD_VALUES, grid.c:969): the transpose
  scatter-add. Strided writes are expressed as an interleave-with-zeros
  reshape + ONE dense slice-add per local node offset — no scatter op, so
  it maps onto the VPU instead of TPU-hostile scatters.
* inject / interpolate / restrict (DMFEInject/Interpolate/Restrict,
  grid.c:543-731): decimation; separable per-axis C-point copy +
  interp-weight fill; and the exact transpose accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hpgmg_tpu.fe.reference import ReferenceElement


@dataclasses.dataclass(frozen=True)
class FEGrid:
    """Static description of one FE level (the Grid+DM analog)."""

    M: Tuple[int, int, int]  # elements per axis
    degree: int  # 1 (Q1) or 2 (Q2)
    L: Tuple[float, float, float] = (1.0, 1.0, 1.0)  # domain lengths
    addquadpts: int = 0

    @property
    def ref(self) -> ReferenceElement:
        return ReferenceElement(self.degree, self.addquadpts)

    @property
    def nodes(self) -> Tuple[int, int, int]:
        return tuple(self.degree * m + 1 for m in self.M)

    @property
    def ndof(self) -> int:
        nx, ny, nz = self.nodes
        return nx * ny * nz

    @property
    def neq(self) -> int:
        """Number of equations = interior nodes (Dirichlet)."""
        return int(np.prod([n - 2 for n in self.nodes]))

    def can_coarsen(self) -> bool:
        return all(m % 2 == 0 for m in self.M)

    def coarsen(self) -> "FEGrid":
        assert self.can_coarsen(), self.M
        return dataclasses.replace(self, M=tuple(m // 2 for m in self.M))

    def num_levels(self) -> int:
        g, n = self, 1
        while g.can_coarsen():
            g, n = g.coarsen(), n + 1
        return n

    # ------------------------------------------------------------------
    # coordinates
    # ------------------------------------------------------------------

    def node_coords_1d(self, axis: int, dtype=jnp.float64):
        n = self.nodes[axis]
        return jnp.linspace(0.0, self.L[axis], n, dtype=dtype)

    def node_coords(self, dtype=jnp.float64, distort: float = 0.0):
        """(3, Nx, Ny, Nz) nodal coordinates; ``distort`` applies the smooth
        in-cube distortion used by the reference drivers (DMCoordDistort,
        fmg.c:396-419 uses ~5%)."""
        xs = [self.node_coords_1d(a, dtype) for a in range(3)]
        X = jnp.stack(jnp.meshgrid(*xs, indexing="ij"))
        if distort:
            # smooth, boundary-preserving: x += eps*L*sin(pi x/L)*... per axis
            pi = jnp.pi
            s = [jnp.sin(pi * X[a] / self.L[a]) for a in range(3)]
            bump = s[0] * s[1] * s[2]
            X = jnp.stack([X[a] + distort * self.L[a] * bump for a in range(3)])
        return X

    # ------------------------------------------------------------------
    # element gather / scatter
    # ------------------------------------------------------------------

    def extract_elements(self, u: jax.Array) -> jax.Array:
        """(Nx,Ny,Nz) -> (P,P,P, Mx,My,Mz): element-local node values.

        Local (basis) indices lead and the element batch trails — the TPU
        layout rule behind the reference's "ne innermost" SIMD ordering
        (grid.c:933-935): the trailing two dims must be the large batch
        dims or the (8,128) tiling pads small trailing dims by ~100x."""
        p = self.degree
        P = p + 1
        Mx, My, Mz = self.M
        parts = []
        for i in range(P):
            ui = lax.slice_in_dim(u, i, i + p * (Mx - 1) + 1, stride=p, axis=0)
            for j in range(P):
                uj = lax.slice_in_dim(ui, j, j + p * (My - 1) + 1, stride=p,
                                      axis=1)
                for k in range(P):
                    parts.append(lax.slice_in_dim(
                        uj, k, k + p * (Mz - 1) + 1, stride=p, axis=2))
        E = jnp.stack(parts, axis=0)  # (P^3, Mx,My,Mz)
        return E.reshape(P, P, P, Mx, My, Mz)

    def _strided_add_axis(self, v: jax.Array, y: jax.Array, offset: int,
                          axis: int) -> jax.Array:
        """v[offset + p*e along axis] += y[e] without scatter: interleave y
        with zeros to a dense contiguous block, then one slice-add."""
        p = self.degree
        m = y.shape[axis]
        if p == 1:
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(offset, offset + m)
            return v.at[tuple(sl)].add(y)
        # stride p: interleave (p-1) zero planes after each entry
        shape = list(y.shape)
        shape.insert(axis + 1, p)
        buf = jnp.zeros(shape, y.dtype)
        idx = [slice(None)] * len(shape)
        idx[axis + 1] = 0
        buf = buf.at[tuple(idx)].set(y)
        merged = list(y.shape)
        merged[axis] = m * p
        dense = buf.reshape(merged)
        # positions offset .. offset + p*(m-1): drop the trailing zeros
        sl_d = [slice(None)] * v.ndim
        sl_d[axis] = slice(0, p * (m - 1) + 1)
        sl_v = [slice(None)] * v.ndim
        sl_v[axis] = slice(offset, offset + p * (m - 1) + 1)
        return v.at[tuple(sl_v)].add(dense[tuple(sl_d)])

    def assemble_add(self, E: jax.Array) -> jax.Array:
        """(P,P,P, Mx,My,Mz) element contributions -> (Nx,Ny,Nz) node array,
        overlapping nodes summed (LocalToGlobal ADD_VALUES)."""
        P = self.degree + 1
        v = jnp.zeros(self.nodes, E.dtype)
        for i in range(P):
            for j in range(P):
                for k in range(P):
                    y = E[i, j, k]
                    t = self._strided_add_axis(
                        jnp.zeros((self.nodes[0],) + y.shape[1:], y.dtype),
                        y, i, 0)
                    t = self._strided_add_axis(
                        jnp.zeros((t.shape[0], self.nodes[1], t.shape[2]),
                                  y.dtype), t, j, 1)
                    v = self._strided_add_axis(v, t, k, 2)
        return v

    # ------------------------------------------------------------------
    # boundary
    # ------------------------------------------------------------------

    def zero_boundaries(self, u: jax.Array) -> jax.Array:
        """Zero the global-boundary nodes (DMFEZeroBoundaries,
        grid.c:733-759; homogeneous Dirichlet)."""
        nx, ny, nz = self.nodes
        mask_x = (jnp.arange(nx) > 0) & (jnp.arange(nx) < nx - 1)
        mask_y = (jnp.arange(ny) > 0) & (jnp.arange(ny) < ny - 1)
        mask_z = (jnp.arange(nz) > 0) & (jnp.arange(nz) < nz - 1)
        mask = (mask_x[:, None, None] & mask_y[None, :, None]
                & mask_z[None, None, :])
        return jnp.where(mask, u, 0.0)

    # ------------------------------------------------------------------
    # inter-grid transfers
    # ------------------------------------------------------------------

    def inject(self, u_fine: jax.Array) -> jax.Array:
        """State restriction Rhat: coarse nodes are every 2nd fine node
        (DMFEInject, grid.c:543-562)."""
        return u_fine[::2, ::2, ::2]

    def _interp_axis(self, coarse_grid: "FEGrid", u: jax.Array,
                     axis: int) -> jax.Array:
        """One separable pass of DMFEInterpolate (grid.c:567-640): even fine
        nodes copy the coarse node; the ``degree`` non-nested fine nodes in
        each coarse element get the reference interp weights."""
        p = self.degree
        W = self.ref.interp_weights()  # (p, P)
        mc = coarse_grid.M[axis]  # coarse elements along axis
        nf = self.nodes[axis]
        # coarse-node count along axis: p*mc + 1
        # element-local coarse nodes: EC[e, l] = u[p*e + l], l in 0..p
        slices = [lax.slice_in_dim(u, l, l + p * (mc - 1) + 1, stride=p,
                                   axis=axis) for l in range(p + 1)]
        fills = []
        for f in range(p):  # non-nested fine nodes inside the coarse element
            fill = sum(float(W[f, l]) * slices[l] for l in range(p + 1))
            fills.append(fill)
        # fine layout within coarse element e (2p fine intervals):
        #   fine node 2p*e + 2l   = coarse node p*e + l       (C-points)
        #   fine node 2p*e + 2f+1 = fills[f][e]
        out_parts = []
        for r in range(2 * p):  # interleave per position within the element
            if r % 2 == 0:
                out_parts.append(slices[r // 2])
            else:
                out_parts.append(fills[r // 2])
        inter = jnp.stack(out_parts, axis=axis + 1)
        shape = list(slices[0].shape)
        shape[axis] = mc * 2 * p
        inter = inter.reshape(shape)
        # append the last C-point (global high-face node)
        last = lax.slice_in_dim(u, p * mc, p * mc + 1, axis=axis)
        out = jnp.concatenate([inter, last], axis=axis)
        assert out.shape[axis] == nf, (out.shape, nf)
        return out

    def interpolate(self, coarse_grid: "FEGrid", u_coarse: jax.Array) -> jax.Array:
        """P: coarse nodes -> fine nodes, separable per axis."""
        u = u_coarse
        for axis in range(3):
            u = self._interp_axis(coarse_grid, u, axis)
        return u

    def _restrict_axis(self, coarse_grid: "FEGrid", v: jax.Array,
                       axis: int) -> jax.Array:
        """Transpose of _interp_axis: accumulate fine-node values into
        coarse nodes (DMFERestrict, grid.c:645-731)."""
        p = self.degree
        W = self.ref.interp_weights()
        mc = coarse_grid.M[axis]
        nc = p * mc + 1
        # split fine nodes into per-element groups of 2p + trailing node
        body = lax.slice_in_dim(v, 0, 2 * p * mc, axis=axis)
        shape = list(v.shape)
        shape[axis] = mc
        shape.insert(axis + 1, 2 * p)
        body = body.reshape(shape)

        def pos(r):
            idx = [slice(None)] * body.ndim
            idx[axis + 1] = r
            return body[tuple(idx)]

        out_shape = list(v.shape)
        out_shape[axis] = nc
        out = jnp.zeros(out_shape, v.dtype)

        def add_strided(out, y, offset):
            return self._strided_add_axis(out, y, offset, axis)

        # C-point rows add directly
        for l in range(p + 1):
            if l < p:
                out = add_strided(out, pos(2 * l), l)
        # the trailing global C-point and the per-element high C-point:
        # fine node 2p*e + 2p == coarse p*e + p belongs to element e's last
        # C-point — handled via the next element's position 0 except the
        # final one; accumulate it explicitly:
        last = lax.slice_in_dim(v, 2 * p * mc, 2 * p * mc + 1, axis=axis)
        sl = [slice(None)] * out.ndim
        sl[axis] = slice(nc - 1, nc)
        out = out.at[tuple(sl)].add(last)
        # non-nested fine nodes distribute with the interp weights
        for f in range(p):
            y = pos(2 * f + 1)
            for l in range(p + 1):
                out = add_strided(out, float(W[f, l]) * y, l)
        return out

    def restrict(self, coarse_grid: "FEGrid", v_fine: jax.Array) -> jax.Array:
        """R = P^T: residual restriction, separable per axis."""
        v = v_fine
        for axis in range(3):
            v = self._restrict_axis(coarse_grid, v, axis)
        return v
