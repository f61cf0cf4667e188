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
        """(3, Nx, Ny, Nz) nodal coordinates; ``distort`` applies the
        reference's smooth "swirl" distortion (DMCoordDistort,
        fmg.c:396-419): rotate (x, y) about the domain axis by
        theta = A * cos^2(pi*r/2) * sin(pi*z) with r the clipped radial
        distance of the normalized (x, y) from the axis; z unchanged.
        The reference hard-codes A = 0.1 ("5% distortion"); here
        ``distort=0.05`` reproduces that (A = 2*distort), and other
        values scale the same swirl."""
        xs = [self.node_coords_1d(a, dtype) for a in range(3)]
        X = jnp.stack(jnp.meshgrid(*xs, indexing="ij"))
        if distort:
            pi = jnp.pi
            x = X[0] / self.L[0]
            y = X[1] / self.L[1]
            z = X[2] / self.L[2]
            r = jnp.minimum(
                jnp.sqrt((2 * x - 1) ** 2 + (2 * y - 1) ** 2), 1.0)
            theta = (2.0 * distort) * jnp.cos(pi * r / 2) ** 2 \
                * jnp.sin(pi * z)
            c, s = jnp.cos(theta), jnp.sin(theta)
            newx = (0.5 + c * (x - 0.5) - s * (y - 0.5)) * self.L[0]
            newy = (0.5 + s * (x - 0.5) + c * (y - 0.5)) * self.L[1]
            X = jnp.stack([newx, newy, X[2]])
        return X

    # ------------------------------------------------------------------
    # element gather / scatter
    # ------------------------------------------------------------------

    def _gather_matrix(self, axis: int, dtype) -> jax.Array:
        """(P*M, N) one-axis element-gather matrix: row l*M + e selects
        node p*e + l. Extraction/assembly as matrices instead of stride-p
        slices / interleaved scatter-adds — strided lane access is
        pathologically slow on TPU and composes badly with GSPMD (see
        ops/transfer.py); the matrix form is an MXU matmul and its exact
        transpose is the ADD_VALUES assembly."""
        p = self.degree
        P = p + 1
        M = self.M[axis]
        N = self.nodes[axis]
        ll = jnp.arange(P)[:, None]
        ee = jnp.arange(M)[None, :]
        G = jnp.zeros((P * M, N), dtype)
        return G.at[ll * M + ee, p * ee + ll].set(1.0)

    def extract_elements(self, u: jax.Array) -> jax.Array:
        """(Nx,Ny,Nz) -> (P,P,P, Mx,My,Mz): element-local node values
        (DMFEExtractElements, grid.c:936) via three per-axis gather-matrix
        einsums.

        Local (basis) indices lead and the element batch trails — the TPU
        layout rule behind the reference's "ne innermost" SIMD ordering
        (grid.c:933-935): the trailing two dims must be the large batch
        dims or the (8,128) tiling pads small trailing dims by ~100x."""
        P = self.degree + 1
        Mx, My, Mz = self.M
        pr = jax.lax.Precision.HIGHEST
        Gx, Gy, Gz = (self._gather_matrix(a, u.dtype) for a in range(3))
        t = jnp.einsum("ai,ijk->ajk", Gx, u, precision=pr)
        t = t.reshape(P, Mx, *t.shape[1:])
        t = jnp.einsum("bj,pmjk->pmbk", Gy, t, precision=pr)
        t = t.reshape(P, Mx, P, My, t.shape[-1])
        t = jnp.einsum("ck,pmqnk->pmqnc", Gz, t, precision=pr)
        t = t.reshape(P, Mx, P, My, P, Mz)
        return t.transpose(0, 2, 4, 1, 3, 5)

    def assemble_add(self, E: jax.Array) -> jax.Array:
        """(P,P,P, Mx,My,Mz) element contributions -> (Nx,Ny,Nz) node array,
        overlapping nodes summed (LocalToGlobal ADD_VALUES) — exactly the
        transposed gather matrices, so the shared-node accumulation is the
        matmul's contraction (no scatter op at all)."""
        P = self.degree + 1
        Mx, My, Mz = self.M
        pr = jax.lax.Precision.HIGHEST
        Gx, Gy, Gz = (self._gather_matrix(a, E.dtype) for a in range(3))
        t = E.transpose(0, 3, 1, 4, 2, 5)           # (P,Mx,P,My,P,Mz)
        t = t.reshape(P, Mx, P, My, P * Mz)
        t = jnp.einsum("ck,pmqnc->pmqnk", Gz, t, precision=pr)
        t = t.reshape(P, Mx, P * My, t.shape[-1])
        t = jnp.einsum("bj,pmbk->pmjk", Gy, t, precision=pr)
        t = t.reshape(P * Mx, *t.shape[2:])
        return jnp.einsum("ai,ajk->ijk", Gx, t, precision=pr)

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
    #
    # All three transfers are separable linear operators and are applied
    # as per-axis matrix einsums (MXU) — strided slicing / interleaving on
    # TPU lane axes is pathologically slow (see ops/transfer.py) and
    # composes badly with GSPMD sharding of the unevenly-sized node
    # arrays. The 1D matrices are built by running the original stencil
    # code on an identity, so the operators are unchanged.
    # ------------------------------------------------------------------

    def _sep_apply3(self, Ws, x):
        """Apply per-axis matrices Ws[a] (out_a, in_a) to a 3D node field."""
        pr = jax.lax.Precision.HIGHEST
        x = jnp.einsum("ai,ijk->ajk", Ws[0], x, precision=pr)
        x = jnp.einsum("bj,ajk->abk", Ws[1], x, precision=pr)
        return jnp.einsum("ck,abk->abc", Ws[2], x, precision=pr)

    def _inject_matrices(self, dtype):
        """(nc, nf) selection of every 2nd fine node per axis."""
        return [jnp.eye(self.nodes[a], dtype=dtype)[::2]
                for a in range(3)]

    def _interp_matrices(self, coarse_grid: "FEGrid", dtype):
        """(nf, nc) per-axis interpolation matrices: the 1D pass
        (_interp_axis) applied to an identity."""
        return [self._interp_axis(
            coarse_grid,
            jnp.eye(coarse_grid.nodes[a], dtype=dtype), 0,
            out_axis=a) for a in range(3)]

    def inject(self, u_fine: jax.Array) -> jax.Array:
        """State restriction Rhat: coarse nodes are every 2nd fine node
        (DMFEInject, grid.c:543-562)."""
        return self._sep_apply3(self._inject_matrices(u_fine.dtype), u_fine)

    def _interp_axis(self, coarse_grid: "FEGrid", u: jax.Array,
                     axis: int, out_axis: int = None) -> jax.Array:
        """One separable pass of DMFEInterpolate (grid.c:567-640): even fine
        nodes copy the coarse node; the ``degree`` non-nested fine nodes in
        each coarse element get the reference interp weights.

        ``out_axis``: the GRID axis whose extents apply (defaults to the
        array axis ``axis``; they differ when building the per-axis
        operator matrix from a 2D identity)."""
        p = self.degree
        W = self.ref.interp_weights()  # (p, P)
        ga = axis if out_axis is None else out_axis
        mc = coarse_grid.M[ga]  # coarse elements along axis
        nf = self.nodes[ga]
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
        Ws = self._interp_matrices(coarse_grid, u_coarse.dtype)
        return self._sep_apply3(Ws, u_coarse)

    def restrict(self, coarse_grid: "FEGrid", v_fine: jax.Array) -> jax.Array:
        """R = P^T: residual restriction (DMFERestrict, grid.c:645-731) —
        exactly the transposed interpolation matrices, so the transpose
        relation holds by construction."""
        Ws = self._interp_matrices(coarse_grid, v_fine.dtype)
        return self._sep_apply3([W.T for W in Ws], v_fine)
