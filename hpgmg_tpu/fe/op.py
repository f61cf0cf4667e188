"""FE operator layer: matrix-free Poisson via tensor-product contractions.

Rebuild of op/op.c + op/op-poisson1.c. The per-8-element SIMD pipeline
(OpApply_Poisson, op-poisson1.c:112-172) becomes batched einsums over ALL
elements at once — the contraction
``du[m,q1,q2,q3] = D[q1,i] B[q2,j] B[q3,k] u[m,i,j,k]`` is exactly an MXU
batched matmul (the reference's tensor.c/tensor-avx512.c AVX kernels, E9).

Registered op types mirror OpRegister/OpCreateFromOptions (op.c:443-517):
poisson1 (Q1), poisson2 (Q2), poisson2affine (skips per-element metric
recomputation by exploiting the affine geometry, op-poisson1.c:179-238),
and project (mass-matrix L2 projection used by transfer tests,
op-project.c).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.solutions import get_solution


def _contract(E: jax.Array, mats) -> jax.Array:
    """y[m1,m2,m3, q1,q2,q3] = A[q1,i] B[q2,j] C[q3,k] E[m1,m2,m3, i,j,k]
    (TensorContract EVAL, tensor.c:3-61). Three batched matmuls -> MXU."""
    A, B, C = mats
    E = jnp.einsum("qi,mnoijk->mnoqjk", A, E)
    E = jnp.einsum("qj,mnoijk->mnoiqk", B, E)
    return jnp.einsum("qk,mnoijk->mnoijq", C, E)


def _contract_t(Y: jax.Array, mats) -> jax.Array:
    """Transpose contraction (TENSOR_TRANSPOSE): accumulate quad-point data
    back to element nodes."""
    A, B, C = mats
    Y = jnp.einsum("qi,mnoqjk->mnoijk", A, Y)
    Y = jnp.einsum("qj,mnoiqk->mnoijk", B, Y)
    return jnp.einsum("qk,mnoijq->mnoijk", C, Y)


@dataclasses.dataclass(frozen=True)
class FEOp:
    """One physics operator bound to a reference element (Op_private
    analog, op.c:12-95)."""

    name: str
    degree: int
    affine: bool = False  # poisson2affine: constant metric per element
    mass_only: bool = False  # 'project': L2 projection (mass matrix)

    def tensors(self, grid: FEGrid, dtype):
        Bn, Dn, w = grid.ref.tensors()
        return (jnp.asarray(Bn, dtype), jnp.asarray(Dn, dtype),
                jnp.asarray(w, dtype))

    # ------------------------------------------------------------------
    # geometry: metric K[a,b] = w |J| (J^{-1} J^{-T})_{ab} at quad points
    # ------------------------------------------------------------------

    def metric(self, grid: FEGrid, coords: jax.Array):
        """Returns (K, wdxdet): K (Mx,My,Mz,Q,Q,Q,3,3) symmetric metric,
        wdxdet (Mx,My,Mz,Q,Q,Q) quadrature weight x |J|
        (PointwiseJacobianInvert, pointwise.h:7-39)."""
        dtype = coords.dtype
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}
        # J[a, c] = d x_c / d xi_a
        Xe = [grid.extract_elements(coords[c]) for c in range(3)]
        J = jnp.stack([
            jnp.stack([_contract(Xe[c], mats[a]) for c in range(3)], -1)
            for a in range(3)], -2)  # (..., a, c)
        det = jnp.linalg.det(J)
        Jinv = jnp.linalg.inv(J)  # (..., xi_a per x?) inv of (a,c) -> (c,a)
        w3 = (w[:, None, None] * w[None, :, None] * w[None, None, :])
        wdxdet = det * w3
        # K = |J| w (J^{-1} J^{-T}); with J[a,c]=dx_c/dxi_a, grad_x u =
        # sum_a Jinv[c,a] du_a, so K[a,b] = wdxdet * sum_c Jinv[c,a] Jinv[c,b]
        K = jnp.einsum("...ca,...cb->...ab", Jinv, Jinv) * wdxdet[..., None, None]
        return K, wdxdet

    def metric_affine(self, grid: FEGrid, dtype):
        """Uniform-grid shortcut (poisson2affine): one constant diagonal
        metric for all elements (op-poisson1.c:179-238)."""
        _, _, w = self.tensors(grid, dtype)
        hx = [grid.L[a] / grid.M[a] / 2.0 for a in range(3)]  # dx/dxi
        det = hx[0] * hx[1] * hx[2]
        w3 = (w[:, None, None] * w[None, :, None] * w[None, None, :])
        wdxdet = det * w3  # (Q,Q,Q)
        # K = wdxdet * (J^{-1} J^{-T}) = wdxdet * diag(1/h_a^2); wdxdet is
        # applied separately, so the diagonal factor is just 1/h^2
        kdiag = jnp.stack([1.0 / (h * h) for h in hx])  # (3,)
        return kdiag, wdxdet

    # ------------------------------------------------------------------
    # A(u)
    # ------------------------------------------------------------------

    def apply(self, grid: FEGrid, coords: Optional[jax.Array], u: jax.Array,
              metric=None) -> jax.Array:
        """v = A u (OpApply_Poisson pipeline, op-poisson1.c:112-172).

        ``metric`` may carry precomputed (K, wdxdet) to skip the geometry
        contractions (the benchmark-relevant path; geometry is solve-
        invariant)."""
        dtype = u.dtype
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}

        ue = grid.extract_elements(u)

        if self.mass_only:
            if metric is None:
                if self.affine or coords is None:
                    _, wdxdet = self.metric_affine(grid, dtype)
                else:
                    _, wdxdet = self.metric(grid, coords)
            else:
                _, wdxdet = metric
            uq = _contract(ue, (B, B, B))
            vq = wdxdet * uq
            ve = _contract_t(vq, (B, B, B))
            return grid.zero_boundaries(grid.assemble_add(ve))

        du = jnp.stack([_contract(ue, mats[a]) for a in range(3)], -1)
        if self.affine and metric is None:
            kdiag, wdxdet = self.metric_affine(grid, dtype)
            dv = du * (kdiag * wdxdet[None, None, None, ..., None])
        elif metric is not None and metric[0].ndim == 1:
            kdiag, wdxdet = metric
            dv = du * (kdiag * wdxdet[None, None, None, ..., None])
        else:
            K, _ = self.metric(grid, coords) if metric is None else metric
            dv = jnp.einsum("...ab,...b->...a", K, du)
        ve = sum(_contract_t(dv[..., a], mats[a]) for a in range(3))
        return grid.zero_boundaries(grid.assemble_add(ve))

    def make_metric(self, grid: FEGrid, coords: Optional[jax.Array], dtype):
        if self.affine or coords is None:
            return self.metric_affine(grid, dtype)
        return self.metric(grid, coords)

    # ------------------------------------------------------------------
    # forcing / solution / norms / diagonal
    # ------------------------------------------------------------------

    def _quad_coords(self, grid: FEGrid, coords: jax.Array):
        dtype = coords.dtype
        B, D, w = self.tensors(grid, dtype)
        return jnp.stack([
            _contract(grid.extract_elements(coords[c]), (B, B, B))
            for c in range(3)])

    def forcing(self, grid: FEGrid, coords: jax.Array, solution: str) -> jax.Array:
        """Galerkin projection of the analytic forcing (OpForcing,
        op.c:123-180): F = assemble(B^T (w |J| f(x_q)))."""
        dtype = coords.dtype
        B, _, _ = self.tensors(grid, dtype)
        _, wdxdet = self.make_metric(grid, coords, dtype)
        xq = self._quad_coords(grid, coords)
        _, fq = get_solution(solution)(xq, grid.L)
        fe = _contract_t(wdxdet * fq, (B, B, B))
        return grid.zero_boundaries(grid.assemble_add(fe))

    def solution_nodes(self, grid: FEGrid, coords: jax.Array,
                       solution: str) -> jax.Array:
        """Pointwise analytic u at the nodes (OpSolution, op.c:96-121)."""
        u, _ = get_solution(solution)(coords, grid.L)
        return grid.zero_boundaries(u)

    def integrate_norms(self, grid: FEGrid, coords: jax.Array, u: jax.Array,
                        solution: str) -> Tuple[jax.Array, jax.Array]:
        """(e_max, e_L2) of u vs the analytic solution via quadrature,
        normalized by the solution norms (OpIntegrateNorms, op.c:183-250)."""
        dtype = u.dtype
        B, _, _ = self.tensors(grid, dtype)
        _, wdxdet = self.make_metric(grid, coords, dtype)
        xq = self._quad_coords(grid, coords)
        uex, _ = get_solution(solution)(xq, grid.L)
        uq = _contract(grid.extract_elements(u), (B, B, B))
        diff = uq - uex
        e_max = jnp.max(jnp.abs(diff)) / jnp.max(jnp.abs(uex))
        e_l2 = jnp.sqrt(jnp.sum(wdxdet * diff * diff)) \
            / jnp.sqrt(jnp.sum(wdxdet * uex * uex))
        return e_max, e_l2

    def diagonal(self, grid: FEGrid, coords: Optional[jax.Array],
                 dtype=jnp.float64, metric=None) -> jax.Array:
        """Matrix-free diag(A) by probing each element-local basis function
        (OpGetDiagonal, op.c:263-338): P^3 one-hot element probes."""
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}
        if metric is None:
            metric = self.make_metric(grid, coords, dtype)
        P = grid.degree + 1
        diag_elems = jnp.zeros(tuple(grid.M) + (P, P, P), dtype)
        for i in range(P):
            for j in range(P):
                for k in range(P):
                    e = jnp.zeros((1, 1, 1, P, P, P), dtype).at[
                        0, 0, 0, i, j, k].set(1.0)
                    e = jnp.broadcast_to(e, tuple(grid.M) + (P, P, P))
                    if self.mass_only:
                        _, wdxdet = metric
                        uq = _contract(e, (B, B, B))
                        ve = _contract_t(wdxdet * uq, (B, B, B))
                    else:
                        du = jnp.stack([_contract(e, mats[a])
                                        for a in range(3)], -1)
                        if metric[0].ndim == 1:
                            kdiag, wdxdet = metric
                            dv = du * (kdiag
                                       * wdxdet[None, None, None, ..., None])
                        else:
                            K, _ = metric
                            dv = jnp.einsum("...ab,...b->...a", K, du)
                        ve = sum(_contract_t(dv[..., a], mats[a])
                                 for a in range(3))
                    diag_elems = diag_elems.at[..., i, j, k].set(
                        ve[..., i, j, k])
        d = grid.assemble_add(diag_elems)
        # constrained (boundary) nodes act as identity rows: diag = 1
        d = grid.zero_boundaries(d)
        return jnp.where(d == 0.0, 1.0, d)


_OPS = {
    "poisson1": lambda: FEOp("poisson1", degree=1),
    "poisson2": lambda: FEOp("poisson2", degree=2),
    "poisson2affine": lambda: FEOp("poisson2affine", degree=2, affine=True),
    "project": lambda: FEOp("project", degree=1, mass_only=True),
    "project2": lambda: FEOp("project2", degree=2, mass_only=True),
}


def get_fe_op(name: str) -> FEOp:
    if name not in _OPS:
        raise ValueError(f"unknown -op_type {name!r}; have {sorted(_OPS)}")
    return _OPS[name]()
