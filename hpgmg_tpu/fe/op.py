"""FE operator layer: matrix-free Poisson via tensor-product contractions.

Rebuild of op/op.c + op/op-poisson1.c. The per-8-element SIMD pipeline
(OpApply_Poisson, op-poisson1.c:112-172) becomes batched einsums over ALL
elements at once — the contraction
``du[q1,q2,q3, e...] = D[q1,i] B[q2,j] B[q3,k] u[i,j,k, e...]`` is an MXU
batched matmul (the reference's tensor.c/tensor-avx512.c kernels, E9).

TPU layout rule: local (basis/quad/tensor) indices LEAD and the element
batch TRAILS — the trailing two dims of every array are the big My,Mz
batch dims, so the (8,128) tiling never pads tiny 3x3 trailing dims (a
(...,3,3)-trailing metric would be inflated ~57x by tile padding). This
is the reference's "ne innermost" vectorization ordering (grid.c:933-935)
mapped to the TPU. The 3x3 Jacobian inverse is the closed-form adjugate
over leading axes (pointwise.h:7-39), never jnp.linalg on trailing dims.

Registered op types mirror OpRegister/OpCreateFromOptions (op.c:443-517):
poisson1 (Q1), poisson2 (Q2), poisson2affine (exploits the affine
geometry, op-poisson1.c:179-238), and project/project2 (mass-matrix L2
projection used by transfer tests, op-project.c).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hpgmg_tpu.fe.grid import FEGrid
from hpgmg_tpu.fe.solutions import get_solution


def _contract(E: jax.Array, mats) -> jax.Array:
    """y[q1,q2,q3, e...] = A[q1,i] B[q2,j] C[q3,k] E[i,j,k, e...]
    (TensorContract EVAL, tensor.c:3-61)."""
    A, B, C = mats
    E = jnp.einsum("qi,ijkmno->qjkmno", A, E)
    E = jnp.einsum("qj,ijkmno->iqkmno", B, E)
    return jnp.einsum("qk,ijkmno->ijqmno", C, E)


def _contract_t(Y: jax.Array, mats) -> jax.Array:
    """Transpose contraction (TENSOR_TRANSPOSE): quad points -> nodes."""
    A, B, C = mats
    Y = jnp.einsum("qi,qjkmno->ijkmno", A, Y)
    Y = jnp.einsum("qj,iqkmno->ijkmno", B, Y)
    return jnp.einsum("qk,ijqmno->ijkmno", C, Y)


def _inv3x3(J):
    """Closed-form inverse + determinant of a field of 3x3 matrices stored
    with the matrix indices LEADING: J[a][c] is an array (the batched
    analog of PointwiseJacobianInvert, pointwise.h:7-39).

    Returns (Jinv as nested lists Jinv[c][a], det)."""
    a = J
    cof = [[None] * 3 for _ in range(3)]
    # cofactor matrix of the 3x3 with rows a[0], a[1], a[2]
    for r in range(3):
        for c in range(3):
            r1, r2 = [t for t in range(3) if t != r]
            c1, c2 = [t for t in range(3) if t != c]
            sign = 1.0 if (r + c) % 2 == 0 else -1.0
            cof[r][c] = sign * (a[r1][c1] * a[r2][c2] - a[r1][c2] * a[r2][c1])
    det = a[0][0] * cof[0][0] + a[0][1] * cof[0][1] + a[0][2] * cof[0][2]
    idet = 1.0 / det
    # inverse = adjugate / det; adj[c][r] = cof[r][c]
    inv = [[cof[r][c] * idet for r in range(3)] for c in range(3)]
    return inv, det


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

    def _w3(self, grid: FEGrid, dtype):
        _, _, w = self.tensors(grid, dtype)
        Q = grid.ref.Q
        return (w[:, None, None] * w[None, :, None]
                * w[None, None, :]).reshape(Q, Q, Q, 1, 1, 1)

    # ------------------------------------------------------------------
    # geometry: metric K[a][b] = w |J| (J^{-1} J^{-T})_{ab} at quad points
    # ------------------------------------------------------------------

    def metric(self, grid: FEGrid, coords: jax.Array):
        """(K, wdxdet): K stacked (3, 3, Q,Q,Q, Mx,My,Mz) — matrix indices
        leading; wdxdet (Q,Q,Q, Mx,My,Mz)."""
        dtype = coords.dtype
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}
        Xe = [grid.extract_elements(coords[c]) for c in range(3)]
        # J[a][c] = d x_c / d xi_a, each (Q,Q,Q, M...)
        J = [[_contract(Xe[c], mats[a]) for c in range(3)] for a in range(3)]
        Jinv, det = _inv3x3(J)  # Jinv[c][a] = d xi_a / d x_c
        wdxdet = det * self._w3(grid, dtype)
        # K[a][b] = wdxdet * sum_c Jinv[c][a] Jinv[c][b]
        K = jnp.stack([
            jnp.stack([wdxdet * sum(Jinv[c][a] * Jinv[c][b]
                                    for c in range(3)) for b in range(3)])
            for a in range(3)])
        return K, wdxdet

    def metric_affine(self, grid: FEGrid, dtype):
        """Uniform-grid shortcut (poisson2affine): constant diagonal metric
        (op-poisson1.c:179-238). Returns (kdiag (3,), wdxdet (Q,Q,Q,1,1,1))."""
        hx = [grid.L[a] / grid.M[a] / 2.0 for a in range(3)]  # dx/dxi
        det = hx[0] * hx[1] * hx[2]
        wdxdet = det * self._w3(grid, dtype)
        kdiag = jnp.stack(
            [jnp.asarray(1.0 / (h * h), dtype) for h in hx])
        return kdiag, wdxdet

    def make_metric(self, grid: FEGrid, coords: Optional[jax.Array], dtype):
        if self.affine or coords is None:
            return self.metric_affine(grid, dtype)
        return self.metric(grid, coords)

    def _apply_metric(self, metric, du):
        """dv[a] = sum_b K[a,b] du[b]; du/dv are lists of 3 arrays."""
        Ka, wdxdet = metric
        if Ka.ndim == 1:  # affine diagonal
            return [Ka[a] * wdxdet * du[a] for a in range(3)]
        return [sum(Ka[a, b] * du[b] for b in range(3)) for a in range(3)]

    # ------------------------------------------------------------------
    # A(u)
    # ------------------------------------------------------------------

    def apply(self, grid: FEGrid, coords: Optional[jax.Array], u: jax.Array,
              metric=None) -> jax.Array:
        """v = A u (OpApply_Poisson pipeline, op-poisson1.c:112-172)."""
        dtype = u.dtype
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}
        if metric is None:
            metric = self.make_metric(grid, coords, dtype)

        ue = grid.extract_elements(u)
        if self.mass_only:
            _, wdxdet = metric
            uq = _contract(ue, (B, B, B))
            ve = _contract_t(wdxdet * uq, (B, B, B))
            return grid.zero_boundaries(grid.assemble_add(ve))

        du = [_contract(ue, mats[a]) for a in range(3)]
        dv = self._apply_metric(metric, du)
        ve = sum(_contract_t(dv[a], mats[a]) for a in range(3))
        return grid.zero_boundaries(grid.assemble_add(ve))

    # ------------------------------------------------------------------
    # forcing / solution / norms / diagonal
    # ------------------------------------------------------------------

    def _quad_coords(self, grid: FEGrid, coords: jax.Array):
        dtype = coords.dtype
        B, _, _ = self.tensors(grid, dtype)
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
        wq = jnp.broadcast_to(wdxdet, uq.shape)
        e_max = jnp.max(jnp.abs(diff)) / jnp.max(jnp.abs(uex))
        e_l2 = jnp.sqrt(jnp.sum(wq * diff * diff)) \
            / jnp.sqrt(jnp.sum(wq * uex * uex))
        return e_max, e_l2

    def diagonal(self, grid: FEGrid, coords: Optional[jax.Array],
                 dtype=jnp.float64, metric=None) -> jax.Array:
        """Matrix-free diag(A) (OpGetDiagonal, op.c:263-338), in closed
        separable form instead of the reference's P^3 one-hot element
        probes: with e the (i,j,k) one-hot, du[b](q) factorizes as
        mats[b][0][q1,i]*mats[b][1][q2,j]*mats[b][2][q3,k], so

          diag[ijk] = sum_ab sum_q prod_t (mats[a][t] ⊙ mats[b][t])(q_t, ·)
                      * K[a,b](q)

        — 9 transpose-contractions over the metric (1 for mass-only) in
        place of 27 full applies. The unrolled probe loop was the FE
        sampler's >24^3 compile blowup (27x the apply HLO per level —
        docs/FESAMPLE_r04.md); this form also runs ~P^3 fewer FLOPs."""
        B, D, w = self.tensors(grid, dtype)
        mats = {0: (D, B, B), 1: (B, D, B), 2: (B, B, D)}
        if metric is None:
            metric = self.make_metric(grid, coords, dtype)
        M = tuple(grid.M)
        if self.mass_only:
            _, wdxdet = metric
            wd = jnp.broadcast_to(wdxdet, wdxdet.shape[:3] + M)
            diag_elems = _contract_t(wd, (B * B, B * B, B * B))
        else:
            Ka, wdxdet = metric
            diag_elems = None
            for a in range(3):
                for b in range(3):
                    if Ka.ndim == 1:
                        if a != b:
                            continue  # affine metric is diagonal
                        Kab = Ka[a] * wdxdet
                    else:
                        Kab = Ka[a, b]
                    Kab = jnp.broadcast_to(Kab, Kab.shape[:3] + M)
                    U = tuple(mats[a][t] * mats[b][t] for t in range(3))
                    term = _contract_t(Kab, U)
                    diag_elems = (term if diag_elems is None
                                  else diag_elems + term)
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
