"""Communication-avoiding Krylov bottom solvers: CABiCGStab and CACG.

Rebuilds of the reference ``solvers/cabicgstab.c`` (Carson/Demmel/Knight
s-step BiCGStab, Alg 3.4) and ``solvers/cacg.c``. Per outer iteration the
method forms 4s+1 monomial basis vectors [P..A^{2s}p, R..A^{2s-1}r] and a
Gram-like matrix G = [P,R]^T [P,R,rt] with ONE global reduction
(matmul.c:6-66 does one MPI_Allreduce), then runs s inner iterations on
tiny (4s+1)-dim recurrences.

TPU mapping: the basis is a stacked (4s+2, n, n, n) array and G is a single
``einsum`` — an MXU matmul with one ``psum`` when the level is sharded
(SURVEY.md §5: "a perfect MXU fit"). The inner recurrences are (4s+1)-dim
vector ops traced inline; breakdown/convergence "break"s become masked
updates via an ``active`` flag, preserving the reference's exact exit
semantics.

Telescoping (cabicgstab.c:49-54): start with s=1, then s=2, then s=4
forever — implemented as two unrolled prologue steps + a ``lax.while_loop``
at s=4 (static shapes per phase).

f32 robustness — SCALED monomial basis: the raw powers A^{2s}r grow like
||A||^{2s} (~1e18 at a 4^3 fv4 bottom) and their Gram squares overflow
f32 (the reference never sees this: it is f64-only). Each power is
normalized by a per-solve power-of-two bound sigma >= ~||A|| (one extra
Rayleigh-probe reduction at setup — NOT per iteration, so the one-
reduction-per-outer-step CA property is intact), and sigma is folded into
the shift matrices (A vhat_i = sigma vhat_{i+1} => T'[i+1,i] = sigma);
the recurrence algebra is invariant under the rescale, and a power-of-two
sigma makes the rescale itself lossless.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hpgmg_tpu.core import blas
from hpgmg_tpu.core.config import SolverConfig
from hpgmg_tpu.core.level import Level

CA_KRYLOV_S = 4  # cabicgstab.c:18
_M_MAX = 200


def _monomial_shift(k: int, splits, power: int):
    """T' (power=1) / T'' (power=2) for the monomial basis: shift-by-power
    within each of the index blocks delimited by ``splits``
    (cabicgstab.c:112-117)."""
    t = np.zeros((k, k))
    for lo, hi in splits:
        for i in range(lo, hi - power + 1):
            if i + power < k:
                t[i + power, i] = 1.0
    return t


def _basis_scale(op, level, cfg, r):
    """Power-of-two upper-bound estimate of ||A|| from one Rayleigh probe
    (||A r|| / ||r||, x4 safety). ONE setup-time reduction per solve; keeps
    every scaled power O(||r||) so f32 Grams cannot overflow."""
    nr = blas.norm(r)
    na = blas.norm(op.apply_op(level, r, cfg))
    est = jnp.where(nr > 0, 4.0 * na / jnp.where(nr > 0, nr, 1.0), 1.0)
    est = jnp.maximum(est, 1.0)
    return jnp.exp2(jnp.ceil(jnp.log2(est))).astype(r.dtype)


def _gram(v_rows, v_cols, rd):
    """G[a, b] = <v_rows[a], v_cols[b]> — one einsum == one reduction."""
    acc = rd or v_rows.dtype
    flat_r = v_rows.reshape(v_rows.shape[0], -1).astype(acc)
    flat_c = v_cols.reshape(v_cols.shape[0], -1).astype(acc)
    return jnp.einsum("an,bn->ab", flat_r, flat_c,
                      preferred_element_type=acc).astype(v_rows.dtype)


def _combine(coeff, basis):
    """sum_i coeff[i] * basis[i] over the stacked basis."""
    return jnp.einsum("a,an->n", coeff,
                      basis.reshape(basis.shape[0], -1)).reshape(
                          basis.shape[1:])


class _CABiCGStabState(NamedTuple):
    x: jax.Array
    p: jax.Array
    r: jax.Array
    delta: jax.Array
    m: jax.Array
    failed: jax.Array
    converged: jax.Array


def _cabicgstab_sstep(op, level: Level, cfg: SolverConfig, s: int,
                      state: _CABiCGStabState, rt, l2_rt, sigma):
    """One outer s-step: build the 4s+1 basis, one Gram reduction, s inner
    iterations (cabicgstab.c:101-277). ``sigma`` scales the basis (see
    module docstring)."""
    rd = cfg.reduce_dtype
    k = 4 * s + 1
    dtype = state.x.dtype
    tp = sigma * jnp.asarray(_monomial_shift(
        k, [(0, 2 * s), (2 * s + 1, 4 * s)], 1), dtype)
    tpp = sigma * sigma * jnp.asarray(_monomial_shift(
        k, [(0, 2 * s - 1), (2 * s + 1, 4 * s - 1)], 2), dtype)

    # scaled monomial matrix powers (cabicgstab.c:124-143)
    inv_sigma = 1.0 / sigma
    pows_p = [state.p]
    for _ in range(2 * s):
        pows_p.append(inv_sigma * op.apply_op(level, pows_p[-1], cfg))
    pows_r = [state.r]
    for _ in range(2 * s - 1):
        pows_r.append(inv_sigma * op.apply_op(level, pows_r[-1], cfg))
    basis = jnp.stack(pows_p + pows_r)  # (k, ...)
    basis_rt = jnp.concatenate([basis, rt[None]])  # (k+1, ...)

    gg = _gram(basis, basis_rt, rd)  # (k, k+1): ONE global reduction
    G, g = gg[:, :k], gg[:, k]

    aj = jnp.zeros((k,), dtype).at[0].set(1.0)
    cj = jnp.zeros((k,), dtype).at[2 * s + 1].set(1.0)
    ej = jnp.zeros((k,), dtype)
    delta = state.delta
    active = ~(state.failed | state.converged)
    failed, converged = state.failed, state.converged
    target = cfg.bottom_rtol * l2_rt

    def upd(cond, new, old):
        return jnp.where(active & cond, new, old)

    for _ in range(s):  # inner n-loop, unrolled (s <= 4)
        tpaj = tp @ aj
        tpcj = tp @ cj
        tppaj = tpp @ aj
        g_dot_tpaj = g @ tpaj
        fail_now = g_dot_tpaj == 0.0  # pivot breakdown
        alpha = delta / g_dot_tpaj
        fail_now |= ~jnp.isfinite(alpha)
        alpha_s = jnp.where(fail_now, 0.0, alpha)

        # omega via the numerically-preferred grouping (cabicgstab.c:184-189)
        t1 = tpcj - alpha_s * tppaj
        t2 = G @ t1
        t3 = cj - alpha_s * tpaj
        omega_num = t3 @ t2
        omega_den = t1 @ t2

        # partial ej update must precede the omega checks (cabicgstab.c:195)
        ej_half = ej + alpha_s * aj

        # ||s|| via the Gram matrix (cabicgstab.c:199-202)
        gs = G @ t3
        l2_s = jnp.sqrt(jnp.maximum(t3 @ gs, 0.0))
        conv_now = l2_s < target

        fail_omega = (omega_den == 0.0)
        omega = omega_num / omega_den
        fail_omega |= ~jnp.isfinite(omega)
        omega_s = jnp.where(fail_omega, 0.0, omega)

        ej_full = ej_half + omega_s * cj - omega_s * alpha_s * tpaj
        cj_full = cj - omega_s * tpcj - alpha_s * tpaj \
            + omega_s * alpha_s * tppaj

        # incremental residual norm (cabicgstab.c:230-237)
        cj_dot_gcj = cj_full @ (G @ cj_full)
        l2_r = jnp.sqrt(jnp.maximum(cj_dot_gcj, 0.0))
        conv_late = l2_r < target

        delta_next = g @ cj_full
        fail_late = ~jnp.isfinite(delta_next) | (delta_next == 0.0) \
            | (omega_s == 0.0)
        beta = (delta_next / delta) * (alpha_s / omega_s)
        fail_late |= ~jnp.isfinite(beta) | (beta == 0.0)
        aj_next = cj_full + beta * aj - omega_s * beta * tpaj

        # commit with break semantics: once failed/converged, freeze
        step_done = fail_now | conv_now | fail_omega | conv_late | fail_late
        ej = upd(True, jnp.where(fail_now, ej,
                                 jnp.where(conv_now | fail_omega, ej_half,
                                           ej_full)), ej)
        cj = upd(~(fail_now | conv_now | fail_omega), cj_full, cj)
        aj = upd(~step_done, aj_next, aj)
        delta = upd(~step_done, delta_next, delta)
        failed = failed | (active & (fail_now | fail_omega
                                     | (~conv_late & fail_late)))
        converged = converged | (active & (conv_now | conv_late))
        active = active & ~step_done

    was_active = ~(state.failed | state.converged)
    x = jnp.where(was_active, state.x + _combine(ej, basis), state.x)
    cont = was_active & ~(failed | converged)
    p = jnp.where(cont, _combine(aj, basis), state.p)
    r = jnp.where(cont, _combine(cj, basis), state.r)
    return _CABiCGStabState(x=x, p=p, r=r, delta=delta, m=state.m + s,
                            failed=failed, converged=converged)


def cabicgstab(op, level: Level, x, rhs, cfg: SolverConfig,
               must_subtract_mean: bool = False):
    rd = cfg.reduce_dtype
    rt = op.residual(level, x, rhs, cfg)
    if must_subtract_mean:
        rt = rt - blas.mean(rt, rd)
    delta = blas.dot(rt, rt, rd)
    norm_rt = blas.norm(rt)
    l2_rt = jnp.sqrt(delta)
    converged0 = (norm_rt == 0.0) | (delta == 0.0)
    sigma = _basis_scale(op, level, cfg, rt)

    st = _CABiCGStabState(
        x=x, p=rt, r=rt, delta=delta, m=jnp.array(0, jnp.int32),
        failed=jnp.array(False), converged=converged0)

    if cfg.cabicgstab_telescoping:
        # telescoping prologue: s=1 then s=2 (cabicgstab.c:99,276)
        st = _cabicgstab_sstep(op, level, cfg, 1, st, rt, l2_rt, sigma)
        st = _cabicgstab_sstep(op, level, cfg, 2, st, rt, l2_rt, sigma)

    def cond(st):
        return (st.m < _M_MAX) & ~st.failed & ~st.converged

    def body(st):
        return _cabicgstab_sstep(op, level, cfg, CA_KRYLOV_S, st, rt, l2_rt,
                                 sigma)

    st = lax.while_loop(cond, body, st)
    return st.x


class _CACGState(NamedTuple):
    x: jax.Array
    p: jax.Array
    r: jax.Array
    m: jax.Array
    failed: jax.Array
    converged: jax.Array


def cacg(op, level: Level, x, rhs, cfg: SolverConfig,
         must_subtract_mean: bool = False):
    """s-step CG (solvers/cacg.c): 2s+1 basis vectors, one Gram reduction,
    s inner iterations per outer step."""
    rd = cfg.reduce_dtype
    s = CA_KRYLOV_S
    k = 2 * s + 1

    r0 = op.residual(level, x, rhs, cfg)
    if must_subtract_mean:
        r0 = r0 - blas.mean(r0, rd)
    delta0 = blas.dot(r0, r0, rd)
    l2_r0 = jnp.sqrt(delta0)
    target = cfg.bottom_rtol * l2_r0
    dtype = x.dtype
    sigma = _basis_scale(op, level, cfg, r0)
    inv_sigma = 1.0 / sigma
    tp = sigma * jnp.asarray(
        _monomial_shift(k, [(0, s), (s + 1, 2 * s)], 1), dtype)

    def body(st: _CACGState):
        pows_p = [st.p]
        for _ in range(s):
            pows_p.append(inv_sigma * op.apply_op(level, pows_p[-1], cfg))
        pows_r = [st.r]
        for _ in range(s - 1):
            pows_r.append(inv_sigma * op.apply_op(level, pows_r[-1], cfg))
        basis = jnp.stack(pows_p + pows_r)  # (k, ...)
        G = _gram(basis, basis, rd)  # ONE global reduction

        aj = jnp.zeros((k,), dtype).at[0].set(1.0)
        cj = jnp.zeros((k,), dtype).at[s + 1].set(1.0)
        ej = jnp.zeros((k,), dtype)
        active = jnp.array(True)
        failed = jnp.array(False)
        converged = jnp.array(False)

        for _ in range(s):  # cacg.c:126-156
            tpaj = tp @ aj
            aj_dot_gtpaj = aj @ (G @ tpaj)
            cj_dot_gcj = cj @ (G @ cj)
            fail_now = aj_dot_gtpaj == 0.0
            alpha = cj_dot_gcj / aj_dot_gtpaj
            fail_now |= ~jnp.isfinite(alpha)
            alpha_s = jnp.where(fail_now, 0.0, alpha)

            ej_new = ej + alpha_s * aj
            cj_new = cj - alpha_s * tpaj
            cj_dot_gcj_new = cj_new @ (G @ cj_new)
            l2_r = jnp.sqrt(jnp.maximum(cj_dot_gcj_new, 0.0))
            conv_now = l2_r < target
            fail_late = cj_dot_gcj_new == 0.0
            beta = cj_dot_gcj_new / cj_dot_gcj
            fail_late |= ~jnp.isfinite(beta) | (beta == 0.0)
            aj_new = cj_new + beta * aj

            upd = active & ~fail_now
            ej = jnp.where(upd, ej_new, ej)
            cj = jnp.where(upd, cj_new, cj)
            aj = jnp.where(upd & ~(conv_now | fail_late), aj_new, aj)
            failed = failed | (active & (fail_now | (~conv_now & fail_late)))
            converged = converged | (active & conv_now)
            active = active & ~(fail_now | conv_now | fail_late)

        x = st.x + _combine(ej, basis)
        cont = ~(failed | converged)
        p = jnp.where(cont, _combine(aj, basis), st.p)
        r = jnp.where(cont, _combine(cj, basis), st.r)
        return _CACGState(x=x, p=p, r=r, m=st.m + s,
                          failed=st.failed | failed,
                          converged=st.converged | converged)

    def cond(st: _CACGState):
        return (st.m < _M_MAX) & ~st.failed & ~st.converged

    st0 = _CACGState(x=x, p=r0, r=r0, m=jnp.array(0, jnp.int32),
                     failed=jnp.array(False),
                     converged=(delta0 == 0.0))
    st = lax.while_loop(cond, body, st0)
    return st.x
