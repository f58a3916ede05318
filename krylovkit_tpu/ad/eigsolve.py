"""Differentiable ``eigsolve`` (reference ``ext/.../eigsolve.jl``, GMRES path).

Per converged eigenpair ``(λ, v)`` with ChainRules cotangents ``(Δλ, Δv)``
(conjugates of JAX's plain-transpose cotangents) the pullback solves the
bordered adjoint system on a (vector, scalar) tuple pytree (reference
``ext/.../eigsolve.jl:144-176``):

    [ conj(λ)·I − Aᴴ   v ] [w]   [Δv − v⟨v,Δv⟩]
    [      vᴴ          0 ] [δ] = [     Δλ      ]

using ``linsolve`` with ``alg_rrule`` — the pullback is itself a Krylov solve
on tuple vectors (SURVEY.md §3.5).  The operator cotangent is
``Ā_CR = Σᵢ wᵢ vᵢᴴ``, delivered generically through the operator's pytree
leaves.  Gauge-sensitive cotangent components (``Im⟨v, Δv⟩``) are projected
out, as in the reference; when the pullback runs eagerly (outside ``jit``)
a debug-mode warning fires first (``ad/gauge.py``), mirroring the
reference's gauge-sensitivity warnings.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..algorithms import GMRES
from ..ops.operator import LinearOperator
from ..ops.vector import zerovector
from .gauge import warn_gauge_eager

PyTree = Any

def _astype_real_safe(x, dt):
    """``x.astype(dt)`` with the complex→real truncation made explicit (the
    imaginary parts cancel mathematically for real primals; JAX deprecates the
    implicit cast)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating) and not jnp.issubdtype(
        jnp.dtype(dt), jnp.complexfloating
    ):
        x = jnp.real(x)
    return x.astype(dt)


__all__ = ["eigsolve_vjp"]


def _conj(x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.conj, x)


def _row(stacked: PyTree, i: int) -> PyTree:
    return jax.tree_util.tree_map(lambda l: l[i], stacked)


def _default_rrule_alg(alg):
    return GMRES(
        tol=alg.tol, krylovdim=alg.krylovdim, maxiter=alg.maxiter, orth=alg.orth
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def eigsolve_vjp(howmany, which, alg, alg_rrule, space, op, x0):
    from ..solvers.eigsolve import _eigsolve_impl

    return _eigsolve_impl(op, x0, howmany, which, alg, space)


def _fwd(howmany, which, alg, alg_rrule, space, op, x0):
    from ..solvers.eigsolve import _eigsolve_impl

    vals, vecs, info = _eigsolve_impl(op, x0, howmany, which, alg, space)
    return (vals, vecs, info), (op, x0, vals, vecs)


def _bwd(howmany, which, alg, alg_rrule, space, res, cot):
    from ..algorithms import Arnoldi, Lanczos

    if isinstance(alg_rrule, Arnoldi):
        if isinstance(alg, Lanczos):
            return _bwd_sylvester(howmany, which, alg, alg_rrule, space, res, cot)
        return _bwd_sylvester_general(
            howmany, which, alg, alg_rrule, space, res, cot
        )
    return _bwd_gmres(howmany, which, alg, alg_rrule, space, res, cot)


def _bwd_gmres(howmany, which, alg, alg_rrule, space, res, cot):
    from ..solvers.linsolve import _linsolve_impl

    op, x0, vals, vecs = res
    vbar_J = cot[1]
    lbar_J = cot[0]
    rrule_alg = alg_rrule or _default_rrule_alg(alg)
    opH = op.apply_adjoint

    cdt = jax.tree_util.tree_leaves(vecs)[0].dtype
    ws = []
    for i in range(howmany):
        lam = vals[i]
        v = _row(vecs, i)
        dlam = jnp.conj(lbar_J[i]).astype(cdt)  # CR cotangent
        dv = _conj(_row(vbar_J, i))
        vddv = space.inner(v, dv)
        # debug-mode gauge warning (reference ext/.../eigsolve.jl:150-156)
        warn_gauge_eager(
            jnp.abs(jnp.imag(vddv)), alg.tol,
            getattr(alg_rrule or alg, "verbosity", 1),
            f"`eigsolve` cotangent for eigenvector {i} is sensitive to gauge "
            "choice: (|gauge| = {gauge})",
        )
        dv = jax.tree_util.tree_map(
            lambda a, b: a - vddv.astype(a.dtype) * b, dv, v
        )

        def opb(xz, lam=lam, v=v):
            x1, x2 = xz
            y1 = jax.tree_util.tree_map(
                lambda ax, xx, vv: jnp.conj(lam).astype(xx.dtype) * xx
                - ax
                + x2.astype(vv.dtype) * vv,
                opH(x1),
                x1,
                v,
            )
            y2 = space.inner(v, x1)
            return y1, y2

        rhs = (dv, jnp.asarray(dlam, cdt))
        zero = (zerovector(dv), jnp.zeros((), cdt))
        (w, _delta), _ = _linsolve_impl(
            LinearOperator(opb, None), rhs, zero,
            jnp.zeros((), cdt), jnp.ones((), cdt), rrule_alg, space,
        )
        ws.append(w)

    # operator cotangent: Ā_J = conj(Σ wᵢ vᵢᴴ) via generic vjp on op's leaves
    def accum(i, opbar):
        v = _row(vecs, i)
        _, op_vjp = jax.vjp(lambda o: o.normal(v), op)
        (ob,) = op_vjp(_conj(ws[i]))
        return jax.tree_util.tree_map(jnp.add, opbar, ob) if opbar is not None else ob

    opbar = None
    for i in range(howmany):
        opbar = accum(i, opbar)
    x0bar = zerovector(x0)
    return opbar, x0bar


eigsolve_vjp.defvjp(_fwd, _bwd)


def _bwd_sylvester(howmany, which, alg, alg_rrule, space, res, cot):
    """Subspace-aware pullback for Hermitian primals (reference
    ``ext/.../eigsolve.jl:318-419``): the subspace components come from the
    antihermitian part of ``VᴴΔV`` divided by eigenvalue gaps (robust for
    degenerate eigenvalues), and the orthogonal-complement components solve the
    Sylvester problem ``(Aᴴ(1−P) + shift·P) W − W Λ = ΔV_perp`` as one
    eigenvalue problem on ``(w, x)`` tuple pytrees with ``alg_rrule``."""
    from .. import dense
    from ..algorithms import EigSorter
    from ..ops import basis as bs
    from ..solvers.arnoldi import eigsolve_arnoldi

    op, x0, vals, vecs = res
    lbar_J, vbar_J = cot[0], cot[1]
    n = howmany
    cdt = jax.tree_util.tree_leaves(vecs)[0].dtype
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)

    dvals = jnp.conj(lbar_J[:n]).astype(cdt)  # CR cotangents
    dvecs = _conj(jax.tree_util.tree_map(lambda l: l[:n], vbar_J))

    # VdΔV[i, j] = <v_i, Δv_j>  — one Gram GEMM on the stacked bases
    VdDV = bs.gram(vecs, dvecs)[:n, :n].astype(cdt)
    a = (VdDV - VdDV.conj().T) / 2
    # debug-mode gauge warning (reference ext/.../eigsolve.jl:334-341): the
    # antihermitian part within (near-)degenerate clusters is pure gauge
    _degmask = (
        jnp.abs(vals[None, :n] - vals[:n, None]).astype(rdt) < tol
    )
    warn_gauge_eager(
        jnp.max(jnp.abs(jnp.where(_degmask, a, 0))), tol,
        getattr(alg_rrule or alg, "verbosity", 1),
        "`eigsolve` cotangents sensitive to gauge choice: (|gauge| = {gauge})",
    )
    gaps = vals[None, :n].astype(cdt) - vals[:n, None].astype(cdt)
    inv_gaps = jnp.where(jnp.abs(gaps) < tol, 0, 1 / jnp.where(gaps == 0, 1, gaps))
    a = a * inv_gaps + jnp.diag(jnp.real(dvals).astype(cdt))

    # subspace components: z_i = Σ_j a[j, i] v_j
    apad = jnp.zeros((jax.tree_util.tree_leaves(vecs)[0].shape[0], n), cdt)
    apad = apad.at[:n, :].set(a)
    Z0 = jax.tree_util.tree_map(
        lambda lv: jnp.tensordot(
            _astype_real_safe(apad.T, lv.dtype), lv, axes=[[1], [0]]
        ),
        vecs,
    )  # stacked (n, ...) — z_i at row i

    # complement part of the cotangents: ΔV_i − Σ_j VdΔV[j,i] v_j
    vpad = jnp.zeros_like(apad).at[:n, :].set(VdDV)
    Dperp = jax.tree_util.tree_map(
        lambda ld, lv: ld
        - jnp.tensordot(_astype_real_safe(vpad.T, lv.dtype), lv, axes=[[1], [0]]),
        dvecs,
        vecs,
    )

    # shift for the projected block if 0 would be more extremal than vals
    key_last = dense.which_key(vals[n - 1 : n].astype(cdt), which)[0]
    key_zero = dense.which_key(jnp.zeros((1,), cdt), which)[0]
    shift = jnp.where(key_last < key_zero, 2 * jnp.conj(vals[n - 1]).astype(cdt), 0)

    def proj(w):
        c = bs.project(vecs, w, n, space)
        return bs.unproject(vecs, c)

    def block_op(wx):
        w, x = wx
        w0 = proj(w)
        wperp = jax.tree_util.tree_map(lambda a_, b_: a_ - b_, w, w0)
        wp = op.apply_adjoint(wperp)
        wp = jax.tree_util.tree_map(
            lambda l, l0: l + _astype_real_safe(shift, l.dtype) * l0, wp, w0
        )
        # − Σ_i ΔV_i x_i
        wp = jax.tree_util.tree_map(
            lambda l, ld: l
            - jnp.tensordot(x.astype(ld.dtype), ld, axes=[[0], [0]]),
            wp,
            Dperp,
        )
        return wp, vals[:n].astype(cdt) * x

    valsc = vals[:n].astype(cdt)
    sorter = EigSorter(
        by=lambda v: jnp.min(
            jnp.abs(v[..., None] - jnp.conj(valsc)[None, :]), axis=-1
        ),
        rev=False,
    )
    w0 = (
        jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), vecs),
        jnp.ones((n,), cdt),
    )
    from ..ops.operator import LinearOperator as _LO

    rvals, Ws, rinfo = eigsolve_arnoldi(
        _LO(block_op, None), w0, n, sorter, alg_rrule, space
    )
    # Ws: tuple of stacked leaves: (w stacked (n, ...), x stacked (n, n))
    Wvec, Wx = Ws
    Zmat = Wx.T[:n, :n]  # Z[:, i] = x_i
    # pseudo-inverse: with exactly degenerate eigenvalues the inner Krylov
    # solve may return a rank-deficient Z (the reference warns in this case);
    # pinv degrades gracefully instead of poisoning the gradient with NaNs
    Zinv = jnp.linalg.pinv(Zmat, rtol=1e-10)
    # complement-projected w_i
    def qproj(l):
        return l

    Wq_c = bs.gram(vecs, Wvec)  # overlaps (cap, n-stacked)
    Wq = jax.tree_util.tree_map(
        lambda lw, lv: lw
        - jnp.tensordot(
            _astype_real_safe(Wq_c[:, : lw.shape[0]].T, lv.dtype), lv, axes=[[1], [0]]
        ),
        Wvec,
        vecs,
    )
    # ws_i = z_i − Σ_j Wq_j Zinv[j, i]  → stacked: Z0 − Zinv^T · Wq
    ws = jax.tree_util.tree_map(
        lambda lz, lq: lz
        - jnp.tensordot(_astype_real_safe(Zinv.T, lq.dtype), lq[:n], axes=[[1], [0]]),
        Z0,
        Wq,
    )
    # real Hermitian primal: the inner solve ran in complex arithmetic, but a
    # consistent cotangent has vanishing imaginary part
    if not jnp.issubdtype(cdt, jnp.complexfloating):
        ws = jax.tree_util.tree_map(lambda l: jnp.real(l).astype(cdt), ws)

    # operator cotangent: Ā_J = conj(Σ wᵢ vᵢᴴ)
    opbar = None
    for i in range(n):
        v = _row(vecs, i)
        _, op_vjp = jax.vjp(lambda o: o.normal(v), op)
        (ob,) = op_vjp(_conj(_row(ws, i)))
        opbar = ob if opbar is None else jax.tree_util.tree_map(jnp.add, opbar, ob)
    x0bar = zerovector(x0)
    return opbar, x0bar


def _bwd_sylvester_general(howmany, which, alg, alg_rrule, space, res, cot):
    """Sylvester-as-eigenproblem pullback for general (Arnoldi) primals
    (reference ``ext/.../eigsolve.jl:182-310``): like :func:`_bwd_sylvester`
    but the primal Ritz vectors are not orthonormal — projections go through
    the Cholesky-factored Gram matrix ``G = VᴴV`` — and the subspace
    coefficients use the raw (non-antihermitian) gauge-projected ``VᴴΔV``."""
    from .. import dense
    from ..algorithms import EigSorter
    from ..ops import basis as bs
    from ..ops.operator import LinearOperator as _LO
    from ..solvers.arnoldi import eigsolve_arnoldi

    op, x0, vals, vecs = res
    lbar_J, vbar_J = cot[0], cot[1]
    n = howmany
    cdt = jax.tree_util.tree_leaves(vecs)[0].dtype
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)

    dvals = jnp.conj(lbar_J[:n]).astype(cdt)
    dvecs = _conj(jax.tree_util.tree_map(lambda l: l[:n], vbar_J))

    G = bs.gram(vecs, vecs)[:n, :n].astype(cdt)
    VdDV = bs.gram(vecs, dvecs)[:n, :n].astype(cdt)
    # debug-mode gauge warning (reference ext/.../eigsolve.jl:207-213):
    # off-diagonal cotangent overlaps within degenerate clusters are gauge
    _degmask = jnp.abs(vals[None, :n] - vals[:n, None]).astype(rdt) < tol
    _gaugepart = jnp.where(
        _degmask, VdDV - jnp.diag(jnp.real(jnp.diagonal(VdDV))).astype(cdt), 0
    )
    warn_gauge_eager(
        jnp.max(jnp.abs(_gaugepart)), tol,
        getattr(alg_rrule or alg, "verbosity", 1),
        "`eigsolve` cotangents sensitive to gauge choice: (|Δgauge| = {gauge})",
    )
    # remove the gauge (diagonal) components: VdΔV' = VdΔV − G·Diag(diag/diagG)
    dratio = jnp.diagonal(VdDV) / jnp.diagonal(G)
    VdDVp = VdDV - G * dratio[None, :]
    gaps = jnp.conj(vals[None, :n].astype(cdt) - vals[:n, None].astype(cdt))
    a = VdDVp * jnp.where(jnp.abs(gaps) < tol, 0, 1 / jnp.where(gaps == 0, 1, gaps))
    a = a + jnp.diag(dvals)
    iGa = jnp.linalg.solve(G, a)
    iGV = jnp.linalg.solve(G, VdDV)

    cap = jax.tree_util.tree_leaves(vecs)[0].shape[0]

    def mix(coeffs):
        pad = jnp.zeros((cap, n), cdt).at[:n, :].set(coeffs)
        return jax.tree_util.tree_map(
            lambda lv: jnp.tensordot(_astype_real_safe(pad.T, lv.dtype), lv, axes=[[1], [0]]),
            vecs,
        )

    Z0 = mix(iGa)  # z_i stacked

    # sylvesterarg_i = fᴴ(z_i) + Δv_i − Σ_j iGV[j,i] v_j
    fz = jax.vmap(op.apply_adjoint)(Z0)
    sub = mix(iGV)
    Dperp = jax.tree_util.tree_map(
        lambda la, ld, lsub: la + ld - lsub, fz, dvecs, sub
    )

    key_last = dense.which_key(vals[n - 1 : n].astype(cdt), which)[0]
    key_zero = dense.which_key(jnp.zeros((1,), cdt), which)[0]
    shift = jnp.where(key_last < key_zero, 2 * jnp.conj(vals[n - 1]).astype(cdt), 0)

    def proj(w):
        c = bs.project(vecs, w, n, space)[:n]
        c = jnp.linalg.solve(G, c.astype(cdt))
        cpad = jnp.zeros((cap,), cdt).at[:n].set(c)
        return bs.unproject(vecs, cpad)

    valsc = vals[:n].astype(cdt)

    def block_op(wx):
        w, x = wx
        w0 = proj(w)
        wperp = jax.tree_util.tree_map(lambda a_, b_: a_ - b_, w, w0)
        wp = op.apply_adjoint(wperp)
        wp = jax.tree_util.tree_map(
            lambda l, l0: l + _astype_real_safe(shift, l.dtype) * l0, wp, w0
        )
        wp = jax.tree_util.tree_map(
            lambda l, ld: l
            - jnp.tensordot(x.astype(ld.dtype), ld, axes=[[0], [0]]),
            wp,
            Dperp,
        )
        return wp, jnp.conj(valsc) * x

    sorter = EigSorter(
        by=lambda v: jnp.min(
            jnp.abs(v[..., None] - jnp.conj(valsc)[None, :]), axis=-1
        ),
        rev=False,
    )
    w0 = (
        jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), vecs),
        jnp.ones((n,), cdt),
    )
    rvals, Ws, rinfo = eigsolve_arnoldi(
        _LO(block_op, None), w0, n, sorter, alg_rrule, space
    )
    Wvec, Wx = Ws
    Zmat = Wx.T[:n, :n]
    Zinv = jnp.linalg.pinv(Zmat, rtol=1e-10)
    # complement projection of the returned w components (G-aware)
    ovl = bs.gram(vecs, Wvec)[:n, :].astype(cdt)  # ⟨v_i, w_j⟩
    covl = jnp.linalg.solve(G, ovl)  # (n, n)
    Wq = jax.tree_util.tree_map(
        lambda lw, lv: lw
        - jnp.tensordot(_astype_real_safe(covl.T, lv.dtype), lv, axes=[[1], [0]]),
        Wvec,
        vecs,
    )
    ws = jax.tree_util.tree_map(
        lambda lz, lq: lz
        - jnp.tensordot(_astype_real_safe(Zinv.T, lq.dtype), lq[:n], axes=[[1], [0]]),
        Z0,
        Wq,
    )
    if not jnp.issubdtype(cdt, jnp.complexfloating):
        ws = jax.tree_util.tree_map(lambda l: jnp.real(l).astype(cdt), ws)

    opbar = None
    for i in range(n):
        v = _row(vecs, i)
        _, op_vjp = jax.vjp(lambda o: o.normal(v), op)
        (ob,) = op_vjp(_conj(_row(ws, i)))
        opbar = ob if opbar is None else jax.tree_util.tree_map(jnp.add, opbar, ob)
    x0bar = zerovector(x0)
    return opbar, x0bar
