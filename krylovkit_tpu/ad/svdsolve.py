"""Differentiable ``svdsolve`` (reference ``ext/.../svdsolve.jl``, GMRES path).

Per converged triplet ``(σ, u, v)`` with ChainRules cotangents
``(Δσ, Δu, Δv)`` the pullback solves the coupled 2×2-block system on an
``(x, y)`` tuple pytree (reference ``ext/.../svdsolve.jl:105-159``):

    x' = P_u(σ x − A y),   y' = P_v(σ y − Aᴴ x)        (P = complement projector)
    (x', y') = (Δu − u⟨u,Δu⟩, Δv − v⟨v,Δv⟩)

then adds the gauge/value parts ``x += u·Δs/2``, ``y += v·conj(Δs)/2`` with
``Δs = Re Δσ + i·Im(⟨u,Δu⟩ − ⟨v,Δv⟩)/(2σ)``.  The operator cotangent is
``Ā_CR = Σᵢ (xᵢ vᵢᴴ + uᵢ yᵢᴴ)`` — contributions through both ``f`` and ``fᴴ``
(reference ``:275-316``), delivered generically through the operator's leaves.
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


__all__ = ["svdsolve_vjp"]


def _conj(x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.conj, x)


def _row(stacked: PyTree, i: int) -> PyTree:
    return jax.tree_util.tree_map(lambda l: l[i], stacked)


def _axpy(y, x, a):
    return jax.tree_util.tree_map(lambda ly, lx: ly + a.astype(ly.dtype) * lx, y, x)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def svdsolve_vjp(howmany, which, alg, alg_rrule, space, op, x0):
    from ..solvers.svdsolve import svdsolve_gkl

    return svdsolve_gkl(op, x0, howmany, which, alg, space)


def _fwd(howmany, which, alg, alg_rrule, space, op, x0):
    from ..solvers.svdsolve import svdsolve_gkl

    vals, lvecs, rvecs, info = svdsolve_gkl(op, x0, howmany, which, alg, space)
    return (vals, lvecs, rvecs, info), (op, x0, vals, lvecs, rvecs)


def _bwd(howmany, which, alg, alg_rrule, space, res, cot):
    from ..algorithms import Arnoldi

    if isinstance(alg_rrule, Arnoldi):
        w = which.upper() if isinstance(which, str) else which
        if w != "LR":
            raise NotImplementedError(
                "Arnoldi-path svdsolve pullback only for which='LR' "
                "(reference ext/.../svdsolve.jl:166)"
            )
        return _bwd_sylvester(howmany, which, alg, alg_rrule, space, res, cot)
    return _bwd_gmres(howmany, which, alg, alg_rrule, space, res, cot)


def _bwd_gmres(howmany, which, alg, alg_rrule, space, res, cot):
    from ..solvers.linsolve import _linsolve_impl

    op, x0, vals, lvecs, rvecs = res
    sbar_J, ubar_J, vbar_J = cot[0], cot[1], cot[2]
    rrule_alg = alg_rrule or GMRES(
        tol=alg.tol, krylovdim=alg.krylovdim, maxiter=alg.maxiter, orth=alg.orth
    )
    cdt = jax.tree_util.tree_leaves(lvecs)[0].dtype

    xs, ys = [], []
    for i in range(howmany):
        sig = vals[i].astype(jnp.finfo(cdt).dtype)
        u = _row(lvecs, i)
        v = _row(rvecs, i)
        dsig = jnp.conj(sbar_J[i])  # CR cotangents
        du = _conj(_row(ubar_J, i))
        dv = _conj(_row(vbar_J, i))
        uddu = space.inner(u, du)
        vddv = space.inner(v, dv)
        # debug-mode gauge warning (reference ext/.../svdsolve.jl:129-133)
        warn_gauge_eager(
            jnp.abs(jnp.imag(uddu + vddv)), alg.tol,
            getattr(alg_rrule or alg, "verbosity", 1),
            f"`svdsolve` cotangents for singular vectors {i} are sensitive "
            "to gauge choice: (|gauge| = {gauge})",
        )
        if jnp.issubdtype(cdt, jnp.complexfloating):
            ds = jnp.real(dsig) + 1j * jnp.imag(uddu - vddv) / (2 * sig)
        else:
            ds = jnp.real(dsig)
        bu = _axpy(du, u, -uddu)
        bv = _axpy(dv, v, -vddv)

        def opb(xy, sig=sig, u=u, v=v):
            x, y = xy
            xp = jax.tree_util.tree_map(
                lambda lx, lay: _astype_real_safe(sig, lx.dtype) * lx - lay, x, op.normal(y)
            )
            yp = jax.tree_util.tree_map(
                lambda ly, lax_: sig.astype(ly.dtype) * ly - lax_, y,
                op.apply_adjoint(x),
            )
            xp = _axpy(xp, u, -space.inner(u, xp))
            yp = _axpy(yp, v, -space.inner(v, yp))
            return xp, yp

        rhs = (bu, bv)
        zero = (zerovector(bu), zerovector(bv))
        (x, y), _ = _linsolve_impl(
            LinearOperator(opb, None), rhs, zero,
            jnp.zeros((), cdt), jnp.ones((), cdt), rrule_alg, space,
        )
        x = _axpy(x, u, jnp.asarray(ds, cdt) / 2)
        y = _axpy(y, v, jnp.conj(jnp.asarray(ds, cdt)) / 2)
        xs.append(x)
        ys.append(y)

    # Ā_J = conj(Σ xᵢ vᵢᴴ + uᵢ yᵢᴴ): through op.normal at v (cot conj(x)) and
    # op.adjoint at u (cot conj(y))
    opbar = None
    for i in range(howmany):
        v = _row(rvecs, i)
        u = _row(lvecs, i)
        _, vjp_n = jax.vjp(lambda o: o.normal(v), op)
        (ob1,) = vjp_n(_conj(xs[i]))
        _, vjp_a = jax.vjp(lambda o: o.apply_adjoint(u), op)
        (ob2,) = vjp_a(_conj(ys[i]))
        ob = jax.tree_util.tree_map(jnp.add, ob1, ob2)
        opbar = ob if opbar is None else jax.tree_util.tree_map(jnp.add, opbar, ob)
    x0bar = zerovector(x0)
    return opbar, x0bar


svdsolve_vjp.defvjp(_fwd, _bwd)


def _bwd_sylvester(howmany, which, alg, alg_rrule, space, res, cot):
    """Coupled (x, y, z) eigenproblem pullback (reference
    ``ext/.../svdsolve.jl:160-273``, which == :LR): all triplet cotangents are
    resolved through one eigsolve of the block operator

        (x, y, z) ↦ (QU(A y) − ΣᵢΔUᵢzᵢ, QV(Aᴴx) − ΣᵢΔVᵢzᵢ, Σ·z)

    on triple tuple pytrees — robust for (near-)degenerate singular values."""
    from ..algorithms import EigSorter
    from ..ops import basis as bs
    from ..ops.operator import LinearOperator as _LO
    from ..solvers.arnoldi import eigsolve_arnoldi

    op, x0, vals, lvecs, rvecs = res
    sbar_J, ubar_J, vbar_J = cot[0], cot[1], cot[2]
    n = howmany
    cdt = jax.tree_util.tree_leaves(lvecs)[0].dtype
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    sig = vals[:n].astype(rdt)

    dsig = jnp.conj(sbar_J[:n])
    dlv = _conj(jax.tree_util.tree_map(lambda l: l[:n], ubar_J))
    drv = _conj(jax.tree_util.tree_map(lambda l: l[:n], vbar_J))

    UdDU = bs.gram(lvecs, dlv)[:n, :n].astype(cdt)
    VdDV = bs.gram(rvecs, drv)[:n, :n].astype(cdt)
    aU = (UdDU - UdDU.conj().T) / 2
    aV = (VdDV - VdDV.conj().T) / 2
    # debug-mode gauge warning (reference ext/.../svdsolve.jl:185-190)
    _degmask = jnp.abs(sig[None, :] - sig[:, None]) < tol
    warn_gauge_eager(
        jnp.max(jnp.abs(jnp.where(_degmask, aU + aV, 0))), tol,
        getattr(alg_rrule or alg, "verbosity", 1),
        "`svdsolve` cotangents for singular vectors are sensitive to gauge "
        "choice: (|gauge| = {gauge})",
    )

    def safe_inv(m):
        return jnp.where(jnp.abs(m) < tol, 0, 1 / jnp.where(m == 0, 1, m))

    gm = sig[None, :] - sig[:, None]
    gp = sig[None, :] + sig[:, None]
    UdDAV = (aU + aV) * safe_inv(gm).astype(cdt) + (aU - aV) * safe_inv(gp).astype(
        cdt
    )
    UdDAV = UdDAV + jnp.diag(jnp.real(dsig).astype(cdt))

    cap_u = jax.tree_util.tree_leaves(lvecs)[0].shape[0]

    def mix(basis_, coeffs):
        cap = jax.tree_util.tree_leaves(basis_)[0].shape[0]
        pad = jnp.zeros((cap, n), cdt).at[:n, :].set(coeffs)
        return jax.tree_util.tree_map(
            lambda lv: jnp.tensordot(_astype_real_safe(pad.T, lv.dtype), lv, axes=[[1], [0]]),
            basis_,
        )

    xs0 = mix(lvecs, UdDAV / 2)
    ys0 = mix(rvecs, UdDAV.conj().T / 2)

    DU = jax.tree_util.tree_map(
        lambda ld, lsub: ld - lsub, dlv, mix(lvecs, UdDU)
    )
    DV = jax.tree_util.tree_map(
        lambda ld, lsub: ld - lsub, drv, mix(rvecs, VdDV)
    )

    def qproj(basis_, w):
        c = bs.project(basis_, w, n, space)
        return jax.tree_util.tree_map(
            lambda lw, lp: lw - lp, w, bs.unproject(basis_, c)
        )

    def block_op(xyz):
        x, y, z = xyz
        xp = qproj(lvecs, op.normal(y))
        yp = qproj(rvecs, op.apply_adjoint(x))
        xp = jax.tree_util.tree_map(
            lambda l, ld: l - jnp.tensordot(z.astype(ld.dtype), ld, axes=[[0], [0]]),
            xp, DU,
        )
        yp = jax.tree_util.tree_map(
            lambda l, ld: l - jnp.tensordot(z.astype(ld.dtype), ld, axes=[[0], [0]]),
            yp, DV,
        )
        return xp, yp, sig.astype(cdt) * z

    w0 = (
        jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), lvecs),
        jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), rvecs),
        jnp.ones((n,), cdt),
    )
    rvals, Ws, rinfo = eigsolve_arnoldi(
        _LO(block_op, None), w0, n, "LR", alg_rrule, space
    )
    Wx, Wy, Wz = Ws
    Zmat = Wz.T[:n, :n]
    Zinv = jnp.linalg.pinv(Zmat, rtol=1e-10)

    xs = jax.tree_util.tree_map(
        lambda l0, lw: l0
        - jnp.tensordot(_astype_real_safe(Zinv.T, lw.dtype), lw[:n], axes=[[1], [0]]),
        xs0, Wx,
    )
    ys = jax.tree_util.tree_map(
        lambda l0, lw: l0
        - jnp.tensordot(_astype_real_safe(Zinv.T, lw.dtype), lw[:n], axes=[[1], [0]]),
        ys0, Wy,
    )
    if not jnp.issubdtype(cdt, jnp.complexfloating):
        xs = jax.tree_util.tree_map(lambda l: jnp.real(l).astype(cdt), xs)
        ys = jax.tree_util.tree_map(lambda l: jnp.real(l).astype(cdt), ys)

    opbar = None
    for i in range(n):
        v = _row(rvecs, i)
        u = _row(lvecs, i)
        _, vjp_n = jax.vjp(lambda o: o.normal(v), op)
        (ob1,) = vjp_n(_conj(_row(xs, i)))
        _, vjp_a = jax.vjp(lambda o: o.apply_adjoint(u), op)
        (ob2,) = vjp_a(_conj(_row(ys, i)))
        ob = jax.tree_util.tree_map(jnp.add, ob1, ob2)
        opbar = ob if opbar is None else jax.tree_util.tree_map(jnp.add, opbar, ob)
    x0bar = zerovector(x0)
    return opbar, x0bar
