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

PyTree = Any

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
        if jnp.issubdtype(cdt, jnp.complexfloating):
            ds = jnp.real(dsig) + 1j * jnp.imag(uddu - vddv) / (2 * sig)
        else:
            ds = jnp.real(dsig)
        bu = _axpy(du, u, -uddu)
        bv = _axpy(dv, v, -vddv)

        def opb(xy, sig=sig, u=u, v=v):
            x, y = xy
            xp = jax.tree_util.tree_map(
                lambda lx, lay: sig.astype(lx.dtype) * lx - lay, x, op.normal(y)
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
