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
out, as in the reference (which warns; invisible under jit).
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
