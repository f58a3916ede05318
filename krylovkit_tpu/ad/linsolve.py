"""Differentiable ``linsolve`` (reference ``ext/.../linsolve.jl:1-93``).

Implicit differentiation of ``(a0 + a1 A) x = b``.  In JAX's plain-transpose
convention, with ``M = a0 I + a1 A`` and ``w = M⁻ᵀ x̄``:

    b̄  = w
    Ā  = −a1 · w xᵀ        (delivered generically through the operator's pytree
                            leaves: ``vjp(op ↦ op(x))`` at cotangent ``−a1 w``)
    ā0 = −wᵀ x
    ā1 = −wᵀ (A x)

``Mᵀ w = x̄`` is solved with the *adjoint* operator via the identity
``w = conj(Mᴴ⁻¹ conj(x̄))`` — one extra Krylov solve with ``alg_rrule``
(default: the primal algorithm), exactly the reference's structure: the
pullback is itself a ``linsolve``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.operator import LinearOperator
from ..ops.vector import zerovector

PyTree = Any

__all__ = ["linsolve_vjp", "dotu"]


def dotu(x: PyTree, y: PyTree) -> jax.Array:
    """Unconjugated dot product Σᵢ xᵢ yᵢ over all leaves."""
    lx = jax.tree_util.tree_leaves(x)
    ly = jax.tree_util.tree_leaves(y)
    parts = [jnp.sum(a * b) for a, b in zip(lx, ly)]
    return sum(parts[1:], parts[0])


def _conj(x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(jnp.conj, x)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def linsolve_vjp(alg, alg_rrule, space, op, b, x0, a0, a1):
    from ..solvers.linsolve import _linsolve_impl

    return _linsolve_impl(op, b, x0, a0, a1, alg, space)


def _fwd(alg, alg_rrule, space, op, b, x0, a0, a1):
    from ..solvers.linsolve import _linsolve_impl

    x, info = _linsolve_impl(op, b, x0, a0, a1, alg, space)
    return (x, info), (op, x, a0, a1)


def _bwd(alg, alg_rrule, space, res, cot):
    from ..solvers.linsolve import _linsolve_impl

    op, x, a0, a1 = res
    xbar, _info_bar = cot
    # w = Mᵀ⁻¹ x̄ = conj(Mᴴ⁻¹ conj(x̄)); Mᴴ = conj(a0) + conj(a1) Aᴴ
    adj_op = LinearOperator(op.apply_adjoint, op.normal)
    u, _ = _linsolve_impl(
        adj_op, _conj(xbar), zerovector(xbar), jnp.conj(a0), jnp.conj(a1),
        alg_rrule, space,
    )
    w = _conj(u)
    bbar = w
    x0bar = zerovector(x)
    Ax = op.normal(x)
    a0bar = -dotu(w, x)
    a1bar = -dotu(w, Ax)
    # operator cotangent through its pytree leaves (empty for plain callables)
    _, op_vjp = jax.vjp(lambda o: o.normal(x), op)
    neg_a1w = jax.tree_util.tree_map(lambda l: (-a1) * l, w)
    (opbar,) = op_vjp(neg_a1w)
    return opbar, bbar, x0bar, a0bar, a1bar


linsolve_vjp.defvjp(_fwd, _bwd)
