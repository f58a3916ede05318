"""``linsolve`` front-end: keyword API + algorithm auto-selection + jit cache.

Mirrors the reference front-end (``src/linsolve/linsolve.jl``): solves

    (a0 + a1·A) x = b

returning ``(x, info)``.  The ``linselector`` picks CG for Hermitian
positive-definite combined operators and GMRES otherwise
(``src/linsolve/linsolve.jl:123-180``; the reference leaves MINRES as a TODO at
``:140-141`` — here a Hermitian *indefinite* concrete matrix selects the
implemented MINRES).  Tolerance resolution ``tol = max(atol, rtol·‖b‖)``
(``src/linsolve/linsolve.jl:130-132``).  ``reallinsolve`` restricts the inner
product to its real part so R-linear maps on complex vectors can be solved
(``src/linsolve/linsolve.jl:250-258``, ``src/KrylovKit.jl:243-256``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms import CG, GMRES, MINRES, BiCGStab, KrylovDefaults
from ..ops.operator import as_operator
from ..ops.vector import REAL, STANDARD, VectorSpace, norm as vec_norm, zerovector
from .bicgstab import linsolve_bicgstab
from .cg import linsolve_cg
from .gmres import linsolve_gmres
from .minres import linsolve_minres

PyTree = Any

__all__ = ["linsolve", "reallinsolve"]


def _linsolve_impl(op, b, x0, a0, a1, alg, space):
    """Undifferentiated driver dispatch (used for both primal and pullback)."""
    if isinstance(alg, CG):
        return linsolve_cg(op, b, x0, a0, a1, alg, space)
    if isinstance(alg, MINRES):
        return linsolve_minres(op, b, x0, a0, a1, alg, space)
    if isinstance(alg, BiCGStab):
        return linsolve_bicgstab(op, b, x0, a0, a1, alg, space)
    if isinstance(alg, GMRES):
        return linsolve_gmres(op, b, x0, a0, a1, alg, space)
    raise TypeError(f"unsupported linsolve algorithm {alg!r}")


@partial(jax.jit, static_argnames=("alg", "alg_rrule", "space"))
def _linsolve_core(op, b, x0, a0, a1, alg, space, alg_rrule=None):
    from ..ad.linsolve import linsolve_vjp

    return linsolve_vjp(alg, alg_rrule or alg, space, op, b, x0, a0, a1)


def _is_concrete(A) -> bool:
    return isinstance(A, (np.ndarray, jax.Array)) and not isinstance(
        A, jax.core.Tracer
    )


def _probe_matrix(A):
    """Hermiticity / positive-definiteness probe for concrete matrices
    (reference ``linselector`` matrix path, src/linsolve/linsolve.jl:152-180)."""
    An = np.asarray(A)
    if An.ndim != 2 or An.shape[0] != An.shape[1]:
        return False, False
    herm = bool(
        np.allclose(An, An.conj().T, atol=1e-12 * max(1.0, float(np.max(np.abs(An)))))
    )
    posdef = False
    if herm:
        try:
            np.linalg.cholesky((An + An.conj().T) / 2)
            posdef = True
        except np.linalg.LinAlgError:
            posdef = False
    return herm, posdef


def _resolve_tol(b, atol, rtol, tol):
    if tol is not None:
        return float(tol)
    atol = KrylovDefaults.tol if atol is None else atol
    rtol = KrylovDefaults.tol if rtol is None else rtol
    leaves = jax.tree_util.tree_leaves(b)
    if rtol != 0 and all(_is_concrete(l) for l in leaves):
        nb = float(
            np.sqrt(sum(float(np.sum(np.abs(np.asarray(l)) ** 2)) for l in leaves))
        )
        return max(float(atol), float(rtol) * nb)
    return float(atol)


def _select_alg(A, a0, a1, ishermitian, isposdef, alg, tol, **kw):
    if alg is not None:
        if tol is not None and getattr(alg, "tol", None) != tol:
            alg = dataclasses.replace(alg, tol=tol)
        return alg
    herm, posdef = (None, None)
    if ishermitian is None or (ishermitian and isposdef is None):
        if _is_concrete(A):
            herm, posdef = _probe_matrix(A)
    ishermitian = herm if ishermitian is None else ishermitian
    isposdef = posdef if isposdef is None else isposdef
    # shift legality: CG/MINRES require a real shift keeping hermiticity;
    # traced shifts cannot be inspected → conservatively pick GMRES
    if isinstance(a0, jax.core.Tracer) or isinstance(a1, jax.core.Tracer):
        real_shift = False
    else:
        real_shift = (
            np.isrealobj(np.asarray(a0)) and np.isrealobj(np.asarray(a1))
            and float(np.real(np.asarray(a1))) > 0
        )
    fields = {k: v for k, v in kw.items() if v is not None}
    if tol is not None:
        fields["tol"] = tol
    if ishermitian and real_shift and float(np.real(np.asarray(a0))) >= 0 and isposdef:
        fields.pop("krylovdim", None)
        fields.pop("orth", None)
        return CG(**fields)
    if ishermitian and real_shift:
        fields.pop("krylovdim", None)
        fields.pop("orth", None)
        return MINRES(**fields)
    return GMRES(**fields)


def linsolve(
    A,
    b: PyTree,
    x0: Optional[PyTree] = None,
    a0=0.0,
    a1=1.0,
    *,
    ishermitian: Optional[bool] = None,
    isposdef: Optional[bool] = None,
    alg=None,
    space: VectorSpace = STANDARD,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    verbosity: Optional[int] = None,
    alg_rrule=None,
):
    """Solve ``(a0 + a1·A) x = b``; returns ``(x, info)``.  Differentiable:
    the pullback solves the transposed system with ``alg_rrule`` (default: the
    primal algorithm), mirroring ``ext/.../linsolve.jl``.

    Reference: ``linsolve`` (``src/linsolve/linsolve.jl:1-122``).  ``A`` may be a
    matrix, callable, ``(f, fadjoint)`` tuple, or ``LinearOperator``; ``b`` any
    pytree.  ``x0`` defaults to the zero vector (reference ``:112-118``).
    """
    op = as_operator(A)
    if x0 is None:
        x0 = zerovector(b)
    # an explicit algorithm object carries its own tol; only re-resolve when
    # the caller passed tolerance keywords (or no alg at all)
    if alg is not None and atol is None and rtol is None and tol is None:
        tolv = None
    else:
        tolv = _resolve_tol(b, atol, rtol, tol)
    alg = _select_alg(
        A, a0, a1, ishermitian, isposdef, alg, tolv,
        maxiter=maxiter, krylovdim=krylovdim, orth=orth, verbosity=verbosity,
    )
    # shift scalars adopt b's scalar type (Python floats must not promote f32→f64)
    cdt = jnp.result_type(*[l.dtype for l in jax.tree_util.tree_leaves(b)])
    if any(
        (jnp.issubdtype(a.dtype, jnp.complexfloating)
         if isinstance(a, (jax.Array, jax.core.Tracer))
         else np.iscomplexobj(np.asarray(a)))
        for a in (a0, a1)
    ):
        cdt = jnp.result_type(cdt, np.complex64)
    a0 = jnp.asarray(a0, cdt)
    a1 = jnp.asarray(a1, cdt)
    if op.adjoint is None:
        op = op.with_adjoint_from(b)  # pullback needs Aᴴ
    return _linsolve_core(op, b, x0, a0, a1, alg, space, alg_rrule)


def reallinsolve(A, b: PyTree, x0: Optional[PyTree] = None, a0=0.0, a1=1.0, **kw):
    """``linsolve`` over the *real* inner product: the complex vector space is
    treated as a real one, so ``A`` need only be R-linear (reference
    ``reallinsolve``, ``src/linsolve/linsolve.jl:250-258``)."""
    space = kw.pop("space", None)
    if space is None:
        space = REAL
    elif not space.real_inner:
        space = dataclasses.replace(space, real_inner=True)
    return linsolve(A, b, x0, a0, a1, space=space, **kw)
