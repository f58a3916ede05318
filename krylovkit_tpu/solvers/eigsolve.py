"""``eigsolve`` front-end: keyword API + algorithm auto-selection + jit cache.

Mirrors the reference front-end (``src/eigsolve/eigsolve.jl``): the ``eigselector``
picks Lanczos for Hermitian problems and Arnoldi otherwise
(``src/eigsolve/eigsolve.jl:238-283``), probing hermiticity numerically for
concrete matrices; callables default to Arnoldi unless ``ishermitian=True``.

The solve itself is a module-level jitted function: operators and starting
vectors are traced pytrees, ``(howmany, which, alg, space)`` are static, so
repeated solves with same-shaped problems reuse the compiled executable.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms import Arnoldi, BlockLanczos, KrylovDefaults, Lanczos
from ..ops.block import Block
from ..ops.operator import LinearOperator, MatrixOperator, as_operator
from ..ops.vector import STANDARD, VectorSpace
from .arnoldi import eigsolve_arnoldi, schursolve as _schursolve_driver
from .blocklanczos import eigsolve_blocklanczos
from .lanczos import eigsolve_lanczos

PyTree = Any

__all__ = ["eigsolve", "schursolve", "realeigsolve"]


def _eigsolve_impl(op, x0, howmany, which, alg, space):
    """Undifferentiated driver dispatch (primal path of the custom VJP)."""
    if isinstance(alg, BlockLanczos):
        return eigsolve_blocklanczos(op, x0, howmany, which, alg, space)
    if isinstance(alg, Lanczos):
        return eigsolve_lanczos(op, x0, howmany, which, alg, space)
    return eigsolve_arnoldi(op, x0, howmany, which, alg, space)


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space", "alg_rrule"))
def _eigsolve_core(op, x0, howmany, which, alg, space, alg_rrule=None):
    if isinstance(alg, BlockLanczos):
        return eigsolve_blocklanczos(op, x0, howmany, which, alg, space)
    from ..ad.eigsolve import eigsolve_vjp

    opd = op if op.adjoint is not None else op.with_adjoint_from(x0)
    return eigsolve_vjp(howmany, which, alg, alg_rrule, space, opd, x0)


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space"))
def _schursolve_core(op, x0, howmany, which, alg, space):
    return _schursolve_driver(op, x0, howmany, which, alg, space)


def _is_concrete(A) -> bool:
    return isinstance(A, (np.ndarray, jax.Array)) and not isinstance(
        A, jax.core.Tracer
    )


def _probe_hermitian(A) -> bool:
    An = np.asarray(A)
    return An.shape[0] == An.shape[1] and bool(
        np.allclose(An, An.conj().T, atol=1e-12 * max(1.0, float(np.max(np.abs(An)))))
    )


def _default_x0(A, x0):
    if x0 is not None:
        # breakdown guard for concrete starts (reference raises on β₀ == 0,
        # src/factorizations/lanczos.jl:184; inside jit this is undetectable)
        leaves = jax.tree_util.tree_leaves(x0)
        if all(_is_concrete(l) for l in leaves):
            nrm2 = sum(float(jnp.sum(jnp.abs(l) ** 2)) for l in leaves)
            if nrm2 == 0.0:
                raise ValueError("starting vector x0 has zero norm")
        return x0
    if _is_concrete(A) and getattr(A, "ndim", 0) == 2:
        n = A.shape[1]
        dt = jnp.asarray(A).dtype
        return jnp.asarray(
            np.random.default_rng(42).standard_normal(n), jnp.finfo(dt).dtype
        ).astype(dt)
    raise ValueError("x0 is required unless the operator is a concrete matrix")


def _select_alg(A, ishermitian, alg, **kw):
    """``eigselector`` (reference src/eigsolve/eigsolve.jl:238-283)."""
    if alg is not None:
        return alg
    if ishermitian is None:
        ishermitian = _probe_hermitian(A) if _is_concrete(A) else False
    cls = Lanczos if ishermitian else Arnoldi
    fields = {k: v for k, v in kw.items() if v is not None}
    return cls(**fields)


def eigsolve(
    A,
    x0: Optional[PyTree] = None,
    howmany: int = 1,
    which="LM",
    *,
    ishermitian: Optional[bool] = None,
    alg=None,
    space: VectorSpace = STANDARD,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    eager: Optional[bool] = None,
    verbosity: Optional[int] = None,
    alg_rrule=None,
):
    """Find ``howmany`` extremal eigenvalues of a linear map.

    Returns ``(vals, vecs, info)`` with ``vals`` of static length ``howmany``,
    ``vecs`` a stacked pytree of Ritz vectors (leading axis ``howmany``) and
    ``info`` a :class:`ConvergenceInfo`.  Reference: ``eigsolve``
    (``src/eigsolve/eigsolve.jl:1-185``).

    The map may be a matrix, a callable, or a ``LinearOperator``; vectors are
    arbitrary pytrees (shardable).  Hermiticity is probed for concrete matrices
    and assumed False for callables unless ``ishermitian=True``.
    """
    op = as_operator(A)
    # Block starting value → BlockLanczos (reference eigselector picks
    # BlockLanczos for Block input, src/eigsolve/eigsolve.jl:238-283)
    if isinstance(x0, Block) or isinstance(alg, BlockLanczos):
        if not isinstance(x0, Block):
            raise ValueError("BlockLanczos requires a Block starting value x0")
        if alg is None or not isinstance(alg, BlockLanczos):
            kwb = dict(
                tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
                eager=eager, verbosity=verbosity,
            )
            alg = BlockLanczos(**{k: v for k, v in kwb.items() if v is not None})
        return _eigsolve_core(op, x0.stacked, howmany, which, alg, space)
    x0 = _default_x0(A, x0)
    alg = _select_alg(
        A,
        ishermitian,
        alg,
        tol=tol,
        krylovdim=krylovdim,
        maxiter=maxiter,
        orth=orth,
        eager=eager,
        verbosity=verbosity,
    )
    if isinstance(alg, Lanczos) and isinstance(which, str) and which.upper() in (
        "LI",
        "SI",
    ):
        raise ValueError("which=LI/SI invalid for Hermitian problems")
    if isinstance(alg, Arnoldi) and isinstance(which, str) and which.upper() in (
        "LI",
        "SI",
    ):
        # real maps have conjugate-symmetric spectra: selecting by imaginary
        # part cannot separate a conjugate pair (reference requires a
        # conj-symmetric `by`, src/eigsolve/eigsolve.jl:209-236)
        from ..ops.operator import probe_dtype as _probe

        try:
            pdt = _probe(op, x0)
        except Exception:
            pdt = None
        if pdt is not None and not jnp.issubdtype(pdt, jnp.complexfloating):
            raise ValueError(
                "which=LI/SI invalid for real linear maps (conjugate-symmetric "
                "spectrum) — reference src/eigsolve/eigsolve.jl:209-236"
            )
    return _eigsolve_core(op, x0, howmany, which, alg, space, alg_rrule)


def schursolve(
    A,
    x0: Optional[PyTree] = None,
    howmany: int = 1,
    which="LM",
    alg: Optional[Arnoldi] = None,
    *,
    space: VectorSpace = STANDARD,
    **kw,
):
    """Partial Schur decomposition ``(T, vecs, vals, info)`` (reference
    ``schursolve``, ``src/eigsolve/arnoldi.jl:1-150``)."""
    op = as_operator(A)
    x0 = _default_x0(A, x0)
    if alg is None:
        alg = Arnoldi(**{k: v for k, v in kw.items() if v is not None})
    return _schursolve_core(op, x0, howmany, which, alg, space)


def realeigsolve(
    A,
    x0: Optional[PyTree] = None,
    howmany: int = 1,
    which="LM",
    alg: Optional[Arnoldi] = None,
    *,
    imag_tol: Optional[float] = None,
    space: VectorSpace = STANDARD,
    **kw,
):
    """Eigsolve for real linear maps asserting real eigenvalues (reference
    ``realeigsolve``, ``src/eigsolve/arnoldi.jl:293-349``).

    Runs the fully REAL Arnoldi driver (real basis, real Schur form with 2x2
    blocks, real eigenvectors — no complex arrays anywhere, so this also works
    on TPU runtimes without complex support).  If a complex conjugate pair
    enters the wanted window the result is invalid: outside jit this raises
    (like the reference); inside jit a WARN-level log fires and the caller can
    inspect the eigenvalue residuals.
    """
    kw.pop("ishermitian", None)
    op = as_operator(A)
    x0 = _default_x0(A, x0)
    if alg is None:
        alg = Arnoldi(**{k: v for k, v in kw.items() if v is not None})
    vals, vecs, info, maximag = _realeigsolve_core(
        op, x0, howmany, which, alg, space
    )
    if not isinstance(maximag, jax.core.Tracer):
        tol = imag_tol
        if tol is None:
            tol = float(np.finfo(np.dtype(jnp.finfo(vals.dtype).dtype)).eps ** 0.5)
        scalemax = max(1.0, float(jnp.max(jnp.abs(vals))))
        if float(maximag) > tol * scalemax:
            raise ValueError(
                f"realeigsolve: requested eigenvalues are not real "
                f"(max |imag| = {float(maximag):.3e}); use eigsolve instead"
            )
    return vals, vecs, info


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space"))
def _realeigsolve_core(op, x0, howmany, which, alg, space):
    from .arnoldi import realeigsolve_arnoldi

    return realeigsolve_arnoldi(op, x0, howmany, which, alg, space)
