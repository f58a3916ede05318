"""Public iterator API over the Krylov factorizations.

Mirrors the reference's iterator protocol (``src/factorizations/krylov.jl:30-134``):
``initialize`` / ``expand`` / ``shrink`` plus the accessors ``basis``,
``rayleighquotient``, ``residual``, ``normres``.  TPU-functionally: the
factorization is an immutable static-shape state advanced by pure functions, so
user-driven stepping composes with ``jit``/``lax`` control flow (the reference's
user-steppable iteration, ``src/factorizations/lanczos.jl:110-127``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.operator import as_operator
from ..ops.vector import STANDARD, VectorSpace, scalartype
from . import gkl as gf
from . import krylov as kf
from . import blocklanczos as bf

PyTree = Any

__all__ = [
    "LanczosIterator",
    "ArnoldiIterator",
    "GKLIterator",
    "BlockLanczosIterator",
    "BiArnoldiIterator",
    "basis",
    "rayleighquotient",
    "residual",
    "normres",
]


@dataclasses.dataclass(frozen=True)
class _KrylovIterator:
    """Shared machinery of Lanczos/Arnoldi iterators (unified expansion)."""

    op: Any
    x0: Any
    krylovdim: int = 30
    orth: on.Orthogonalizer = on.cgs2
    space: VectorSpace = STANDARD
    hermitian_expand: bool = False

    def initialize(self) -> kf.KrylovState:
        op = as_operator(self.op)
        cdt = scalartype(jax.eval_shape(op.normal, self.x0), self.x0)
        return kf.initialize(self.x0, self.krylovdim, cdt, self.space)

    def expand(self, state: kf.KrylovState) -> kf.KrylovState:
        op = as_operator(self.op)
        fn = kf.expand_hermitian if self.hermitian_expand else kf.expand
        return fn(op.normal, state, self.orth, self.space)

    def shrink(self, state: kf.KrylovState, k) -> kf.KrylovState:
        """Truncate to the first ``k`` vectors (mask-based; reference
        ``shrink!``, ``src/factorizations/lanczos.jl:273-291``)."""
        m1 = state.H.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
        keep = (rows <= k) & (cols < k)
        H = jnp.where(keep, state.H, 0)
        ki = jnp.asarray(k, jnp.int32)
        beta = jnp.abs(
            jax.lax.dynamic_slice(
                state.H, (ki, jnp.maximum(ki - 1, 0)), (1, 1)
            )[0, 0]
        )
        return kf.KrylovState(state.V, H, jnp.asarray(k, jnp.int32), beta)


@dataclasses.dataclass(frozen=True)
class LanczosIterator(_KrylovIterator):
    """Hermitian 3-term recurrence + drift sweep (reference
    ``src/factorizations/lanczos.jl``).

    With ``keepvecs=False`` the iterator runs the pure 3-term recurrence with
    O(1) vector storage — no stored basis, only the rolling ``(v_{k-1}, v_k)``
    pair (reference ``src/factorizations/lanczos.jl:133-144``).  Like the
    reference (``:137-141``) this is rejected for reorthogonalizing
    strategies, which need the full basis.
    """

    hermitian_expand: bool = True
    keepvecs: bool = True

    def __post_init__(self):
        if not self.keepvecs and not isinstance(
            self.orth, (on.ClassicalGramSchmidt, on.ModifiedGramSchmidt)
        ):
            raise ValueError(
                "keepvecs=False requires a non-reorthogonalizing strategy "
                "(cgs or mgs) — reference src/factorizations/lanczos.jl:137-141"
            )

    def initialize(self):
        if self.keepvecs:
            return super().initialize()
        op = as_operator(self.op)
        cdt = scalartype(jax.eval_shape(op.normal, self.x0), self.x0)
        return kf.initialize_3term(self.x0, self.krylovdim, cdt, self.space)

    def expand(self, state):
        if self.keepvecs:
            return super().expand(state)
        op = as_operator(self.op)
        return kf.expand_3term(op.normal, state, self.space)

    def shrink(self, state, k):
        if self.keepvecs:
            return super().shrink(state, k)
        raise ValueError(
            "cannot shrink a keepvecs=False factorization (no stored basis) — "
            "reference src/factorizations/lanczos.jl:273-291"
        )


@dataclasses.dataclass(frozen=True)
class ArnoldiIterator(_KrylovIterator):
    """Full orthogonalization against the basis (reference
    ``src/factorizations/arnoldi.jl``)."""

    hermitian_expand: bool = False


@dataclasses.dataclass(frozen=True)
class GKLIterator:
    """Golub-Kahan-Lanczos bidiagonalization iterator (reference
    ``src/factorizations/gkl.jl``)."""

    op: Any
    x0: Any  # codomain (left) starting vector
    krylovdim: int = 30
    orth: on.Orthogonalizer = on.cgs2
    space: VectorSpace = STANDARD

    def initialize(self) -> gf.GKLState:
        op = as_operator(self.op)
        if op.adjoint is None:
            op = op.with_adjoint_from(self.x0)
        cdt = scalartype(jax.eval_shape(op.apply_adjoint, self.x0), self.x0)
        return gf.initialize(op, self.x0, self.krylovdim, cdt, self.space)

    def expand(self, state: gf.GKLState) -> gf.GKLState:
        op = as_operator(self.op)
        if op.adjoint is None:
            op = op.with_adjoint_from(self.x0)
        return gf.expand(op, state, self.orth, self.space)


@dataclasses.dataclass(frozen=True)
class BlockLanczosIterator:
    """Block Lanczos iterator (reference ``src/factorizations/blocklanczos.jl``)."""

    op: Any
    X0: Any  # stacked starting block
    krylovdim: int = 30
    qr_tol: float = -1.0
    space: VectorSpace = STANDARD

    def _qr_tol(self, cdt):
        if self.qr_tol >= 0:
            return jnp.asarray(self.qr_tol, jnp.finfo(cdt).dtype)
        rdt = jnp.finfo(cdt).dtype
        return jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

    def initialize(self) -> bf.BlockLanczosState:
        op = as_operator(self.op)
        x0 = jax.tree_util.tree_map(lambda l: l[0], self.X0)
        cdt = scalartype(jax.eval_shape(op.normal, x0), self.X0)
        return bf.initialize(
            self.X0, self.krylovdim, cdt, self._qr_tol(cdt), self.space
        )

    def expand(self, state: bf.BlockLanczosState) -> bf.BlockLanczosState:
        op = as_operator(self.op)
        cdt = jax.tree_util.tree_leaves(state.H)[0].dtype
        return bf.expand(op.normal, state, self._qr_tol(cdt), self.space)


@dataclasses.dataclass(frozen=True)
class BiArnoldiIterator:
    """Pair of Arnoldi factorizations for ``A`` and ``Aᴴ`` expanded in
    lock-step (reference ``src/factorizations/biarnoldi.jl:1-83``).  State is a
    ``(right, left)`` tuple of :class:`~..factorizations.krylov.KrylovState`."""

    op: Any
    v0: Any
    w0: Any
    krylovdim: int = 30
    orth: on.Orthogonalizer = on.cgs2
    space: VectorSpace = STANDARD

    def _op(self):
        op = as_operator(self.op)
        if op.adjoint is None:
            op = op.with_adjoint_from(self.v0)
        return op

    def initialize(self):
        op = self._op()
        cdt = jnp.result_type(
            scalartype(jax.eval_shape(op.normal, self.v0), self.v0)
        )
        return (
            kf.initialize(self.v0, self.krylovdim, cdt, self.space),
            kf.initialize(self.w0, self.krylovdim, cdt, self.space),
        )

    def expand(self, state):
        op = self._op()
        fV, fW = state
        fV = kf.expand(op.normal, fV, self.orth, self.space)
        fW = kf.expand(op.apply_adjoint, fW, self.orth, self.space)
        return fV, fW


# ---- accessors (reference src/factorizations/krylov.jl:30-92) ----

def basis(state):
    """The stacked basis of a factorization state (``V``; for GKL pass the
    state and read ``.U``/``.V`` directly for the two sides)."""
    return state.V


def rayleighquotient(state):
    """The projected matrix buffer (active block ``[:k, :k]``)."""
    if isinstance(state, gf.GKLState):
        return state.B
    return state.H


def residual(state):
    """The (normalized) residual direction: the next basis vector slot."""
    if isinstance(state, gf.GKLState):
        return bs.get(state.U, state.k)
    if isinstance(state, bf.BlockLanczosState):
        return state.X
    if isinstance(state, kf.Lanczos3State):
        return state.v_cur
    return bs.get(state.V, state.k)


def normres(state):
    """Residual norm β of the factorization."""
    return state.beta
