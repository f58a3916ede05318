"""Gram-Schmidt orthogonalization strategies, batched for TPU.

The reference implements six strategies (``src/algorithms.jl:17-80``, kernels in
``src/orthonormal.jl:370-489``): ClassicalGramSchmidt (cgs), ModifiedGramSchmidt
(mgs), their twice-applied variants (cgs2 / mgs2 — mgs2 is the reference default,
``src/algorithms.jl:558``) and iteratively-refined variants (cgsir / mgsir) with
the DGKS criterion ``η = 1/sqrt(2)``.

TPU-first design (SURVEY.md §5.8): CGS-family strategies batch *all* inner
products of a sweep into one contraction → one ``psum`` per sweep on a sharded
mesh, and are the right default on TPU (``cgs2`` here).  MGS variants perform one
dependent reduction per basis vector (k sequential ``psum`` rounds per sweep) and
are provided for numerical parity testing with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from . import basis as bs
from .vector import VectorSpace, STANDARD, add

PyTree = Any

__all__ = [
    "Orthogonalizer",
    "ClassicalGramSchmidt",
    "ModifiedGramSchmidt",
    "ClassicalGramSchmidt2",
    "ModifiedGramSchmidt2",
    "ClassicalGramSchmidtIR",
    "ModifiedGramSchmidtIR",
    "cgs",
    "mgs",
    "cgs2",
    "mgs2",
    "cgsir",
    "mgsir",
    "orthogonalize",
    "orthonormalize",
]

_ETA_DGKS = 1 / jnp.sqrt(2.0)  # reference default η (src/algorithms.jl:76-80)


@dataclasses.dataclass(frozen=True)
class Orthogonalizer:
    """Base class; hashable static config, mirroring the reference's
    ``Orthogonalizer`` hierarchy (``src/algorithms.jl:17-80``)."""


@dataclasses.dataclass(frozen=True)
class ClassicalGramSchmidt(Orthogonalizer):
    pass


@dataclasses.dataclass(frozen=True)
class ModifiedGramSchmidt(Orthogonalizer):
    pass


@dataclasses.dataclass(frozen=True)
class ClassicalGramSchmidt2(Orthogonalizer):
    pass


@dataclasses.dataclass(frozen=True)
class ModifiedGramSchmidt2(Orthogonalizer):
    pass


@dataclasses.dataclass(frozen=True)
class ClassicalGramSchmidtIR(Orthogonalizer):
    eta: float = float(_ETA_DGKS)
    maxiter: int = 4


@dataclasses.dataclass(frozen=True)
class ModifiedGramSchmidtIR(Orthogonalizer):
    eta: float = float(_ETA_DGKS)
    maxiter: int = 4


# Singleton instances with the reference's lowercase names (src/algorithms.jl:30-76)
cgs = ClassicalGramSchmidt()
mgs = ModifiedGramSchmidt()
cgs2 = ClassicalGramSchmidt2()
mgs2 = ModifiedGramSchmidt2()
cgsir = ClassicalGramSchmidtIR()
mgsir = ModifiedGramSchmidtIR()


# Bucketed CGS sweeps: the XLA lowering of project/unproject streams the FULL
# (kmax, …) basis buffer every step because the active length k is traced.
# With bucketing, a lax.switch picks the smallest static row-prefix B ≥ k and
# both contractions read only B rows — a contiguous static leading-axis slice
# (layout unchanged), saving ~(1 − avg(B)/kmax) of the dominant HBM traffic of
# every Krylov solver.  On-chip A/B: tools/tpu_measure_all.py §2 (flag off/on).
use_bucketed_sweeps = True


def _cgs_sweep(w, V, k, space):
    kmax = _capacity(V)
    buckets = bs.buckets_for(kmax)
    if (
        use_bucketed_sweeps
        and len(buckets) > 1
        and space.inner_fn is None
        and not bs.use_pallas_projections
    ):
        cdt = _coeff_dtype(V, w, space)

        def make_branch(B):
            def br(w, V):
                Vb = bs.prefix(V, B)
                c = bs.project(Vb, w, k, space)
                w2 = add(w, bs.unproject(Vb, c), a=-1)
                return w2, jnp.pad(c, (0, kmax - B)).astype(cdt)

            return br

        idx = bs.bucket_index(k, buckets)
        return jax.lax.switch(idx, [make_branch(B) for B in buckets], w, V)
    c = bs.project(V, w, k, space)
    w = add(w, bs.unproject(V, c, k), a=-1)
    return w, c


def _mgs_sweep(w, V, k, space):
    kmax = _capacity(V)
    cz = jnp.zeros((kmax,), dtype=_coeff_dtype(V, w, space))

    def body(j, carry):
        w, c = carry
        vj = bs.get(V, j)
        cj = jnp.where(j < k, space.inner(vj, w), 0)
        w = add(w, vj, a=-cj)
        return w, c.at[j].set(cj)

    return jax.lax.fori_loop(0, kmax, body, (w, cz))


def _capacity(V) -> int:
    return jax.tree_util.tree_leaves(V)[0].shape[0]


def _coeff_dtype(V, w, space):
    dt = jnp.result_type(
        *[l.dtype for l in jax.tree_util.tree_leaves(V)],
        *[l.dtype for l in jax.tree_util.tree_leaves(w)],
    )
    if space.real_inner:
        dt = jnp.finfo(dt).dtype
    return dt


def orthogonalize(
    w: PyTree,
    V: PyTree,
    k,
    orth: Orthogonalizer = cgs2,
    space: VectorSpace = STANDARD,
) -> Tuple[PyTree, jax.Array]:
    """Orthogonalize ``w`` against the first ``k`` basis vectors of ``V``.

    Returns ``(w_perp, c)`` with ``w = w_perp + V c`` (``c`` masked to ``j < k``).
    Reference: ``orthogonalize!!`` per strategy (``src/orthonormal.jl:370-489``).
    """
    if isinstance(orth, ClassicalGramSchmidt):
        return _cgs_sweep(w, V, k, space)
    if isinstance(orth, ModifiedGramSchmidt):
        return _mgs_sweep(w, V, k, space)
    if isinstance(orth, ClassicalGramSchmidt2):
        w, c1 = _cgs_sweep(w, V, k, space)
        w, c2 = _cgs_sweep(w, V, k, space)
        return w, c1 + c2
    if isinstance(orth, ModifiedGramSchmidt2):
        w, c1 = _mgs_sweep(w, V, k, space)
        w, c2 = _mgs_sweep(w, V, k, space)
        return w, c1 + c2
    if isinstance(orth, (ClassicalGramSchmidtIR, ModifiedGramSchmidtIR)):
        sweep = (
            _cgs_sweep if isinstance(orth, ClassicalGramSchmidtIR) else _mgs_sweep
        )
        nrm_before = space.norm(w)
        w, c = sweep(w, V, k, space)
        nrm_after = space.norm(w)

        def cond(state):
            i, _, _, nb, na = state
            # DGKS drift criterion (reference src/orthonormal.jl:452-489):
            # refine while the sweep removed more than a factor η of the norm.
            return jnp.logical_and(i < orth.maxiter, na < orth.eta * nb)

        def body(state):
            i, w, c, _, na = state
            w2, dc = sweep(w, V, k, space)
            return i + 1, w2, c + dc, na, space.norm(w2)

        _, w, c, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), w, c, nrm_before, nrm_after)
        )
        return w, c
    raise TypeError(f"unknown orthogonalizer {orth!r}")


def orthonormalize(
    w: PyTree,
    V: PyTree,
    k,
    orth: Orthogonalizer = cgs2,
    space: VectorSpace = STANDARD,
) -> Tuple[PyTree, jax.Array, jax.Array]:
    """Orthogonalize then normalize: returns ``(v, beta, c)`` with
    ``w = V c + beta * v`` and ``||v|| = 1`` (guarded for breakdown ``beta ≈ 0``;
    in that case ``v`` is the zero vector).  Reference: ``orthonormalize!!``
    (``src/orthonormal.jl:520-527``)."""
    w, c = orthogonalize(w, V, k, orth, space)
    beta = space.norm(w)
    safe = jnp.where(beta > 0, beta, 1).astype(beta.dtype)
    v = jax.tree_util.tree_map(lambda l: jnp.where(beta > 0, l / safe, 0 * l), w)
    return v, beta, c
