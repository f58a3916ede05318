"""Pytree vector space — the TPU-native analogue of KrylovKit's VectorInterface.

The reference (KrylovKit.jl) lets a "vector" be any Julia object implementing
``inner``, ``norm``, ``scale!!``, ``add!!``, ``zerovector`` (reference:
``docs/src/index.md:69-77``, ``Project.toml:11``) and never assumes the length is
known (``src/eigsolve/eigsolve.jl:121-125``).  The JAX analogue is: a vector is any
*pytree of arrays* (real or complex), possibly sharded over a device mesh.  All
reductions (``inner``, ``norm``) end in a single scalar so that under ``jit`` on a
sharded mesh XLA lowers them to one fused ``psum`` over ICI.

Custom inner products (the reference's ``InnerProductVec``,
``src/innerproductvec.jl:18-21``) and the "real inner product" trick powering
``reallinsolve``/``realeigsolve`` (``src/KrylovKit.jl:243-256``) are expressed here
as a static :class:`VectorSpace` carried through the solvers, instead of wrapping
every vector: under ``jit`` the space is a hashable static argument, so the custom
inner product is traced straight into the compiled program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

PyTree = Any

__all__ = [
    "VectorSpace",
    "STANDARD",
    "REAL",
    "inner",
    "norm",
    "scale",
    "add",
    "zerovector",
    "scalartype",
    "real_scalartype",
    "randn_like",
    "from_template",
]


@dataclasses.dataclass(frozen=True)
class VectorSpace:
    """Static description of the inner-product space the solver works in.

    Attributes:
      inner_fn: optional custom inner product ``(x, y) -> scalar`` on raw pytrees
        (conjugate-linear in ``x``).  ``None`` means the standard Euclidean inner
        product summed over all leaves.  Mirrors ``InnerProductVec``
        (reference ``src/innerproductvec.jl:18-21``).
      real_inner: if True, use ``real(inner(x, y))`` — this treats a complex
        vector space as a real one, enabling ``reallinsolve``/``realeigsolve``
        for linear maps that are only R-linear (reference
        ``src/KrylovKit.jl:243-256``).
      psum_axis: mesh axis name for SHARD-LOCAL execution under ``shard_map``:
        inner products (and the batched projections in ``ops.basis``) compute
        local partials and finish with one ``lax.psum`` over this axis.  This
        is how whole solvers run inside ``shard_map`` with explicit
        collectives — the config-5 pod-scale mode (SURVEY.md §5.8).
    """

    inner_fn: Optional[Callable[[PyTree, PyTree], jax.Array]] = None
    real_inner: bool = False
    psum_axis: Optional[str] = None

    def inner(self, x: PyTree, y: PyTree) -> jax.Array:
        ip = self.inner_fn(x, y) if self.inner_fn is not None else _tree_inner(x, y)
        if self.psum_axis is not None:
            ip = jax.lax.psum(ip, self.psum_axis)
        if self.real_inner:
            ip = jnp.real(ip)
        return ip

    def norm(self, x: PyTree) -> jax.Array:
        # re-use inner so custom metrics give the induced norm
        nrm2 = jnp.real(self.inner(x, x))
        return jnp.sqrt(jnp.maximum(nrm2, 0))


STANDARD = VectorSpace()
REAL = VectorSpace(real_inner=True)


def _tree_inner(x: PyTree, y: PyTree) -> jax.Array:
    """Euclidean inner product over all leaves; conjugate-linear in ``x``.

    Ends in a single scalar add-reduction so a sharded execution needs exactly one
    ``psum`` (the per-iteration latency-critical collective — see SURVEY.md §5.8).
    """
    lx = jax.tree_util.tree_leaves(x)
    ly = jax.tree_util.tree_leaves(y)
    parts = [
        jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST) for a, b in zip(lx, ly)
    ]
    return sum(parts[1:], parts[0])


def inner(x: PyTree, y: PyTree, space: VectorSpace = STANDARD) -> jax.Array:
    return space.inner(x, y)


def norm(x: PyTree, space: VectorSpace = STANDARD) -> jax.Array:
    return space.norm(x)


def scale(x: PyTree, a) -> PyTree:
    """``a * x`` (reference VectorInterface ``scale``)."""
    return jax.tree_util.tree_map(lambda l: (a * l.astype(_promote(l, a))), x)


def add(y: PyTree, x: PyTree, a=1, b=1) -> PyTree:
    """``b*y + a*x`` — the reference's ``add!!(y, x, a, b)`` convention."""
    return jax.tree_util.tree_map(lambda ly, lx: b * ly + a * lx, y, x)


def zerovector(x: PyTree, dtype=None) -> PyTree:
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros_like(l, dtype=dtype or l.dtype), x
    )


def scalartype(*trees) -> jnp.dtype:
    """Joint scalar dtype of one or more pytrees (the reference's
    ``scalartype``/``apply_scalartype`` value-domain part, ``src/apply.jl:26-36``)."""
    leaves = [l for t in trees for l in jax.tree_util.tree_leaves(t)]
    return jnp.result_type(*[l.dtype for l in leaves])


def real_scalartype(dtype) -> jnp.dtype:
    """Real counterpart of a (possibly complex) floating dtype."""
    return jnp.finfo(dtype).dtype


def _promote(leaf, a):
    return jnp.result_type(leaf.dtype, jnp.result_type(a))


def from_template(template: PyTree, flat: jax.Array) -> PyTree:
    """Unravel a flat array into the structure/shapes/dtypes of ``template``."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    pos = 0
    for l in leaves:
        n = l.size
        out.append(flat[pos : pos + n].reshape(l.shape).astype(l.dtype))
        pos += n
    return jax.tree_util.tree_unflatten(treedef, out)


def randn_like(key: jax.Array, x: PyTree, dtype=None) -> PyTree:
    """Random gaussian pytree with the structure of ``x`` (for starting vectors)."""
    leaves, treedef = jax.tree_util.tree_flatten(x)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, l in zip(keys, leaves):
        dt = dtype or l.dtype
        if jnp.issubdtype(dt, jnp.complexfloating):
            rdt = jnp.finfo(dt).dtype
            re = jax.random.normal(k, l.shape, rdt)
            im = jax.random.normal(jax.random.fold_in(k, 1), l.shape, rdt)
            out.append((re + 1j * im).astype(dt))
        else:
            out.append(jax.random.normal(k, l.shape, dt))
    return jax.tree_util.tree_unflatten(treedef, out)
