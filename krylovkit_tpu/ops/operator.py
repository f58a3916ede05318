"""Linear-operator protocol — TPU-native analogue of the reference's ``apply`` layer.

The reference dispatches operator application on three encodings
(``src/apply.jl:1-23``):

* an ``AbstractMatrix`` applied via ``*``,
* an arbitrary callable applied via call,
* a two-sided encoding for adjoint problems: a ``(f, fadjoint)`` tuple or a
  flag-taking function.

Here the canonical form is a :class:`LinearOperator` holding jittable
``normal``/``adjoint`` callables on pytrees.  Improvements over the reference made
possible by JAX:

* for a plain callable with no user-supplied adjoint, the adjoint is derived
  automatically with ``jax.linear_transpose`` (the reference requires the user to
  pass the adjoint explicitly for two-sided problems);
* a fused ``a0*x + a1*A(x)`` apply (the reference's ``apply(f, x, a0, a1)``,
  ``src/apply.jl:5-11``) keeps the shift elementwise-fused into the operator's
  output under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from . import vector as vec

PyTree = Any
OperatorLike = Union[jax.Array, Callable, Tuple]

__all__ = [
    "LinearOperator",
    "ParametricOperator",
    "StencilOperator",
    "GridStencilOperator",
    "as_operator",
    "as_generalized_pair",
    "apply_shifted",
]


@dataclasses.dataclass(frozen=True)
class LinearOperator:
    """A linear map on pytree vectors with optional adjoint.

    ``normal(x)`` computes ``A x``; ``adjoint(y)`` computes ``Aᴴ y``.  Both must be
    jit-traceable.  ``adjoint`` may be ``None`` when the problem never needs it.

    Registered as a pytree with the callables as static aux data, so an operator
    can be passed straight through ``jit`` boundaries (the jit cache keys on the
    callables' identity; matrix operators keep the matrix as traced data — see
    :class:`MatrixOperator`).
    """

    normal: Callable[[PyTree], PyTree]
    adjoint: Optional[Callable[[PyTree], PyTree]] = None

    def __call__(self, x: PyTree) -> PyTree:
        return self.normal(x)

    def apply_adjoint(self, y: PyTree) -> PyTree:
        if self.adjoint is None:
            raise ValueError(
                "this operator has no adjoint; pass a (f, fadjoint) tuple, a matrix, "
                "or let as_operator derive one with with_adjoint_from(x_template)"
            )
        return self.adjoint(y)

    def with_adjoint_from(self, x_template: PyTree) -> "LinearOperator":
        """Return an operator whose adjoint is auto-derived via linear transpose.

        For a complex-linear map ``f``, ``Aᴴ y = conj(fᵀ(conj(y)))``.  ``fᵀ`` comes
        from ``jax.linear_transpose`` on the template structure.
        """
        if self.adjoint is not None:
            return self
        f = self.normal

        def adj(y):
            ybar = jax.tree_util.tree_map(jnp.conj, y)
            (xbar,) = jax.linear_transpose(f, x_template)(ybar)
            return jax.tree_util.tree_map(jnp.conj, xbar)

        return LinearOperator(f, adj)


jax.tree_util.register_pytree_node(
    LinearOperator,
    lambda op: ((), (op.normal, op.adjoint)),
    lambda aux, _: LinearOperator(*aux),
)


@dataclasses.dataclass(frozen=True)
class StencilOperator(LinearOperator):
    """Constant-coefficient stencil ``(A x)[i] = Σ_p coeffs[p]·x[i + offsets[p]]``
    on the row-major flattening of the vector, with ZERO (Dirichlet-truncation)
    boundary: out-of-range neighbours contribute nothing.

    The offsets/coefficients are STATIC metadata, which makes the operator
    *fusable*: the Lanczos fused-expansion kernel
    (``ops/pallas_fused_lanczos.py``) applies it tile-locally inside the same
    VMEM pass that forms the residual, halving the solver's dominant HBM
    traffic.  ``normal``/``adjoint`` default to a roll-based XLA apply with
    identical semantics (the adjoint is the reversed stencil with conjugated
    coefficients), so the operator works everywhere; the fused path engages
    only where supported.

    Construct directly, or via helpers like ``parallel.laplacian_1d``.
    """

    offsets: Tuple[int, ...] = ()
    coeffs: Tuple[float, ...] = ()

    def __init__(self, offsets, coeffs, normal=None, adjoint=None):
        offsets = tuple(int(d) for d in offsets)
        coeffs = tuple(complex(c).real if complex(c).imag == 0 else complex(c)
                       for c in coeffs)
        object.__setattr__(self, "offsets", offsets)
        object.__setattr__(self, "coeffs", coeffs)
        object.__setattr__(
            self, "normal", normal or _stencil_apply_fn(offsets, coeffs)
        )
        if adjoint is None:
            adj_off = tuple(-d for d in reversed(offsets))
            adj_cf = tuple(
                (c.conjugate() if isinstance(c, complex) else c)
                for c in reversed(coeffs)
            )
            adjoint = _stencil_apply_fn(adj_off, adj_cf)
        object.__setattr__(self, "adjoint", adjoint)


def _stencil_apply_fn(offsets, coeffs):
    """Roll-based XLA apply of a constant stencil with zero boundary, on the
    row-major flattening of an arbitrarily-shaped single-leaf vector.  For
    ``(rows, 128)`` TPU layouts the rolls stay tile-local (lane shifts +
    one-row carries), the same formulation ``parallel.laplacian_1d`` uses."""

    def apply(x):
        shape = x.shape
        n = 1
        for d in shape:
            n *= d
        if x.ndim > 2:
            # whole-leaf row-major flattening (the documented semantics):
            # collapse leading dims into rows so the 2-D path's cross-row
            # carries connect adjacent leading slices (a free reshape — the
            # trailing dim is preserved)
            C = shape[-1]
            return apply(x.reshape((n // C, C))).reshape(shape)
        if x.ndim == 2:
            # operate in the native 2-D layout: offset δ decomposes into a
            # last-axis roll with a cross-row carry — no flattening reshape
            # (a flat (n,) relayout costs a full pass; CLAUDE.md perf facts)
            C = shape[-1]
            idx = jax.lax.broadcasted_iota(jnp.int32, shape, x.ndim - 1)
            ridx = jax.lax.broadcasted_iota(jnp.int32, shape, x.ndim - 2)
            R = shape[-2]
            y = None
            for coef, d in zip(coeffs, offsets):
                if d == 0:
                    t = x
                else:
                    q, r = divmod(d, C)
                    sh = jnp.roll(x, -r, axis=-1) if r else x
                    # lanes that wrapped need the next row's values
                    if r:
                        sh_next = jnp.roll(sh, -(q + 1), axis=-2)
                        sh_same = jnp.roll(sh, -q, axis=-2) if q else sh
                        t = jnp.where(idx < C - r, sh_same, sh_next)
                        # zero where the source element falls outside [0, n)
                        src_row = jnp.where(idx < C - r, ridx + q, ridx + q + 1)
                    else:
                        t = jnp.roll(sh, -q, axis=-2)
                        src_row = ridx + q
                    t = jnp.where((src_row >= 0) & (src_row < R), t, 0)
                y = coef * t if y is None else y + coef * t
            return y

        idx = jnp.arange(n)
        y = jnp.zeros(shape, jnp.result_type(x.dtype))
        for coef, d in zip(coeffs, offsets):
            sh = jnp.roll(x, -d)
            sh = jnp.where((idx + d >= 0) & (idx + d < n), sh, 0)
            y = y + coef * sh
        return y.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else y

    return apply


jax.tree_util.register_pytree_node(
    StencilOperator,
    lambda op: ((), (op.offsets, op.coeffs, op.normal, op.adjoint)),
    lambda aux, _: StencilOperator(aux[0], aux[1], aux[2], aux[3]),
)


@dataclasses.dataclass(frozen=True)
class GridStencilOperator(LinearOperator):
    """Constant-coefficient stencil on the row-major flattening of a 2-D grid
    ``(grid_rows, grid_cols)`` with offsets given as ``(dy, dx)`` pairs and
    ZERO (Dirichlet) boundaries on BOTH axes::

        (A x)[iy, ix] = Σ_p coeffs[p] · x[iy + dy_p, ix + dx_p]

    with out-of-grid neighbours contributing nothing — unlike
    :class:`StencilOperator`'s flat-chain semantics, an ``ix ± 1`` neighbour
    never wraps into the adjacent grid row.  This is the 2-D Poisson / grid-PDE
    operator class (BASELINE config 2).

    The grid is STATIC metadata, so the operator is *fusable*: the one-stream
    expansion kernel (``ops/pallas_fused_lanczos.py``) applies it tile-locally
    with multi-row halos (``dy`` reaches ``grid_cols/128`` layout rows) and
    per-lane grid masks.  The default ``normal``/``adjoint`` is a roll-based
    XLA apply accepting vectors shaped ``(grid_rows, grid_cols)``, any
    ``(R, C)`` row-major layout with ``grid_cols % C == 0`` (use ``(n/128,
    128)`` on TPU — see ``ops/basis.py``), or flat ``(n,)``.

    Reference counterpart: the reference applies such operators as generic
    sparse ``A*x`` (``src/apply.jl:1-2``); the static-metadata redesign is
    what lets TPU fuse them into the basis stream.
    """

    grid: Tuple[int, int] = ()
    offsets2: Tuple[Tuple[int, int], ...] = ()
    coeffs: Tuple[float, ...] = ()

    def __init__(self, grid, offsets2, coeffs, normal=None, adjoint=None):
        grid = (int(grid[0]), int(grid[1]))
        offsets2 = tuple((int(dy), int(dx)) for dy, dx in offsets2)
        coeffs = tuple(
            complex(c).real if complex(c).imag == 0 else complex(c)
            for c in coeffs
        )
        object.__setattr__(self, "grid", grid)
        object.__setattr__(self, "offsets2", offsets2)
        object.__setattr__(self, "coeffs", coeffs)
        object.__setattr__(
            self, "normal",
            normal or _grid_stencil_apply_fn(grid, offsets2, coeffs),
        )
        if adjoint is None:
            adj_off = tuple((-dy, -dx) for dy, dx in reversed(offsets2))
            adj_cf = tuple(
                (c.conjugate() if isinstance(c, complex) else c)
                for c in reversed(coeffs)
            )
            adjoint = _grid_stencil_apply_fn(grid, adj_off, adj_cf)
        object.__setattr__(self, "adjoint", adjoint)


def _grid_stencil_apply_fn(grid, offsets2, coeffs):
    """Roll-based XLA apply of a 2-D grid stencil with zero BC on both axes.
    Works on ``(grid_rows, grid_cols)``, ``(R, C)`` with ``grid_cols % C ==
    0``, flat ``(n,)``, and higher-rank leaves (leading dims folded into
    rows).  Tile-local on TPU: ``dy`` lowers to whole-row rolls, ``dx`` to a
    lane roll + one-row carry + a per-lane mask."""
    gr_, gc_ = grid
    n = gr_ * gc_

    def apply(x):
        shape = x.shape
        if x.ndim == 1:
            idx = jnp.arange(n)
            iy, ix = idx // gc_, idx % gc_
            y = None
            for c, (dy, dx) in zip(coeffs, offsets2):
                sh = jnp.roll(x, -(dy * gc_ + dx))
                valid = (
                    (iy + dy >= 0) & (iy + dy < gr_)
                    & (ix + dx >= 0) & (ix + dx < gc_)
                )
                t = jnp.where(valid, sh, 0)
                y = c * t if y is None else y + c * t
            return y
        if x.ndim > 2:
            C = shape[-1]
            nn = 1
            for d in shape:
                nn *= d
            return apply(x.reshape((nn // C, C))).reshape(shape)
        R, C = shape
        if gc_ % C != 0:
            # non-tileable column width: correctness fallback via flat view
            return apply(x.reshape((R * C,))).reshape(shape)
        mrow = gc_ // C
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        ix = (ridx % mrow) * C + lane
        y = None
        for c, (dy, dx) in zip(coeffs, offsets2):
            d = dy * gc_ + dx  # flat offset
            q, r = divmod(d, C)
            sh = jnp.roll(x, -r, axis=-1) if r else x
            if r:
                sh_next = jnp.roll(sh, -(q + 1), axis=0)
                sh_same = jnp.roll(sh, -q, axis=0) if q else sh
                t = jnp.where(lane < C - r, sh_same, sh_next)
                src_row = jnp.where(lane < C - r, ridx + q, ridx + q + 1)
            else:
                t = jnp.roll(sh, -q, axis=0) if q else sh
                src_row = ridx + q
            # flat-range mask covers the dy extent (given the ix mask below,
            # src flat index in [0, n) ⟺ iy + dy in [0, grid_rows))
            valid = (src_row >= 0) & (src_row < R)
            if dx:
                valid &= (ix + dx >= 0) & (ix + dx < gc_)
            t = jnp.where(valid, t, 0)
            y = c * t if y is None else y + c * t
        return y

    return apply


jax.tree_util.register_pytree_node(
    GridStencilOperator,
    lambda op: ((), (op.grid, op.offsets2, op.coeffs, op.normal, op.adjoint)),
    lambda aux, _: GridStencilOperator(*aux),
)


@dataclasses.dataclass(frozen=True)
class MatrixOperator(LinearOperator):
    """Dense-matrix operator; the matrix is traced pytree data, so repeated
    solves with same-shaped matrices hit the jit cache."""

    A: jax.Array = None

    def __init__(self, A):
        object.__setattr__(self, "A", A)
        object.__setattr__(self, "normal", self._normal)
        object.__setattr__(self, "adjoint", self._adjoint)

    def _normal(self, x):
        return jnp.matmul(self.A, x, precision=jax.lax.Precision.HIGHEST)

    def _adjoint(self, y):
        return jnp.matmul(self.A.conj().T, y, precision=jax.lax.Precision.HIGHEST)


jax.tree_util.register_pytree_node(
    MatrixOperator,
    lambda op: ((op.A,), ()),
    lambda aux, children: MatrixOperator(children[0]),
)


@dataclasses.dataclass(frozen=True)
class ParametricOperator(LinearOperator):
    """Operator whose application depends on differentiable parameters carried
    as pytree DATA: ``apply_fn(params, x)``.

    Plain callables close over their parameters statically, so ``jax.grad``
    through a solve cannot differentiate with respect to them (custom-VJP
    rules only see explicit inputs).  Carrying ``params`` as pytree children
    routes them through the solvers' ``custom_vjp`` rules — the operator
    cotangent is then the gradient with respect to ``params``.

    Example::

        op = ParametricOperator(lambda g, x: g * x, params=g)
        vals, vecs, info = kk.eigsolve(op, x0, 1, "SR", ishermitian=True)
    """

    apply_fn: Callable = None
    params: Any = None
    adjoint_fn: Optional[Callable] = None

    def __init__(self, apply_fn, params, adjoint_fn=None):
        object.__setattr__(self, "apply_fn", apply_fn)
        object.__setattr__(self, "params", params)
        object.__setattr__(self, "adjoint_fn", adjoint_fn)
        object.__setattr__(self, "normal", lambda x: apply_fn(self.params, x))
        object.__setattr__(
            self,
            "adjoint",
            (lambda y: adjoint_fn(self.params, y)) if adjoint_fn is not None else None,
        )

    def with_adjoint_from(self, x_template: PyTree) -> "ParametricOperator":
        # keep params explicit — a plain-LinearOperator wrap would bury the
        # (possibly traced) params inside a static closure and break jax.grad
        if self.adjoint is not None:
            return self
        f = self.apply_fn

        def adj_fn(params, y):
            ybar = jax.tree_util.tree_map(jnp.conj, y)
            (xbar,) = jax.linear_transpose(lambda x: f(params, x), x_template)(ybar)
            return jax.tree_util.tree_map(jnp.conj, xbar)

        return ParametricOperator(f, self.params, adj_fn)


jax.tree_util.register_pytree_node(
    ParametricOperator,
    lambda op: ((op.params,), (op.apply_fn, op.adjoint_fn)),
    lambda aux, children: ParametricOperator(aux[0], children[0], aux[1]),
)


def _matrix_operator(A: jax.Array) -> LinearOperator:
    if A.ndim != 2:
        raise ValueError(f"operator array must be 2-D, got shape {A.shape}")
    return MatrixOperator(A)


def as_operator(A: OperatorLike) -> LinearOperator:
    """Normalize any supported operator encoding into a :class:`LinearOperator`.

    Mirrors the reference's dispatch (``src/apply.jl:14-19``): matrix, callable, or
    ``(f, fadjoint)`` tuple.
    """
    if isinstance(A, LinearOperator):
        return A
    if isinstance(A, tuple):
        if len(A) != 2:
            raise ValueError("tuple operator must be (f, fadjoint)")
        f, fadj = A
        fop = as_operator(f)
        fadjop = as_operator(fadj)
        return LinearOperator(fop.normal, fadjop.normal)
    if callable(A) and not isinstance(A, jax.Array):
        return LinearOperator(A, None)
    arr = jnp.asarray(A)
    return _matrix_operator(arr)


def as_generalized_pair(AB) -> Tuple[LinearOperator, Optional[LinearOperator]]:
    """Normalize the ``(A, B)`` encoding of generalized eigenproblems
    (reference ``genapply``, ``src/apply.jl:22-23``).  ``B=None`` means identity."""
    if isinstance(AB, tuple) and len(AB) == 2:
        A, B = AB
        return as_operator(A), (as_operator(B) if B is not None else None)
    return as_operator(AB), None


def apply_shifted(op: LinearOperator, x: PyTree, a0, a1) -> PyTree:
    """Fused ``a0*x + a1*A(x)`` (reference ``src/apply.jl:5-11``)."""
    ax = op(x)
    return jax.tree_util.tree_map(lambda lx, la: a0 * lx + a1 * la, x, ax)


def check_adjoint_compatibility(op: LinearOperator, x0: PyTree, space=None) -> None:
    """Adjoint-consistency guard for user-supplied ``(f, fadjoint)`` pairs.

    Mirrors the reference's GKL-initialization check
    (``src/factorizations/gkl.jl:188-192``): with ``β₀ = ‖u₀‖``,
    ``α = ‖Aᴴu₀‖/β₀`` and ``α² = ⟨u₀, A(Aᴴu₀)⟩/β₀²`` must agree — otherwise
    the pair is not an operator and its adjoint and GKL/LSMR silently return
    wrong answers.  Host-side check: skipped for traced inputs (can't raise
    inside jit; the reference's check is also an eager value check).
    """
    leaves = jax.tree_util.tree_leaves(x0)
    if any(isinstance(l, jax.core.Tracer) for l in leaves):
        return
    from .vector import STANDARD, inner, norm

    space = space or STANDARD
    b0 = norm(x0, space)
    if float(b0) == 0.0:
        raise ValueError("initial vector should not have norm zero")
    v = op.apply_adjoint(x0)
    alpha = norm(v, space) / b0
    Av = op.normal(v)
    alpha2 = inner(x0, Av, space) / (b0 * b0)
    # fetch to HOST before any complex conversion: jnp.asarray(., complex128)
    # would materialize a complex array ON DEVICE, which is UNIMPLEMENTED on
    # complex-less TPU runtimes (axon) and poisons every later program in the
    # process — found by tools/tpu_smoke.py cascading 5 family failures
    import numpy as _np

    a2 = complex(_np.asarray(jax.device_get(alpha2)))
    aa = float(alpha) ** 2
    rdt = jnp.finfo(jnp.result_type(*(l.dtype for l in leaves))).eps
    if abs(a2 - aa) > (rdt ** 0.5) * max(abs(a2), aa, 1e-30):
        raise ValueError(
            f"operator and its adjoint are not compatible: <u0, A A^H u0>/|u0|^2 "
            f"= {a2} but |A^H u0|^2/|u0|^2 = {aa} "
            "(reference src/factorizations/gkl.jl:192)"
        )


def probe_dtype(op: LinearOperator, x0: PyTree):
    """Scalar type of the problem from one (abstract) operator application —
    the reference's ``apply_scalartype`` (``src/apply.jl:26-36``).  Uses
    ``jax.eval_shape`` so no FLOPs are spent on the probe."""
    out = jax.eval_shape(op.normal, x0)
    return vec.scalartype(out, x0)
