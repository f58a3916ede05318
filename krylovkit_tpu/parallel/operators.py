"""Structured sharded operators — the benchmark/reference operators of
BASELINE.json, built TPU-first.

The reference applies sparse matrices through Julia's generic ``A*x``
(``src/apply.jl:1-2``).  On TPU a structured stencil beats an explicit CSR
gather: the 1D Laplacian and 2D Poisson operators below are shift-and-add
(``jnp.roll`` + masks), which XLA fuses into a couple of VPU passes; on a
sharded vector the shifts lower to ``ppermute`` halo exchanges over ICI — the
distributed-SpMV pattern of SURVEY.md §2 ("Parallelism inventory") without any
hand-written communication.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.operator import LinearOperator, StencilOperator

__all__ = ["laplacian_1d", "poisson_2d", "shard_local_stencil",
           "sharded_laplacian_1d"]


def laplacian_1d(n: int, dtype=jnp.float32, dirichlet: bool = True) -> LinearOperator:
    """Operator for the tridiagonal ``tridiag(-1, 2, -1)`` Laplacian
    (BASELINE.json config 1).  Hermitian positive definite for Dirichlet.

    Layout-polymorphic: a multi-dimensional vector is treated as the row-major
    flattening of the chain (neighbour couplings carry across the last-axis
    boundary).  On TPU, pass vectors shaped ``(n/128, 128)`` — tile-aligned
    basis rows make the whole Krylov loop ~2x faster (see ``ops/basis.py``
    layout note)."""

    def apply(x):
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        xm = jnp.roll(x, 1, axis=-1)
        xp = jnp.roll(x, -1, axis=-1)
        if x.ndim == 1:
            if dirichlet:
                xm = jnp.where(idx == 0, 0, xm)
                xp = jnp.where(idx == n - 1, 0, xp)
            return 2 * x - xm - xp
        # row-major chain across a (..., rows, C) layout: element (r, 0)'s left
        # neighbour is (r-1, C-1); element (r, C-1)'s right neighbour is (r+1, 0)
        C = x.shape[-1]
        R = x.shape[-2]
        prev_last = jnp.roll(x[..., :, C - 1], 1, axis=-1)[..., :, None]
        next_first = jnp.roll(x[..., :, 0], -1, axis=-1)[..., :, None]
        xm = jnp.where(idx == 0, prev_last, xm)
        xp = jnp.where(idx == C - 1, next_first, xp)
        if dirichlet:
            ridx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
            xm = jnp.where((ridx == 0) & (idx == 0), 0, xm)
            xp = jnp.where((ridx == R - 1) & (idx == C - 1), 0, xp)
        return 2 * x - xm - xp

    if dirichlet:
        # zero-BC constant stencil: advertise static (offsets, coeffs) so the
        # Lanczos fused-expansion kernel can apply it inside the basis stream
        # (ops/pallas_fused_lanczos.py); keep this module's hand-tuned roll
        # closure as the XLA apply
        return StencilOperator((-1, 0, 1), (-1.0, 2.0, -1.0), normal=apply,
                               adjoint=apply)
    return LinearOperator(apply, apply)  # symmetric (periodic)


def poisson_2d(nx: int, ny: int, dtype=jnp.float32) -> LinearOperator:
    """5-point stencil 2D Poisson operator on an ``(nx, ny)`` grid
    (BASELINE.json config 2).  SPD, zero (Dirichlet) boundaries.

    Returns a :class:`~..ops.operator.GridStencilOperator` — the grid is
    static metadata, so with ``(n/128, 128)``-shaped vectors the Krylov
    drivers run the fused one-stream expansion kernel (multi-row halos + grid
    masks, ``ops/pallas_fused_lanczos.py``).  Vectors shaped ``(nx, ny)``
    also work (any row-major layout with ``ny % cols == 0``)."""
    from ..ops.operator import GridStencilOperator

    return GridStencilOperator(
        (nx, ny),
        ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
        (4.0, -1.0, -1.0, -1.0, -1.0),
    )


def sharded_laplacian_1d(
    n: int, mesh, dtype=jnp.float32
) -> LinearOperator:
    """1D Laplacian whose application pins the output sharding to the vector
    axis, so the whole Krylov loop stays sharded (halos via ``ppermute``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import VECTOR_AXIS

    base = laplacian_1d(n, dtype)

    def apply(x):
        y = base.normal(x)
        spec = P(*([None] * (y.ndim - 1)), VECTOR_AXIS)
        return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, spec))

    return LinearOperator(apply, apply)


def shard_local_stencil(op, axis: str):
    """Shard-local wrapper of a fusable stencil operator for use INSIDE
    ``shard_map`` with the vector's row dimension split over mesh axis
    ``axis``: the XLA apply exchanges ``h`` edge rows with the neighbouring
    shards via ``ppermute`` (zeros arrive at the global ends — the Dirichlet
    boundary), applies the stencil on the haloed strip, and slices the
    interior.  The static stencil metadata is preserved, so the fused
    one-stream expansion (``ops/pallas_fused_lanczos.py``) stays eligible —
    its boundary caches take the SAME edge rows through the stepper's
    ``ppermute`` fix (``factorizations/krylov.py:_edge_fix``), which is all
    the communication the fused path needs per step.

    Chains (:class:`~..ops.operator.StencilOperator`) and grids
    (:class:`~..ops.operator.GridStencilOperator`, shard boundaries must cut
    whole grid rows) are supported."""
    from ..ops.operator import GridStencilOperator, StencilOperator
    from ..ops import pallas_fused_lanczos as pf

    spec = pf.spec_for(op)
    if spec is None:
        raise ValueError("shard_local_stencil requires a fusable stencil op")
    h = spec.h
    if spec.mrow:
        # grid ops: round the exchanged halo up to whole grid rows so the
        # haloed strip keeps grid-column phase (shards must cut whole grid
        # rows: R_local·128 % grid_cols == 0)
        h = -(-h // spec.mrow) * spec.mrow

    def _mk(inner_apply, grid_offset_rows):
        def apply(x):
            # x: (R_local, 128) shard rows
            n = jax.lax.axis_size(axis)
            left = jax.lax.ppermute(
                x[-h:], axis, [(i, i + 1) for i in range(n - 1)]
            )
            right = jax.lax.ppermute(
                x[:h], axis, [(i + 1, i) for i in range(n - 1)]
            )
            strip = jnp.concatenate([left, x, right], axis=0)
            return inner_apply(strip, grid_offset_rows)[h:-h]

        return apply

    if isinstance(op, GridStencilOperator):
        gr, gc = op.grid

        def inner(strip, _):
            # per-shard grid rows: the wrapper only supports shard cuts at
            # whole grid rows (gc % 128 == 0 guaranteed by spec_for); the
            # strip is treated as its own flattened sub-grid — valid because
            # dy reaches at most h rows and dx masking is row-local
            rows = strip.shape[0] * 128 // gc
            sub = GridStencilOperator((rows, gc), op.offsets2, op.coeffs)
            return sub.normal(strip)

        normal = _mk(inner, 0)
        adj = GridStencilOperator(
            op.grid,
            tuple((-dy, -dx) for dy, dx in reversed(op.offsets2)),
            tuple(reversed(op.coeffs)),
        )

        def inner_a(strip, _):
            rows = strip.shape[0] * 128 // gc
            sub = GridStencilOperator((rows, gc), adj.offsets2, adj.coeffs)
            return sub.normal(strip)

        return GridStencilOperator(
            op.grid, op.offsets2, op.coeffs, normal=normal,
            adjoint=_mk(inner_a, 0),
        )

    assert isinstance(op, StencilOperator)

    def inner(strip, _):
        return StencilOperator(op.offsets, op.coeffs).normal(strip)

    adj_off = tuple(-d for d in reversed(op.offsets))
    adj_cf = tuple(reversed(op.coeffs))

    def inner_a(strip, _):
        return StencilOperator(adj_off, adj_cf).normal(strip)

    return StencilOperator(
        op.offsets, op.coeffs, normal=_mk(inner, 0), adjoint=_mk(inner_a, 0)
    )
