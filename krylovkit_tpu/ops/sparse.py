"""Sparse linear operators, TPU-first.

The reference applies sparse matrices through Julia's generic ``A*x``
(``src/apply.jl:1-2``, SparseArrays).  On TPU an unstructured CSR gather is
hostile to the vector units; the right layout is **ELLPACK**: pad every row to
the same nnz count and store ``(n, max_nnz)`` column-index and value planes.
The matvec is then one ``take`` (vectorized gather) + one multiply-reduce —
dense, static-shape, fuseable by XLA; padding slots point at row 0 with value 0.

For matrices whose rows vary wildly in length, slice the matrix into a few
ELL blocks by row-length bucket (``from_dense``/``from_coo`` do a single
block, which is right for stencil-like and bounded-degree graphs — the
reference benchmark operators).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .operator import LinearOperator

__all__ = ["ELLOperator", "from_coo", "from_dense"]


class ELLOperator(LinearOperator):
    """ELLPACK sparse operator: ``cols``/``vals`` of shape ``(n_rows, max_nnz)``.

    Registered as a pytree (data leaves traced), so jit caches compile once per
    sparsity *shape*.  The adjoint is materialized as a second ELL block at
    construction (transposition on device would re-gather every apply).
    """

    def __init__(self, cols, vals, n_cols: int, adj=None):
        object.__setattr__(self, "cols", jnp.asarray(cols))
        object.__setattr__(self, "vals", jnp.asarray(vals))
        object.__setattr__(self, "n_cols", int(n_cols))
        object.__setattr__(self, "adj", adj)
        object.__setattr__(self, "normal", self._matvec)
        object.__setattr__(
            self, "adjoint", adj._matvec if adj is not None else None
        )

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.cols.shape[0], self.n_cols)

    def _matvec(self, x):
        g = jnp.take(x, self.cols, axis=0)  # (n_rows, max_nnz)
        return jnp.sum(self.vals * g, axis=1)


jax.tree_util.register_pytree_node(
    ELLOperator,
    lambda op: (
        (op.cols, op.vals)
        + ((op.adj.cols, op.adj.vals) if op.adj is not None else ()),
        (op.n_cols, op.adj is not None, op.cols.shape[0] if op.adj is not None else None),
    ),
    lambda aux, ch: (
        ELLOperator(
            ch[0], ch[1], aux[0],
            adj=ELLOperator(ch[2], ch[3], aux[2]) if aux[1] else None,
        )
    ),
)


def _coo_to_ell(rows, cols, vals, n_rows, n_cols):
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_rows)
    width = int(counts.max()) if len(counts) else 0
    ell_cols = np.zeros((n_rows, max(width, 1)), np.int32)
    ell_vals = np.zeros((n_rows, max(width, 1)), vals.dtype)
    pos = np.zeros(n_rows, np.int64)
    for r, c, v in zip(rows, cols, vals):
        ell_cols[r, pos[r]] = c
        ell_vals[r, pos[r]] = v
        pos[r] += 1
    return ell_cols, ell_vals


def from_coo(rows, cols, vals, shape: Tuple[int, int], with_adjoint: bool = True) -> ELLOperator:
    """Build an ELL operator from COO triplets (host-side packing)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    n_rows, n_cols = shape
    ec, ev = _coo_to_ell(rows, cols, vals, n_rows, n_cols)
    adj = None
    if with_adjoint:
        ac, av = _coo_to_ell(cols, rows, np.conj(vals), n_cols, n_rows)
        adj = ELLOperator(ac, av, n_rows)
    return ELLOperator(ec, ev, n_cols, adj=adj)


def from_dense(A, tol: float = 0.0, with_adjoint: bool = True) -> ELLOperator:
    """Sparsify a dense matrix (entries with ``|a| > tol``) into ELL."""
    A = np.asarray(A)
    rows, cols = np.nonzero(np.abs(A) > tol)
    return from_coo(rows, cols, A[rows, cols], A.shape, with_adjoint)
