"""Eigenvectors from a complex Schur form — the reference's LAPACK ``trevc``
ccall (``src/dense/linalg.jl:197-304``), on device.

For an upper-triangular ``T`` with eigenvalue ``λ_i = T[i,i]``, the eigenvector is
``x = [y; 1; 0…]`` with ``(T[:i,:i] - λ_i I) y = -T[:i,i]``.  All ``k`` solves are
batched with ``vmap`` over guarded triangular systems (the LAPACK-style ``smin``
diagonal perturbation protects against (near-)degenerate eigenvalues).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["triangular_eigvecs"]


def triangular_eigvecs(T: jax.Array, k) -> jax.Array:
    """Right eigenvectors of the active block of upper-triangular ``T``.

    Returns ``X`` (m, m): column ``i < k`` is the unit-norm eigenvector of
    ``T[:k,:k]`` for ``λ_i = T[i,i]`` (supported on rows ``<= i``); columns
    ``>= k`` are canonical unit vectors.
    """
    with jax.default_matmul_precision("highest"):
        m = T.shape[0]
        cdt = T.dtype
        rdt = jnp.finfo(cdt).dtype
        eps = jnp.finfo(rdt).eps
        tnorm = jnp.maximum(jnp.max(jnp.abs(T)), 1.0)
        smin = eps * tnorm

        rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        eye = jnp.eye(m, dtype=cdt)

        def one_col(i):
            lam = jax.lax.dynamic_index_in_dim(jnp.diagonal(T), i, 0, keepdims=False)
            # leading block system, identity elsewhere so the full solve is exact
            inblk = (rows < i) & (cols < i)
            M = jnp.where(inblk, T, eye)
            d = jnp.where(ridx < i, jnp.diagonal(T) - lam, 1)
            # guard small pivots: |d| >= smin, keeping the phase
            dmag = jnp.abs(d)
            phase = jnp.where(dmag > 0, d / jnp.maximum(dmag, smin), 1)
            d = jnp.where(dmag < smin, smin * phase, d)
            M = jnp.where(rows == cols, 0, M) + jnp.diag(jnp.where(ridx < i, d, 1))
            rhs = jnp.where(ridx < i, -jax.lax.dynamic_index_in_dim(T, i, 1, keepdims=False), 0)
            y = jax.scipy.linalg.solve_triangular(M, rhs, lower=False)
            x = jnp.where(ridx < i, y, 0) + jnp.where(ridx == i, 1, 0).astype(cdt)
            return x / jnp.linalg.norm(x)

        X = jax.vmap(one_col)(jnp.arange(m)).T
        # inactive columns: canonical basis
        X = jnp.where(cols >= k, eye, X)
        return X
