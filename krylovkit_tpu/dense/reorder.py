"""Schur reordering on device — the reference's ``permuteschur!``/``trexc``/
``trsen`` LAPACK surface (``src/dense/linalg.jl:335-393, 538-585``).

Sorting the Schur form by the ``which`` criterion is required for the
Krylov-Schur thick restart (the kept leading columns must span the invariant
subspace of the *wanted* eigenvalues).  Implemented as a jittable bubble sort of
the diagonal: an adjacent swap of ``(d1, d2)`` applies the 2×2 unitary whose first
column is the (normalized) eigenvector ``[t12, d2 - d1]`` of the trailing
eigenvalue — a Givens similarity confined to rows/cols ``(j, j+1)``.  The full
sort is ``m`` masked passes in a rolled ``fori_loop`` nest: ~O(m³) flops on a
``krylovdim``-sized buffer, negligible on device and fully static-shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sort_schur", "partition_schur"]


def _swap_rotation(d1, t12, d2, cdt):
    """2×2 unitary G with first column ∝ [t12, d2-d1] (eigvec of d2);
    Gᴴ [[d1,t12],[0,d2]] G = [[d2,*],[0,d1]].  Identity if the vector vanishes."""
    v1, v2 = t12, d2 - d1
    n = jnp.sqrt(jnp.abs(v1) ** 2 + jnp.abs(v2) ** 2)
    safe = n > 0
    nn = jnp.where(safe, n, 1)
    a = jnp.where(safe, v1 / nn, 1).astype(cdt)
    b = jnp.where(safe, v2 / nn, 0).astype(cdt)
    # columns: [a, b] and its orthogonal complement [-conj(b), conj(a)]
    return jnp.array([[a, -jnp.conj(b)], [b, jnp.conj(a)]])


def sort_schur(
    T: jax.Array, Q: jax.Array, key: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reorder a complex Schur form so diagonal keys ascend.

    ``key`` is a real (m,) array (smaller = moves toward the top-left; push
    entries that must stay put — e.g. the inactive sentinel block — to +inf...
    but note inactive entries already carry out-of-spectrum keys if the caller
    used ``masking.sort_perm``-style keys).  Returns ``(T, Q, key_sorted)``.
    """
    with jax.default_matmul_precision("highest"):
        m = T.shape[0]
        cdt = T.dtype

        def swap_at(carry, j):
            T, Q, key, swapped = carry
            kj = jax.lax.dynamic_index_in_dim(key, j, 0, keepdims=False)
            kj1 = jax.lax.dynamic_index_in_dim(key, j + 1, 0, keepdims=False)
            do = kj > kj1

            d1 = jax.lax.dynamic_index_in_dim(jnp.diagonal(T), j, 0, keepdims=False)
            d2 = jax.lax.dynamic_index_in_dim(jnp.diagonal(T), j + 1, 0, keepdims=False)
            t12 = jax.lax.dynamic_slice(T, (j, j + 1), (1, 1))[0, 0]
            G = _swap_rotation(d1, t12, d2, cdt)
            G = jnp.where(do, G, jnp.eye(2, dtype=cdt))

            # rows j, j+1 of T:  T[j:j+2, :] = Gᴴ @ T[j:j+2, :]
            rowsT = jax.lax.dynamic_slice(T, (j, 0), (2, m))
            T = jax.lax.dynamic_update_slice(T, G.conj().T @ rowsT, (j, 0))
            # cols j, j+1 of T and Q
            colsT = jax.lax.dynamic_slice(T, (0, j), (m, 2))
            T = jax.lax.dynamic_update_slice(T, colsT @ G, (0, j))
            colsQ = jax.lax.dynamic_slice(Q, (0, j), (m, 2))
            Q = jax.lax.dynamic_update_slice(Q, colsQ @ G, (0, j))
            # exact zero below the swapped diagonal
            T = jax.lax.dynamic_update_slice(
                T, jnp.zeros((1, 1), cdt), (j + 1, j)
            )
            key = jnp.where(do, key.at[j].set(kj1).at[j + 1].set(kj), key)
            return (T, Q, key, swapped | do), None

        def one_pass(carry):
            T, Q, key, npass, _ = carry
            (T, Q, key, swapped), _ = jax.lax.scan(
                swap_at, (T, Q, key, jnp.asarray(False)), jnp.arange(m - 1)
            )
            return T, Q, key, npass + 1, swapped

        # early exit on the first swap-free pass (restarted Krylov-Schur
        # matrices arrive nearly sorted); bounded by m passes
        T, Q, key, _, _ = jax.lax.while_loop(
            lambda c: c[4] & (c[3] < m + 1),
            one_pass,
            (T, Q, key, jnp.int32(0), jnp.asarray(True)),
        )
        return T, Q, key


def partition_schur(T: jax.Array, Q: jax.Array, select: jax.Array):
    """Move the selected eigenvalues to the leading block — the reference's
    ``trsen!``/``partitionschur!`` (``src/dense/linalg.jl:388-393, 538-585``).

    ``select`` is a boolean (m,) mask; returns ``(T, Q, nselected)``.  A stable
    reordering: selected eigenvalues keep their relative order, as do the rest.
    """
    with jax.default_matmul_precision("highest"):
        m = T.shape[0]
        rdt = jnp.finfo(T.dtype).dtype
        pos = jax.lax.broadcasted_iota(jnp.int32, (m,), 0).astype(rdt)
        key = jnp.where(select, pos, pos + m)  # stable two-group key
        T, Q, _ = sort_schur(T, Q, key)
        return T, Q, jnp.sum(select.astype(jnp.int32))
