"""Householder reduction of the (masked) projected matrix to Hessenberg form.

Needed because the Krylov-Schur restart leaves the projected matrix as
"triangular + spike row + Hessenberg extension" rather than pure Hessenberg
(SURVEY.md §7: the reference instead restores Arnoldi form with Householder
sweeps over the *basis vectors*, ``src/eigsolve/arnoldi.jl:468-481`` — O(n·k²) on
the big vectors; reducing the k×k projected matrix on device is O(k³) tiny).

All rank-1 updates act on the full static buffer; reflectors are masked to the
rows below the current column, so the inactive (sentinel-diagonal) block is
untouched automatically.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["hessenberg_reduce"]


def hessenberg_reduce(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unitary ``Q`` and Hessenberg ``H`` with ``Qᴴ A Q = H`` (complex dtype).

    Returns ``(H, Q)``.  Operates on the whole buffer; callers embed the active
    block first (inactive = diagonal, which reduction leaves untouched).
    """
    with jax.default_matmul_precision("highest"):
        m = A.shape[0]
        cdt = A.dtype
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)

        def body(j, carry):
            A, Q = carry
            col = jax.lax.dynamic_index_in_dim(A, j, axis=1, keepdims=False)
            x = jnp.where(ridx > j, col, 0)
            nx = jnp.linalg.norm(x)
            pivot = jax.lax.dynamic_index_in_dim(x, j + 1, 0, keepdims=False)
            apiv = jnp.abs(pivot)
            phase = jnp.where(apiv > 0, pivot / jnp.where(apiv > 0, apiv, 1), 1)
            alpha = -phase * nx
            v = x - alpha * (ridx == j + 1).astype(cdt)
            nv = jnp.linalg.norm(v)
            ok = nv > 0
            v = jnp.where(ok, v / jnp.where(ok, nv, 1), 0)
            # A <- P A P, Q <- Q P with P = I - 2 v vH (rank-1 GEMV updates)
            A = A - 2 * jnp.outer(v, v.conj() @ A)
            A = A - 2 * jnp.outer(A @ v, v.conj())
            Q = Q - 2 * jnp.outer(Q @ v, v.conj())
            return A, Q

        Q0 = jnp.eye(m, dtype=cdt)
        H, Q = jax.lax.fori_loop(0, max(m - 2, 0), body, (A, Q0))
        # clean numerical fill-in below the sub-diagonal
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        H = jnp.where(rows > cols + 1, 0, H)
        return H, Q
