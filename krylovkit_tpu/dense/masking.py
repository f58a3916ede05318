"""Static-shape masking utilities for the small dense projected problems.

The drivers run under ``jit`` with a fixed ``krylovdim``-sized buffer while the
*active* subspace size ``k`` is a traced integer (SURVEY.md §7 hard part (b)).
Every dense kernel therefore operates on the full ``(m, m)`` buffer with the
active ``k×k`` block embedded block-diagonally:

    M_eff = [[ M[:k,:k]      0        ]
             [    0      sentinel * I ]]

with ``sentinel`` placed *outside* the active spectrum (a Gershgorin-style bound)
so the inactive eigen/singular values neither collide nor mix with active ones.
Spurious solutions are then detected exactly by the support of their vectors.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..algorithms import EigSorter

__all__ = [
    "active_mask",
    "embed_active",
    "spectrum_sentinel",
    "active_support",
    "which_key",
    "which_key_ri",
    "sort_perm",
]


def active_mask(m: int, k) -> jax.Array:
    """Boolean (m, m) mask of the active leading ``k×k`` block."""
    i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return (i < k) & (j < k)


def spectrum_sentinel(M: jax.Array, k) -> jax.Array:
    """A real value strictly outside the spectrum/singular range of the active
    block (Gershgorin: every active eigenvalue has |λ| ≤ max abs row sum)."""
    m = M.shape[0]
    Ma = jnp.where(active_mask(m, k), M, 0)
    bound = jnp.max(jnp.sum(jnp.abs(Ma), axis=1))
    return (2 * bound + 1).real.astype(jnp.finfo(M.dtype).dtype)


def embed_active(M: jax.Array, k, sentinel: Union[jax.Array, float]) -> jax.Array:
    """Zero the inactive rows/cols of ``M`` and put ``sentinel`` on the inactive
    diagonal."""
    m = M.shape[0]
    out = jnp.where(active_mask(m, k), M, 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    sent_diag = jnp.where(d >= k, jnp.asarray(sentinel, M.dtype), 0)
    return out + jnp.diag(sent_diag)


def active_support(U: jax.Array, k) -> jax.Array:
    """Fraction of each column's mass inside the active rows.  For an exactly
    block-diagonal problem this is 0 or 1; use ``> 0.5`` to flag genuine
    solutions."""
    m = U.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, U.shape, 0)
    num = jnp.sum(jnp.where(rows < k, jnp.abs(U) ** 2, 0), axis=0)
    den = jnp.maximum(jnp.sum(jnp.abs(U) ** 2, axis=0), jnp.finfo(num.dtype).tiny)
    return num / den


def which_key(vals: jax.Array, which) -> jax.Array:
    """Map eigenvalues to ascending sort keys for a ``which`` spec.

    Mirrors the reference's ``eigsort`` (``src/eigsolve/eigsolve.jl:334-355``) and
    ``EigSorter`` (``:187-193``).  Keys are real; smallest key = most wanted.
    """
    if isinstance(which, EigSorter):
        key = jnp.real(which.by(vals))
        return -key if which.rev else key
    table = {
        "LM": lambda v: -jnp.abs(v),
        "SM": lambda v: jnp.abs(v),
        "LR": lambda v: -jnp.real(v),
        "SR": lambda v: jnp.real(v),
        "LI": lambda v: -jnp.imag(v),
        "SI": lambda v: jnp.imag(v),
    }
    w = which.upper() if isinstance(which, str) else which
    if w not in table:
        raise ValueError(f"unknown which={which!r}; expected one of {list(table)} or EigSorter")
    return table[w](vals)


def which_key_ri(re: jax.Array, im: jax.Array, which) -> jax.Array:
    """`which_key` on eigenvalues given as (re, im) real pairs — no complex
    arrays materialized (usable on complex-less TPU runtimes).  ``EigSorter``
    callbacks receive a complex value and are therefore only supported on
    backends with complex dtypes."""
    if isinstance(which, EigSorter):
        key = jnp.real(which.by(re + 1j * im))
        return -key if which.rev else key
    table = {
        "LM": lambda r, i: -jnp.hypot(r, i),
        "SM": lambda r, i: jnp.hypot(r, i),
        "LR": lambda r, i: -r,
        "SR": lambda r, i: r,
        "LI": lambda r, i: -i,
        "SI": lambda r, i: i,
    }
    w = which.upper() if isinstance(which, str) else which
    if w not in table:
        raise ValueError(
            f"unknown which={which!r}; expected one of {list(table)} or EigSorter"
        )
    return table[w](re, im)


def sort_perm(vals: jax.Array, valid: jax.Array, which) -> jax.Array:
    """Permutation sorting ``vals`` by ``which`` with invalid entries pushed last."""
    key = which_key(vals, which)
    big = jnp.asarray(jnp.finfo(key.dtype).max, key.dtype)
    key = jnp.where(valid, key, big)
    return jnp.argsort(key)
