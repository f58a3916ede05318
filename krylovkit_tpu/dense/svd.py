"""Masked dense SVD of the projected bidiagonal — the reference's LAPACK
``bdsqr`` wrapper (``bidiagsvd!``, ``src/dense/linalg.jl:123-130``), on device.

The thick-restart GKL projected matrix is bidiagonal-plus-spike anyway, so a
dense ``jnp.linalg.svd`` of the (≤ krylovdim) buffer is the general choice; the
inactive block carries an out-of-range sentinel so genuine triplets are detected
by support (see ``masking.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import embed_active, spectrum_sentinel, active_support

__all__ = ["svd_active"]


def svd_active(B: jax.Array, k) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """SVD of the active ``k×k`` block of ``B``.

    Returns ``(s, U, Vh, valid)`` of static size ``m`` with
    ``B[:k,:k] = (U diag(s) Vh)[:k,:k]``; singular values descending; spurious
    (inactive) triplets flagged False in ``valid`` and pushed to sentinel values.
    """
    sent = spectrum_sentinel(B, k)
    Beff = embed_active(B, k, sent)
    U, s, Vh = jnp.linalg.svd(Beff, full_matrices=False)
    valid = active_support(U, k) > 0.5
    m = B.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    U = jnp.where(rows < k, U, 0)
    Vh = jnp.where(cols < k, Vh, 0)
    return s, U, Vh, valid
