"""Masked Hermitian eigendecomposition of the projected Rayleigh quotient.

TPU-native replacement of the reference's LAPACK ``stegr`` wrapper
(``tridiageigh!``, ``src/dense/linalg.jl:396-458``) and ``sygvd`` (``geneigh!``,
``:118-120``): the projected matrix is at most ``krylovdim`` sized, so a dense
``jnp.linalg.eigh`` on device (inside the jitted solver loop) beats a host
round-trip by orders of magnitude in latency.  The thick-restart (arrowhead)
projected matrix is not tridiagonal anyway, so dense is also the *general* choice.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import embed_active, spectrum_sentinel, active_support

__all__ = ["eigh_active", "geneigh_active"]


def eigh_active(T: jax.Array, k) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Eigendecomposition of the active ``k×k`` block of Hermitian ``T``.

    Returns ``(w, U, valid)`` of static size ``m``: eigenvalues, eigenvectors
    (columns; supported on active rows only), and a boolean mask of the ``k``
    genuine pairs.  Invalid entries carry a sentinel eigenvalue outside the
    active spectrum.
    """
    T = (T + T.conj().T) / 2
    sent = spectrum_sentinel(T, k)
    Teff = embed_active(T, k, sent)
    w, U = jnp.linalg.eigh(Teff)
    valid = active_support(U, k) > 0.5
    # zero out any numerical leakage into inactive rows of genuine eigenvectors
    m = T.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    U = jnp.where(rows < k, U, 0)
    return w, U, valid


def geneigh_active(
    A: jax.Array, B: jax.Array, k
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Generalized Hermitian eigenproblem ``A x = λ B x`` on the active block,
    with ``B`` positive definite — the reference's ``geneigh!`` (LAPACK ``sygvd``,
    ``src/dense/linalg.jl:118-120``), used by GolubYe.

    Solved as ``L⁻¹ A L⁻ᴴ`` with ``B = L Lᴴ`` (Cholesky on device).  The inactive
    block of ``B`` is set to the identity so the factorization is well posed.
    Eigenvectors are returned B-orthonormal (``XᴴBX = I``).
    """
    m = A.shape[0]
    A = (A + A.conj().T) / 2
    B = (B + B.conj().T) / 2
    d = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    ident_tail = jnp.diag(jnp.where(d >= k, jnp.ones((m,), A.dtype).real, 0)).astype(
        A.dtype
    )
    Beff = embed_active(B, k, 0) + ident_tail
    L = jnp.linalg.cholesky(Beff)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(m, dtype=A.dtype), lower=True)
    C = Linv @ embed_active(A, k, 0) @ Linv.conj().T
    w, Y, valid = eigh_active(C, k)
    X = Linv.conj().T @ Y
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    X = jnp.where(rows < k, X, 0)
    return w, X, valid
