"""On-device complex Schur decomposition of the (masked) projected matrix.

This replaces the reference's LAPACK ``hseqr`` ccall (``hschur!``,
``src/dense/linalg.jl:464-500, 594-629``) — the one genuinely "native" work item
of the port (SURVEY.md §7 hard part (a)): XLA has no Schur primitive and
``jax.lax.linalg.schur`` lowers to host LAPACK (CPU only), which would serialize
the jitted solver loop on TPU.

Algorithm: Householder reduction to Hessenberg form (``hessenberg.py``), then
explicit Wilkinson-shifted QR iteration with bottom-up deflation, formulated so
each step is one ``m×m`` QR + two GEMMs (MXU-friendly) instead of a scalar bulge
chase (explicit QR preserves Hessenberg structure, so single-entry deflation and
LAPACK-style exceptional shifts apply):

    while hi > 0:  # hi = index of trailing un-deflated eigenvalue
        if A[hi, hi-1] is negligible: deflate, hi -= 1
        else:
            mu  = Wilkinson shift from trailing 2x2 (exceptional shift on stall)
            M   = [[A[:hi+1,:hi+1] - mu I, 0], [0, I]]     (static-shape mask)
            Q_i R = qr(M)          # block-diagonal by construction
            A  <- Q_iH A Q_i ;  Q <- Q Q_i

Everything is static-shape: the active block of size ``k`` (traced) is embedded
with an out-of-spectrum sentinel diagonal (see ``masking.py``); the QR acts on the
leading ``hi+1`` sub-block through identity-masking, which keeps the factorization
block-diagonal, so the similarity transform is exact for the full buffer.

Works on *general* active blocks, not just Hessenberg — needed because the
Krylov-Schur restart leaves H as "triangular + spike + Hessenberg extension"
(cheaper on TPU than the reference's basis-side Householder restoration,
``src/eigsolve/arnoldi.jl:468-481``, which touches the big basis vectors).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import embed_active, spectrum_sentinel
from .hessenberg import hessenberg_reduce

__all__ = ["schur_active", "schur_eigvals"]


def _complex_dtype(dtype):
    return jnp.result_type(dtype, jnp.complex64)


def schur_active(
    H: jax.Array, k, tol: float | None = None, max_sweeps: int | None = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Complex Schur form of the active ``k×k`` block of ``H``.

    Returns ``(T, Q, ok)`` with ``Q[:k,:k]ᴴ H[:k,:k] Q[:k,:k] = T[:k,:k]`` upper
    triangular, ``Q`` unitary (identity-phase on the inactive part), and ``ok`` a
    scalar bool flagging full deflation within the sweep budget.
    """
    with jax.default_matmul_precision("highest"):
        m = H.shape[0]
        cdt = _complex_dtype(H.dtype)
        rdt = jnp.finfo(cdt).dtype
        if tol is None:
            tol = float(jnp.finfo(rdt).eps)
        if max_sweeps is None:
            max_sweeps = 30 * m

        sent = spectrum_sentinel(H.astype(cdt), k)
        A_embedded = embed_active(H.astype(cdt), k, sent)
        scale = jnp.maximum(jnp.max(jnp.abs(A_embedded)), 1.0)
        A0, Qh = hessenberg_reduce(A_embedded)

        eye = jnp.eye(m, dtype=cdt)
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)

        def sub(A, i):
            """|A[i, i-1]| (0 when i <= 0)."""
            row = jax.lax.dynamic_index_in_dim(A, jnp.maximum(i, 1), 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(row, jnp.maximum(i - 1, 0), 0, keepdims=False)
            return jnp.where(i > 0, jnp.abs(v), 0.0)

        def at(A, i, j):
            row = jax.lax.dynamic_index_in_dim(A, i, 0, keepdims=False)
            return jax.lax.dynamic_index_in_dim(row, j, 0, keepdims=False)

        def wilkinson_shift(A, hi, stag):
            a = at(A, hi - 1, hi - 1)
            b = at(A, hi - 1, hi)
            c = at(A, hi, hi - 1)
            d = at(A, hi, hi)
            tr2 = (a + d) / 2
            disc = jnp.sqrt(((a - d) / 2) ** 2 + b * c)
            mu1 = tr2 + disc
            mu2 = tr2 - disc
            mu = jnp.where(jnp.abs(mu1 - d) < jnp.abs(mu2 - d), mu1, mu2)
            # exceptional shift on stall (LAPACK zlahqr: dat1 * (|h(i,i-1)| + |h(i-1,i-2)|))
            exc = (0.75 * (sub(A, hi) + sub(A, hi - 1))).astype(cdt) + d
            return jnp.where((stag > 0) & (stag % 10 == 0), exc, mu)

        def cond(state):
            A, Q, hi, it, stag = state
            return jnp.logical_and(hi > 0, it < max_sweeps)

        def body(state):
            A, Q, hi, it, stag = state
            off = sub(A, hi)
            dmag = jnp.abs(at(A, hi, hi)) + jnp.abs(at(A, hi - 1, hi - 1))
            small = off <= tol * jnp.maximum(dmag, scale * tol)

            def deflate(args):
                A, Q, hi, stag = args
                A = jnp.where((rows == hi) & (cols == hi - 1), 0, A)
                return A, Q, hi - 1, jnp.int32(0)

            def sweep(args):
                A, Q, hi, stag = args
                mu = wilkinson_shift(A, hi, stag)
                inblk = (rows <= hi) & (cols <= hi)
                diag_blk = (rows == cols) & (rows <= hi)
                M = jnp.where(inblk, A, eye) - jnp.where(diag_blk, mu, 0)
                Qi, _ = jnp.linalg.qr(M)
                A = Qi.conj().T @ A @ Qi
                # QR of a shifted Hessenberg preserves Hessenberg form; clean the
                # eps-level fill-in so deflation tests stay single-entry
                A = jnp.where(rows > cols + 1, 0, A)
                Q = Q @ Qi
                return A, Q, hi, stag + 1

            A, Q, hi, stag = jax.lax.cond(small, deflate, sweep, (A, Q, hi, stag))
            return A, Q, hi, it + 1, stag

        hi0 = jnp.maximum(jnp.asarray(k, jnp.int32) - 1, 0)
        A, Q, hi, it, _ = jax.lax.while_loop(
            cond, body, (A0, Qh, hi0, jnp.int32(0), jnp.int32(0))
        )
        ok = hi == 0
        T = jnp.triu(A)
        return T, Q, ok


def schur_eigvals(T: jax.Array) -> jax.Array:
    """Eigenvalues from the (complex) Schur factor — the reference's
    ``schur2eigvals`` (``src/dense/linalg.jl:156-189``); trivial here since we
    always work in the complex Schur form (no real 2×2 blocks)."""
    return jnp.diagonal(T)
