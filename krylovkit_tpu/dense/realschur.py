"""Real Schur decomposition (quasi-triangular, 2x2 blocks) on device.

TPU-native replacement for the reference's *real* LAPACK surface: ``dhseqr``
(``hschur!`` on real matrices, ``src/dense/linalg.jl:464-500``), the 2x2-block
eigenvalue extraction (``schur2eigvals``, ``:156-189``), and block
standardization (``dlanv2`` inside LAPACK).  Everything is static-shape and
jittable: the active ``k×k`` block is embedded with an out-of-spectrum sentinel
(``masking.py``), and the iteration is a ``lax.while_loop`` whose sweeps are
whole-buffer GEMMs/QRs (MXU-friendly) instead of scalar bulge chases.

Why a separate real path: (a) real problems keep the *basis* (the big vectors)
in real arithmetic — 2x less HBM traffic than promoting to complex, exactly as
the reference does; (b) some TPU runtimes (the axon tunnel used here) have no
complex support at all, so the real path is the only on-device non-Hermitian
path there.

Algorithm: Householder Hessenberg reduction, then Francis *double-shift* QR in
explicit form: the shift pair (s, p) = (trace, det) of the trailing 2x2 is
real, so M = A² − sA + pI is real, and the orthogonal Q of one implicit sweep
is the Q of ``qr(M)`` (implicit-Q theorem).  Deflation handles both single
eigenvalues (zero last subdiagonal) and 2x2 blocks (zero second-to-last
subdiagonal), standardizing each deflated 2x2 with a ``dlanv2``-style rotation:
blocks with real eigenvalues are split into two 1x1s, complex pairs are rotated
to the standard form ``[[a, b], [c, a]]`` with ``b·c < 0``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import embed_active, spectrum_sentinel
from .hessenberg import hessenberg_reduce

__all__ = [
    "lanv2_rotation",
    "real_schur_active",
    "real_schur_eigvals",
    "block_starts",
]


def lanv2_rotation(a, b, c, d):
    """Rotation (cs, sn) standardizing the real 2x2 ``[[a, b], [c, d]]``.

    ``G = [[cs, -sn], [sn, cs]]``; ``Gᵀ M G`` is upper triangular when the
    block has real eigenvalues (the (0,0) entry gets the eigenvalue whose
    eigenvector defines the rotation), and has equal diagonal entries (standard
    form, complex pair) otherwise.  Scalar, branchless (``where``).
    """
    rdt = jnp.result_type(a, b, c, d)
    half = (a - d) / 2
    disc = half * half + b * c  # discriminant/4 of the characteristic poly
    real_eigs = disc >= 0

    # --- real case: rotate the eigenvector [b, λ - a] (or fallback) to e1 ---
    sq = jnp.sqrt(jnp.abs(disc))
    lam = (a + d) / 2 + jnp.where(half >= 0, sq, -sq)  # larger-|.| root bias
    v1a, v2a = b, lam - a
    v1b, v2b = lam - d, c
    use_a = jnp.abs(v1a) + jnp.abs(v2a) >= jnp.abs(v1b) + jnp.abs(v2b)
    v1 = jnp.where(use_a, v1a, v1b)
    v2 = jnp.where(use_a, v2a, v2b)
    nv = jnp.sqrt(v1 * v1 + v2 * v2)
    ok = nv > 0
    cs_r = jnp.where(ok, v1 / jnp.where(ok, nv, 1), 1)
    sn_r = jnp.where(ok, v2 / jnp.where(ok, nv, 1), 0)

    # --- complex case: equalize the diagonal ---
    # (Gᵀ M G)₀₀ − (Gᵀ M G)₁₁ = (a−d)·cos2θ + (b+c)·sin2θ, zero at
    # tan(2θ) = −(a−d)/(b+c)
    denom = b + c
    theta = 0.5 * jnp.arctan2(d - a, jnp.where(denom == 0, jnp.finfo(rdt).tiny, denom))
    cs_c = jnp.cos(theta)
    sn_c = jnp.sin(theta)

    cs = jnp.where(real_eigs, cs_r, cs_c)
    sn = jnp.where(real_eigs, sn_r, sn_c)
    return cs, sn


def _apply_pair_rotation(A, Q, i, cs, sn):
    """Similarity by the identity-embedded rotation acting on rows/cols
    ``(i, i+1)``: ``A ← Gᵀ A G``, ``Q ← Q G`` with ``G[i:i+2, i:i+2] =
    [[cs, -sn], [sn, cs]]`` (i traced)."""
    with jax.default_matmul_precision("highest"):
        m = A.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        e1 = (ridx == i).astype(A.dtype)
        e2 = (ridx == i + 1).astype(A.dtype)
        # G = I + (cs-1)(e1 e1ᵀ + e2 e2ᵀ) + sn (e2 e1ᵀ - e1 e2ᵀ)
        G = (
            jnp.eye(m, dtype=A.dtype)
            + (cs - 1) * (jnp.outer(e1, e1) + jnp.outer(e2, e2))
            + sn * (jnp.outer(e2, e1) - jnp.outer(e1, e2))
        )
        return G.T @ A @ G, Q @ G


def _standardize_block(A, Q, i):
    """Standardize the 2x2 block at (i, i+1) with a lanv2 rotation; zero the
    subdiagonal entry if the block's eigenvalues are real."""
    def at(M, r, c):
        row = jax.lax.dynamic_index_in_dim(M, r, 0, keepdims=False)
        return jax.lax.dynamic_index_in_dim(row, c, 0, keepdims=False)

    a, b = at(A, i, i), at(A, i, i + 1)
    c, d = at(A, i + 1, i), at(A, i + 1, i + 1)
    cs, sn = lanv2_rotation(a, b, c, d)
    A, Q = _apply_pair_rotation(A, Q, i, cs, sn)
    # if real eigenvalues, the rotation triangularizes: clean the subdiagonal
    half = (a - d) / 2
    disc = half * half + b * c
    m = A.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    hit = (rows == i + 1) & (cols == i)
    A = jnp.where(hit & (disc >= 0), 0.0, A)
    return A, Q


def real_schur_active(
    H: jax.Array, k, tol: float | None = None, max_sweeps: int | None = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Real Schur form of the active ``k×k`` block of real ``H``.

    Returns ``(T, Q, ok)``: ``Q[:k,:k]ᵀ H[:k,:k] Q[:k,:k] = T[:k,:k]``
    quasi-upper-triangular with standardized 2x2 blocks (complex pairs only),
    ``Q`` orthogonal (identity on the inactive part up to signs), ``ok`` a
    scalar bool flagging full deflation within the sweep budget.
    """
    with jax.default_matmul_precision("highest"):
        m = H.shape[0]
        rdt = H.dtype
        if tol is None:
            tol = float(jnp.finfo(rdt).eps)
        if max_sweeps is None:
            max_sweeps = 40 * m

        sent = spectrum_sentinel(H, k)
        A_emb = embed_active(H, k, sent)
        scale = jnp.maximum(jnp.max(jnp.abs(A_emb)), 1.0)
        A0, Q0 = hessenberg_reduce(A_emb)

        eye = jnp.eye(m, dtype=rdt)
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)

        def at(A, i, j):
            row = jax.lax.dynamic_index_in_dim(A, i, 0, keepdims=False)
            return jax.lax.dynamic_index_in_dim(row, j, 0, keepdims=False)

        def sub(A, i):
            v = at(A, jnp.maximum(i, 1), jnp.maximum(i - 1, 0))
            return jnp.where(i > 0, jnp.abs(v), 0.0)

        def negligible(A, i):
            """|A[i, i-1]| small vs its diagonal neighbourhood (i > 0)."""
            dmag = jnp.abs(at(A, i, i)) + jnp.abs(at(A, jnp.maximum(i - 1, 0), jnp.maximum(i - 1, 0)))
            return sub(A, i) <= tol * jnp.maximum(dmag, scale * tol)

        def cond(state):
            A, Q, hi, it, stag = state
            return jnp.logical_and(hi > 0, it < max_sweeps)

        def body(state):
            A, Q, hi, it, stag = state
            small1 = negligible(A, hi)
            # a 2x2 block (hi-1, hi) deflates when the subdiagonal ABOVE it dies;
            # at hi == 1 the block reaches the top, so it deflates unconditionally
            small2 = jnp.logical_or(hi <= 1, negligible(A, hi - 1))

            def deflate1(args):
                A, Q, hi, stag = args
                A = jnp.where((rows == hi) & (cols == hi - 1), 0.0, A)
                return A, Q, hi - 1, jnp.int32(0)

            def deflate2(args):
                A, Q, hi, stag = args
                hit = (rows == hi - 1) & (cols == hi - 2)
                A = jnp.where(jnp.logical_and(hi >= 2, hit), 0.0, A)
                A, Q = _standardize_block(A, Q, hi - 1)
                return A, Q, hi - 2, jnp.int32(0)

            def sweep(args):
                A, Q, hi, stag = args
                a = at(A, hi - 1, hi - 1)
                b = at(A, hi - 1, hi)
                c = at(A, hi, hi - 1)
                d = at(A, hi, hi)
                s = a + d
                p = a * d - b * c
                # exceptional shifts on stall (LAPACK dhseqr style)
                x = jnp.abs(at(A, hi, hi - 1)) + jnp.abs(
                    at(A, jnp.maximum(hi - 1, 1), jnp.maximum(hi - 2, 0))
                )
                exc = (stag > 0) & (stag % 8 == 0)
                xs = 0.75 * x + d
                s = jnp.where(exc, 2 * xs, s)
                p = jnp.where(exc, xs * xs, p)
                inblk = (rows <= hi) & (cols <= hi)
                Ablk = jnp.where(inblk, A, eye)
                M = Ablk @ Ablk - s * Ablk + p * eye
                # block-diagonal by construction: identity on the inactive part so
                # QR cannot mix active and inactive subspaces
                M = jnp.where(inblk, M, eye)
                Qi, _ = jnp.linalg.qr(M)
                A = Qi.T @ A @ Qi
                A = jnp.where(rows > cols + 1, 0.0, A)  # implicit-Q: clean fill-in
                Q = Q @ Qi
                return A, Q, hi, stag + 1

            def not1(args):
                return jax.lax.cond(small2, deflate2, sweep, args)

            A, Q, hi, stag = jax.lax.cond(small1, deflate1, not1, (A, Q, hi, stag))
            return A, Q, hi, it + 1, stag

        hi0 = jnp.maximum(jnp.asarray(k, jnp.int32) - 1, 0)
        A, Q, hi, it, _ = jax.lax.while_loop(
            cond, body, (A0, Q0, hi0, jnp.int32(0), jnp.int32(0))
        )
        ok = hi <= 0
        T = jnp.where(rows > cols + 1, 0.0, A)
        # zero subdiagonal entries that are only eps-level noise (keep real 2x2s)
        return T, Q, ok


def block_starts(T: jax.Array, k) -> jax.Array:
    """Boolean (m,) mask: position ``i < k`` starts a 2x2 block (``T[i+1, i]``
    nonzero).  Positions ``>= k`` and block interiors are False."""
    m = T.shape[0]
    subd = jnp.concatenate([jnp.diagonal(T, -1), jnp.zeros((1,), T.dtype)])
    nz = subd != 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    nz = jnp.where(idx < k - 1, nz, False)
    # a nonzero subdiagonal at i marks a block start only if i-1 isn't one
    prev = jnp.concatenate([jnp.zeros((1,), bool), nz[:-1]])
    return jnp.logical_and(nz, jnp.logical_not(prev))


def real_schur_eigvals(T: jax.Array, k) -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues (re, im) from a real quasi-triangular ``T`` — the
    reference's ``schur2eigvals`` with 2x2 blocks (``src/dense/linalg.jl:
    156-189``), without materializing complex arrays (axon-safe)."""
    m = T.shape[0]
    d = jnp.diagonal(T)
    up = jnp.concatenate([jnp.diagonal(T, 1), jnp.zeros((1,), T.dtype)])
    lo = jnp.concatenate([jnp.diagonal(T, -1), jnp.zeros((1,), T.dtype)])
    starts = block_starts(T, k)
    second = jnp.concatenate([jnp.zeros((1,), bool), starts[:-1]])
    d_next = jnp.roll(d, -1)
    d_prev = jnp.roll(d, 1)
    # block (i, i+1): re = (d_i + d_{i+1})/2, im² = -((d_i-d_{i+1})/2)² - b·c
    half = (d - d_next) / 2
    disc = half * half + up * lo  # at a start position
    im_sq = jnp.maximum(-disc, 0.0)
    im_start = jnp.sqrt(im_sq)
    re_start = (d + d_next) / 2
    half_p = (d_prev - d) / 2
    disc_p = half_p * half_p + jnp.roll(up, 1) * jnp.roll(lo, 1)
    im_second = jnp.sqrt(jnp.maximum(-disc_p, 0.0))
    re_second = (d_prev + d) / 2
    re = jnp.where(starts, re_start, jnp.where(second, re_second, d))
    im = jnp.where(starts, im_start, jnp.where(second, -im_second, 0.0))
    return re, im
