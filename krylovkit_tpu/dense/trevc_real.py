"""Eigenvectors from a REAL quasi-triangular Schur form — the reference's
LAPACK ``dtrevc`` surface (``src/dense/linalg.jl:197-304``, real branch where
complex-pair columns are combined, ``:223-246``) on device, without
materializing complex arrays (axon-safe): vectors are returned as an
``(X_re, X_im)`` pair.

For a 1x1 block at ``i`` (real λ): ``x = [y; 1; 0…]`` with the leading
quasi-triangular system ``(T[:i,:i] − λI) y = −T[:i, i]``.  For a standardized
2x2 block ``[[a, b], [c, a]]`` at ``(i, i+1)`` (λ = a ± iμ, μ = √(−bc), b≠0):
the in-block part is ``[b, iμ]`` and the leading extension solves the complex
system ``(T[:i,:i] − λI) y = −(b·T[:i,i] + iμ·T[:i,i+1])``, written as the real
``2m×2m`` block system ``[[R, μI], [−μI, R]]``.  Both cases are the SAME
embedded real system (μ = 0 degenerates to two decoupled real solves), so all
columns batch through one ``vmap`` over LU solves.  Column ``i+1`` of a pair is
the conjugate of column ``i``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .realschur import block_starts

__all__ = ["triangular_eigvecs_real"]


def triangular_eigvecs_real(T: jax.Array, k) -> Tuple[jax.Array, jax.Array]:
    """Right eigenvectors of the active block of real quasi-triangular ``T``.

    Returns ``(Xre, Xim)``, each (m, m): column ``i < k`` is the unit-norm
    eigenvector for the eigenvalue of the block containing position ``i``
    (conjugate pairs in adjacent columns, ``Xim[:, i+1] = -Xim[:, i]``);
    columns ``>= k`` are canonical unit vectors.
    """
    with jax.default_matmul_precision("highest"):
        m = T.shape[0]
        rdt = T.dtype
        eps = jnp.finfo(rdt).eps
        tnorm = jnp.maximum(jnp.max(jnp.abs(T)), 1.0)
        smin = eps * tnorm

        rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        eye = jnp.eye(m, dtype=rdt)
        d = jnp.diagonal(T)
        starts = block_starts(T, k)
        up = jnp.concatenate([jnp.diagonal(T, 1), jnp.zeros((1,), rdt)])
        lo = jnp.concatenate([jnp.diagonal(T, -1), jnp.zeros((1,), rdt)])

        def one_col(i):
            is2 = jax.lax.dynamic_index_in_dim(starts, i, 0, keepdims=False)
            a = jax.lax.dynamic_index_in_dim(d, i, 0, keepdims=False)
            b = jax.lax.dynamic_index_in_dim(up, i, 0, keepdims=False)
            c = jax.lax.dynamic_index_in_dim(lo, i, 0, keepdims=False)
            dd = jax.lax.dynamic_index_in_dim(
                d, jnp.minimum(i + 1, m - 1), 0, keepdims=False
            )
            # general (not-exactly-standardized) block: λ = (a+d)/2 ± i·μ with
            # μ² = −((a−d)/2)² − bc; eigenvector v = [b, (d−a)/2 + i·μ]
            half = (a - dd) / 2
            mu = jnp.where(is2, jnp.sqrt(jnp.maximum(-(half * half + b * c), 0.0)), 0.0)
            lam_re = jnp.where(is2, (a + dd) / 2, a)
            v2r = jnp.where(is2, -half, 0.0)

            # leading block R = T[:i,:i] − Re(λ)·I embedded: identity beyond row i
            lead = (rows < i) & (cols < i)
            R = jnp.where(lead, T, 0.0) - jnp.where(
                (rows == cols) & (rows < i), lam_re, 0.0
            )
            # pivot guard: bump near-singular diagonal (|T[j,j]−Re λ| and μ tiny)
            dv = jnp.where(ridx < i, d - lam_re, 1.0)
            piv_small = (jnp.hypot(dv, mu) < smin) & (ridx < i)
            bump = jnp.where(piv_small, jnp.where(dv >= 0, smin, -smin), 0.0)
            R = R + jnp.diag(jnp.where(ridx < i, bump, 0.0))
            R = R + jnp.diag(jnp.where(ridx < i, 0.0, 1.0))

            # rhs: −(T[:i,i]·v1 + T[:i,i+1]·v2), v1 = b (pair) or 1, v2 = v2r + iμ
            coli = jax.lax.dynamic_index_in_dim(T, i, 1, keepdims=False)
            coli1 = jax.lax.dynamic_index_in_dim(
                T, jnp.minimum(i + 1, m - 1), 1, keepdims=False
            )
            v1 = jnp.where(is2, b, 1.0)
            rr = jnp.where(ridx < i, -(v1 * coli + v2r * coli1), 0.0)
            ri = jnp.where(ridx < i, -mu * coli1, 0.0)

            # real 2m system [[R, μI], [−μI, R]] [yr; yi] = [rr; ri]
            muI = mu * jnp.where((rows == cols) & (rows < i), 1.0, 0.0)
            M = jnp.block([[R, muI], [-muI, R]])
            y = jnp.linalg.solve(M, jnp.concatenate([rr, ri]))
            yr, yi = y[:m], y[m:]

            # assemble: leading y, then the in-block part [v1, v2r] + i[0, μ]
            xr = (
                jnp.where(ridx < i, yr, 0.0)
                + jnp.where(ridx == i, v1, 0.0)
                + jnp.where(jnp.logical_and(ridx == i + 1, is2), v2r, 0.0)
            )
            xi = jnp.where(ridx < i, yi, 0.0) + jnp.where(ridx == i + 1, mu, 0.0)
            xi = jnp.where(is2, xi, 0.0)
            nrm = jnp.sqrt(jnp.sum(xr * xr) + jnp.sum(xi * xi))
            nrm = jnp.where(nrm > 0, nrm, 1.0)
            return xr / nrm, xi / nrm

        Xre, Xim = jax.vmap(one_col)(jnp.arange(m))
        Xre, Xim = Xre.T, Xim.T

        # second column of each pair = conjugate of the first
        second = jnp.concatenate([jnp.zeros((1,), bool), starts[:-1]])
        Xre = jnp.where(second[None, :], jnp.roll(Xre, 1, axis=1), Xre)
        Xim = jnp.where(second[None, :], -jnp.roll(Xim, 1, axis=1), Xim)

        # inactive columns: canonical basis
        Xre = jnp.where(cols >= k, eye, Xre)
        Xim = jnp.where(cols >= k, 0.0, Xim)
        return Xre, Xim
