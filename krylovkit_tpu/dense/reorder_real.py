"""Reordering of a REAL Schur form with 2x2 blocks — the reference's
``permuteschur!``/``trexc`` LAPACK surface on real matrices
(``src/dense/linalg.jl:335-386``), on device.

Adjacent block swaps follow LAPACK ``dlaexc``: to move the trailing block
``T22`` (q×q) of the window ``[[T11, T12], [0, T22]]`` (p, q ∈ {1, 2}) to the
front, solve the Sylvester equation ``T11·X − X·T22 = T12`` and take the
orthogonal factor of ``[[−X], [I_q]]`` (its columns span the T22-invariant
subspace); the similarity by that factor swaps the blocks.  Ill-conditioned
swaps (Sylvester solution too large, i.e. nearly confluent blocks) are
skipped, mirroring LAPACK's ``info = 1`` behavior.

TPU-native schedule: instead of LAPACK's sequential bubble of one block at a
time (a GEMM-triple per micro-step — latency-bound on an accelerator), each
pass is an **odd-even transposition over blocks**: all adjacent block pairs of
one parity are disjoint, so their 4×4 swap rotations are computed together
(one vmapped Sylvester solve + QR) and applied as a SINGLE accumulated
orthogonal similarity ``T ← Gᵀ T G``.  A second vectorized phase
re-standardizes every 2×2 block with one accumulated lanv2 rotation (lanv2 of
an already-standard block is the identity, so it is applied unconditionally).
The pass pair (even parity then odd parity) repeats until swap-free; matrices
arriving from a Krylov-Schur restart are nearly sorted, so this usually exits
after one round.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import which_key_ri
from .realschur import lanv2_rotation

__all__ = ["sort_schur_real"]


def _solve4(K, rhs):
    """Branchless unrolled 4x4 linear solve: Gaussian elimination with partial
    pivoting (4 pivot steps of pure vector ops — no ``jnp.linalg.solve``,
    whose LU lowers to a latency-bound while loop on device)."""
    rdt = K.dtype
    tiny = jnp.finfo(rdt).tiny
    A = jnp.concatenate([K, rhs[:, None]], axis=1)  # (4, 5) augmented
    ridx = jax.lax.broadcasted_iota(jnp.int32, (4,), 0)
    for j in range(4):
        # pivot: swap row j with the max-|A[:,j]| row among rows >= j
        col = jnp.where(ridx >= j, jnp.abs(A[:, j]), -1.0)
        piv = jnp.argmax(col)
        rj, rp = A[j], A[piv]
        A = A.at[j].set(rp).at[piv].set(rj)
        # eliminate below
        d = A[j, j]
        d = jnp.where(jnp.abs(d) > 0, d, tiny)
        f = jnp.where(ridx > j, A[:, j] / d, 0.0)
        A = A - f[:, None] * A[j][None, :]
    # back substitution, unrolled
    x = jnp.zeros((4,), rdt)
    for j in range(3, -1, -1):
        d = A[j, j]
        d = jnp.where(jnp.abs(d) > 0, d, tiny)
        x = x.at[j].set((A[j, 4] - A[j, :4] @ x) / d)
    return x


def _householder_q(Z):
    """Orthogonal 4x4 ``Qf`` from two unrolled Householder reflectors of the
    4x2 ``Z`` (columns may be zero → tau = 0 → identity reflector).  Rows where
    ``Z`` is exactly zero give reflector-vector zeros, so ``Qf`` is exactly
    identity on those coordinates — required by the accumulated-similarity
    schedule.  First ``rank(Z)`` columns of ``Qf`` span ``col(Z)``."""
    rdt = Z.dtype
    i4 = jnp.eye(4, dtype=rdt)

    def reflect(x, off):
        # dlarfg on x[off:]: H x = beta e_off; returns (v, tau) with v[<off]=0
        ridx = jax.lax.broadcasted_iota(jnp.int32, (4,), 0)
        act = ridx >= off
        xa = jnp.where(act, x, 0.0)
        alpha = x[off]
        nrm = jnp.sqrt(jnp.sum(xa * xa))
        tail = jnp.sqrt(jnp.maximum(nrm * nrm - alpha * alpha, 0.0))
        degenerate = tail == 0.0  # already ±e_off (or zero): identity works
        beta = -jnp.sign(jnp.where(alpha == 0, 1.0, alpha)) * nrm
        denom = alpha - beta
        denom = jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        v = jnp.where(act, xa / denom, 0.0)
        v = v.at[off].set(1.0)
        tau = jnp.where(degenerate, 0.0, (beta - alpha) / jnp.where(beta == 0, 1.0, beta))
        return v, tau

    v0, t0 = reflect(Z[:, 0], 0)
    z1 = Z[:, 1] - t0 * v0 * (v0 @ Z[:, 1])  # H0 applied to column 1
    v1, t1 = reflect(z1, 1)
    # Qf = H0 H1 = (I − t0 v0 v0ᵀ)(I − t1 v1 v1ᵀ)
    H1 = i4 - t1 * v1[:, None] * v1[None, :]
    Qf = H1 - t0 * v0[:, None] * (v0 @ H1)[None, :]
    return Qf


def _swap_window(W, p, q):
    """Orthogonal G (4x4) swapping the leading p×p and following q×q diagonal
    blocks of the padded window ``W`` (4x4; unused part = identity).  Returns
    (G, ok); ok=False when the Sylvester solve is too ill-conditioned."""
    with jax.default_matmul_precision("highest"):
        rdt = W.dtype
        eps = jnp.finfo(rdt).eps

        T11 = jax.lax.dynamic_slice(W, (jnp.int32(0), jnp.int32(0)), (2, 2))
        T22 = jax.lax.dynamic_slice(W, (p, p), (2, 2))
        T12 = jax.lax.dynamic_slice(W, (jnp.int32(0), p), (2, 2))
        # pad unused dims: for p==1 row/col 1 of T11 is irrelevant -> set diag
        # entries far apart so the 4x4 Kronecker system is well-posed, and zero
        # the corresponding rhs so the padded X entries come out 0.
        pr = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
        pc = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
        big = jnp.asarray(1.0, rdt)
        T11 = jnp.where((pr < p) & (pc < p), T11, 0.0) + jnp.where(
            (pr == pc) & (pr >= p), 2 * big + jnp.abs(W).max(), 0.0
        )
        T22 = jnp.where((pr < q) & (pc < q), T22, 0.0) + jnp.where(
            (pr == pc) & (pr >= q), -(2 * big + jnp.abs(W).max()), 0.0
        )
        T12 = jnp.where((pr < p) & (pc < q), T12, 0.0)

        # Sylvester T11 X - X T22 = T12 via 4x4 Kronecker solve
        K = jnp.kron(jnp.eye(2, dtype=rdt), T11) - jnp.kron(
            T22.T, jnp.eye(2, dtype=rdt)
        )
        rhs = T12.T.reshape(4)  # column-major vec
        scale = jnp.maximum(jnp.max(jnp.abs(K)), eps)
        X4 = _solve4(K / scale, rhs / scale)
        X = X4.reshape(2, 2).T
        ok = jnp.all(jnp.isfinite(X)) & (jnp.max(jnp.abs(X)) < 1 / (16 * eps))

        # Z (4×2): [[-X], [I_q]] laid out in the (p+q) window rows; unused
        # columns (cc >= q) zero
        rr = jax.lax.broadcasted_iota(jnp.int32, (4, 2), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (4, 2), 1)
        Xfull = jnp.concatenate([-X, jnp.zeros((2, 2), rdt)], axis=0)  # (4, 2)
        Xpad = jnp.where((rr < p) & (cc < q), Xfull, 0.0)
        Ipad = jnp.where((rr == cc + p) & (cc < q), 1.0, 0.0)
        Z = Xpad + Ipad

        # complete to an orthogonal 4x4 via two unrolled Householder
        # reflectors.  Rows/cols ≥ p+q come out EXACT identity (Z's padding
        # rows are exact zeros → reflector vectors are zero there), which the
        # accumulated-similarity schedule in sort_schur_real requires: it sums
        # embedded ``G4 − I`` terms whose 4x4 windows may overlap beyond p+q.
        Qf = _householder_q(Z)
        return Qf, ok


def sort_schur_real(
    T: jax.Array, Q: jax.Array, which, k
) -> Tuple[jax.Array, jax.Array]:
    """Reorder a real Schur pair ``(T, Q)`` so diagonal blocks ascend by the
    ``which`` key, never splitting 2x2 blocks.  Positions ``>= k`` (sentinel)
    keep +inf keys and stay trailing.  Returns ``(T, Q)``."""
    with jax.default_matmul_precision("highest"):
        m = T.shape[0]
        rdt = T.dtype
        mp = m + 4

        # pad to (m+4, m+4): identity tail so 4-windows never clamp
        rows = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
        Tp = jnp.zeros((mp, mp), rdt).at[:m, :m].set(T)
        Tp = Tp + jnp.where((rows == cols) & (rows >= m), 1.0, 0.0)
        Qp = jnp.zeros((mp, mp), rdt).at[:m, :m].set(Q)
        Qp = Qp + jnp.where((rows == cols) & (rows >= m), 1.0, 0.0)

        kk = jnp.asarray(k, jnp.int32)
        inf = jnp.asarray(jnp.inf, rdt)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (mp,), 0)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
        eyemp = jnp.eye(mp, dtype=rdt)
        # E[j]: (4, mp) selector of rows j..j+3 — E[j][a, r] = (r == j+a)
        Esel = (
            pidx[None, None, :] == (jidx[:, None, None] + jnp.arange(4)[None, :, None])
        ).astype(rdt)  # (m, 4, mp)

        def block_meta(Tp):
            """Per-position vectors: ``two[j]`` (j starts a 2x2), ``second[j]``
            (j is the trailing member), and the block sort key replicated onto
            both members (+inf beyond the active block)."""
            d = jnp.diagonal(Tp)
            up = jnp.concatenate([jnp.diagonal(Tp, 1), jnp.zeros((1,), rdt)])
            lo = jnp.concatenate([jnp.diagonal(Tp, -1), jnp.zeros((1,), rdt)])
            nz = (lo != 0) & (pidx < kk - 1)
            prev = jnp.concatenate([jnp.zeros((1,), bool), nz[:-1]])
            two = nz & ~prev
            second = jnp.concatenate([jnp.zeros((1,), bool), two[:-1]])
            d_next = jnp.roll(d, -1)
            half = (d - d_next) / 2
            disc = half * half + up * lo
            im = jnp.where(two, jnp.sqrt(jnp.maximum(-disc, 0.0)), 0.0)
            re = jnp.where(two, (d + d_next) / 2, d)
            key = which_key_ri(re, im, which)
            key = jnp.where(second, jnp.roll(key, 1), key)  # share with partner
            key = jnp.where(pidx < kk, key, inf)
            return two, second, key

        def sub_pass(Tp, Qp, parity):
            """One parity sub-pass: swap all adjacent block pairs (lead block
            index ≡ parity mod 2) whose keys are out of order, as ONE
            accumulated orthogonal similarity.  Standardization is deferred to
            a single pass after the sort: swaps preserve each block's
            eigenvalue pair, and block detection / keys only need the
            subdiagonal + the 2x2 trace/determinant, not standard form."""
            two, second, key = block_meta(Tp)
            start = ~second & (pidx < kk)
            bidx = jnp.cumsum(start.astype(jnp.int32)) - 1  # block index per pos

            startm = start[:m]
            p = 1 + two[:m].astype(jnp.int32)  # lead block size at j
            n0 = jidx + p  # next block start
            q = 1 + jnp.take(two, n0, fill_value=False).astype(jnp.int32)
            key1 = key[:m]
            key2 = jnp.take(key, n0, fill_value=jnp.inf)
            fits = n0 + q <= kk
            cand = startm & ((bidx[:m] % 2) == parity) & fits & (key1 > key2)

            # vmapped 4x4 window rotations for every position (masked later)
            def window_rot(j, p, q):
                W = jax.lax.dynamic_slice(Tp, (j, j), (4, 4))
                wr = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
                wc = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
                inw = (wr < p + q) & (wc < p + q)
                W = jnp.where(inw, W, 0.0) + jnp.where(
                    (wr == wc) & (wr >= p + q), 1.0, 0.0
                )
                return _swap_window(W, p, q)

            G4, ok = jax.vmap(window_rot)(jidx, p, q)  # (m, 4, 4), (m,)
            do = cand & ok
            D = jnp.where(do[:, None, None], G4 - jnp.eye(4, dtype=rdt), 0.0)
            # disjoint windows (parity schedule) ⇒ I + Σ_j E_jᵀ (G4_j − I) E_j
            # is exactly the product of the embedded rotations
            G = eyemp + jnp.einsum("jar,jab,jbs->rs", Esel, D, Esel)
            Tn = G.T @ Tp @ G
            Qn = Qp @ G

            # clean: zero the strictly-lower in-window entries except the new
            # standard 2x2 subdiagonals at (j+1, j) [q==2] and (j+q+1, j+q)
            # [p==2]
            wmask = (
                (pidx[None, :] >= jidx[:, None])
                & (pidx[None, :] < (jidx + p + q)[:, None])
                & do[:, None]
            ).astype(rdt)  # (m, mp)
            inwin = jnp.einsum("jr,jc->rc", wmask, wmask) > 0
            K1 = jnp.einsum(
                "jr,jc->rc",
                e_of(jidx + 1) * (do & (q == 2))[:, None].astype(rdt),
                e_of(jidx),
            )
            K2 = jnp.einsum(
                "jr,jc->rc",
                e_of(jidx + q + 1) * (do & (p == 2))[:, None].astype(rdt),
                e_of(jidx + q),
            )
            lower = inwin & (rows > cols) & (K1 + K2 == 0)
            Tn = jnp.where(lower, 0.0, Tn)
            return Tn, Qn, jnp.any(do)

        def e_of(v):
            return (pidx[None, :] == v[:, None]).astype(rdt)

        def standardize_all(Tn, Qn):
            """Re-standardize ALL 2x2 blocks with one accumulated lanv2
            rotation (identity rotation for blocks already in standard form;
            all 2x2 blocks are disjoint so the sum of embedded rotations is
            exactly their product)."""
            two2, _, _ = block_meta(Tn)
            t2 = two2[:m]
            d = jnp.diagonal(Tn)
            up = jnp.concatenate([jnp.diagonal(Tn, 1), jnp.zeros((1,), rdt)])
            lo = jnp.concatenate([jnp.diagonal(Tn, -1), jnp.zeros((1,), rdt)])
            a, b = d[:m], up[:m]
            c, dd = lo[:m], jnp.roll(d, -1)[:m]
            cs, sn = jax.vmap(lanv2_rotation)(a, b, c, dd)
            cs = jnp.where(t2, cs, 1.0)
            sn = jnp.where(t2, sn, 0.0)
            # rotation acts on rows (j, j+1): embed [[cs,−sn],[sn,cs]] − I2
            R2 = jnp.stack(
                [
                    jnp.stack([cs - 1.0, -sn], axis=-1),
                    jnp.stack([sn, cs - 1.0], axis=-1),
                ],
                axis=-2,
            )  # (m, 2, 2)
            E2 = Esel[:, :2, :]  # (m, 2, mp)
            R = eyemp + jnp.einsum("jar,jab,jbs->rs", E2, R2, E2)
            Tn = R.T @ Tn @ R
            Qn = Qn @ R
            # a real-eigenvalue 2x2 is triangularized by lanv2: clean its
            # subdiagonal entry
            disc = ((a - dd) / 2) ** 2 + b * c
            split = t2 & (disc >= 0)
            hit = (
                jnp.einsum(
                    "jr,jc->rc",
                    e_of(jidx + 1) * split[:, None].astype(rdt),
                    e_of(jidx),
                )
                > 0
            )
            Tn = jnp.where(hit, 0.0, Tn)
            return Tn, Qn

        def one_round(carry):
            Tp, Qp, nround, _ = carry
            Tp, Qp, s0 = sub_pass(Tp, Qp, jnp.int32(0))
            Tp, Qp, s1 = sub_pass(Tp, Qp, jnp.int32(1))
            return Tp, Qp, nround + 1, s0 | s1

        # a round (even + odd sub-pass) with no swaps ⇒ sorted; nearly-sorted
        # Krylov-Schur restarts exit after ~1 round
        def round_cond(carry):
            _, _, nround, swapped = carry
            return swapped & (nround < (m + 2) // 2 + 1)

        Tp, Qp, _, _ = jax.lax.while_loop(
            round_cond, one_round, (Tp, Qp, jnp.int32(0), jnp.asarray(True))
        )
        Tp, Qp = standardize_all(Tp, Qp)
        return Tp[:m, :m], Qp[:m, :m]
