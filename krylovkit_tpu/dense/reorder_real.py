"""Reordering of a REAL Schur form with 2x2 blocks — the reference's
``permuteschur!``/``trexc`` LAPACK surface on real matrices
(``src/dense/linalg.jl:335-386``), on device.

Adjacent block swaps follow LAPACK ``dlaexc``: to move the trailing block
``T22`` (q×q) of the window ``[[T11, T12], [0, T22]]`` (p, q ∈ {1, 2}) to the
front, solve the Sylvester equation ``T11·X − X·T22 = T12`` and take the
orthogonal factor of ``[[−X], [I_q]]`` (its columns span the T22-invariant
subspace); the similarity by that factor swaps the blocks.  The (1,1) case
reduces to a single Givens rotation.  Swapped 2x2 blocks are re-standardized
with ``lanv2``.

The bubble sort runs entirely in a ``fori_loop`` nest on a ``+4``-padded
buffer (so 4-wide windows never clamp), with all block boundaries discovered
dynamically from the subdiagonal — static shapes throughout.  Ill-conditioned
swaps (Sylvester solution too large, i.e. nearly confluent blocks) are skipped,
mirroring LAPACK's ``info = 1`` behavior.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masking import which_key_ri
from .realschur import lanv2_rotation

__all__ = ["sort_schur_real"]


def _block_key(Tp, j, which):
    """Sort key of the block starting at (traced) position ``j`` of the padded
    quasi-triangular ``Tp``; also returns the block size p ∈ {1, 2}."""
    def at(M, r, c):
        row = jax.lax.dynamic_index_in_dim(M, r, 0, keepdims=False)
        return jax.lax.dynamic_index_in_dim(row, c, 0, keepdims=False)

    a = at(Tp, j, j)
    b = at(Tp, j, j + 1)
    c = at(Tp, j + 1, j)
    d = at(Tp, j + 1, j + 1)
    is2 = c != 0
    p = jnp.where(is2, 2, 1).astype(jnp.int32)
    half = (a - d) / 2
    disc = half * half + b * c
    im = jnp.where(is2, jnp.sqrt(jnp.maximum(-disc, 0.0)), 0.0)
    re = jnp.where(is2, (a + d) / 2, a)
    # EigSorter callbacks expect vector input — feed a length-1 array
    key = which_key_ri(re.reshape(1), im.reshape(1), which)
    return key.reshape(-1)[0], p


def _swap_window(W, p, q):
    """Orthogonal G (4x4) swapping the leading p×p and following q×q diagonal
    blocks of the padded window ``W`` (4x4; unused part = identity).  Returns
    (G, ok); ok=False when the Sylvester solve is too ill-conditioned."""
    with jax.default_matmul_precision("highest"):
        rdt = W.dtype
        eps = jnp.finfo(rdt).eps
        i4 = jnp.eye(4, dtype=rdt)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (4,), 0)

        # masks for the p×p leading block and the q×q trailing block (at offset p)
        in1 = ridx < p
        in2 = (ridx >= p) & (ridx < p + q)

        # T11 (embed into 2x2 at [0:2]), T22 (embed the block at offset p into 2x2)
        def embed2(mask_rows, offset):
            # rows/cols [offset, offset+1] of W -> 2x2, padded with distinct
            # diagonal so the Kronecker system stays nonsingular for size-1 blocks
            blk = jax.lax.dynamic_slice(W, (offset, offset), (2, 2))
            return blk

        T11 = jax.lax.dynamic_slice(W, (jnp.int32(0), jnp.int32(0)), (2, 2))
        T22 = jax.lax.dynamic_slice(W, (p, p), (2, 2))
        T12 = jax.lax.dynamic_slice(W, (jnp.int32(0), p), (2, 2))
        # pad unused dims: for p==1 row/col 1 of T11 is irrelevant -> set diag
        # entries far apart so the 4x4 Kronecker system is well-posed, and zero the
        # corresponding rhs so the padded X entries come out 0.
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
        K = jnp.kron(jnp.eye(2, dtype=rdt), T11) - jnp.kron(T22.T, jnp.eye(2, dtype=rdt))
        rhs = T12.T.reshape(4)  # column-major vec
        scale = jnp.maximum(jnp.max(jnp.abs(K)), eps)
        X4 = jnp.linalg.solve(K / scale, rhs / scale)
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

        # complete to an orthogonal 4x4: QR of [Z | complement seeds]
        seeds = i4
        Mfull = jnp.concatenate([Z, seeds], axis=1)  # (4, 6)
        Qf, _ = jnp.linalg.qr(Mfull, mode="reduced")  # (4, 4) orthogonal
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

        def block_meta(Tp):
            """Vectorized per-position metadata: ``two[j]`` (j starts a 2x2),
            ``second[j]`` (j is the trailing member), and the block sort key
            replicated onto both members (+inf beyond the active block).
            Computed once per PASS (the per-micro-step scalar recomputation
            dominated the sort's latency) and updated incrementally on swaps."""
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

        def micro(carry, j):
            Tp, Qp, two, second, key, swapped = carry

            def g(v, i):
                return jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)

            is_start = jnp.logical_not(g(second, j))
            p = 1 + g(two, j).astype(jnp.int32)
            n0 = j + p
            q = 1 + g(two, n0).astype(jnp.int32)
            key1 = g(key, j)
            key2 = g(key, n0)
            fits = n0 + q <= kk  # whole window inside the active block
            do = is_start & fits & (key1 > key2)

            def do_swap(args):
                Tp, Qp, two, second, key, swapped = args
                W = jax.lax.dynamic_slice(Tp, (j, j), (4, 4))
                # identity-pad the window outside p+q
                wr = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
                wc = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
                inw = (wr < p + q) & (wc < p + q)
                W = jnp.where(inw, W, 0.0) + jnp.where(
                    (wr == wc) & (wr >= p + q), 1.0, 0.0
                )
                G4, ok = _swap_window(W, p, q)
                # embed G4 at offset j into identity
                G = jnp.eye(mp, dtype=rdt)
                G = jax.lax.dynamic_update_slice(G, G4, (j, j))
                Tn = G.T @ Tp @ G
                Qn = Qp @ G
                # clean: zero the (new) below-block entries in the window and
                # re-standardize the swapped blocks: leading block now q×q at j,
                # trailing p×p at j+q
                r2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
                c2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
                inwin = (r2 >= j) & (r2 < j + p + q) & (c2 >= j) & (c2 < j + p + q)
                # zero strictly-lower entries of the window except the standard 2x2
                # subdiagonals at (j+1, j) [if q==2] and (j+q+1, j+q) [if p==2]
                keep1 = (r2 == j + 1) & (c2 == j) & (q == 2)
                keep2 = (r2 == j + q + 1) & (c2 == j + q) & (p == 2)
                lower = inwin & (r2 > c2) & ~keep1 & ~keep2
                Tn = jnp.where(lower, 0.0, Tn)

                from .realschur import _standardize_block

                def std_at(args):
                    Tn, Qn, pos = args
                    return _standardize_block(Tn, Qn, pos) + (pos,)

                Tn, Qn, _ = jax.lax.cond(
                    q == 2, std_at, lambda a: a, (Tn, Qn, j)
                )
                Tn, Qn, _ = jax.lax.cond(
                    p == 2, std_at, lambda a: a, (Tn, Qn, j + q)
                )
                # only commit if the swap was numerically sound
                Tn = jnp.where(ok, Tn, Tp)
                Qn = jnp.where(ok, Qn, Qp)

                # incremental metadata update for positions j..j+3: the blocks
                # exchanged places (B: size q now at j, A: size p at j+q)
                w4 = jax.lax.broadcasted_iota(jnp.int32, (4,), 0)
                two4 = jnp.where(w4 == 0, q == 2, jnp.where(w4 == q, p == 2, False))
                two4 = jnp.where(w4 < p + q, two4, False)
                sec4 = jnp.where(
                    (w4 == 1) & (q == 2), True,
                    jnp.where((w4 == q + 1) & (p == 2), True, False),
                )
                key4 = jnp.where(w4 < q, key2, key1)
                old_two = jax.lax.dynamic_slice(two, (j,), (4,))
                old_sec = jax.lax.dynamic_slice(second, (j,), (4,))
                old_key = jax.lax.dynamic_slice(key, (j,), (4,))
                win = w4 < p + q
                two_n = jax.lax.dynamic_update_slice(
                    two, jnp.where(win & ok, two4, old_two), (j,)
                )
                sec_n = jax.lax.dynamic_update_slice(
                    second, jnp.where(win & ok, sec4, old_sec), (j,)
                )
                key_n = jax.lax.dynamic_update_slice(
                    key, jnp.where(win & ok, key4, old_key), (j,)
                )
                return Tn, Qn, two_n, sec_n, key_n, swapped | ok

            def no_swap(args):
                return args

            Tp, Qp, two, second, key, swapped = jax.lax.cond(
                do, do_swap, no_swap, (Tp, Qp, two, second, key, swapped)
            )
            return (Tp, Qp, two, second, key, swapped), None

        def one_pass(carry):
            Tp, Qp, npass, _ = carry
            two, second, key = block_meta(Tp)
            (Tp, Qp, _, _, _, swapped), _ = jax.lax.scan(
                micro,
                (Tp, Qp, two, second, key, jnp.asarray(False)),
                jnp.arange(m - 1),
            )
            return Tp, Qp, npass + 1, swapped

        # passes run until swap-free (restarted Krylov-Schur matrices arrive
        # nearly sorted, so this usually exits after 1-2 passes), bounded by m
        def pass_cond(carry):
            _, _, npass, swapped = carry
            return swapped & (npass < m + 1)

        Tp, Qp, _, _ = jax.lax.while_loop(
            pass_cond, one_pass, (Tp, Qp, jnp.int32(0), jnp.asarray(True))
        )
        return Tp[:m, :m], Qp[:m, :m]
