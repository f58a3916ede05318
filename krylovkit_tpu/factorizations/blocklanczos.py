"""Block Lanczos factorization, TPU-native.

Mirrors the reference (``src/factorizations/blocklanczos.jl``): block-tridiagonal
factorization ``A V = V H + R B'`` where each step applies the operator to a
*block* of vectors, with rank detection in the block QR (``block_qr!``,
``src/factorizations/blocklanczos.jl:312-353``) so degenerate eigenvalues are
resolved.  The reference *shrinks* the block when rank drops
(``src/factorizations/blocklanczos.jl:200-240``); here the block size ``b`` is
static and rank deficiency is handled by **compaction**: the block QR moves the
surviving directions to the front of the block (zero columns trail) and the
committed count ``k`` advances by the dynamic rank ``r ≤ b``, so the active
basis ``V[:k]`` is always fully orthonormal and the zero tail is overwritten by
the next commit.

Layout: the basis ``V`` (capacity ``mcap + b``) holds committed vectors in
``[0, k)``; the *current* orthonormal block ``X`` is a separate stacked pytree.
``H`` is a dense ``(mcap+b)²`` buffer: committing a block writes its coefficient
columns and its sub-diagonal coupling rows (the block-tridiagonal ``B`` factors).
The operator is applied to the whole block at once with ``jax.vmap`` — a batched
SpMV/GEMM, exactly what the MXU wants.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import basis as bs
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any
_HI = jax.lax.Precision.HIGHEST

__all__ = ["BlockLanczosState", "block_qr", "initialize", "expand"]


class BlockLanczosState(NamedTuple):
    V: PyTree  # committed basis, capacity mcap + b
    H: jax.Array  # (mcap+b, mcap+b) projected-matrix buffer
    X: PyTree  # current orthonormal block (stacked b), compacted
    r: jax.Array  # current block rank (int32, ≤ b)
    k: jax.Array  # committed count
    beta: jax.Array  # Frobenius norm of the last coupling block


def _block_axpy(W: PyTree, V: PyTree, M: jax.Array) -> PyTree:
    """``W[i] −= Σ_j M[j, i] V[j]`` for stacked blocks (one GEMM per leaf)."""

    def leaf(lW, lV):
        n = lW[0].size
        upd = jnp.matmul(
            M.T.astype(jnp.result_type(M.dtype, lV.dtype)),
            lV.reshape(lV.shape[0], n),
            precision=_HI,
        )
        return (lW.reshape(lW.shape[0], n) - upd).reshape(lW.shape)

    return jax.tree_util.tree_map(leaf, W, V)


def block_qr(
    X: PyTree, qr_tol, space: VectorSpace = STANDARD
) -> Tuple[PyTree, jax.Array, jax.Array]:
    """Rank-revealing QR of a stacked block by two-pass MGS with compaction.

    Returns ``(Q, C, rank)`` with ``X[i] = Σ_j C[j, i] Q[j]``, the valid columns
    of ``Q`` moved to the front (zero columns trail), and ``C``'s rows permuted
    accordingly.  Reference ``block_qr!``
    (``src/factorizations/blocklanczos.jl:312-353``).
    """
    b = jax.tree_util.tree_leaves(X)[0].shape[0]
    cdt = jnp.result_type(*[l.dtype for l in jax.tree_util.tree_leaves(X)])
    rdt = jnp.finfo(cdt).dtype
    # relative rank tolerance
    norms0 = jnp.sqrt(jnp.maximum(jnp.real(bs.batch_inner(X, X, space)), 0))
    scale_ = jnp.maximum(jnp.max(norms0), jnp.asarray(1e-30, rdt))
    tol = qr_tol * scale_

    Q = jax.tree_util.tree_map(jnp.zeros_like, X)
    C = jnp.zeros((b, b), cdt)
    valid = jnp.zeros((b,), bool)
    for i in range(b):
        xi = bs.get(X, i)
        # two CGS passes against the already-accepted columns
        for _ in range(2):
            c = bs.project(Q, xi, b, space) * valid.astype(rdt)
            C = C.at[:, i].add(c.astype(cdt))
            xi = jax.tree_util.tree_map(
                lambda lx, lq: lx
                - jnp.tensordot(
                    c.astype(lq.dtype), lq, axes=[[0], [0]]
                ),
                xi,
                Q,
            )
        nrm = space.norm(xi)
        ok = nrm > tol
        safe = jnp.where(ok, nrm, 1)
        xi = jax.tree_util.tree_map(
            lambda l: jnp.where(ok, l / safe.astype(l.dtype), 0 * l), xi
        )
        Q = bs.set(Q, i, xi)
        C = C.at[i, i].set(jnp.where(ok, nrm.astype(cdt), 0))
        valid = valid.at[i].set(ok)

    # compact: move valid columns first (stable order)
    order = jnp.argsort(~valid, stable=True)
    Q = jax.tree_util.tree_map(lambda l: l[order], Q)
    C = C[order, :]
    rank = jnp.sum(valid.astype(jnp.int32)).astype(jnp.int32)
    return Q, C, rank


def initialize(
    X0: PyTree,
    mcap: int,
    coeff_dtype,
    qr_tol,
    space: VectorSpace = STANDARD,
) -> BlockLanczosState:
    """Orthonormalize the starting block (reference ``initialize``,
    ``src/factorizations/blocklanczos.jl:159-198``)."""
    b = jax.tree_util.tree_leaves(X0)[0].shape[0]
    Q, C, r = block_qr(X0, qr_tol, space)
    V = bs.alloc(bs.get(Q, 0), mcap + b)
    H = jnp.zeros((mcap + b, mcap + b), coeff_dtype)
    return BlockLanczosState(
        V=V, H=H, X=Q, r=r, k=jnp.int32(0),
        beta=jnp.ones((), jnp.finfo(coeff_dtype).dtype),
    )


def expand(
    op_apply,
    state: BlockLanczosState,
    qr_tol,
    space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> BlockLanczosState:
    """One block step: commit ``X`` at ``[k, k+b)``, apply ``A`` to the block,
    orthogonalize against the (committed + current) basis, rank-revealing QR →
    next block.  Reference ``block_lanczosrecurrence``
    (``src/factorizations/blocklanczos.jl:242-263``)."""
    V, H, X, r, k, _ = state
    b = jax.tree_util.tree_leaves(X)[0].shape[0]
    mcapb = H.shape[0]
    ki = jnp.asarray(k, jnp.int32)

    # commit the current block into slots [k, k+b) (zero tail gets overwritten
    # by the next commit since k only advances by r)
    def commit(lV, lX):
        return jax.lax.dynamic_update_slice(
            lV, lX.astype(lV.dtype), (ki,) + (jnp.int32(0),) * (lV.ndim - 1)
        )

    V = jax.tree_util.tree_map(commit, V, X)
    kr = k + r  # new committed count

    # apply the operator to the whole block (batched)
    W = jax.vmap(op_apply)(X)

    # project against all committed vectors (two CGS passes)
    M = jnp.zeros((mcapb, b), H.dtype)
    for _ in range(2):
        Mi = bs.gram(V, W, space)  # (mcap+b, b)
        rows = jax.lax.broadcasted_iota(jnp.int32, Mi.shape, 0)
        Mi = jnp.where(rows < kr, Mi, 0)
        W = _block_axpy(W, V, Mi)
        M = M + Mi.astype(H.dtype)

    # H column block: columns k..k+b-1, rows < k+r
    H = jax.lax.dynamic_update_slice(H, M, (jnp.int32(0), ki))
    # Hermitian mirror: rows k..k+b-1 (couplings to older blocks + diagonal)
    H = jax.lax.dynamic_update_slice(H, M.conj().T, (ki, jnp.int32(0)))

    # next block via rank-revealing QR
    Q, C, rnew = block_qr(W, qr_tol, space)
    # coupling rows: H[kr + j, k + i] = C[j, i]
    H = jax.lax.dynamic_update_slice(
        H, C.astype(H.dtype), (jnp.asarray(kr, jnp.int32), ki)
    )
    # mirror couplings for hermiticity of the buffer
    H = jax.lax.dynamic_update_slice(
        H, C.conj().T.astype(H.dtype), (ki, jnp.asarray(kr, jnp.int32))
    )
    beta = jnp.sqrt(jnp.maximum(jnp.sum(jnp.abs(C) ** 2), 0)).astype(state.beta.dtype)
    from ..info import EACHITERATION, log_if

    log_if(
        verbosity, EACHITERATION + 1,
        "BlockLanczos expansion to dimension {k}: subspace normres = {b}",
        k=kr, b=beta,
    )
    return BlockLanczosState(V=V, H=H, X=Q, r=rnew, k=kr, beta=beta)
