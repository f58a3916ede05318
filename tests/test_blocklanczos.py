"""BlockLanczos tests, mirroring the reference ``test/eigsolve.jl:471-794`` and
``test/block.jl``: degenerate eigenvalues resolved with correct multiplicity."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import N, hermitize, mat_with_eigrepition, n, precision, rand_mat, rand_vec


def test_block_qr_rank_detection():
    from krylovkit_tpu.factorizations.blocklanczos import block_qr

    rng = np.random.default_rng(51)
    X = rng.standard_normal((4, 20))
    X[3] = X[0] + X[1]  # rank 3
    Q, C, r = block_qr(jnp.asarray(X), 1e-10)
    assert int(r) == 3
    Qn = np.asarray(Q)
    G = Qn @ Qn.T
    assert np.allclose(G[:3, :3], np.eye(3), atol=1e-12)
    assert np.allclose(Qn[3], 0)
    # X = Cᵀ-weighted combination of Q rows
    assert np.allclose(np.asarray(C).T @ Qn, X, atol=1e-10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_block_eigsolve_degenerate(dtype):
    """Matrix with eigenvalue multiplicity 3 at the top: block method finds the
    full multiplicity (reference mat_with_eigrepition, test/testsetup.jl:46-58)."""
    rng = np.random.default_rng(52)
    A = mat_with_eigrepition(rng, N, 2, dtype)  # top eigenvalue ×3
    w_true = np.linalg.eigvalsh(A)[::-1]
    bsize = 4
    X0 = kk.Block([jnp.asarray(rand_vec(rng, N, dtype)) for _ in range(bsize)])
    howmany = 4
    vals, vecs, info = kk.eigsolve(
        A, X0, howmany, "LR", krylovdim=40, tol=1e-9, maxiter=100,
    )
    assert int(info.converged) >= howmany
    assert np.allclose(np.asarray(vals), w_true[:howmany], atol=1e-7)
    # eigenvector residuals
    V = np.asarray(vecs).T
    for i in range(howmany):
        v = V[:, i]
        assert np.linalg.norm(A @ v - np.asarray(vals)[i] * v) <= 1e-6


def test_block_eigsolve_full_small():
    rng = np.random.default_rng(53)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    X0 = kk.Block([jnp.asarray(rand_vec(rng, n, np.float64)) for _ in range(2)])
    vals, vecs, info = kk.eigsolve(A, X0, 3, "SR", krylovdim=n, tol=1e-10,
                                   maxiter=50)
    w_true = np.linalg.eigvalsh(A)
    assert np.allclose(np.asarray(vals), w_true[:3], atol=1e-8)


def test_block_explicit_alg():
    rng = np.random.default_rng(54)
    A = mat_with_eigrepition(rng, n, 1, np.float64)
    X0 = kk.Block([jnp.asarray(rand_vec(rng, n, np.float64)) for _ in range(2)])
    alg = kk.BlockLanczos(krylovdim=n, tol=1e-10, maxiter=50)
    vals, vecs, info = kk.eigsolve(A, X0, 2, "LR", alg=alg)
    w_true = np.linalg.eigvalsh(A)[::-1]
    assert np.allclose(np.asarray(vals), w_true[:2], atol=1e-8)
