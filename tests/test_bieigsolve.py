"""bieigsolve (BiArnoldi) tests, mirroring the reference ``test/bieigsolve.jl``:
simultaneous left/right eigenpairs, biorthogonality, residual identities."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import N, eig_close, n, precision, rand_mat, rand_vec


def eig_close_unordered(got, want, tol):
    # greedy nearest matching: robust to sort-order flips of conjugate pairs
    return eig_close(got, want, tol)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_bieig_full(dtype):
    rng = np.random.default_rng(61)
    A = rand_mat(rng, n, n, dtype)
    v0 = rand_vec(rng, n, dtype)
    w0 = rand_vec(rng, n, dtype)
    howmany = 3
    vals, (vecsV, vecsW), (infoV, infoW) = kk.bieigsolve(
        A, jnp.asarray(v0), jnp.asarray(w0), howmany, "LM",
        krylovdim=n, tol=1e-10, maxiter=100,
    )
    wA = np.linalg.eigvals(A)
    wA = wA[np.argsort(-np.abs(wA))]
    assert int(infoV.converged) >= howmany
    assert eig_close_unordered(np.asarray(vals), wA[:howmany], 1e-7)
    V = np.asarray(vecsV).T
    W = np.asarray(vecsW).T
    lam = np.asarray(vals)
    # right eigenvectors of A, left eigenvectors = eigenvectors of Aᴴ w/ conj λ
    for i in range(howmany):
        assert np.linalg.norm(A @ V[:, i] - lam[i] * V[:, i]) <= 1e-6
        assert np.linalg.norm(A.conj().T @ W[:, i] - np.conj(lam[i]) * W[:, i]) <= 1e-6
    # biorthogonality WᴴV diagonal (nonzero diag)
    G = W.conj().T @ V
    off = G - np.diag(np.diagonal(G))
    assert np.linalg.norm(off) <= 1e-6 * max(1.0, np.linalg.norm(np.diagonal(G)))


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_bieig_iterative(dtype):
    rng = np.random.default_rng(62)
    A = rand_mat(rng, N, N, dtype) + np.diag(np.linspace(0, 2, N)).astype(dtype)
    v0 = rand_vec(rng, N, dtype)
    w0 = rand_vec(rng, N, dtype)
    howmany = 2
    vals, (vecsV, vecsW), (infoV, infoW) = kk.bieigsolve(
        A, jnp.asarray(v0), jnp.asarray(w0), howmany, "LM",
        krylovdim=25, tol=1e-9, maxiter=200,
    )
    wA = np.linalg.eigvals(A)
    wA = wA[np.argsort(-np.abs(wA))]
    assert int(infoV.converged) >= howmany
    assert eig_close_unordered(np.asarray(vals), wA[:howmany], 1e-6)
    V = np.asarray(vecsV).T
    W = np.asarray(vecsW).T
    lam = np.asarray(vals)
    for i in range(howmany):
        nv = np.linalg.norm(V[:, i])
        assert np.linalg.norm(A @ V[:, i] - lam[i] * V[:, i]) <= 1e-6 * max(nv, 1)
        nw = np.linalg.norm(W[:, i])
        assert (
            np.linalg.norm(A.conj().T @ W[:, i] - np.conj(lam[i]) * W[:, i])
            <= 1e-6 * max(nw, 1)
        )


def test_bieig_default_start():
    rng = np.random.default_rng(63)
    A = rand_mat(rng, n, n, np.float64)
    vals, (vV, vW), (iV, iW) = kk.bieigsolve(A, howmany=2, krylovdim=n,
                                             tol=1e-10, maxiter=60)
    wA = np.linalg.eigvals(A)
    wA = wA[np.argsort(-np.abs(wA))]
    assert eig_close_unordered(np.asarray(vals), wA[:2], 1e-7)
