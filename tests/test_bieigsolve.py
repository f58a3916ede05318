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


# ---------------------------------------------------------------------------
# Reference-parity matrix (test/bieigsolve.jl:1-10): dtype × orth incl. f32 at
# eps^(2/3), biorthogonality WᴴV ≈ diag, and complex SI/LI sort modes.
# ---------------------------------------------------------------------------

import jax
from krylovkit_tpu import cgs2, mgs2, cgsir, mgsir
from testsetup import as_pytree, pytree_matvec, precision

ORTHS = {"cgs2": cgs2, "mgs2": mgs2, "cgsir": cgsir, "mgsir": mgsir}


@pytest.mark.parametrize("dtype", [np.float32, np.float64,
                                   np.complex64, np.complex128])
@pytest.mark.parametrize("orth", list(ORTHS))
def test_bieig_full_matrix(dtype, orth):
    rng = np.random.default_rng(64)
    A = rand_mat(rng, n, n, dtype)
    v0 = rand_vec(rng, n, dtype)
    w0 = rand_vec(rng, n, dtype)
    tol = precision(dtype)
    howmany = 3
    vals, (vecsV, vecsW), (infoV, infoW) = kk.bieigsolve(
        A, jnp.asarray(v0), jnp.asarray(w0), howmany, "LM",
        krylovdim=n, tol=tol, maxiter=30, orth=ORTHS[orth],
    )
    wA = np.linalg.eigvals(A.astype(np.complex128))
    wA = wA[np.argsort(-np.abs(wA))]
    assert int(infoV.converged) >= howmany
    # each returned value is in the spectrum, with the right magnitude rank
    # (a conjugate pair straddling howmany may return either partner first)
    got = np.asarray(vals)[:howmany]
    atol = 500 * tol * max(1.0, float(np.abs(wA[0])))
    for lam_i in got:
        assert np.min(np.abs(wA - lam_i)) <= atol
    assert np.allclose(
        np.sort(np.abs(got)), np.sort(np.abs(wA[:howmany])), atol=atol
    )
    V = np.asarray(vecsV).T[:, :howmany]
    W = np.asarray(vecsW).T[:, :howmany]
    lam = np.asarray(vals)[:howmany]
    for i in range(howmany):
        assert np.linalg.norm(A @ V[:, i] - lam[i] * V[:, i]) <= 500 * tol
        assert (
            np.linalg.norm(A.conj().T @ W[:, i] - np.conj(lam[i]) * W[:, i])
            <= 500 * tol
        )
    # biorthogonality: WᴴV diagonal
    G = W.conj().T @ V
    off = G - np.diag(np.diagonal(G))
    assert np.linalg.norm(off) <= 500 * tol * max(
        1.0, float(np.linalg.norm(np.diagonal(G)))
    )


@pytest.mark.parametrize("which", ["SI", "LI"])
def test_bieig_complex_imag_sorts(which):
    """:SI/:LI modes exist only for complex scalars
    (reference test/bieigsolve.jl:107-138)."""
    rng = np.random.default_rng(65)
    dtype = np.complex128
    A = rand_mat(rng, n, n, dtype)
    v0 = rand_vec(rng, n, dtype)
    w0 = rand_vec(rng, n, dtype)
    howmany = 3
    vals, (vecsV, vecsW), (infoV, infoW) = kk.bieigsolve(
        A, jnp.asarray(v0), jnp.asarray(w0), howmany, which,
        krylovdim=n, tol=1e-10, maxiter=30,
    )
    wA = np.linalg.eigvals(A)
    order = np.argsort(np.imag(wA)) if which == "SI" else np.argsort(-np.imag(wA))
    assert int(infoV.converged) >= howmany
    assert eig_close(np.asarray(vals), wA[order][:howmany], 1e-6)


def test_bieig_pytree_mode():
    rng = np.random.default_rng(66)
    dtype = np.float64
    A = rand_mat(rng, n, n, dtype)
    v0 = rand_vec(rng, n, dtype)
    w0 = rand_vec(rng, n, dtype)
    f = pytree_matvec(A)
    fH = pytree_matvec(A.conj().T)
    vals, (vecsV, vecsW), (infoV, infoW) = kk.bieigsolve(
        (f, fH), as_pytree(v0), as_pytree(w0), 2, "LM",
        krylovdim=n, tol=1e-10, maxiter=30,
    )
    wA = np.linalg.eigvals(A)
    wA = wA[np.argsort(-np.abs(wA))]
    assert int(infoV.converged) >= 2
    assert eig_close(np.asarray(vals), wA[:2], 1e-6)
    vV0 = jax.tree_util.tree_map(lambda l: l[0], vecsV)
    v = np.concatenate([np.asarray(vV0["a"]), np.asarray(vV0["b"])])
    lam = complex(np.asarray(vals)[0])
    assert (
        np.linalg.norm(A.astype(complex) @ v - lam * v)
        <= 1e-6 * np.linalg.norm(v)
    )
