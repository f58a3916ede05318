"""geneigsolve (GolubYe) tests, mirroring the reference ``test/geneigsolve.jl``.

Oracle: dense generalized Hermitian eig via Cholesky reduction."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import DTYPES, N, hermitize, n, precision, rand_mat, rand_vec


def dense_geneig(A, B):
    L = np.linalg.cholesky(B)
    Li = np.linalg.inv(L)
    C = Li @ A @ Li.conj().T
    w, Y = np.linalg.eigh((C + C.conj().T) / 2)
    X = Li.conj().T @ Y
    return w, X


def make_pencil(rng, m, dtype):
    A = hermitize(rand_mat(rng, m, m, dtype))
    C = rand_mat(rng, m, m, dtype)
    B = C @ C.conj().T + 2 * np.eye(m, dtype=dtype)
    return A, B


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("which", ["SR", "LR"])
def test_geneig_full(dtype, which):
    rng = np.random.default_rng(41)
    A, B = make_pencil(rng, n, dtype)
    x0 = rand_vec(rng, n, dtype)
    tol = precision(dtype)
    howmany = 2
    vals, vecs, info = kk.geneigsolve(
        (A, B), jnp.asarray(x0), howmany, which, krylovdim=n, tol=tol, maxiter=50
    )
    w, _ = dense_geneig(A, B)
    want = w[:howmany] if which == "SR" else w[::-1][:howmany]
    assert int(info.converged) >= howmany
    assert np.allclose(np.asarray(vals), want, atol=100 * tol)
    # residual check: ||A v − λ B v|| small
    V = np.asarray(vecs).T
    for i in range(howmany):
        v = V[:, i]
        lam = float(np.real(np.asarray(vals)[i]))
        assert (
            np.linalg.norm(A @ v - lam * (B @ v)) <= 1e-5 * np.linalg.norm(v)
        )


def test_geneig_iterative():
    rng = np.random.default_rng(42)
    dtype = np.float64
    A, B = make_pencil(rng, N, dtype)
    x0 = rand_vec(rng, N, dtype)
    tol = 1e-8
    howmany = 2
    vals, vecs, info = kk.geneigsolve(
        (A, B), jnp.asarray(x0), howmany, "SR", krylovdim=25, tol=tol, maxiter=200
    )
    w, _ = dense_geneig(A, B)
    assert int(info.converged) >= howmany
    assert np.allclose(np.asarray(vals), w[:howmany], atol=1e-6)


def test_geneig_b_identity_matches_eigsolve():
    rng = np.random.default_rng(43)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    vals, vecs, info = kk.geneigsolve(
        (A, None), jnp.asarray(x0), 2, "SR", krylovdim=n, tol=1e-10, maxiter=60
    )
    w = np.linalg.eigvalsh(A)
    assert np.allclose(np.asarray(vals), w[:2], atol=1e-7)


def test_geneig_callable_pencil():
    rng = np.random.default_rng(44)
    A, B = make_pencil(rng, n, np.float64)
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    x0 = rand_vec(rng, n, np.float64)
    vals, vecs, info = kk.geneigsolve(
        (lambda x: Aj @ x, lambda x: Bj @ x),
        jnp.asarray(x0), 1, "SR", krylovdim=n, tol=1e-10, maxiter=60,
    )
    w, _ = dense_geneig(A, B)
    assert np.allclose(np.asarray(vals)[0], w[0], atol=1e-7)


# ---------------------------------------------------------------------------
# Reference-parity matrix (test/geneigsolve.jl:1-25): dtype × orth, incl. f32
# at eps^(2/3), with B-orthonormality and residual identities.
# ---------------------------------------------------------------------------

from krylovkit_tpu import cgs2, mgs2, cgsir, mgsir
from testsetup import as_pytree, pytree_matvec

ORTHS = {"cgs2": cgs2, "mgs2": mgs2, "cgsir": cgsir, "mgsir": mgsir}


@pytest.mark.parametrize("dtype", [np.float32, np.float64,
                                   np.complex64, np.complex128])
@pytest.mark.parametrize("orth", list(ORTHS))
def test_geneig_full_matrix(dtype, orth):
    rng = np.random.default_rng(45)
    A, B = make_pencil(rng, n, dtype)
    x0 = rand_vec(rng, n, dtype)
    tol = precision(dtype)
    howmany = n // 2
    vals, vecs, info = kk.geneigsolve(
        (A, B), jnp.asarray(x0), howmany, "SR",
        krylovdim=n, tol=tol, maxiter=3, orth=ORTHS[orth],
    )
    w, _ = dense_geneig(A.astype(np.complex128), B.astype(np.complex128))
    got = np.sort(np.real(np.asarray(vals[:howmany])))
    assert np.allclose(got, np.real(w[:howmany]), atol=500 * tol)
    # B-orthonormality U'BU ≈ I and residual A U ≈ B U diag(D)
    V = np.asarray(vecs).T[:, :howmany]
    D = np.real(np.asarray(vals[:howmany]))
    G = V.conj().T @ B @ V
    assert np.linalg.norm(G - np.eye(howmany)) <= 1000 * tol
    assert np.linalg.norm(A @ V - (B @ V) * D) <= 2000 * tol


def test_geneig_pytree_mode():
    """The reference's wrapped-vector modes → pytree operators here."""
    rng = np.random.default_rng(46)
    dtype = np.float64
    A, B = make_pencil(rng, n, dtype)
    x0 = rand_vec(rng, n, dtype)
    vals, vecs, info = kk.geneigsolve(
        (pytree_matvec(A), pytree_matvec(B)), as_pytree(x0), 2, "SR",
        krylovdim=n, tol=1e-10, maxiter=50,
    )
    w, _ = dense_geneig(A, B)
    assert int(info.converged) >= 2
    assert np.allclose(np.real(np.asarray(vals)), w[:2], atol=1e-7)
    # vecs come back as pytrees with the same structure
    v0 = jax.tree_util.tree_map(lambda l: l[0], vecs)
    v = np.concatenate([np.asarray(v0["a"]), np.asarray(v0["b"])])
    lam = float(np.real(np.asarray(vals)[0]))
    assert np.linalg.norm(A @ v - lam * (B @ v)) <= 1e-6 * np.linalg.norm(v)


import jax  # noqa: E402  (used by test_geneig_pytree_mode)
