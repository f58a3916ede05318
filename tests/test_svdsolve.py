"""svdsolve tests, mirroring the reference ``test/svdsolve.jl``.

Oracle: dense ``np.linalg.svd`` (the reference compares against ``svdvals``,
``test/svdsolve.jl``).  Full problems (n×n, one iteration), rectangular
problems, iterative problems with restarts (2N×N), both ``which`` values, and
``(f, fadjoint)`` operator encodings.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import DTYPES, N, n, precision, rand_mat, rand_vec


@pytest.mark.parametrize("dtype", DTYPES)
def test_svd_full_square(dtype):
    rng = np.random.default_rng(11)
    A = rand_mat(rng, n, n, dtype)
    x0 = rand_vec(rng, n, dtype)
    tol = precision(dtype)
    vals, lvecs, rvecs, info = kk.svdsolve(
        A, x0, howmany=n, which="LR", krylovdim=n, tol=tol
    )
    want = np.linalg.svd(A, compute_uv=False)
    assert np.allclose(np.asarray(vals), want, atol=10 * tol)
    # residual identity A v ≈ σ u for every triplet
    U = np.asarray(lvecs).T
    V = np.asarray(rvecs).T
    assert np.linalg.norm(A @ V - U * np.asarray(vals)) <= 20 * tol * max(want)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("which", ["LR", "SR"])
def test_svd_rectangular(dtype, which):
    rng = np.random.default_rng(12)
    rows, cols_ = 2 * n, n
    A = rand_mat(rng, rows, cols_, dtype)
    # start in range(A): a left-null x0 component stalls :SR (see solver docs;
    # the reference's tests start from A[:, 1], test/svdsolve.jl:13)
    x0 = A @ rand_vec(rng, cols_, dtype)
    tol = precision(dtype)
    howmany = 4
    vals, lvecs, rvecs, info = kk.svdsolve(
        A, x0, howmany=howmany, which=which, krylovdim=15, tol=tol, maxiter=100
    )
    want = np.linalg.svd(A, compute_uv=False)
    want = np.sort(want)[::-1] if which == "LR" else np.sort(want)
    assert int(info.converged) >= howmany
    assert np.allclose(np.asarray(vals), want[:howmany], atol=50 * tol)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_svd_iterative_restarts(dtype):
    rng = np.random.default_rng(13)
    A = rand_mat(rng, 2 * N, N, dtype)
    x0 = rand_vec(rng, 2 * N, dtype)
    tol = precision(dtype)
    howmany = 4
    vals, lvecs, rvecs, info = kk.svdsolve(
        A, x0, howmany=howmany, which="LR", krylovdim=25, tol=tol, maxiter=100
    )
    want = np.linalg.svd(A, compute_uv=False)[:howmany]
    assert int(info.converged) >= howmany
    assert np.allclose(np.asarray(vals), want, atol=100 * tol)
    # orthonormality of returned triplet bases
    U = np.asarray(lvecs).T
    V = np.asarray(rvecs).T
    assert np.linalg.norm(U.conj().T @ U - np.eye(howmany)) <= 1e-6
    assert np.linalg.norm(V.conj().T @ V - np.eye(howmany)) <= 1e-6
    assert np.linalg.norm(A @ V - U * np.asarray(vals)) <= 100 * tol


def test_svd_tuple_operator():
    """(f, fadjoint) operator encoding (reference src/apply.jl:14-19)."""
    rng = np.random.default_rng(14)
    dtype = np.complex128
    A = rand_mat(rng, 2 * n, n, dtype)
    Aj = jnp.asarray(A)
    x0 = rand_vec(rng, 2 * n, dtype)
    tol = precision(dtype)
    vals, lvecs, rvecs, info = kk.svdsolve(
        (lambda x: Aj @ x, lambda y: Aj.conj().T @ y),
        x0,
        howmany=3,
        which="LR",
        krylovdim=15,
        tol=tol,
        maxiter=60,
    )
    want = np.linalg.svd(A, compute_uv=False)[:3]
    assert np.allclose(np.asarray(vals), want, atol=100 * tol)


def test_svd_default_x0_and_which_validation():
    rng = np.random.default_rng(15)
    A = rand_mat(rng, n, n, np.float64)
    vals, *_ = kk.svdsolve(A, howmany=2, krylovdim=n, tol=1e-10)
    want = np.linalg.svd(A, compute_uv=False)[:2]
    assert np.allclose(np.asarray(vals), want, atol=1e-8)
    with pytest.raises(ValueError):
        kk.svdsolve(A, howmany=1, which="LM")


def test_gkl_adjoint_compatibility_check():
    """Inconsistent (f, fadjoint) pairs must be rejected at init (reference
    src/factorizations/gkl.jl:192)."""
    rng = np.random.default_rng(300)
    A = jnp.asarray(rng.standard_normal((20, 20)))
    B = jnp.asarray(rng.standard_normal((20, 20)))  # NOT A's adjoint
    x0 = jnp.asarray(rng.standard_normal(20))
    with pytest.raises(ValueError, match="not compatible"):
        kk.svdsolve((lambda x: A @ x, lambda y: B.T @ y), x0, 2, "LR")
    with pytest.raises(ValueError, match="not compatible"):
        kk.lssolve((lambda x: A @ x, lambda y: B.T @ y), x0)
    # a CONSISTENT pair passes the guard and solves
    s, _, _, info = kk.svdsolve(
        (lambda x: A @ x, lambda y: A.T @ y), x0, 2, "LR", tol=1e-10
    )
    assert np.allclose(
        np.asarray(s), np.linalg.svd(np.asarray(A), compute_uv=False)[:2], atol=1e-8
    )
