"""lssolve (LSMR) tests, mirroring the reference ``test/lssolve.jl`` and the
op-count regression ``test/issues.jl:22-29``."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import DTYPES, N, n, precision, rand_mat, rand_vec


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_lsmr_overdetermined(dtype):
    rng = np.random.default_rng(21)
    A = rand_mat(rng, 2 * n, n, dtype)
    b = rand_vec(rng, 2 * n, dtype)
    tol = precision(dtype)
    x, info = kk.lssolve(A, b, tol=tol, maxiter=200)
    want, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), want, atol=100 * tol)
    # normal-equation residual is the convergence measure
    r = b - A @ np.asarray(x)
    assert np.linalg.norm(A.conj().T @ r) <= 100 * tol


@pytest.mark.parametrize("dtype", [np.float64])
def test_lsmr_regularized(dtype):
    rng = np.random.default_rng(22)
    A = rand_mat(rng, 2 * n, n, dtype)
    b = rand_vec(rng, 2 * n, dtype)
    lam = 0.7
    tol = precision(dtype)
    x, info = kk.lssolve(A, b, lam, tol=tol, maxiter=200)
    want = np.linalg.solve(
        A.conj().T @ A + lam**2 * np.eye(n, dtype=dtype), A.conj().T @ b
    )
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), want, atol=100 * tol)


def test_lsmr_iterative_large():
    rng = np.random.default_rng(23)
    dtype = np.float64
    A = rand_mat(rng, 2 * N, N, dtype)
    b = rand_vec(rng, 2 * N, dtype)
    tol = precision(dtype)
    x, info = kk.lssolve(A, b, tol=tol, maxiter=4 * N)
    want, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), want, atol=1e-7)


def test_lsmr_identity_opcount():
    """lssolve(I, b): converged=1, numiter=1, numops=2 (reference
    test/issues.jl:22-29)."""
    b = jnp.asarray(np.ones(2))
    x, info = kk.lssolve(np.eye(2), b, tol=1e-12)
    assert int(info.converged) == 1
    assert int(info.numiter) == 1
    assert int(info.numops) == 2
    assert np.allclose(np.asarray(x), 1.0)


def test_lsmr_tuple_operator_rectangular():
    rng = np.random.default_rng(24)
    dtype = np.complex128
    A = rand_mat(rng, 3 * n, n, dtype)
    Aj = jnp.asarray(A)
    b = rand_vec(rng, 3 * n, dtype)
    tol = precision(dtype)
    x, info = kk.lssolve(
        (lambda x: Aj @ x, lambda y: Aj.conj().T @ y), b, tol=tol, maxiter=200
    )
    want, *_ = np.linalg.lstsq(A, b, rcond=None)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), want, atol=100 * tol)


def test_reallssolve_rlinear():
    rng = np.random.default_rng(25)
    dtype = np.complex128
    A = rand_mat(rng, n, n, dtype) + 3 * np.eye(n, dtype=dtype)
    B = 0.2 * rand_mat(rng, n, n, dtype)
    b = rand_vec(rng, n, dtype)
    tol = precision(dtype)

    def f(x):
        return jnp.asarray(A) @ x + jnp.asarray(B) @ jnp.conj(x)

    def fadj(y):
        # real-adjoint of x ↦ Ax + B conj(x) under Re⟨·,·⟩: y ↦ Aᴴy + Bᵀconj(y)
        return jnp.asarray(A).conj().T @ y + jnp.asarray(B).T @ jnp.conj(y)

    x, info = kk.reallssolve((f, fadj), jnp.asarray(b), tol=tol, maxiter=300)
    assert int(info.converged) == 1
    x = np.asarray(x)
    # solution of the square real-linear system: residual of f(x) - b small
    assert np.linalg.norm(A @ x + B @ np.conj(x) - b) <= 1e-6
