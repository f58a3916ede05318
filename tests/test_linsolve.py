"""linsolve tests, mirroring the reference ``test/linsolve.jl``.

Small problems (n=10, krylovdim ≥ n: converge within one cycle) and iterative
problems (N=100 with restarts), across the scalar-type matrix, with shifts
``(a0, a1)``, algorithm auto-selection, pytree vectors, and ``reallinsolve``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import krylovkit_tpu as kk
from testsetup import (
    DTYPES,
    N,
    as_pytree,
    hermitize,
    n,
    precision,
    pytree_matvec,
    rand_mat,
    rand_vec,
)


def _resid(A, x, b, a0=0.0, a1=1.0):
    x = np.asarray(x)
    return np.linalg.norm(b - (a0 * x + a1 * (A @ x)))


@pytest.mark.parametrize("dtype", DTYPES)
def test_cg_posdef_full(dtype):
    rng = np.random.default_rng(1)
    B = rand_mat(rng, n, n, dtype)
    A = B @ B.conj().T + np.eye(n, dtype=dtype)  # Hermitian posdef
    b = rand_vec(rng, n, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(A, b, tol=float(tol))
    assert int(info.converged) == 1
    assert _resid(A, x, b) <= 2 * tol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_cg_iterative(dtype):
    rng = np.random.default_rng(2)
    B = rand_mat(rng, N, N, dtype)
    A = B @ B.conj().T + 2 * np.eye(N, dtype=dtype)
    b = rand_vec(rng, N, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(A, b, tol=float(tol), maxiter=2 * N)
    assert int(info.converged) == 1
    assert _resid(A, x, b) <= 5 * tol


@pytest.mark.parametrize("dtype", DTYPES)
def test_gmres_general_full(dtype):
    rng = np.random.default_rng(3)
    A = rand_mat(rng, n, n, dtype) + 2 * np.eye(n, dtype=dtype)
    b = rand_vec(rng, n, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(A, b, tol=float(tol))
    assert int(info.converged) == 1
    assert _resid(A, x, b) <= 2 * tol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_gmres_iterative_restarts(dtype):
    rng = np.random.default_rng(4)
    A = rand_mat(rng, N, N, dtype) + 2 * np.eye(N, dtype=dtype)
    b = rand_vec(rng, N, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(A, b, tol=float(tol), krylovdim=20, maxiter=50)
    assert int(info.converged) == 1
    assert int(info.numiter) > 1  # genuine restarts
    assert _resid(A, x, b) <= 5 * tol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_shifted_solve(dtype):
    """(a0 + a1 A) x = b with nontrivial shift (reference linsolve a0/a1 API)."""
    rng = np.random.default_rng(5)
    A = rand_mat(rng, n, n, dtype)
    b = rand_vec(rng, n, dtype)
    a0, a1 = 3.0, 0.5
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(A, b, a0=a0, a1=a1, tol=float(tol))
    assert int(info.converged) == 1
    assert _resid(A, x, b, a0, a1) <= 2 * tol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_minres_hermitian_indefinite(dtype):
    rng = np.random.default_rng(6)
    A = hermitize(rand_mat(rng, n, n, dtype))  # indefinite
    b = rand_vec(rng, n, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    # auto-selection: Hermitian + not posdef → MINRES
    x, info = kk.linsolve(A, b, tol=float(tol))
    assert int(info.converged) == 1
    assert _resid(A, x, b) <= 5 * tol
    # explicit algorithm
    x2, info2 = kk.linsolve(A, b, alg=kk.MINRES(tol=float(tol), maxiter=100))
    assert int(info2.converged) == 1
    assert _resid(A, x2, b) <= 5 * tol


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_bicgstab(dtype):
    rng = np.random.default_rng(7)
    A = rand_mat(rng, N, N, dtype) + 2 * np.eye(N, dtype=dtype)
    b = rand_vec(rng, N, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.linsolve(
        A, b, alg=kk.BiCGStab(tol=float(tol), maxiter=4 * N)
    )
    assert int(info.converged) == 1
    assert _resid(A, x, b) <= 10 * tol


def test_pytree_callable_operator():
    """Mode matrix: operator as callable on a two-leaf pytree (reference
    :vector/:inplace/:outplace wrappers, test/testsetup.jl:65-98)."""
    rng = np.random.default_rng(8)
    dtype = np.complex128
    A = rand_mat(rng, N, N, dtype) + 2 * np.eye(N, dtype=dtype)
    bvec = rand_vec(rng, N, dtype)
    b = as_pytree(bvec)
    tol = precision(dtype) * np.linalg.norm(bvec)
    x, info = kk.linsolve(pytree_matvec(A), b, tol=float(tol), krylovdim=30)
    assert int(info.converged) == 1
    xflat = np.concatenate([np.asarray(x["a"]), np.asarray(x["b"])])
    assert _resid(A, xflat, bvec) <= 5 * tol


def test_reallinsolve_rlinear_map():
    """R-linear map on complex vectors: f(x) = A x + B conj(x) (reference
    reallinsolve, test/linsolve.jl real-linear cases)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    dtype = np.complex128
    A = rand_mat(rng, n, n, dtype) + 4 * np.eye(n, dtype=dtype)
    B = 0.1 * rand_mat(rng, n, n, dtype)
    b = rand_vec(rng, n, dtype)

    def f(x):
        return jnp.asarray(A) @ x + jnp.asarray(B) @ jnp.conj(x)

    tol = precision(dtype) * np.linalg.norm(b)
    x, info = kk.reallinsolve(f, jnp.asarray(b), tol=float(tol), krylovdim=2 * n)
    assert int(info.converged) == 1
    x = np.asarray(x)
    assert np.linalg.norm(b - (A @ x + B @ np.conj(x))) <= 10 * tol


def test_zero_rhs_immediate():
    b = np.zeros(n)
    x, info = kk.linsolve(np.eye(n), b, tol=1e-12)
    assert int(info.converged) == 1
    assert int(info.numiter) == 0
    assert np.allclose(np.asarray(x), 0)


def test_identity_opcount():
    """lssolve-style identity sanity: solving I x = b must converge instantly
    (reference test/issues.jl:22-29 exactness-of-counters spirit)."""
    rng = np.random.default_rng(10)
    b = rand_vec(rng, n, np.float64)
    x, info = kk.linsolve(np.eye(n), b, tol=1e-10)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), b, atol=1e-10)


def test_gmres_warm_start():
    """x0 warm start: starting near the solution converges in fewer ops."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    A = rand_mat(rng, N, N, np.float64) + 2 * np.eye(N)
    b = rand_vec(rng, N, np.float64)
    xstar = np.linalg.solve(A, b)
    tol = 1e-10
    x_cold, info_cold = kk.linsolve(A, b, tol=tol, krylovdim=30, maxiter=100)
    x0 = jnp.asarray(xstar + 1e-8 * rand_vec(rng, N, np.float64))
    x_warm, info_warm = kk.linsolve(A, b, x0, tol=tol, krylovdim=30, maxiter=100)
    assert int(info_warm.converged) == 1
    assert int(info_warm.numops) < int(info_cold.numops)
    assert np.allclose(np.asarray(x_warm), xstar, atol=1e-8)


def test_alg_rrule_passthrough():
    """Gradients with an explicit alg_rrule (different from the primal alg)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    A = rand_mat(rng, n, n, np.float64) + 2 * np.eye(n)
    b = rand_vec(rng, n, np.float64)
    c = rand_vec(rng, n, np.float64)

    def loss(A):
        x, _ = kk.linsolve(
            A, b, tol=1e-12, krylovdim=n,
            alg_rrule=kk.BiCGStab(tol=1e-12, maxiter=300),
        )
        return jnp.vdot(c, x)

    g = jax.grad(loss)(jnp.asarray(A))
    g2 = jax.grad(lambda A: jnp.vdot(c, jnp.linalg.solve(A, jnp.asarray(b))))(
        jnp.asarray(A)
    )
    assert np.allclose(np.asarray(g), np.asarray(g2), atol=1e-7)


def test_explicit_alg_tol_respected():
    """An explicit algorithm object's tol must not be overridden by the
    default tolerance resolution (regression: alg.tol was replaced by
    max(atol_default, rtol_default*|b|), making loose user tolerances
    unreachable in f32)."""
    rng = np.random.default_rng(30)
    A = rand_mat(rng, 40, 40, np.float64)
    A = A @ A.conj().T + 10 * np.eye(40)
    b = jnp.asarray(rand_vec(rng, 40, np.float64))
    x, info = kk.linsolve(jnp.asarray(A), b, alg=kk.CG(tol=1e-3, maxiter=500))
    assert int(info.converged) == 1
    assert int(info.numiter) < 100  # loose tol -> early stop, not maxiter
    # explicit tol keyword still wins over the alg's
    x2, info2 = kk.linsolve(jnp.asarray(A), b, tol=1e-10,
                            alg=kk.CG(tol=1e-3, maxiter=500))
    assert float(info2.normres) <= 1e-9
