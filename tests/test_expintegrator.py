"""exponentiate / expintegrator tests, mirroring ``test/expintegrator.jl``.

Oracle: dense ``exp(tA)`` columnwise and φ-functions via their Taylor series
(the reference uses an augmented-matrix dense oracle,
``test/expintegrator.jl:1-13``)."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import N, hermitize, n, precision, rand_mat, rand_vec


def dense_expm(M):
    w, V = np.linalg.eig(M)
    return (V * np.exp(w)) @ np.linalg.inv(V)


def phi_mat(M, j, terms=60):
    """φ_j(M) by Taylor series Σ_k M^k/(k+j)!."""
    out = np.zeros_like(M)
    term = np.eye(M.shape[0], dtype=M.dtype)
    import math

    for k_ in range(terms):
        out = out + term / math.factorial(k_ + j)
        term = term @ M
    return out


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("herm", [True, False])
def test_exponentiate_full(dtype, herm):
    rng = np.random.default_rng(31)
    A = rand_mat(rng, n, n, dtype)
    if herm:
        A = hermitize(A)
    v = rand_vec(rng, n, dtype)
    t = 1.3
    tol = precision(dtype)
    y, info = kk.exponentiate(A, t, jnp.asarray(v), tol=tol, krylovdim=n + 2,
                              ishermitian=herm)
    want = dense_expm(t * A) @ v
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(y), want, atol=1e-8 * np.linalg.norm(want))


def test_exponentiate_negative_and_complex_time():
    rng = np.random.default_rng(32)
    A = hermitize(rand_mat(rng, n, n, np.complex128))
    v = rand_vec(rng, n, np.complex128)
    for t in (-0.7, 1j * 0.9, -0.3 + 0.4j):
        y, info = kk.exponentiate(A, t, jnp.asarray(v), tol=1e-12,
                                  krylovdim=n + 2, ishermitian=True)
        want = dense_expm(t * A) @ v
        assert np.allclose(np.asarray(y), want, atol=1e-8), f"t={t}"


def test_exponentiate_iterative_restarts():
    rng = np.random.default_rng(33)
    A = hermitize(rand_mat(rng, N, N, np.float64))
    v = rand_vec(rng, N, np.float64)
    t = 6.0
    y, info = kk.exponentiate(A, t, jnp.asarray(v), tol=1e-10, krylovdim=10,
                              maxiter=200, ishermitian=True)
    want = dense_expm(t * A) @ v
    assert int(info.numiter) > 1  # genuine substepping/restarts
    assert np.allclose(np.asarray(y), want, atol=1e-6 * np.linalg.norm(want))


@pytest.mark.parametrize("p", [1, 2, 3])
def test_expintegrator_phi_combination(p):
    rng = np.random.default_rng(34)
    dtype = np.float64
    A = rand_mat(rng, n, n, dtype)
    us = [rand_vec(rng, n, dtype) for _ in range(p + 1)]
    t = 0.9
    y, info = kk.expintegrator(
        A, t, tuple(jnp.asarray(u) for u in us), tol=1e-12, krylovdim=n + p + 2
    )
    want = phi_mat(t * A, 0) @ us[0]
    for j in range(1, p + 1):
        want = want + t**j * (phi_mat(t * A, j) @ us[j])
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(y), want, atol=1e-8 * np.linalg.norm(want))


def test_expintegrator_ode_solution():
    """y(t) solves ẋ = A x + u₁ with x(0) = u₀ → y = e^{tA}u₀ + tφ₁(tA)u₁."""
    rng = np.random.default_rng(35)
    A = rand_mat(rng, n, n, np.float64)
    u0 = rand_vec(rng, n, np.float64)
    u1 = rand_vec(rng, n, np.float64)
    t = 1.1
    y, info = kk.expintegrator(A, t, (jnp.asarray(u0), jnp.asarray(u1)),
                               tol=1e-12, krylovdim=n + 3)
    want = dense_expm(t * A) @ u0 + t * (phi_mat(t * A, 1) @ u1)
    assert np.allclose(np.asarray(y), want, atol=1e-8)


def test_expintegrator_fixed_point():
    """t=Inf with (u₀, u₁): converge to the fixed point −A⁻¹u₁ for stable A
    (reference src/matrixfun/expintegrator.jl:127-135)."""
    rng = np.random.default_rng(36)
    B = rand_mat(rng, n, n, np.float64)
    A = -(B @ B.T + np.eye(n))  # negative definite → stable, invertible
    u0 = rand_vec(rng, n, np.float64)
    u1 = rand_vec(rng, n, np.float64)
    y, info = kk.expintegrator(
        A, np.inf, (jnp.asarray(u0), jnp.asarray(u1)),
        tol=1e-10, krylovdim=n + 2, maxiter=100, ishermitian=True,
    )
    want = -np.linalg.solve(A, u1)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(y), want, atol=1e-7)


def test_exponentiate_t_zero():
    rng = np.random.default_rng(37)
    A = rand_mat(rng, n, n, np.float64)
    v = rand_vec(rng, n, np.float64)
    y, info = kk.exponentiate(A, 0.0, jnp.asarray(v), tol=1e-12, krylovdim=n)
    assert np.allclose(np.asarray(y), v)


def test_exponentiate_numops_reference_parity():
    """Exact numops parity with the reference's counting (hand-derived from
    src/matrixfun/expintegrator.jl:110,151,176,287,291,318): 1 probe apply
    (reused as w[2]) + 1 initialize + (krylovdim-1) expansions per cycle, and
    +2 per substep restart (p=1: one w rebuild + one re-initialize)."""
    rng = np.random.default_rng(77)
    A = rng.standard_normal((40, 40))
    A = A + A.T
    v = rng.standard_normal(40)
    # single substep: 1 + 1 + 19 = 21 applies, numiter = 1
    w, info = kk.exponentiate(
        jnp.asarray(A), 0.01, jnp.asarray(v), krylovdim=20, tol=1e-12,
        ishermitian=True,
    )
    assert int(info.numops) == 21
    assert int(info.numiter) == 1
    # multi-substep: first cycle 11 applies, each later cycle 2 + 9 = 11
    w2, info2 = kk.exponentiate(
        jnp.asarray(A), 1.0, jnp.asarray(v), krylovdim=10, tol=1e-10,
        maxiter=30, ishermitian=True,
    )
    assert int(info2.numops) == 11 * int(info2.numiter)
