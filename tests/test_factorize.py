"""Factorization contract tests, mirroring the reference ``test/factorize.jl``:
``A V ≈ V H + r b'`` identities, orthonormality, shrink round-trips."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import hermitize, n, rand_mat, rand_vec


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_lanczos_factorization_contract(dtype):
    rng = np.random.default_rng(81)
    A = hermitize(rand_mat(rng, n, n, dtype))
    x0 = rand_vec(rng, n, dtype)
    it = kk.LanczosIterator(jnp.asarray(A), jnp.asarray(x0), krylovdim=8)
    st = it.initialize()
    for _ in range(6):
        st = it.expand(st)
    k = int(st.k)
    V = np.asarray(st.V)
    # orthonormality of active basis (incl. residual direction)
    G = V[: k + 1].conj() @ V[: k + 1].T
    assert np.allclose(G, np.eye(k + 1), atol=1e-12)
    # tridiagonal factorization: A V = V T + beta * v_k e_k'
    H = np.asarray(st.H)
    L = np.tril(H)
    T = L + np.tril(H, -1).conj().T
    lhs = A @ V[:k].T
    rhs = V[:k].T @ T[:k, :k]
    resid = lhs - rhs
    want_res = float(st.beta) * np.outer(V[k], np.eye(k)[k - 1]).T
    assert np.allclose(resid, want_res.T, atol=1e-10)


@pytest.mark.parametrize("dtype", [np.complex128])
def test_arnoldi_factorization_contract(dtype):
    rng = np.random.default_rng(82)
    A = rand_mat(rng, n, n, dtype)
    x0 = rand_vec(rng, n, dtype)
    it = kk.ArnoldiIterator(jnp.asarray(A), jnp.asarray(x0), krylovdim=8)
    st = it.initialize()
    for _ in range(6):
        st = it.expand(st)
    k = int(st.k)
    V = np.asarray(st.V)
    G = V[: k + 1].conj() @ V[: k + 1].T
    assert np.allclose(G, np.eye(k + 1), atol=1e-12)
    H = np.asarray(st.H)
    lhs = A @ V[:k].T
    rhs = V[: k + 1].T @ H[: k + 1, :k]
    assert np.allclose(lhs, rhs, atol=1e-10)


def test_lanczos_shrink_roundtrip():
    rng = np.random.default_rng(83)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    it = kk.LanczosIterator(jnp.asarray(A), jnp.asarray(x0), krylovdim=8)
    st = it.initialize()
    for _ in range(6):
        st = it.expand(st)
    st2 = it.shrink(st, 3)
    assert int(st2.k) == 3
    # expanding again keeps the factorization valid
    for _ in range(2):
        st2 = it.expand(st2)
    k = int(st2.k)
    V = np.asarray(st2.V)
    G = V[: k + 1].conj() @ V[: k + 1].T
    assert np.allclose(G, np.eye(k + 1), atol=1e-10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_gkl_factorization_contract(dtype):
    rng = np.random.default_rng(84)
    A = rand_mat(rng, 2 * n, n, dtype)
    Aj = jnp.asarray(A)
    x0 = rand_vec(rng, 2 * n, dtype)
    it = kk.GKLIterator(
        (lambda x: Aj @ x, lambda y: Aj.conj().T @ y), jnp.asarray(x0), krylovdim=8
    )
    st = it.initialize()
    for _ in range(6):
        st = it.expand(st)
    k = int(st.k)
    U = np.asarray(st.U)
    V = np.asarray(st.V)
    B = np.asarray(st.B)
    assert np.allclose(U[: k + 1].conj() @ U[: k + 1].T, np.eye(k + 1), atol=1e-12)
    assert np.allclose(V[:k].conj() @ V[:k].T, np.eye(k), atol=1e-12)
    # A V = U[:k+1] B[:k+1, :k]
    assert np.allclose(A @ V[:k].T, U[: k + 1].T @ B[: k + 1, :k], atol=1e-10)
    # Aᴴ U[:k] = V B[:k,:k]ᴴ
    assert np.allclose(
        A.conj().T @ U[:k].T, V[:k].T @ B[:k, :k].conj().T, atol=1e-10
    )


def test_blocklanczos_iterator():
    rng = np.random.default_rng(85)
    A = hermitize(rand_mat(rng, 20, 20, np.float64))
    X0 = jnp.asarray(np.stack([rand_vec(rng, 20, np.float64) for _ in range(3)]))
    it = kk.BlockLanczosIterator(jnp.asarray(A), X0, krylovdim=12)
    st = it.initialize()
    for _ in range(3):
        st = it.expand(st)
    k = int(st.k)
    V = np.asarray(st.V)
    assert np.allclose(V[:k].conj() @ V[:k].T, np.eye(k), atol=1e-10)


def test_lanczos_keepvecs_false_3term():
    """keepvecs=False: O(1)-vector pure 3-term mode reproduces the tridiagonal
    coefficients of the full-basis iterator (reference keepvecs=false mode,
    src/factorizations/lanczos.jl:133-144)."""
    rng = np.random.default_rng(83)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    it3 = kk.LanczosIterator(
        jnp.asarray(A), jnp.asarray(x0), krylovdim=10, orth=kk.cgs, keepvecs=False
    )
    itf = kk.LanczosIterator(
        jnp.asarray(A), jnp.asarray(x0), krylovdim=10, orth=kk.cgs
    )
    s3, sf = it3.initialize(), itf.initialize()
    # the 3-term state stores NO basis — only the rolling (v_prev, v_cur) pair
    assert not hasattr(s3, "V")
    for _ in range(8):
        s3, sf = it3.expand(s3), itf.expand(sf)
    H3 = np.asarray(s3.H)
    Hf = np.asarray(sf.H)
    T3 = np.tril(H3) + np.tril(H3, -1).T
    Tf = np.tril(Hf) + np.tril(Hf, -1).T
    # drift-free in exact arithmetic at modest k; f64 agreement to ~1e-8
    assert np.allclose(T3[:8, :8], Tf[:8, :8], atol=1e-8)
    # rayleighquotient/residual/normres accessors work on the 3-term state
    from krylovkit_tpu.factorizations import iterators as its

    assert its.rayleighquotient(s3).shape == H3.shape
    r = np.asarray(its.residual(s3))
    assert np.isclose(np.linalg.norm(r), 1.0, atol=1e-12)


def test_lanczos_keepvecs_false_rejects_reorth():
    rng = np.random.default_rng(84)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    with pytest.raises(ValueError, match="keepvecs"):
        kk.LanczosIterator(
            jnp.asarray(A), jnp.asarray(rand_vec(rng, n, np.float64)),
            keepvecs=False, orth=kk.cgs2,
        )
    it = kk.LanczosIterator(
        jnp.asarray(A), jnp.asarray(rand_vec(rng, n, np.float64)),
        keepvecs=False, orth=kk.cgs,
    )
    st = it.initialize()
    with pytest.raises(ValueError, match="shrink"):
        it.shrink(st, 2)
