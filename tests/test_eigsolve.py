"""eigsolve tests, mirroring the reference's test/eigsolve.jl:

* full problems (n=10, krylovdim ≥ n → converge in 1 iteration) and iterative
  problems (N=100 with restarts), scalar-type × orthogonalizer matrix,
* oracle comparison against dense LAPACK (np.linalg.eigh / eigvals),
* structural invariants A·x ≈ λ·x, unit vectors,
* pytree-vector and callable-operator modes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import krylovkit_tpu as kk
from krylovkit_tpu import Lanczos, Arnoldi, EigSorter

from testsetup import (
    DTYPES,
    N,
    n,
    as_pytree,
    eig_close,
    hermitize,
    precision,
    pytree_matvec,
    rand_mat,
    rand_vec,
)

ORTHS = [kk.cgs2, kk.mgs2, kk.cgsir, kk.mgsir]


def sortsel(w, which, hm):
    if which == "LM":
        return w[np.argsort(-np.abs(w), kind="stable")][:hm]
    if which == "LR":
        return w[np.argsort(-np.real(w), kind="stable")][:hm]
    if which == "SR":
        return w[np.argsort(np.real(w), kind="stable")][:hm]
    raise ValueError(which)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("which", ["LM", "LR", "SR"])
def test_lanczos_full(dtype, which):
    rng = np.random.default_rng(1)
    A = hermitize(rand_mat(rng, n, n, dtype))
    x0 = jnp.asarray(rand_vec(rng, n, dtype))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=2, which=which, krylovdim=n, tol=precision(dtype) / 10
    )
    assert int(info.converged) >= 2
    assert int(info.numiter) == 1
    w = np.linalg.eigvalsh(A)
    assert eig_close(np.asarray(vals), sortsel(w, which, 2), precision(dtype))
    V = np.asarray(vecs)
    for i in range(2):
        r = A @ V[i] - np.asarray(vals)[i] * V[i]
        assert np.linalg.norm(r) < 10 * precision(dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("orth", ORTHS, ids=lambda o: type(o).__name__)
def test_lanczos_iterative(dtype, orth):
    rng = np.random.default_rng(2)
    A = hermitize(rand_mat(rng, N, N, dtype)) * np.sqrt(N)
    x0 = jnp.asarray(rand_vec(rng, N, dtype))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=4, which="LM",
        alg=Lanczos(krylovdim=25, maxiter=200, tol=1e-10, orth=orth),
    )
    assert int(info.converged) == 4
    w = np.linalg.eigvalsh(A)
    assert eig_close(np.asarray(vals), sortsel(w, "LM", 4), 1e-8)
    V = np.asarray(vecs)
    # invariants: orthonormal Ritz vectors, small residuals
    G = V.conj() @ V.T
    assert np.allclose(G, np.eye(4), atol=1e-8)
    assert np.all(np.asarray(info.normres) < 1e-10)


def test_lanczos_callable_pytree():
    """Operator as callable on a two-leaf pytree (mode matrix, SURVEY §4.1)."""
    rng = np.random.default_rng(3)
    A = hermitize(rand_mat(rng, 40, 40, np.float64)) * 5
    f = pytree_matvec(jnp.asarray(A))
    x0 = as_pytree(rand_vec(rng, 40, np.float64))
    vals, vecs, info = kk.eigsolve(
        f, x0, howmany=3, which="LM", ishermitian=True,
        krylovdim=15, tol=1e-10, maxiter=100,
    )
    w = np.linalg.eigvalsh(A)
    assert eig_close(np.asarray(vals), sortsel(w, "LM", 3), 1e-8)
    va = np.concatenate([np.asarray(vecs["a"]), np.asarray(vecs["b"])], axis=1)
    for i in range(3):
        assert np.linalg.norm(A @ va[i] - np.asarray(vals)[i] * va[i]) < 1e-8


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("which", ["LM", "LR", "SR"])
def test_arnoldi_full(dtype, which):
    rng = np.random.default_rng(4)
    A = rand_mat(rng, n, n, dtype)
    x0 = jnp.asarray(rand_vec(rng, n, dtype))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=2, which=which,
        ishermitian=False, krylovdim=n, tol=precision(dtype) / 10,
    )
    assert int(info.converged) >= 2
    w = np.linalg.eigvals(A)
    assert eig_close(np.asarray(vals), sortsel(w, which, 2), 10 * precision(dtype))
    V = np.asarray(vecs)
    for i in range(2):
        r = A @ V[i] - np.asarray(vals)[i] * V[i]
        assert np.linalg.norm(r) < 100 * precision(dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("orth", [kk.cgs2, kk.mgs2], ids=lambda o: type(o).__name__)
def test_arnoldi_iterative(dtype, orth):
    rng = np.random.default_rng(5)
    A = rand_mat(rng, N, N, dtype) * np.sqrt(N)
    x0 = jnp.asarray(rand_vec(rng, N, dtype))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=3, which="LM",
        ishermitian=False,
        alg=Arnoldi(krylovdim=25, maxiter=300, tol=1e-10, orth=orth),
    )
    assert int(info.converged) == 3
    w = np.linalg.eigvals(A)
    got = np.asarray(vals)
    # each returned value is a true eigenvalue, with the right magnitudes
    # (conjugate-pair members tie in |λ|; either is a correct pick)
    for v in got:
        assert np.min(np.abs(w - v)) < 1e-8
    assert np.allclose(np.abs(got), np.abs(sortsel(w, "LM", 3)), atol=1e-8)
    V = np.asarray(vecs)
    for i in range(3):
        r = A @ V[i] - np.asarray(vals)[i] * V[i]
        assert np.linalg.norm(r) < 1e-8
        assert abs(np.linalg.norm(V[i]) - 1) < 1e-10


def test_arnoldi_which_LI():
    rng = np.random.default_rng(6)
    A = rand_mat(rng, 30, 30, np.complex128) * 4
    x0 = jnp.asarray(rand_vec(rng, 30, np.complex128))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=2, which="LI", ishermitian=False,
        krylovdim=20, maxiter=300, tol=1e-10,
    )
    w = np.linalg.eigvals(A)
    want = w[np.argsort(-np.imag(w))][:2]
    assert eig_close(np.asarray(vals), want, 1e-8)


def test_eigsorter():
    rng = np.random.default_rng(7)
    A = hermitize(rand_mat(rng, 40, 40, np.float64)) * 4
    x0 = jnp.asarray(rand_vec(rng, 40, np.float64))
    # largest eigenvalue by value (not magnitude) via EigSorter
    vals, _, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=2,
        which=EigSorter(by=lambda v: jnp.real(v), rev=True),
        krylovdim=15, maxiter=100, tol=1e-10,
    )
    w = np.linalg.eigvalsh(A)
    assert eig_close(np.asarray(vals), np.sort(w)[::-1][:2], 1e-8)


def test_schursolve_real():
    # real input -> REAL Schur path: quasi-triangular T (2x2 blocks for
    # conjugate pairs), real Schur vectors, vals as an (re, im) pair
    rng = np.random.default_rng(8)
    A = rand_mat(rng, 50, 50, np.float64) * 3
    x0 = jnp.asarray(rand_vec(rng, 50, np.float64))
    # spectrum by |.|: conj pair, real, conj pair -> howmany=3 cuts cleanly
    hm = 3
    T, vecs, (re, im), info = kk.schursolve(
        jnp.asarray(A), x0, howmany=hm, which="LM",
        krylovdim=20, maxiter=200, tol=1e-10,
    )
    assert int(info.converged) >= hm
    Tn = np.asarray(T)
    V = np.asarray(vecs).T  # columns = Schur vectors, REAL
    assert V.dtype == np.float64 and Tn.dtype == np.float64
    assert np.linalg.norm(A @ V - V @ Tn) < 1e-8
    assert np.allclose(V.T @ V, np.eye(hm), atol=1e-10)
    # quasi-triangular: nothing below the first subdiagonal
    assert np.max(np.abs(np.tril(Tn, -2))) < 1e-12
    w = np.linalg.eigvals(A)
    lam = np.asarray(re) + 1j * np.asarray(im)
    assert eig_close(lam, sortsel(w, "LM", hm), 1e-8)
    # a howmany that splits a conjugate pair is detectable: im[-1] != 0 with
    # the partner truncated (static shapes cannot grow the return like the
    # reference's dynamic howmany+1)
    _, _, (re4, im4), _ = kk.schursolve(
        jnp.asarray(A), x0, howmany=4, which="LM",
        krylovdim=20, maxiter=200, tol=1e-10,
    )
    assert abs(float(im4[-1])) > 0.1


def test_schursolve_complex():
    rng = np.random.default_rng(8)
    A = rand_mat(rng, 50, 50, np.complex128) * 3
    x0 = jnp.asarray(rand_vec(rng, 50, np.complex128))
    T, vecs, vals, info = kk.schursolve(
        jnp.asarray(A), x0, howmany=3, which="LM",
        krylovdim=20, maxiter=200, tol=1e-10,
    )
    assert int(info.converged) >= 3
    Tn = np.asarray(T)
    V = np.asarray(vecs).T
    assert np.linalg.norm(A @ V - V @ Tn) < 1e-8
    assert np.allclose(V.conj().T @ V, np.eye(3), atol=1e-10)
    assert np.max(np.abs(np.tril(Tn, -1))) < 1e-12
    w = np.linalg.eigvals(A)
    assert eig_close(np.diag(Tn), sortsel(w, "LM", 3), 1e-8)


def test_realeigsolve():
    rng = np.random.default_rng(9)
    # matrix with dominant real eigenvalues: make it similar to diag(real)
    D = np.diag(np.array([5.0, -4.0, 3.0, -2.0] + list(rng.standard_normal(26) * 0.5)))
    S = rng.standard_normal((30, 30)) * 0.2 + np.eye(30)
    A = S @ D @ np.linalg.inv(S)
    x0 = jnp.asarray(rand_vec(rng, 30, np.float64))
    vals, vecs, info = kk.realeigsolve(
        jnp.asarray(A), x0, howmany=2, which="LM", krylovdim=25, maxiter=300, tol=1e-10
    )
    assert vals.dtype == jnp.float64
    assert eig_close(np.asarray(vals), np.array([5.0, -4.0]), 1e-7)
    V = np.asarray(vecs)
    assert V.dtype == np.float64
    for i in range(2):
        assert np.linalg.norm(A @ V[i] - np.asarray(vals)[i] * V[i]) < 1e-6


def test_realeigsolve_rejects_complex_pair():
    rng = np.random.default_rng(10)
    A = np.zeros((10, 10))
    A[0, 1], A[1, 0] = -3.0, 3.0  # dominant eigenvalues ±3i
    A += rng.standard_normal((10, 10)) * 0.05
    with pytest.raises(ValueError, match="not real"):
        kk.realeigsolve(
            jnp.asarray(A), jnp.asarray(rand_vec(rng, 10, np.float64)),
            howmany=2, which="LM", krylovdim=10, tol=1e-10,
        )


def test_degenerate_eigenvalues():
    """Repeated extremal eigenvalue (single-vector Lanczos finds one copy per
    Krylov space; with restarts it must still converge to the right values)."""
    rng = np.random.default_rng(11)
    from testsetup import mat_with_eigrepition

    A = mat_with_eigrepition(rng, 60, 1, np.float64)
    x0 = jnp.asarray(rand_vec(rng, 60, np.float64))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=4, which="LR", krylovdim=25, maxiter=300, tol=1e-9
    )
    w = np.linalg.eigvalsh(A)
    assert eig_close(np.asarray(vals), np.sort(w)[::-1][:4], 1e-6)


def test_howmany_exceeds_krylovdim_errors():
    with pytest.raises(ValueError, match="krylovdim"):
        kk.eigsolve(jnp.eye(10), jnp.ones(10), howmany=8, krylovdim=5)


def test_hermitian_LI_rejected():
    with pytest.raises(ValueError, match="LI"):
        kk.eigsolve(jnp.eye(10), jnp.ones(10), howmany=1, which="LI", ishermitian=True)


def test_maxiter_unconverged_reported():
    rng = np.random.default_rng(12)
    A = hermitize(rand_mat(rng, 200, 200, np.float64)) * 14
    x0 = jnp.asarray(rand_vec(rng, 200, np.float64))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, howmany=6, which="LM",
        alg=Lanczos(krylovdim=8, maxiter=2, tol=1e-14),
    )
    assert int(info.numiter) == 2
    assert int(info.converged) < 6  # honest reporting (no fake convergence)


def test_jit_cache_reuse():
    """Second solve with same shapes must not retrace (MatrixOperator is a
    traced pytree)."""
    rng = np.random.default_rng(13)
    from krylovkit_tpu.solvers.eigsolve import _eigsolve_core

    A1 = hermitize(rand_mat(rng, 30, 30, np.float64))
    A2 = hermitize(rand_mat(rng, 30, 30, np.float64))
    x0 = jnp.asarray(rand_vec(rng, 30, np.float64))
    kk.eigsolve(jnp.asarray(A1), x0, howmany=2, krylovdim=10, tol=1e-8)
    misses0 = _eigsolve_core._cache_size()
    vals, _, _ = kk.eigsolve(jnp.asarray(A2), x0, howmany=2, krylovdim=10, tol=1e-8)
    assert _eigsolve_core._cache_size() == misses0
    w = np.linalg.eigvalsh(A2)
    assert eig_close(np.asarray(vals), sortsel(w, "LM", 2), 1e-6)


def test_tile_aligned_2d_layout():
    """(rows, 128)-shaped vectors — the TPU-fast basis layout (ops/basis.py
    layout note) — must give identical results to flat 1D vectors."""
    from krylovkit_tpu.parallel import laplacian_1d

    nn = 512
    op = laplacian_1d(nn, jnp.float64)
    alg = Lanczos(krylovdim=30, maxiter=100, tol=5e-8)
    x1 = jnp.asarray(np.random.default_rng(0).normal(size=nn))
    x2 = x1.reshape(nn // 128, 128)
    v1, V1, i1 = kk.eigsolve(op, x1, 4, "LM", alg=alg, ishermitian=True)
    v2, V2, i2 = kk.eigsolve(op, x2, 4, "LM", alg=alg, ishermitian=True)
    assert int(i1.converged) >= 4 and int(i2.converged) >= 4
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9)
    # oracle: 1D Dirichlet Laplacian eigenvalues 2 - 2 cos(k pi / (n+1))
    ks = np.arange(1, nn + 1)
    exact = np.sort(2 - 2 * np.cos(ks * np.pi / (nn + 1)))[::-1][:4]
    np.testing.assert_allclose(np.asarray(v1), exact, rtol=1e-8)
    # eigenvectors live in the vector's shape
    assert jax.tree_util.tree_leaves(V2)[0].shape == (4, nn // 128, 128)


def test_real_arnoldi_LI_rejected():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((20, 20))
    with pytest.raises(ValueError, match="LI/SI invalid for real"):
        kk.eigsolve(jnp.asarray(A), jnp.ones(20), 2, "LI", ishermitian=False)


def test_realeigsolve_pytree_operator():
    # fully real path with a callable pytree operator on the TPU-style layout
    rng = np.random.default_rng(12)
    D = jnp.asarray(np.linspace(1.0, 6.0, 256).reshape(2, 128))

    def f(x):
        return {"a": D * x["a"]}

    x0 = {"a": jnp.asarray(rng.standard_normal((2, 128)))}
    vals, vecs, info = kk.realeigsolve(f, x0, 2, "LR", krylovdim=25,
                                       maxiter=100, tol=1e-10)
    assert np.allclose(np.asarray(vals), [6.0, np.asarray(D).ravel()[-2]], atol=1e-7)
    assert np.asarray(vals).dtype == np.float64


def test_zero_x0_host_raises():
    A = np.diag(np.arange(1.0, 9.0))
    with pytest.raises(ValueError, match="zero norm"):
        kk.eigsolve(jnp.asarray(A), jnp.zeros(8), 2, "LM")


def test_zero_x0_in_graph_converged_zero():
    """Inside jit the host-side guard cannot fire (x0 is a tracer); the
    in-graph contract is NaN results + converged == 0 (+ a WARN log, see
    factorizations/krylov.py:initialize; reference raises unconditionally,
    src/factorizations/lanczos.jl:184)."""
    A = jnp.asarray(np.diag(np.arange(1.0, 17.0)))

    @jax.jit
    def run(x0):
        vals, vecs, info = kk.eigsolve(
            A, x0, 2, "LM", ishermitian=True, krylovdim=8, maxiter=2
        )
        return vals, info.converged

    vals, conv = run(jnp.zeros(16))
    assert int(conv) == 0
    assert np.all(np.isnan(np.asarray(vals)))

    # non-Hermitian (Arnoldi) path
    @jax.jit
    def run_arnoldi(x0):
        vals, vecs, info = kk.eigsolve(
            A, x0, 2, "LM", ishermitian=False, krylovdim=8, maxiter=2
        )
        return vals, info.converged

    vals_a, conv_a = run_arnoldi(jnp.zeros(16))
    assert int(conv_a) == 0
    assert np.all(np.isnan(np.asarray(vals_a)))
