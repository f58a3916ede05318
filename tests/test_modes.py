"""Mode-matrix tests mirroring the reference's scalar-type × orthogonalizer
parametrization (``test/runtests.jl:18-24``, ``test/eigsolve.jl:2-6``) plus
eager mode and EigSorter coverage."""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import DTYPES, eig_close, hermitize, n, precision, rand_mat, rand_vec

ORTHS = [kk.cgs2, kk.mgs2, kk.cgsir, kk.mgsir]
ORTH_IDS = ["cgs2", "mgs2", "cgsir", "mgsir"]


@pytest.mark.parametrize("orth", ORTHS, ids=ORTH_IDS)
@pytest.mark.parametrize("dtype", DTYPES)
def test_eigsolve_orth_matrix(dtype, orth):
    rng = np.random.default_rng(111)
    A = hermitize(rand_mat(rng, n, n, dtype))
    x0 = rand_vec(rng, n, dtype)
    tol = precision(dtype)
    alg = kk.Lanczos(krylovdim=n, tol=tol, maxiter=20, orth=orth)
    vals, vecs, info = kk.eigsolve(
        A, jnp.asarray(x0), 3, "LR", ishermitian=True, alg=alg
    )
    want = np.linalg.eigvalsh(A)[::-1][:3]
    assert eig_close(vals, want, 10 * tol)


@pytest.mark.parametrize("orth", [kk.cgs2, kk.mgs2], ids=["cgs2", "mgs2"])
def test_gmres_orth_variants(orth):
    rng = np.random.default_rng(112)
    dtype = np.complex128
    A = rand_mat(rng, n, n, dtype) + 2 * np.eye(n, dtype=dtype)
    b = rand_vec(rng, n, dtype)
    tol = precision(dtype) * np.linalg.norm(b)
    alg = kk.GMRES(krylovdim=n, tol=float(tol), maxiter=20, orth=orth)
    x, info = kk.linsolve(A, b, alg=alg)
    assert int(info.converged) == 1
    assert np.linalg.norm(A @ np.asarray(x) - b) <= 5 * tol


def test_eigsolve_eager():
    """eager=True processes after every expansion → early return when the
    leading eigenpair converges before krylovdim is reached."""
    rng = np.random.default_rng(113)
    A = hermitize(rand_mat(rng, 50, 50, np.float64))
    # spectral gap: boost the top eigenvalue
    w, V = np.linalg.eigh(A)
    w[-1] = w[-1] + 10
    A = (V * w) @ V.T
    x0 = rand_vec(rng, 50, np.float64)
    vals, vecs, info = kk.eigsolve(
        A, jnp.asarray(x0), 1, "LR", ishermitian=True,
        alg=kk.Lanczos(krylovdim=40, tol=1e-10, maxiter=10, eager=True),
    )
    assert np.allclose(float(np.real(np.asarray(vals)[0])), w[-1], atol=1e-8)
    assert int(info.converged) >= 1


def test_eigsorter_custom_order():
    """EigSorter: target eigenvalues closest to a shift (reference
    EigSorter(abs∘(λ-σ)), src/eigsolve/eigsolve.jl:187-193)."""
    rng = np.random.default_rng(114)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    w = np.linalg.eigvalsh(A)
    sigma = float(np.median(w))
    sorter = kk.EigSorter(by=lambda v: jnp.abs(v - sigma), rev=False)
    vals, vecs, info = kk.eigsolve(
        A, jnp.asarray(x0), 2, sorter, ishermitian=True, tol=1e-10, krylovdim=n,
        maxiter=30,
    )
    want = w[np.argsort(np.abs(w - sigma))][:2]
    assert eig_close(vals, want, 1e-7)


@pytest.mark.parametrize("which", ["LM", "SR", "LR"])
def test_arnoldi_which_variants(which):
    rng = np.random.default_rng(115)
    A = rand_mat(rng, n, n, np.complex128)
    x0 = rand_vec(rng, n, np.complex128)
    vals, vecs, info = kk.eigsolve(A, jnp.asarray(x0), 2, which, tol=1e-10,
                                   krylovdim=n, maxiter=30)
    w = np.linalg.eigvals(A)
    key = {
        "LM": lambda v: -np.abs(v),
        "SR": lambda v: np.real(v),
        "LR": lambda v: -np.real(v),
    }[which]
    want = w[np.argsort(key(w))][:2]
    assert eig_close(vals, want, 1e-7), (np.asarray(vals), want)


def test_selective_reorthogonalization():
    """Lanczos(reorth='selective'): Simon's omega-recurrence partial
    reorthogonalization matches the full-reorth results (semiorthogonality
    preserves O(eps) Ritz accuracy)."""
    rng = np.random.default_rng(116)
    m = 200
    A = hermitize(rand_mat(rng, m, m, np.float64))
    x0 = jnp.asarray(rand_vec(rng, m, np.float64))
    want = np.linalg.eigvalsh(A)[::-1][:4]
    alg = kk.Lanczos(krylovdim=30, tol=1e-10, maxiter=60, reorth="selective")
    vals, vecs, info = kk.eigsolve(A, x0, 4, "LR", ishermitian=True, alg=alg)
    assert int(info.converged) >= 4
    assert np.allclose(np.asarray(vals), want, atol=1e-8)
    V = np.asarray(vecs)
    assert np.max(np.abs(V @ V.conj().T - np.eye(4))) < 1e-7


def test_vmap_batched_eigsolve():
    """Batched solves via jax.vmap over the driver — the data-parallel axis
    (dryrun_multichip shards this over the mesh's batch axis)."""
    import jax
    from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos
    from krylovkit_tpu.ops.operator import MatrixOperator

    rng = np.random.default_rng(117)
    As = np.stack([hermitize(rand_mat(rng, 20, 20, np.float64)) for _ in range(3)])
    x0 = jnp.asarray(rand_vec(rng, 20, np.float64))
    alg = kk.Lanczos(krylovdim=20, tol=1e-10, maxiter=10)

    def solve_one(A):
        vals, vecs, info = eigsolve_lanczos(MatrixOperator(A), x0, 2, "LR", alg)
        return vals

    vals = jax.jit(jax.vmap(solve_one))(jnp.asarray(As))
    for b in range(3):
        want = np.linalg.eigvalsh(As[b])[::-1][:2]
        assert np.allclose(np.asarray(vals)[b], want, atol=1e-8), b


def test_vmap_batched_gmres():
    import jax
    from krylovkit_tpu.solvers.gmres import linsolve_gmres
    from krylovkit_tpu.ops.operator import MatrixOperator

    rng = np.random.default_rng(118)
    A = rand_mat(rng, 20, 20, np.float64) + 2 * np.eye(20)
    Bs = np.stack([rand_vec(rng, 20, np.float64) for _ in range(4)])
    alg = kk.GMRES(krylovdim=20, tol=1e-10, maxiter=10)

    def solve_one(b):
        x, info = linsolve_gmres(
            MatrixOperator(jnp.asarray(A)), b, jnp.zeros_like(b),
            jnp.float64(0), jnp.float64(1), alg,
        )
        return x

    X = jax.jit(jax.vmap(solve_one))(jnp.asarray(Bs))
    want = np.linalg.solve(A, Bs.T).T
    assert np.allclose(np.asarray(X), want, atol=1e-8)
