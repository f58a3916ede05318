"""ELL sparse operators, custom inner products (the reference's
``InnerProductVec``, ``src/innerproductvec.jl``), and sharded-mesh execution
(the reference's threaded-kernel CI rerun, ``.github/workflows/ci.yml:46-75``,
mapped to an 8-device virtual mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.ops import sparse
from testsetup import hermitize, n, precision, rand_mat, rand_vec


def test_ell_matvec_matches_dense():
    rng = np.random.default_rng(101)
    A = rand_mat(rng, 30, 20, np.float64)
    A[np.abs(A) < 0.15] = 0  # sparsify
    op = sparse.from_dense(A)
    x = rand_vec(rng, 20, np.float64)
    y = rand_vec(rng, 30, np.float64)
    assert np.allclose(np.asarray(op.normal(jnp.asarray(x))), A @ x)
    assert np.allclose(np.asarray(op.apply_adjoint(jnp.asarray(y))), A.T @ y)


def test_ell_eigsolve_laplacian():
    N_ = 200
    rows = np.concatenate([np.arange(N_), np.arange(N_ - 1), np.arange(1, N_)])
    cols = np.concatenate([np.arange(N_), np.arange(1, N_), np.arange(N_ - 1)])
    vals = np.concatenate(
        [2 * np.ones(N_), -np.ones(N_ - 1), -np.ones(N_ - 1)]
    )
    op = sparse.from_coo(rows, cols, vals, (N_, N_))
    # random start: a symmetric x0 has no overlap with the antisymmetric modes
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(N_))
    vals_, vecs, info = kk.eigsolve(
        op, x0, 3, "SR", ishermitian=True, tol=1e-10, krylovdim=30, maxiter=200
    )
    want = 2 - 2 * np.cos(np.pi * np.arange(1, 4) / (N_ + 1))
    assert int(info.converged) >= 3
    assert np.allclose(np.asarray(vals_), want, atol=1e-8)


def test_ell_linsolve():
    rng = np.random.default_rng(102)
    A = rand_mat(rng, 50, 50, np.float64)
    A[np.abs(A) < 0.1] = 0
    A = A + 3 * np.eye(50)
    op = sparse.from_dense(A)
    b = rand_vec(rng, 50, np.float64)
    x, info = kk.linsolve(op, jnp.asarray(b), tol=1e-10, krylovdim=40)
    assert int(info.converged) == 1
    assert np.linalg.norm(A @ np.asarray(x) - b) <= 1e-8


def test_custom_inner_product_space():
    """Eigsolve in a weighted inner product ⟨x, y⟩_M = xᴴ M y: self-adjoint
    operators w.r.t. M get real Ritz values and M-orthonormal eigenvectors
    (the reference's InnerProductVec use-case, docs/src/man/intro.md:79-84)."""
    rng = np.random.default_rng(103)
    d = np.abs(rng.standard_normal(n)) + 0.5  # diagonal metric M
    A = hermitize(rand_mat(rng, n, n, np.float64))
    # B = M^{-1} A is self-adjoint w.r.t. ⟨·,·⟩_M
    B = jnp.asarray(A / d[:, None])
    Mj = jnp.asarray(d)

    space = kk.VectorSpace(inner_fn=lambda x, y: jnp.vdot(x, Mj * y))
    x0 = jnp.asarray(rand_vec(rng, n, np.float64))
    vals, vecs, info = kk.eigsolve(
        lambda x: B @ x, x0, 2, "LR", ishermitian=True, space=space,
        tol=1e-10, krylovdim=n,
    )
    # oracle: generalized problem A v = λ M v
    L = np.diag(np.sqrt(d))
    Li = np.diag(1 / np.sqrt(d))
    w = np.linalg.eigvalsh(Li @ A @ Li)
    assert np.allclose(np.asarray(vals), w[::-1][:2], atol=1e-8)
    # M-orthonormality of Ritz vectors
    V = np.asarray(vecs).T
    G = V.T @ np.diag(d) @ V
    assert np.allclose(G, np.eye(2), atol=1e-8)


def test_sharded_mesh_eigsolve():
    """Full solve with the vector dimension sharded over all 8 virtual devices:
    same results as single-device, collectives exercised for real."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from krylovkit_tpu.parallel import make_mesh, sharded_laplacian_1d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    N_ = 256
    op = sharded_laplacian_1d(N_, mesh, jnp.float64)
    x0 = jax.device_put(
        jnp.asarray(np.random.default_rng(105).standard_normal(N_)),
        NamedSharding(mesh, P("vec")),
    )
    vals, vecs, info = kk.eigsolve(
        op, x0, 2, "LM", ishermitian=True, tol=1e-8, krylovdim=30, maxiter=300
    )
    want = 2 - 2 * np.cos(np.pi * np.arange(N_, N_ - 2, -1) / (N_ + 1))
    assert int(info.converged) >= 2
    assert np.allclose(np.asarray(vals), want, atol=1e-6)


def test_sharded_mesh_gmres():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from krylovkit_tpu.parallel import make_mesh, sharded_laplacian_1d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    N_ = 512
    op = sharded_laplacian_1d(N_, mesh, jnp.float64)
    b = jax.device_put(
        jnp.asarray(np.random.default_rng(104).standard_normal(N_)),
        NamedSharding(mesh, P("vec")),
    )
    # SPD + large condition number → CG (restarted GMRES stagnates here)
    x, info = kk.linsolve(op, b, alg=kk.CG(tol=1e-10, maxiter=3000))
    # residual against the dense Laplacian
    Ad = 2 * np.eye(N_) - np.eye(N_, k=1) - np.eye(N_, k=-1)
    assert int(info.converged) == 1
    assert np.linalg.norm(Ad @ np.asarray(x) - np.asarray(b)) <= 1e-7


def test_nested_tuple_svd_embedding():
    """Custom-vector integration (reference test/nestedtuple.jl:1-30): the
    Hermitian embedding [0 A; Aᴴ 0] acting on a (x, y) tuple pytree has
    eigenvalues ±σ(A); eigsolve on tuple vectors recovers the singular values."""
    rng = np.random.default_rng(106)
    A = rand_mat(rng, 25, 15, np.float64)
    Aj = jnp.asarray(A)

    def f(xy):
        x, y = xy
        return (Aj @ y, Aj.T @ x)

    x0 = (
        jnp.asarray(rand_vec(rng, 25, np.float64)),
        jnp.asarray(rand_vec(rng, 15, np.float64)),
    )
    vals, vecs, info = kk.eigsolve(
        f, x0, 3, "LR", ishermitian=True, tol=1e-10, krylovdim=30, maxiter=60
    )
    want = np.linalg.svd(A, compute_uv=False)[:3]
    assert int(info.converged) >= 3
    assert np.allclose(np.asarray(vals), want, atol=1e-8)


def test_sharded_mesh_real_arnoldi():
    """Real non-Hermitian path with the vector dimension sharded: the REAL
    Schur projected problems are replicated, collectives exercised for real."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from krylovkit_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    N_ = 256

    # non-normal triangular map: diag(d) + nilpotent up-shift — spectrum = d
    d = jnp.asarray(np.linspace(1.0, 5.0, N_))
    idx = jnp.arange(N_)

    def apply(x):
        y = d * x + 0.02 * jnp.where(idx < N_ - 1, jnp.roll(x, -1), 0.0)
        return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P("vec")))

    def apply_adj(x):
        y = d * x + 0.02 * jnp.where(idx > 0, jnp.roll(x, 1), 0.0)
        return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P("vec")))

    x0 = jax.device_put(
        jnp.asarray(np.random.default_rng(106).standard_normal(N_)),
        NamedSharding(mesh, P("vec")),
    )
    T, vecs, (re, im), info = kk.schursolve(
        (apply, apply_adj), x0, howmany=2, which="LM",
        krylovdim=25, maxiter=150, tol=1e-9,
    )
    ex = np.sort(np.asarray(d))[::-1][:2]
    lam = np.asarray(re) + 1j * np.asarray(im)
    assert int(info.converged) >= 2
    assert np.abs(np.asarray(im)).max() < 1e-7
    assert np.abs(np.sort(lam.real)[::-1] - ex).max() < 1e-6


def test_real_arnoldi_f32():
    """f32 real-Schur path at eps^(2/3) tolerance (the reference's f32 test
    regime, test/testsetup.jl:14-15)."""
    rng = np.random.default_rng(107)
    A = rng.standard_normal((60, 60)).astype(np.float32)
    x0 = jnp.asarray(rng.standard_normal(60), jnp.float32)
    tol = float(np.finfo(np.float32).eps ** (2 / 3))
    vals, vecs, info = kk.eigsolve(
        jnp.asarray(A), x0, 3, "LM", ishermitian=False,
        krylovdim=25, maxiter=100, tol=tol,
    )
    ex = np.linalg.eigvals(A.astype(np.float64))
    ex = ex[np.argsort(-np.abs(ex))][:3]
    assert int(info.converged) >= 3
    assert np.abs(np.sort_complex(np.asarray(vals).astype(np.complex128))
                  - np.sort_complex(ex)).max() < 10 * tol * np.abs(ex[0])
