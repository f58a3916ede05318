"""L1 tests: basis kernels + all 6 orthogonalization strategies.

Replicates the reference's structural invariants (SURVEY.md §4.4): ``VᴴV ≈ I``
and the decomposition contract ``w = V c + β v``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.ops import orthonormal as on
from krylovkit_tpu.ops import vector as vec

from testsetup import DTYPES, rand_vec, rand_mat, precision, as_pytree

ORTHS = [on.cgs, on.mgs, on.cgs2, on.mgs2, on.cgsir, on.mgsir]


def make_basis(rng, kmax, k, m, dtype, pytree=False):
    """Random orthonormal basis with k active vectors of dim m."""
    M = rand_mat(rng, m, k, dtype)
    Q, _ = np.linalg.qr(M)
    tmpl = as_pytree(np.zeros(m, dtype)) if pytree else jnp.zeros(m, dtype)
    V = bs.alloc(tmpl, kmax)
    for j in range(k):
        vj = as_pytree(Q[:, j]) if pytree else jnp.asarray(Q[:, j])
        V = bs.set(V, j, vj)
    return V, Q


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("pytree", [False, True])
def test_project_unproject_transform(dtype, pytree):
    rng = np.random.default_rng(10)
    kmax, k, m = 8, 5, 20
    V, Q = make_basis(rng, kmax, k, m, dtype, pytree)
    x_np = rand_vec(rng, m, dtype)
    x = as_pytree(x_np) if pytree else jnp.asarray(x_np)

    c = bs.project(V, x, k)
    assert c.shape == (kmax,)
    assert np.allclose(c[:k], Q.conj().T @ x_np, atol=precision(dtype))
    assert np.allclose(c[k:], 0)

    y = bs.unproject(V, c)
    y_np = np.concatenate([y["a"], y["b"]]) if pytree else np.asarray(y)
    assert np.allclose(y_np, Q @ (Q.conj().T @ x_np), atol=precision(dtype))

    U = np.zeros((kmax, kmax), dtype)
    U_active = rand_mat(rng, k, k, dtype)
    U[:k, :k] = U_active
    W = bs.transform(V, jnp.asarray(U))
    for j in range(k):
        wj = bs.get(W, j)
        wj_np = np.concatenate([wj["a"], wj["b"]]) if pytree else np.asarray(wj)
        assert np.allclose(wj_np, Q @ U_active[:, j], atol=precision(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("orth", ORTHS, ids=lambda o: type(o).__name__)
def test_orthonormalize_contract(dtype, orth):
    rng = np.random.default_rng(11)
    kmax, k, m = 10, 6, 30
    V, Q = make_basis(rng, kmax, k, m, dtype)
    w_np = rand_vec(rng, m, dtype)
    w = jnp.asarray(w_np)

    v, beta, c = on.orthonormalize(w, V, k, orth)
    tol = 10 * precision(dtype)
    # contract w = V c + beta v
    recon = np.asarray(bs.unproject(V, c)) + np.asarray(beta) * np.asarray(v)
    assert np.allclose(recon, w_np, atol=tol * np.linalg.norm(w_np))
    # orthogonality of v against the active basis
    overlaps = Q.conj().T @ np.asarray(v)
    assert np.max(np.abs(overlaps)) < tol
    assert np.allclose(np.linalg.norm(np.asarray(v)), 1.0, atol=tol)


@pytest.mark.parametrize("orth", ORTHS, ids=lambda o: type(o).__name__)
def test_orthogonalize_breakdown_guard(orth):
    """w entirely inside span(V): beta must be ~0 and v must stay finite."""
    rng = np.random.default_rng(12)
    kmax, k, m = 6, 4, 12
    V, Q = make_basis(rng, kmax, k, m, np.float64)
    w = jnp.asarray(Q @ rng.standard_normal(k))
    v, beta, c = on.orthonormalize(w, V, k, orth)
    assert float(beta) < 1e-10
    assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize("orth", ORTHS, ids=lambda o: type(o).__name__)
def test_orthogonalize_under_jit_with_traced_k(orth):
    rng = np.random.default_rng(13)
    kmax, m = 8, 16
    V, Q = make_basis(rng, kmax, 5, m, np.float64)
    w = jnp.asarray(rand_vec(rng, m, np.float64))

    @jax.jit
    def f(V, w, k):
        return on.orthonormalize(w, V, k, orth)

    v, beta, c = f(V, w, jnp.int32(5))
    assert np.max(np.abs(Q.conj().T @ np.asarray(v))) < 1e-12


def test_ir_strategies_refine_badly_conditioned():
    """Near-dependent w: single CGS leaves O(sqrt(eps)) overlap; IR cleans it."""
    rng = np.random.default_rng(14)
    kmax, k, m = 6, 4, 50
    V, Q = make_basis(rng, kmax, k, m, np.float64)
    # w = (almost in span) + tiny orthogonal component
    w = jnp.asarray(Q @ rng.standard_normal(k) + 1e-10 * rng.standard_normal(m))
    v, beta, c = on.orthonormalize(w, V, k, on.cgsir)
    assert np.max(np.abs(Q.conj().T @ np.asarray(v))) < 1e-12


def test_custom_inner_orthogonalization():
    rng = np.random.default_rng(15)
    m = 12
    wts = np.abs(rng.standard_normal(m)) + 0.5
    space = vec.VectorSpace(inner_fn=lambda a, b: jnp.vdot(a * wts, b))
    V = bs.alloc(jnp.zeros(m), 4)
    v0 = jnp.asarray(rng.standard_normal(m))
    v0 = v0 / space.norm(v0)
    V = bs.set(V, 0, v0)
    w = jnp.asarray(rng.standard_normal(m))
    v, beta, c = on.orthonormalize(w, V, 1, on.cgs2, space)
    assert abs(float(space.inner(v0, v))) < 1e-12
    assert np.allclose(float(space.norm(v)), 1.0)


@pytest.mark.parametrize("kmax", [6, 9, 16, 31])
def test_bucketed_cgs_sweep_matches_unbucketed_for_every_k(kmax, monkeypatch):
    """The lax.switch bucket ladder must reproduce the full-basis sweep to
    machine precision at EVERY active length k (prefix reads + masking only
    change which rows stream from HBM; the reduction *size* differs, so XLA's
    blocked accumulation order may differ by ULPs, never more)."""
    rng = np.random.default_rng(21)
    m = 40
    V, Q = make_basis(rng, kmax, min(kmax, m) - 1, m, np.float64)
    w = jnp.asarray(rand_vec(rng, m, np.float64))
    space = vec.STANDARD
    for k in range(1, kmax + 1):
        kt = jnp.int32(k)
        monkeypatch.setattr(on, "use_bucketed_sweeps", True)
        wb, cb = jax.jit(lambda w, V, k: on._cgs_sweep(w, V, k, space))(w, V, kt)
        monkeypatch.setattr(on, "use_bucketed_sweeps", False)
        wf, cf = jax.jit(lambda w, V, k: on._cgs_sweep(w, V, k, space))(w, V, kt)
        np.testing.assert_allclose(np.asarray(wb), np.asarray(wf), atol=1e-14)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(cf), atol=1e-14)


def test_bucket_ladder_covers_every_k():
    for kmax in range(1, 64):
        buckets = bs.buckets_for(kmax)
        assert buckets[-1] == kmax
        for k in range(0, kmax + 1):
            idx = int(bs.bucket_index(jnp.int32(k), buckets))
            assert buckets[idx] >= k, (kmax, k, buckets)
            # smallest covering bucket (no dead rows beyond the ladder spacing)
            assert idx == 0 or buckets[idx - 1] < k
