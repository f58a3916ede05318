"""Distributed general-sparse layer (BASELINE.json config 5, scaled down).

Row-partitioned ELL SpMV with planned shard_map+ppermute halo exchange on the
8-device virtual mesh; values must match the single-device / dense oracle.
Reference counterpart being replaced: the threaded L1 kernels
``/root/reference/src/orthonormal.jl:94-196`` (the one axis the reference
parallelizes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import (
    banded_coo,
    make_mesh,
    rect_sparse_coo,
    sharded_ell_from_coo,
)


def _dense(rows, cols, vals, shape):
    A = np.zeros(shape, np.asarray(vals).dtype)
    A[np.asarray(rows), np.asarray(cols)] = np.asarray(vals)
    return A


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(8)


def test_sharded_spmv_matches_dense():
    mesh = _mesh8()
    m = n = 264 * 8  # not a power of two; divisible by 8
    rows, cols, vals = banded_coo(n, halfband=5, seed=1, spd=False)
    op = sharded_ell_from_coo(rows, cols, vals, (m, n), mesh)
    A = _dense(rows, cols, vals, (m, n))
    rng = np.random.default_rng(2)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal(n)), NamedSharding(mesh, P("vec"))
    )
    y = jax.jit(op.normal)(x)
    assert np.allclose(np.asarray(y), A @ np.asarray(x), atol=1e-12)
    z = jax.jit(op.adjoint)(x)
    assert np.allclose(np.asarray(z), A.T @ np.asarray(x), atol=1e-12)
    # halo plan is nearest-neighbour for a banded matrix
    assert set(op.fwd_plan.deltas) <= {1, 7}


def test_sharded_spmv_rectangular_and_tiled():
    mesh = _mesh8()
    m, n = 128 * 8, 64 * 8
    rows, cols, vals = rect_sparse_coo(m, n, nnz_per_row=7, seed=3)
    # tiled (len/8, 8) vector layout, partition by element blocks
    op = sharded_ell_from_coo(rows, cols, vals, (m, n), mesh, tile=8)
    A = _dense(rows, cols, vals, (m, n))
    rng = np.random.default_rng(4)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n // 8, 8))),
        NamedSharding(mesh, P("vec", None)),
    )
    y = jax.jit(op.normal)(x)
    assert y.shape == (m // 8, 8)
    assert np.allclose(np.asarray(y).ravel(), A @ np.asarray(x).ravel(), atol=1e-12)
    u = jax.device_put(
        jnp.asarray(rng.standard_normal((m // 8, 8))),
        NamedSharding(mesh, P("vec", None)),
    )
    v = jax.jit(op.adjoint)(u)
    assert v.shape == (n // 8, 8)
    assert np.allclose(np.asarray(v).ravel(), A.T @ np.asarray(u).ravel(), atol=1e-12)


def test_sharded_spmv_long_range_coupling():
    """A matrix with couplings spanning several shards exercises multi-round
    halo exchange (δ > 1), not just nearest neighbours."""
    mesh = _mesh8()
    n = 64 * 8
    i = np.arange(n)
    k = 3 * (n // 8)  # couples shard d to shard d±3
    rows = np.concatenate([i, i[:-k], i[k:]])
    cols = np.concatenate([i, i[:-k] + k, i[k:] - k])
    vals = np.concatenate([np.full(n, 2.0), np.full(n - k, -1.0), np.full(n - k, -1.0)])
    op = sharded_ell_from_coo(rows, cols, vals, (n, n), mesh)
    assert set(op.fwd_plan.deltas) == {3, 5}
    A = _dense(rows, cols, vals, (n, n))
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(5).standard_normal(n)),
        NamedSharding(mesh, P("vec")),
    )
    y = jax.jit(op.normal)(x)
    assert np.allclose(np.asarray(y), A @ np.asarray(x), atol=1e-12)


def test_sharded_eigsolve_matches_single_device():
    """Config-5 eigsolve: sharded banded-CSR Lanczos vs the dense oracle AND
    vs the identical single-device solve (bitwise-comparable path)."""
    mesh = _mesh8()
    n = 104 * 8
    rows, cols, vals = banded_coo(n, halfband=4, seed=11, spd=True)
    op = sharded_ell_from_coo(rows, cols, vals, (n, n), mesh)
    x0_host = np.random.default_rng(12).standard_normal(n)
    x0 = jax.device_put(jnp.asarray(x0_host), NamedSharding(mesh, P("vec")))
    vals_s, vecs_s, info_s = kk.eigsolve(
        op, x0, 4, "LM", ishermitian=True, tol=1e-10, krylovdim=30, maxiter=200
    )
    A = _dense(rows, cols, vals, (n, n))
    want = np.linalg.eigvalsh(A)
    want = want[np.argsort(-np.abs(want))][:4]
    assert int(info_s.converged) >= 4
    assert np.allclose(np.sort(np.asarray(vals_s)), np.sort(want), atol=1e-8)

    # single-device ELL reference solve (same algorithm, no mesh)
    from krylovkit_tpu.ops.sparse import from_coo

    op1 = from_coo(rows, cols, vals, (n, n))
    vals_1, _, info_1 = kk.eigsolve(
        op1, jnp.asarray(x0_host), 4, "LM", ishermitian=True,
        tol=1e-10, krylovdim=30, maxiter=200,
    )
    assert np.allclose(np.asarray(vals_s), np.asarray(vals_1), atol=1e-10)
    assert int(info_s.numops) == int(info_1.numops)


def test_sharded_lssolve_lsmr():
    """Config-5 lssolve: rectangular sparse LSMR fully sharded (normal AND
    adjoint halo plans) vs the dense least-squares oracle."""
    mesh = _mesh8()
    m, n = 96 * 8, 48 * 8
    rows, cols, vals = rect_sparse_coo(m, n, nnz_per_row=6, seed=21)
    op = sharded_ell_from_coo(rows, cols, vals, (m, n), mesh)
    A = _dense(rows, cols, vals, (m, n))
    b_host = np.random.default_rng(22).standard_normal(m)
    b = jax.device_put(jnp.asarray(b_host), NamedSharding(mesh, P("vec")))
    x, info = kk.lssolve(op, b, tol=1e-12, maxiter=3 * n)
    x_star, *_ = np.linalg.lstsq(A, b_host, rcond=None)
    assert int(info.converged) == 1
    assert np.allclose(np.asarray(x), x_star, atol=1e-7)


def test_sharded_svdsolve():
    """GKL svdsolve on the sharded rectangular operator (both directions of
    the halo exchange inside one Krylov loop)."""
    mesh = _mesh8()
    m, n = 64 * 8, 40 * 8
    rows, cols, vals = rect_sparse_coo(m, n, nnz_per_row=5, seed=31)
    op = sharded_ell_from_coo(rows, cols, vals, (m, n), mesh)
    A = _dense(rows, cols, vals, (m, n))
    x0 = jax.device_put(
        jnp.asarray(np.random.default_rng(32).standard_normal(m)),
        NamedSharding(mesh, P("vec")),
    )
    svals, lvecs, rvecs, info = kk.svdsolve(
        op, x0, 3, "LR", tol=1e-10, krylovdim=30, maxiter=100
    )
    want = np.linalg.svd(A, compute_uv=False)[:3]
    assert int(info.converged) >= 3
    assert np.allclose(np.asarray(svals), want, atol=1e-8)


def test_sharded_mesh1_degenerates_to_local():
    """On a 1-device mesh the plan must be communication-free (this is the
    real-chip bench path)."""
    mesh = make_mesh(1)
    n = 512
    rows, cols, vals = banded_coo(n, halfband=3, seed=41)
    op = sharded_ell_from_coo(rows, cols, vals, (n, n), mesh)
    assert op.fwd_plan.deltas == ()
    A = _dense(rows, cols, vals, (n, n))
    x = jnp.asarray(np.random.default_rng(42).standard_normal(n))
    y = jax.jit(op.normal)(x)
    assert np.allclose(np.asarray(y), A @ np.asarray(x), atol=1e-12)
