"""Pallas stencil kernel: correctness vs the XLA roll-based operator
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp

from krylovkit_tpu.ops.pallas_stencil import laplacian_1d_pallas
from krylovkit_tpu.parallel import laplacian_1d


def test_pallas_laplacian_matches_xla():
    n = 2048
    opp = laplacian_1d_pallas(n, jnp.float64, tile_rows=4, interpret=True)
    opx = laplacian_1d(n, jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    assert np.allclose(np.asarray(opp.normal(x)), np.asarray(opx.normal(x)))


def test_pallas_laplacian_dense_oracle():
    n = 256
    opp = laplacian_1d_pallas(n, jnp.float64, tile_rows=2, interpret=True)
    A = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    x = np.random.default_rng(1).standard_normal(n)
    assert np.allclose(np.asarray(opp.normal(jnp.asarray(x))), A @ x)


# ---------------------------------------------------------------------------
# transform_partial tail contract (VERDICT r2 weak #3): the in-place Pallas
# kernel must PRESERVE rows >= m_out — the masked-restart drivers read basis
# rows beyond m_out after gated-off identity restarts (solvers/lanczos.py).
# interpret mode makes the TPU kernel CI-visible on CPU.
# ---------------------------------------------------------------------------


def test_transform_inplace_preserves_tail_rows():
    from krylovkit_tpu.ops.basis import _pallas_transform_inplace

    rng = np.random.default_rng(7)
    kmax, R, C, m_out = 11, 16, 128, 6
    V = jnp.asarray(rng.standard_normal((kmax, R, C)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((kmax, kmax)), jnp.float32)
    out = _pallas_transform_inplace(V, U, m_out, interpret=True)
    # rows < m_out: the rotation
    want = jnp.einsum("ji,jrc->irc", U[:, :m_out], V)
    assert np.allclose(np.asarray(out[:m_out]), np.asarray(want), atol=1e-5)
    # rows >= m_out: bit-identical to the INPUT (tail preservation contract)
    assert np.array_equal(np.asarray(out[m_out:]), np.asarray(V[m_out:]))


def test_transform_partial_identity_consistency():
    """Both paths (Pallas in-place, XLA fallback) must agree for an identity
    rotation — the gated-off-restart case where the solver reads past m_out."""
    from krylovkit_tpu.ops import basis as bs
    from krylovkit_tpu.ops.basis import _pallas_transform_inplace

    rng = np.random.default_rng(8)
    kmax, R, C, m_out = 9, 8, 128, 4
    V = jnp.asarray(rng.standard_normal((kmax, R, C)), jnp.float32)
    eye = jnp.eye(kmax, dtype=jnp.float32)
    out_pl = _pallas_transform_inplace(V, eye, m_out, interpret=True)
    out_xla = bs.transform_partial(V, eye, m_out)  # CPU → XLA fallback
    assert np.allclose(np.asarray(out_pl), np.asarray(V), atol=0)
    assert np.allclose(np.asarray(out_xla), np.asarray(V), atol=1e-6)


# ---------------------------------------------------------------------------
# dynamic-k projection kernels (ops/pallas_basis.py) — gated off in prod
# (on-chip regression) but kept correct: interpret-mode parity vs ops.basis.
# ---------------------------------------------------------------------------


def test_project_pallas_matches_xla():
    from krylovkit_tpu.ops import basis as bs
    from krylovkit_tpu.ops.pallas_basis import project_pallas

    rng = np.random.default_rng(3)
    kmax, R, C = 13, 16, 128
    V = jnp.asarray(rng.standard_normal((kmax, R, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
    for k in (0, 1, 5, 8, 13):
        got = project_pallas(V, w, k, kb=4, br=8, interpret=True)
        want = np.asarray(bs.project(V, w, jnp.int32(k)))
        assert got.shape == (kmax,)
        assert np.allclose(np.asarray(got), want, atol=1e-4), k


def test_unproject_pallas_matches_xla():
    from krylovkit_tpu.ops import basis as bs
    from krylovkit_tpu.ops.basis import mask_coeffs
    from krylovkit_tpu.ops.pallas_basis import unproject_pallas

    rng = np.random.default_rng(4)
    kmax, R, C = 13, 16, 128
    V = jnp.asarray(rng.standard_normal((kmax, R, C)), jnp.float32)
    c = jnp.asarray(rng.standard_normal(kmax), jnp.float32)
    for k in (1, 4, 13):
        cm = mask_coeffs(c, jnp.int32(k))
        got = unproject_pallas(V, cm, k, kb=4, br=8, interpret=True)
        want = np.asarray(bs.unproject(V, cm))
        assert np.allclose(np.asarray(got), want, atol=1e-4), k


# ---------------------------------------------------------------------------
# banded offset-decomposed SpMV (ops/pallas_spmv.py): Pallas kernel vs dense
# oracle in interpret mode + XLA fallback equivalence.
# ---------------------------------------------------------------------------


def test_banded_pallas_spmv_dense_oracle():
    from krylovkit_tpu.ops.pallas_spmv import banded_from_dense, _spmv_pallas

    rng = np.random.default_rng(5)
    n = 2048  # R = 16 rows of 128 lanes; TR=4 → 4 tiles incl. 2 middle ones
    A = np.zeros((n, n), np.float32)
    for d in (-130, -127, -1, 0, 1, 3, 127, 129, 256):
        v = rng.standard_normal(n - abs(d)).astype(np.float32)
        A += np.diag(v, k=d)
    op = banded_from_dense(A)
    x = rng.standard_normal(n).astype(np.float32)
    x2 = jnp.asarray(x).reshape(n // 128, 128)
    y = _spmv_pallas(x2, op.diags, op.offsets, TR=4, interpret=True)
    assert np.allclose(np.asarray(y).reshape(n), A @ x, atol=1e-4)


def test_banded_pallas_window_guard():
    """A halo wider than one tile must raise, not read out of bounds."""
    import pytest
    from krylovkit_tpu.ops.pallas_spmv import banded_from_dense, _spmv_pallas

    rng = np.random.default_rng(9)
    n = 1024
    A = np.diag(rng.standard_normal(n - 256).astype(np.float32), k=256)
    A += np.eye(n, dtype=np.float32)
    op = banded_from_dense(A)
    x2 = jnp.asarray(rng.standard_normal(n).astype(np.float32)).reshape(-1, 128)
    with pytest.raises(ValueError, match="banded window"):
        _spmv_pallas(x2, op.diags, op.offsets, TR=2, interpret=True)


def test_banded_xla_fallback_matches_dense():
    from krylovkit_tpu.ops.pallas_spmv import banded_from_dense

    rng = np.random.default_rng(6)
    n = 300  # not a multiple of 128 → XLA path
    A = np.zeros((n, n))
    for d in (-2, 0, 5):
        A += np.diag(rng.standard_normal(n - abs(d)), k=d)
    op = banded_from_dense(A)
    x = jnp.asarray(rng.standard_normal(n))
    assert np.allclose(np.asarray(op.normal(x)), A @ np.asarray(x), atol=1e-10)
    # adjoint plan
    assert np.allclose(np.asarray(op.adjoint(x)), A.T @ np.asarray(x), atol=1e-10)
