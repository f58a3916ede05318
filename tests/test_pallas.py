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
