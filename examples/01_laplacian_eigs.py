"""Extremal eigenvalues of the 1D Laplacian with the TPU-fast vector layout.

Run: python examples/01_laplacian_eigs.py            (TPU if available)
     JAX_PLATFORMS=cpu python examples/...           (or force CPU in-code)
"""
import numpy as np
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import laplacian_1d

n = 1 << 16
op = laplacian_1d(n, jnp.float32)

# (rows, 128)-shaped vectors: tile-aligned Krylov basis (docs/man/intro.md)
x0 = jnp.asarray(np.random.default_rng(0).standard_normal((n // 128, 128)), jnp.float32)

vals, vecs, info = kk.eigsolve(
    op, x0, howmany=4, which="LM", ishermitian=True,
    krylovdim=30, maxiter=40, tol=1e-3,
)
print("largest eigenvalues:", np.asarray(vals))
print("converged:", int(info.converged), " operator applications:", int(info.numops))
exact_top = 2 - 2 * np.cos(np.pi * n / (n + 1))
assert abs(float(vals[0]) - exact_top) < 1e-3
print("matches 2 - 2 cos(n pi / (n+1)) =", exact_top)
