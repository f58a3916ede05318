"""A/B the flagship bench with the pallas partial restart ON vs OFF in one
session (same chip/tunnel conditions)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos


def run(label):
    n = 1 << 21
    op = laplacian_1d(n, jnp.float32)
    alg = kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30, orth=kk.cgs)

    @jax.jit
    def solve(x0):
        vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
        return vals, info.numops

    x0 = jnp.ones((n // 128, 128), jnp.float32)
    vals, numops = solve(x0)
    jax.block_until_ready(vals)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        vals, numops = solve(x0)
    jax.block_until_ready(vals)
    dt = (time.perf_counter() - t0) / reps
    assert np.allclose(np.asarray(vals), 4.0, atol=2e-2), np.asarray(vals)
    ops = int(numops)
    print(f"{label}: {ops} applies in {dt*1e3:.1f} ms -> {ops*3*n/dt/1e9:.2f} Gnnz/s")


orig = bs.transform_partial
run("pallas partial restart ON ")
bs.transform_partial = lambda V, U, m_out: bs.transform(V, U)
run("pallas partial restart OFF")
bs.transform_partial = orig
run("pallas partial restart ON2")
