"""Decompose the flagship bench: T(maxiter) = a + b*applies + c*restarts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

n = 1 << 21
op = laplacian_1d(n, jnp.float32)
x0 = jnp.ones((n // 128, 128), jnp.float32)

rows = []
for mi in (1, 2, 4, 7, 10):
    alg = kk.Lanczos(krylovdim=30, maxiter=mi, tol=1e-30, orth=kk.cgs)

    @jax.jit
    def solve(x0):
        vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
        return vals, info.numops, info.numiter

    vals, numops, numiter = solve(x0)
    jax.block_until_ready(vals)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve(x0)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    ops, iters = int(numops), int(numiter)
    rows.append((dt, ops, iters))
    print(f"maxiter={mi}: {ops} applies, {iters} restars, {dt*1e3:.1f} ms")

A = np.array([[1.0, ops, iters] for (_, ops, iters) in rows])
y = np.array([dt for (dt, _, _) in rows])
coef, *_ = np.linalg.lstsq(A, y, rcond=None)
print(f"fixed={coef[0]*1e3:.2f} ms  per-apply={coef[1]*1e3:.3f} ms  "
      f"per-restart={coef[2]*1e3:.3f} ms")
