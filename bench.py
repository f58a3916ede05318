"""Benchmark: sustained SpMV + orthogonalization throughput of the flagship
Lanczos eigsolve on the 1D Laplacian (BASELINE.json config 1), one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is nnz/s processed by the operator applications alone (nnz = 3n for
the tridiagonal Laplacian); the timed region includes the full solver loop —
orthogonalization sweeps (the dominant HBM-bound cost at krylovdim=30), the
on-device projected eigensolves, and thick restarts — so it is an end-to-end
solver throughput, not a kernel microbenchmark.  ``vs_baseline`` is the ratio
against 1e9 nnz/s, an estimate of the reference's single-socket CPU throughput
(KrylovKit publishes no numbers — BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import krylovkit_tpu as kk
    from krylovkit_tpu.parallel import laplacian_1d
    from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

    n = 1 << 21  # 2M unknowns, f32
    maxiter = 10
    op = laplacian_1d(n, jnp.float32)  # row-major chain on (n/128, 128) vectors
    # DEFAULT config (orth=cgs2): routed through the fused one-reduce DGKS
    # expansion (deferred second sweep in scalar space — two-sweep
    # orthogonality at B+3 HBM row-passes/step; factorizations/krylov.py).
    # On-chip r5: 12.16 Gnnz/s default vs 12.20 with orth=cgs vs 6.86 unfused
    alg = kk.Lanczos(krylovdim=30, maxiter=maxiter, tol=1e-30)

    @jax.jit
    def solve(x0):
        vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
        return vals, info.numops, info.normres

    # (rows, 128) vector layout: tile-aligned basis rows (ops/basis.py note)
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    # warm-up / compile
    vals, numops, normres = solve(x0)
    jax.block_until_ready(vals)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        vals, numops, normres = solve(x0)
    jax.block_until_ready(vals)
    t1 = time.perf_counter()

    dt = (t1 - t0) / reps
    # correctness guard: top Laplacian eigenvalues are 4 - O((pi/n)^2) ~= 4.0 in f32
    import numpy as np

    assert np.allclose(np.asarray(vals), 4.0, atol=2e-2), np.asarray(vals)
    nnz = 3 * n
    ops = int(numops)
    value = ops * nnz / dt
    baseline = 1e9  # est. reference single-CPU SpMV+orthog throughput (nnz/s)
    print(
        json.dumps(
            {
                "metric": "lanczos_eigsolve_spmv_orthog_throughput",
                "value": value,
                "unit": "nnz/s",
                "vs_baseline": value / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
