"""Follow-up one-process on-chip measurements (round 3):

  1. fixed-overhead split of the flagship solve: time vs maxiter ∈ {1,2,5,10}
     — the intercept is per-solve fixed cost (init + extraction + dispatch),
     the slope is per-restart-cycle cost
  2. config 2 (CG tol fix + GMRES row)
  3. bench.py headline JSON line

Run: `timeout 2400 python -u tools/tpu_measure_followup.py`
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    n = 1 << 21
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.ones((n // 128, 128), jnp.float32)

    print("\n### fixed-overhead split: solve time vs maxiter", flush=True)
    times = {}
    for mi in (1, 2, 5, 10):
        alg = kk.Lanczos(krylovdim=30, maxiter=mi, tol=1e-30, orth=kk.cgs)

        @jax.jit
        def solve(x0, alg=alg):
            vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
            return vals, info.numops

        vals, numops = solve(x0)
        jax.block_until_ready(vals)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            vals, numops = solve(x0)
        jax.block_until_ready(vals)
        dt = (time.perf_counter() - t0) / reps
        times[mi] = dt
        print(f"  maxiter={mi:2d}: {dt*1e3:7.1f} ms, {int(numops)} applies",
              flush=True)
    # least-squares line through (cycles, time): fixed = intercept
    mis = np.array(sorted(times))
    ts = np.array([times[m] for m in mis])
    A = np.stack([mis, np.ones_like(mis)], axis=1).astype(float)
    slope, intercept = np.linalg.lstsq(A, ts, rcond=None)[0]
    print(f"  per-cycle {slope*1e3:.2f} ms, fixed {intercept*1e3:.2f} ms",
          flush=True)

    print("\n### config 2", flush=True)
    import benchmarks.run_all as ra

    try:
        ra.config2()
    except Exception as e:
        print(f"  config2 FAILED: {type(e).__name__}: {e}", flush=True)

    print("\n### bench.py headline", flush=True)
    import bench

    bench.main()
    print("\n### done", flush=True)


if __name__ == "__main__":
    main()
