"""Decompose config-1's ~39 ms/solve fixed cost (RESULTS.md hot spot #1).

Three independent slopes, each defeating the axon tunnel's round-trip jitter
by measuring differences of back-to-back async dispatch chains with a single
device_get at the end (CLAUDE.md "Perf facts" methodology):

  1. reps-slope at fixed maxiter  — true per-solve wall cost as seen by a
     client issuing solves back-to-back (what bench.py measures).
  2. maxiter-slope at fixed reps  — per-restart-cycle cost; the intercept is
     the per-solve fixed cost (init + extraction + dispatch).
  3. trivial-dispatch reps-slope  — pure tunnel dispatch cost per call, to
     split the intercept into client overhead vs on-device fixed work.
  4. in-device chained solves     — a lax.fori_loop over whole solves with a
     data dependency between them: per-solve cost with ZERO dispatches, the
     honest on-device number.

Run alone on the chip: `timeout 900 python tools/bench_fixed_cost.py`.
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

n = 1 << 21
R = n // 128


def chain_time(fn, x0, reps):
    """Issue `reps` dependent solves back-to-back, sync once via device_get."""
    out = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    jax.device_get(out)
    return time.perf_counter() - t0


def main():
    # probe the tunnel first (CLAUDE.md: first op after idle can take ~70 s)
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)

    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.ones((R, 128), jnp.float32)

    def make_solve(mi):
        alg = kk.Lanczos(krylovdim=30, maxiter=mi, tol=1e-30, orth=kk.cgs)

        @jax.jit
        def solve(x):
            vals, vecs, info = eigsolve_lanczos(op, x, 4, "LM", alg)
            # feed the leading eigvec back in so chained solves have a real
            # data dependency (prevents overlap-hiding of the solve itself)
            nxt = vecs[0] + 1e-6 * x
            return nxt / jnp.linalg.norm(nxt)

        return solve

    # --- 3. trivial dispatch cost ---
    triv = jax.jit(lambda x: x * 1.000001)
    jax.device_get(triv(x0))
    t10 = chain_time(triv, x0, 10)
    t40 = chain_time(triv, x0, 40)
    disp = (t40 - t10) / 30
    print(f"trivial dispatch: {disp*1e3:.3f} ms/call (t10={t10:.3f} t40={t40:.3f})", flush=True)

    # --- 1+2. solve cost vs maxiter and reps ---
    per_solve = {}
    for mi in (1, 3, 10):
        solve = make_solve(mi)
        jax.device_get(solve(x0))  # compile
        t3 = chain_time(solve, x0, 3)
        t11 = chain_time(solve, x0, 11)
        per_solve[mi] = (t11 - t3) / 8
        print(f"maxiter={mi:2d}: {per_solve[mi]*1e3:8.2f} ms/solve (reps-slope)", flush=True)

    per_iter = (per_solve[10] - per_solve[1]) / 9
    fixed = per_solve[1] - per_iter
    print(f"per-restart-cycle: {per_iter*1e3:.2f} ms", flush=True)
    print(f"fixed (init+extract+dispatch): {fixed*1e3:.2f} ms", flush=True)
    print(f"  of which trivial dispatch:   {disp*1e3:.2f} ms", flush=True)

    # --- 4. fully in-device chained solves (no dispatch at all) ---
    alg = kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30, orth=kk.cgs)

    def make_loop(k):
        @jax.jit
        def run(x):
            def body(i, x):
                vals, vecs, info = eigsolve_lanczos(op, x, 4, "LM", alg)
                nxt = vecs[0] + 1e-6 * x
                return nxt / jnp.linalg.norm(nxt)

            out = jax.lax.fori_loop(0, k, body, x)
            return out.sum()

        return run

    f2, f6 = make_loop(2), make_loop(6)
    jax.device_get(f2(x0)); jax.device_get(f6(x0))
    # several rounds, min of the differences: a single (t2-t1)-(t1-t0) sample
    # can be dominated by tunnel round-trip jitter (25 ms-1 s, CLAUDE.md)
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.device_get(f2(x0))
        t1 = time.perf_counter(); jax.device_get(f6(x0))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    ondev = min(diffs) / 4
    print(f"in-device per-solve (maxiter=10): {ondev*1e3:.2f} ms "
          f"(min of {len(diffs)} rounds)", flush=True)
    print(f"=> client-side overhead per dispatched solve: "
          f"{(per_solve[10]-ondev)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
