"""A/B the bucket ladder granularity inside ONE process (tunnel-jitter-proof).

Traces the flagship config-1 solve twice — once with the old quartile ladder
(8,16,24,31), once with the current step-4 + (kmax-1) ladder — and times both
as chained back-to-back dispatch runs, interleaved A B A B to cancel drift.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

n = 1 << 21
R = n // 128


def quartile_ladder(kmax):
    if kmax < 8:
        return (kmax,)
    return tuple(sorted({-(-kmax // 4), -(-kmax // 2), -(-3 * kmax // 4), kmax}))


def make_solve():
    op = laplacian_1d(n, jnp.float32)
    alg = kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30, orth=kk.cgs)

    @jax.jit
    def solve(x):
        vals, vecs, info = eigsolve_lanczos(op, x, 4, "LM", alg)
        nxt = vecs[0] + 1e-6 * x
        return nxt / jnp.linalg.norm(nxt)

    return solve


def chain(fn, x0, reps):
    out = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    jax.device_get(out)
    return time.perf_counter() - t0


def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    x0 = jnp.ones((R, 128), jnp.float32)

    ladder_new = bs.buckets_for
    solve_new = make_solve()
    jax.device_get(solve_new(x0))  # compile with new ladder

    # try/finally: if solve_old's compile throws, the process-global ladder
    # must not stay monkeypatched (trap when copied into one-process batteries)
    bs.buckets_for = quartile_ladder
    try:
        solve_old = make_solve()
        jax.device_get(solve_old(x0))  # compile with old ladder
    finally:
        bs.buckets_for = ladder_new

    print(f"ladders: old={quartile_ladder(31)} new={ladder_new(31)}", flush=True)
    res = {"old": [], "new": []}
    for rnd in range(3):
        for name, fn in (("old", solve_old), ("new", solve_new)):
            t3 = chain(fn, x0, 3)
            t11 = chain(fn, x0, 11)
            per = (t11 - t3) / 8
            res[name].append(per)
            print(f"round {rnd} {name}: {per*1e3:8.2f} ms/solve", flush=True)
    mo = min(res["old"]); mn = min(res["new"])
    print(f"best old {mo*1e3:.2f} ms  best new {mn*1e3:.2f} ms  "
          f"speedup {mo/mn:.3f}x", flush=True)


if __name__ == "__main__":
    main()
