"""Per-phase time split of the flagship config-1 Lanczos solve (VERDICT r2 #3).

Slope-times (t(45) - t(5))/40 each phase as an honest in-device loop with a
real data dependency chained through the iterations:

  expand@k   — one Hermitian CGS expansion at pinned active size k
               (SpMV + full-basis project + unproject + normalize + appends)
  process    — eigh_active(31) + sort + convergence count
  restart    — masked thick-restart (transform_partial Pallas + arrowhead H)
  full solve — bench.py's exact solve for cross-checking the sum

Run on the real chip: `timeout 600 python tools/bench_phases.py`.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers import lanczos as lz

n = 1 << 21
m = 30
R = n // 128


def slope(make_loop, *args):
    f5, f45 = make_loop(5), make_loop(45)
    jax.device_get(f5(*args)); jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def main():
    op = laplacian_1d(n, jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    fact0 = kf.initialize(x0, m, jnp.float32)

    # build a size-k factorization once (host loop over jitted expansions)
    expand = jax.jit(lambda f: kf.expand_hermitian(op.normal, f, kk.cgs))
    facts = {}
    f = fact0
    for k in range(m):
        if k in (15, 23, 29):
            facts[k] = f
        f = expand(f)
    facts[30] = f
    jax.block_until_ready(facts[30].V)

    # --- expand at pinned k: chain V through reps, reset k each step ---
    for k in (15, 23, 29):
        def make_loop(reps, k=k):
            @jax.jit
            def run(fact):
                def body(i, fact):
                    f2 = kf.expand_hermitian(op.normal, fact, kk.cgs)
                    return kf.KrylovState(f2.V, f2.H, fact.k, f2.beta)
                out = jax.lax.fori_loop(0, reps, body, fact)
                return out.beta + out.V[0][0, 0]
            return run
        dt = slope(make_loop, facts[k])
        # traffic model: project+unproject stream full 31-row basis
        gb = (2 * 31 * n + 6 * n) * 4 / dt / 1e9
        print(f"expand@k={k:2d}: {dt*1e3:7.3f} ms   ({gb:5.0f} GB/s if full-31-row streams)")

    # --- process (projected eig + sort + conv count) ---
    fact = facts[30]
    tol = jnp.float32(1e-30)

    def make_proc(reps):
        @jax.jit
        def run(H, beta):
            def body(i, carry):
                H, acc = carry
                nconv, vals, U, res = lz._process(H, jnp.int32(m), beta, "LM", tol, 4)
                return H + 1e-30 * jnp.real(U), acc + vals[0]
            H2, acc = jax.lax.fori_loop(0, reps, body, (H, jnp.float32(0)))
            return acc + H2[0, 0]
        return run

    dt_proc = slope(make_proc, fact.H, fact.beta)
    print(f"process@k=30: {dt_proc*1e3:7.3f} ms")

    # --- restart (masked, gate=True) ---
    nconv0 = jnp.int32(0)
    keep_raw = (3 * m + 2 * nconv0) // 5
    keep = jnp.clip(keep_raw, 1, m - 1)
    keep_max = min((3 * m + 2 * 3) // 5, m - 1)

    def make_restart(reps):
        @jax.jit
        def run(fact, vals, U):
            def body(i, fact):
                f2 = lz._restart(fact, vals, U, fact.beta, keep,
                                 keep_max, gate=jnp.asarray(True))
                # re-pin k so every rep does the same-size restart
                return kf.KrylovState(f2.V, f2.H, fact.k, f2.beta)
            out = jax.lax.fori_loop(0, reps, body, fact)
            return out.beta + out.V[0][0, 0] + out.H[0, 0]
        return run

    nconv, vals, U, res = jax.jit(
        lambda H, b: lz._process(H, jnp.int32(m), b, "LM", tol, 4)
    )(fact.H, fact.beta)
    dt_rs = slope(make_restart, fact, vals, U)
    print(f"restart(keep_max={keep_max}): {dt_rs*1e3:7.3f} ms")

    # --- full solve for the cross-check ---
    from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos
    alg = kk.Lanczos(krylovdim=m, maxiter=10, tol=1e-30, orth=kk.cgs)

    @jax.jit
    def solve(x0):
        vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
        return vals, info.numops

    x1 = jnp.ones((R, 128), jnp.float32)
    vals_, numops = solve(x1)
    jax.block_until_ready(vals_)
    t0 = time.perf_counter()
    for _ in range(3):
        vals_, numops = solve(x1)
    jax.block_until_ready(vals_)
    t1 = time.perf_counter()
    dt_solve = (t1 - t0) / 3
    numops = int(numops)
    print(f"full solve: {dt_solve*1e3:.1f} ms, numops={numops}")

    # reconstruction: iter1 = 30 expands, 9 restarts * 15 expands
    n_exp = numops
    avg_exp = None
    # crude average expand cost: weight measured points
    print("--- reconstruction ---")
    print(f"  expands ({n_exp}) at avg of measured ks, "
          f"10x process ({10*dt_proc*1e3:.1f} ms), "
          f"10x restart ({10*dt_rs*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
