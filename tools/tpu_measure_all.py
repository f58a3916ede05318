"""One-process on-chip measurement battery (round 3).

Every TPU process start/stop risks wedging the axon tunnel (CLAUDE.md), so all
remaining round-3 measurements run sequentially in THIS one process, flushing
after each line:

  1. bucket probe   — does a static basis-prefix slice cut expansion traffic?
  2. flagship A/B   — bench.py solve with bucketed sweeps OFF vs ON
  3. per-phase split— expand@k / process / restart slope times
  4. configs 1-4    — benchmarks/run_all.py rows (refreshed RESULTS.md data)

Run: `timeout 3000 python -u tools/tpu_measure_all.py > /tmp/measure_all.log 2>&1`
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

SECTION = lambda s: print(f"\n### {s}", flush=True)


def fetch(x):
    return float(jnp.sum(x) if hasattr(x, "shape") and x.size > 1 else x)


def slope_loop(step, x, r_lo=100, r_hi=1100, pairs=2):
    """min-of-pairs slope of an in-device fori_loop with scalar end fetch."""

    @jax.jit
    def loop(x, r):
        return jnp.sum(jax.lax.fori_loop(0, r, lambda _, v: step(v), x))

    float(loop(x, r_lo))  # compile
    los, his = [], []
    for _ in range(pairs):
        t0 = time.perf_counter(); float(loop(x, r_lo))
        t1 = time.perf_counter(); float(loop(x, r_hi))
        t2 = time.perf_counter()
        los.append(t1 - t0); his.append(t2 - t1)
    return (min(his) - min(los)) / (r_hi - r_lo)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    n = 1 << 21
    R = n // 128
    KMAX = 31
    _HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)

    # ---------------- 1. bucket probe ----------------
    SECTION("bucket probe: expansion-shaped step vs static prefix B")
    V = jnp.asarray(rng.standard_normal((KMAX, R, 128)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    jax.block_until_ready(V)

    def make_step(B):
        def step(w):
            Vb = jax.lax.slice(V, (0, 0, 0), (B, R, 128))
            c = jax.lax.dot_general(Vb, w, (((1, 2), (0, 1)), ((), ())),
                                    precision=_HI)
            y = jax.lax.dot_general(c, Vb, (((0,), (0,)), ((), ())),
                                    precision=_HI)
            w2 = w - y
            return w2 / jnp.sqrt(jnp.sum(w2 * w2))

        return step

    for B in (8, 16, 24, 31):
        dt = slope_loop(make_step(B), w0)
        gb = (2 * B + 4) * n * 4 / dt / 1e9
        print(f"  B={B:2d}: {dt*1e3:7.4f} ms  ({gb:5.0f} GB/s @ 2B+4 rows)",
              flush=True)

    # ---------------- 2. flagship A/B: bucketed sweeps off/on --------------
    SECTION("flagship config-1 solve: bucketed sweeps OFF vs ON")
    import krylovkit_tpu as kk
    from krylovkit_tpu.ops import orthonormal as on
    from krylovkit_tpu.parallel import laplacian_1d
    from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.ones((n // 128, 128), jnp.float32)

    def run_solve(tag):
        alg = kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30, orth=kk.cgs)

        @jax.jit
        def solve(x0):
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
        ops = int(numops)
        print(f"  {tag}: {dt*1e3:7.1f} ms, {ops} applies, "
              f"{ops * 3 * n / dt / 1e9:6.2f} Gnnz/s, vals[0]={float(vals[0]):.4f}",
              flush=True)
        return dt

    on.use_bucketed_sweeps = False
    dt_off = run_solve("buckets OFF")
    on.use_bucketed_sweeps = True
    dt_on = run_solve("buckets ON ")
    print(f"  speedup: {dt_off / dt_on:.3f}x", flush=True)

    # ---------------- 3. per-phase split ----------------
    SECTION("per-phase split (expand@k, process, restart)")
    from krylovkit_tpu.factorizations import krylov as kf
    from krylovkit_tpu.solvers import lanczos as lz

    m = 30
    fact0 = kf.initialize(x0, m, jnp.float32)
    expand = jax.jit(lambda f: kf.expand_hermitian(op.normal, f, kk.cgs))
    facts = {}
    f = fact0
    for k in range(m):
        if k in (7, 15, 23, 29):
            facts[k] = f
        f = expand(f)
    facts[30] = f
    jax.block_until_ready(facts[30].V)

    for k in (7, 15, 23, 29):
        fk = facts[k]

        def step(fact, k=k):
            f2 = kf.expand_hermitian(op.normal, fact, kk.cgs)
            return kf.KrylovState(f2.V, f2.H, fact.k, f2.beta)

        @jax.jit
        def loop(fact, r):
            out = jax.lax.fori_loop(0, r, lambda _, fa: step(fa), fact)
            return out.beta + out.V[0, 0, 0]

        float(loop(fk, 100))
        t0 = time.perf_counter(); float(loop(fk, 100))
        t1 = time.perf_counter(); float(loop(fk, 1100))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 1000
        print(f"  expand@k={k:2d}: {dt*1e3:7.4f} ms", flush=True)

    fact = facts[30]
    tol = jnp.float32(1e-30)

    @jax.jit
    def proc_loop(H, beta, r):
        def body(i, carry):
            H, acc = carry
            nconv, vals, U, res = lz._process(H, jnp.int32(m), beta, "LM", tol, 4)
            return H + 1e-30 * jnp.real(U), acc + vals[0]
        H2, acc = jax.lax.fori_loop(0, r, body, (H, jnp.float32(0)))
        return acc + H2[0, 0]

    float(proc_loop(fact.H, fact.beta, 50))
    t0 = time.perf_counter(); float(proc_loop(fact.H, fact.beta, 50))
    t1 = time.perf_counter(); float(proc_loop(fact.H, fact.beta, 550))
    t2 = time.perf_counter()
    print(f"  process@k=30: {(((t2-t1)-(t1-t0))/500)*1e3:7.4f} ms", flush=True)

    nconv, vals, U, res = jax.jit(
        lambda H, b: lz._process(H, jnp.int32(m), b, "LM", tol, 4)
    )(fact.H, fact.beta)
    keep = jnp.clip((3 * m + 2 * jnp.int32(0)) // 5, 1, m - 1)
    keep_max = min((3 * m + 2 * 3) // 5, m - 1)

    @jax.jit
    def rs_loop(fact, vals, U, r):
        def body(i, fa):
            f2 = lz._restart(fa, vals, U, fa.beta, keep, keep_max,
                             gate=jnp.asarray(True))
            return kf.KrylovState(f2.V, f2.H, fa.k, f2.beta)
        out = jax.lax.fori_loop(0, r, body, fact)
        return out.beta + out.V[0, 0, 0] + out.H[0, 0]

    float(rs_loop(fact, vals, U, 50))
    t0 = time.perf_counter(); float(rs_loop(fact, vals, U, 50))
    t1 = time.perf_counter(); float(rs_loop(fact, vals, U, 550))
    t2 = time.perf_counter()
    print(f"  restart(keep_max={keep_max}): {(((t2-t1)-(t1-t0))/500)*1e3:7.4f} ms",
          flush=True)

    # ---------------- 4. configs 1-4 ----------------
    SECTION("benchmarks/run_all.py configs")
    import benchmarks.run_all as ra

    for c in (ra.config1, ra.config2, ra.config3, ra.config4):
        try:
            c()
        except Exception as e:
            print(f"  {c.__name__} FAILED: {type(e).__name__}: {e}", flush=True)

    print("\n### done", flush=True)


if __name__ == "__main__":
    main()
