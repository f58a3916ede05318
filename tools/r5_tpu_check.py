"""Round-5 on-chip validation + bench: grid kernel, with_drift, dgks mode.

One TPU process, in order:
  1. tunnel probe
  2. fused_step correctness on-chip: chain (+drift packing) and 2-D grid
  3. config-1 eigsolve bench: orth=cgs (fused single-sweep) vs DEFAULT
     orth=cgs2 (fused one-reduce DGKS) vs unfused cgs2
  4. config-2 GMRES(30) fixed-budget bench (fused, default orth) + the
     convergent shifted row
  5. config-4 schursolve + exponentiate with default orth

Run alone on the chip: ``timeout 3600 python tools/r5_tpu_check.py``.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops import pallas_fused_lanczos as pf
from krylovkit_tpu.ops.operator import GridStencilOperator, StencilOperator
from krylovkit_tpu.parallel import laplacian_1d, poisson_2d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

REPS = 3


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS, out


def check_chain(with_drift):
    n, B, kp1, kmax = 1 << 16, 16, 13, 31
    R = n // 128
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)).astype("float32"))
    y = jnp.asarray(rng.standard_normal((R, 128)).astype("float32"))
    g = jnp.asarray(rng.standard_normal(kmax + 1).astype("float32"))
    op = StencilOperator((-1, 0, 1), (-1.0, 2.0, -1.0))
    spec = pf.spec_for(op)
    T = pf.choose_tile(R, 256, spec.h)
    Vn, yn, raw, wb, ynb = pf.fused_step(
        V, y, pf.boundary_cache(V, T, spec.h), pf.boundary_cache(y, T, spec.h),
        g, jnp.int32(kp1), B, spec, with_drift=with_drift,
    )
    W = g[kmax] * y - jnp.einsum("j,jrc->rc", g[:B], V[:B])
    ynr = op.normal(W)
    sc = float(jnp.max(jnp.abs(ynr)))
    e1 = float(jnp.max(jnp.abs(yn - ynr))) / sc
    r = jnp.einsum("jrc,rc->j", V[:B], ynr)
    mask = np.arange(B) != kp1
    e2 = float(jnp.max(jnp.abs((raw[:B] - r))[np.where(mask)[0]])) / (
        float(jnp.max(jnp.abs(r))) + 1e-30
    )
    errs = [e1, e2]
    if with_drift:
        dref = jnp.einsum("jrc,rc->j", V[:B], W)
        e3 = float(jnp.max(jnp.abs((raw[B : 2 * B] - dref))[np.where(mask)[0]])) / (
            float(jnp.max(jnp.abs(dref))) + 1e-30
        )
        rp, q = raw[2 * B], raw[2 * B + 1]
        errs.append(e3)
    else:
        rp, q = raw[B], raw[B + 1]
    errs.append(abs(float(rp - jnp.sum(W * ynr))) / abs(float(jnp.sum(W * ynr))))
    errs.append(abs(float(q - jnp.sum(W * W))) / abs(float(jnp.sum(W * W))))
    ok = all(e < 5e-4 for e in errs)
    print(f"chain fused_step drift={with_drift}: "
          + " ".join(f"{e:.1e}" for e in errs) + ("  OK" if ok else "  FAIL"),
          flush=True)
    return ok


def check_grid():
    gr, gc = 64, 512  # mrow=4, h=4, R=256
    op = poisson_2d(gr, gc, jnp.float32)
    spec = pf.spec_for(op)
    kmax, R = 13, gr * gc // 128
    rng = np.random.default_rng(1)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)).astype("float32"))
    y = jnp.asarray(rng.standard_normal((R, 128)).astype("float32"))
    g = jnp.asarray(rng.standard_normal(kmax + 1).astype("float32"))
    B, kp1 = 8, 9
    T = pf.choose_tile(R, 64, spec.h)
    Vn, yn, raw, wb, ynb = pf.fused_step(
        V, y, pf.boundary_cache(V, T, spec.h), pf.boundary_cache(y, T, spec.h),
        g, jnp.int32(kp1), B, spec, tile_rows=64,
    )
    W = g[kmax] * y - jnp.einsum("j,jrc->rc", g[:B], V[:B])
    ynr = op.normal(W)
    sc = float(jnp.max(jnp.abs(ynr)))
    e1 = float(jnp.max(jnp.abs(yn - ynr))) / sc
    ok = e1 < 5e-4
    print(f"grid fused_step (h={spec.h}, mrow={spec.mrow}): {e1:.1e}"
          + ("  OK" if ok else "  FAIL"), flush=True)
    return ok


def bench_config1():
    n = 1 << 21
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    for label, alg, fused in (
        ("cgs fused", kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30,
                                 orth=kk.cgs), True),
        ("cgs2 DGKS fused (DEFAULT)", kk.Lanczos(krylovdim=30, maxiter=10,
                                                 tol=1e-30), True),
        ("cgs2 unfused", kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30),
         False),
    ):
        kf.use_fused_expansion = fused

        @jax.jit
        def solve(x0):
            vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
            return vals, info.numops

        dt, (vals, numops) = timed(solve, x0)
        ops = int(numops)
        assert np.allclose(np.asarray(vals), 4.0, atol=2e-2), np.asarray(vals)
        print(f"config1 {label:28s}: {ops * 3 * n / dt / 1e9:6.2f} Gnnz/s "
              f"({ops} applies / {dt*1e3:.1f} ms)", flush=True)
    kf.use_fused_expansion = True


def bench_config2():
    nx = ny = 1024
    n = nx * ny
    op = poisson_2d(nx, ny, jnp.float32)
    b = jnp.ones((n // 128, 128), jnp.float32)

    for label, fused in (("fused (default cgs2→DGKS)", True),
                         ("unfused", False)):
        kf.use_fused_expansion = fused

        @jax.jit
        def solve(b):
            x, info = kk.linsolve(op, b, alg=kk.GMRES(krylovdim=30, tol=1e-4,
                                                      maxiter=14))
            return x, info.numops, info.normres

        dt, (x, numops, nres) = timed(solve, b)
        ops = int(numops)
        print(f"config2 GMRES {label:26s}: {ops * 5 * n / dt / 1e9:6.2f} "
              f"Gnnz/s ({ops} applies / {dt*1e3:.1f} ms, "
              f"normres={float(nres):.2e})", flush=True)
    kf.use_fused_expansion = True

    @jax.jit
    def solve_conv(b):
        x, info = kk.linsolve(op, b, a0=0.5,
                              alg=kk.GMRES(krylovdim=30, tol=5e-5, maxiter=20))
        return x, info.numops, info.normres, info.numiter, info.converged

    dt, (x, numops, nres, niter, conv) = timed(solve_conv, b)
    ops = int(numops)
    print(f"config2 GMRES shifted CONVERGENT: conv={int(conv)} in "
          f"{int(niter)} restarts, {ops} applies / {dt*1e3:.1f} ms "
          f"({ops * 5 * n / dt / 1e9:.2f} Gnnz/s), true normres="
          f"{float(nres):.2e}", flush=True)


def bench_config4():
    n = 1 << 20
    op = StencilOperator((-1, 0, 1), (-1.3, 2.0, -0.7))
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((n // 128, 128)), jnp.float32
    )

    @jax.jit
    def solve(x0):
        T, vecs, (re, im), info = kk.schursolve(
            op, x0, 4, "LM", krylovdim=30, maxiter=8, tol=1e-30)
        return re, info.numops

    dt, (re, numops) = timed(solve, x0)
    ops = int(numops)
    print(f"config4 schursolve DEFAULT orth : {ops * 3 * n / dt / 1e9:6.2f} "
          f"Gnnz/s ({ops} applies / {dt*1e3:.1f} ms)", flush=True)

    neg_lap = StencilOperator((-1, 0, 1), (1.0, -2.0, 1.0))

    def step(x0):
        y, info = kk.exponentiate(neg_lap, 0.1, x0, krylovdim=30, tol=1e-4,
                                  ishermitian=True)
        return y, info.numops

    y, numops = step(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(REPS):
        y, numops = step(x0)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / REPS
    ops = int(numops)
    print(f"config4 exponentiate DEFAULT    : {ops * 3 * n / dt / 1e9:6.2f} "
          f"Gnnz/s ({ops} applies / {dt*1e3:.1f} ms)", flush=True)


def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    ok = check_chain(False) and check_chain(True) and check_grid()
    if not ok:
        print("CORRECTNESS FAILURES — stopping before benches")
        sys.exit(1)
    bench_config1()
    bench_config2()
    bench_config4()


if __name__ == "__main__":
    main()
