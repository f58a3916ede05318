"""Probe: does a static row-prefix slice of the basis reduce expansion HBM
traffic, or does XLA:TPU materialize the slice as a copy?

Times one cgs Hermitian-expansion-shaped step (project + unproject + subtract
+ normalize) against a static basis prefix of B rows, for B in (8, 16, 24, 31).
If time scales ~linearly with B, bucketed lax.switch projections are the
flagship perf lever (read only ceil-to-bucket rows instead of kmax=31).

Run alone on the chip: `timeout 900 python tools/bench_bucket_probe.py`.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

n = 1 << 21
R = n // 128
KMAX = 31
_HI = jax.lax.Precision.HIGHEST


def make_step(B):
    """One expansion-shaped step against the first B basis rows."""

    def step(V, w):
        Vb = jax.lax.slice(V, (0, 0, 0), (B, R, 128))
        c = jax.lax.dot_general(Vb, w, (((1, 2), (0, 1)), ((), ())),
                                precision=_HI)
        y = jax.lax.dot_general(c, Vb, (((0,), (0,)), ((), ())),
                                precision=_HI)
        w2 = w - y
        nrm = jnp.sqrt(jnp.sum(w2 * w2))
        return w2 / nrm

    return step


def slope(fn, V, w, r_lo=100, r_hi=1100):
    @jax.jit
    def loop(V, w, r):
        def body(_, w):
            return fn(V, w)

        return jnp.sum(jax.lax.fori_loop(0, r, body, w))

    float(loop(V, w, r_lo))
    t0 = time.perf_counter(); float(loop(V, w, r_lo))
    t1 = time.perf_counter(); float(loop(V, w, r_hi))
    # one more pair for a min-of-2
    t2 = time.perf_counter(); float(loop(V, w, r_lo))
    t3 = time.perf_counter(); float(loop(V, w, r_hi))
    t4 = time.perf_counter()
    lo = min(t1 - t0, t3 - t2)
    hi = min(t2 - t1, t4 - t3)
    return (hi - lo) / (r_hi - r_lo)


def main():
    rng = np.random.default_rng(0)
    print(f"# devices: {jax.devices()}", flush=True)
    V = jnp.asarray(rng.standard_normal((KMAX, R, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    jax.block_until_ready(V)
    print(f"{'B':>3s} {'ms/step':>9s} {'GB/s @2B-rows':>13s}", flush=True)
    for B in (8, 16, 24, 31):
        dt = slope(make_step(B), V, w)
        gb = (2 * B + 4) * n * 4 / dt / 1e9
        print(f"{B:3d} {dt*1e3:9.4f} {gb:13.0f}", flush=True)


if __name__ == "__main__":
    main()
