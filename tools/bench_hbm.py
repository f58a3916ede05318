"""HBM rate characterization on the axon chip: pure-read vs read+write mixes
over the (31, R, 128) basis buffer, to locate the transform's 335 GB/s wall."""

import time

import jax
import jax.numpy as jnp
import numpy as np

kmax = 31
n = 1 << 21
R = n // 128


def slope(make_loop, *args):
    f5, f45 = make_loop(5), make_loop(45)
    jax.device_get(f5(*args)); jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def main():
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)), jnp.float32) / np.sqrt(n)
    x = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((kmax, kmax)), jnp.float32) * 0.1
    HI = jax.lax.Precision.HIGHEST

    # 1. pure read: projection c = V·x (reads 31n + n, writes 31 scalars)
    def mk_read(reps):
        @jax.jit
        def f(V, x):
            def body(i, x):
                c = jax.lax.dot_general(V, x, (((1, 2), (0, 1)), ((), ())), precision=HI)
                # feed c back into x to chain (rank-1ish update, reads nothing big)
                return x * (1 + 0e0 * c[0])
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))
        return f

    dt = slope(mk_read, V, x)
    print(f"project (read 32n):        {dt*1e3:7.3f} ms  {32*n*4/dt/1e9:6.1f} GB/s")

    # 2. elementwise copy: W = V * a (reads 31n, writes 31n)
    def mk_copy(reps):
        @jax.jit
        def f(V):
            def body(i, V):
                return V * 1.000001
            return jnp.sum(jax.lax.fori_loop(0, reps, body, V)[0, 0])
        return f

    dt = slope(mk_copy, V)
    print(f"scale (read+write 62n):    {dt*1e3:7.3f} ms  {62*n*4/dt/1e9:6.1f} GB/s")

    # 3. unproject: y = c·V (reads 31n, writes n)
    def mk_unproj(reps):
        @jax.jit
        def f(V, x):
            c0 = jnp.ones((kmax,), jnp.float32)
            def body(i, x):
                y = jax.lax.dot_general(c0, V, (((0,), (0,)), ((), ())), precision=HI)
                return x + y * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))
        return f

    dt = slope(mk_unproj, V, x)
    print(f"unproject (read 32n wr n): {dt*1e3:7.3f} ms  {33*n*4/dt/1e9:6.1f} GB/s")

    # 4. the transform GEMM again for reference
    def mk_tr(reps):
        @jax.jit
        def f(V, U):
            def body(i, V):
                return jax.lax.dot_general(U.T, V, (((1,), (0,)), ((), ())), precision=HI)
            return jnp.sum(jax.lax.fori_loop(0, reps, body, V)[0, 0])
        return f

    dt = slope(mk_tr, V, U)
    print(f"transform (r+w 62n GEMM):  {dt*1e3:7.3f} ms  {62*n*4/dt/1e9:6.1f} GB/s")

    # 5. two half-size transforms pipelined? (split N dim in two sequential GEMMs)
    def mk_tr2(reps):
        @jax.jit
        def f(V, U):
            def body(i, V):
                h = R // 2
                a = jax.lax.dot_general(U.T, V[:, :h], (((1,), (0,)), ((), ())), precision=HI)
                b = jax.lax.dot_general(U.T, V[:, h:], (((1,), (0,)), ((), ())), precision=HI)
                return jnp.concatenate([a, b], axis=1)
            return jnp.sum(jax.lax.fori_loop(0, reps, body, V)[0, 0])
        return f

    dt = slope(mk_tr2, V, U)
    print(f"transform split-N:         {dt*1e3:7.3f} ms  {62*n*4/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
