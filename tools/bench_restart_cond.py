"""Does lax.cond around the aliased pallas transform force a copy?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from krylovkit_tpu.ops import basis as bs

kmax = 31
n = 1 << 21
R = n // 128
m_out = 20


def slope(make_loop, *args):
    f5, f45 = make_loop(5), make_loop(45)
    jax.device_get(f5(*args)); jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def run(name, step):
    def make_loop(reps):
        @jax.jit
        def f(V, U):
            def body(i, V):
                return step(V, U, i)
            out = jax.lax.fori_loop(0, reps, body, V)
            return jnp.sum(out[0, 0])
        return f

    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)), jnp.float32) / np.sqrt(n)
    U = jnp.asarray(rng.standard_normal((kmax, kmax)), jnp.float32) * 0.1
    dt = slope(make_loop, V, U)
    print(f"{name:36s}: {dt*1e3:7.3f} ms")


run("xla transform (old)", lambda V, U, i: bs.transform(V, U))
run("pallas transform_partial", lambda V, U, i: bs.transform_partial(V, U, m_out))
run(
    "pallas partial in lax.cond(True)",
    lambda V, U, i: jax.lax.cond(
        i >= 0, lambda v: bs.transform_partial(v, U, m_out), lambda v: v, V
    ),
)
run(
    "xla transform in lax.cond(True)",
    lambda V, U, i: jax.lax.cond(
        i >= 0, lambda v: bs.transform(v, U), lambda v: v, V
    ),
)
