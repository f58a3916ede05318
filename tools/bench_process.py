"""Time the per-restart processing pipeline pieces on the chip:
eigh_active(31x31), sort_perm, full _process, and the restart transform —
to find where the ~2.9 ms/processing of the flagship bench goes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from krylovkit_tpu import dense
from krylovkit_tpu.solvers.lanczos import _process

m1 = 31


def slope(make_loop, *args):
    f5, f45 = make_loop(5), make_loop(45)
    jax.device_get(f5(*args)); jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def chainloop(step):
    def make_loop(reps):
        @jax.jit
        def f(T):
            def body(i, T):
                return step(T)
            out = jax.lax.fori_loop(0, reps, body, T)
            return jnp.sum(out)
        return f
    return make_loop


rng = np.random.default_rng(0)
d = rng.standard_normal(m1).astype(np.float32)
e = rng.standard_normal(m1 - 1).astype(np.float32) * 0.5
T0 = jnp.asarray(np.diag(d) + np.diag(e, -1) + np.diag(e, 1), jnp.float32)
k = jnp.int32(30)


def step_eigh(T):
    w, U, valid = dense.eigh_active(T, k)
    # chain: rebuild a tridiagonal-ish matrix from the outputs
    return T + 1e-12 * (U @ jnp.diag(w) @ U.T)


dt = slope(chainloop(step_eigh), T0)
print(f"eigh_active(31,f32):       {dt*1e3:7.3f} ms")


def step_proc(T):
    nconv, w, U, res = _process(T, k, jnp.float32(0.5), "LM", jnp.float32(1e-30), 4)
    return T + 1e-12 * (U.real @ jnp.diag(w) @ U.real.T) + 1e-12 * res[0]


dt = slope(chainloop(step_proc), T0)
print(f"_process (eigh+sort+conv): {dt*1e3:7.3f} ms")
