"""Pallas kernel candidates for the thick-restart basis transform.

W[i, r, c] = sum_j U[j, i] V[j, r, c]   (V: (kmax, R, 128) f32, U: (kmax, kmax))

XLA's emitter runs this at ~320 GB/s (tools/bench_transform.py); candidates:
  A. rank-3 in-kernel dot_general (contract dim 0)
  B. in-kernel reshape (kmax, Br, 128)->(kmax, Br*128) + 2-D dot + reshape back
  C. VPU accumulation: W += U[j,i] * V[j]  (fori over j, broadcast multiply)
Each checked numerically against the XLA reference on the first block.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

kmax = 31
n = 1 << 21
R = n // 128
Br = 256  # rows per block: in 31*256*128*4 = 4.1 MB, out same


def slope(make_loop, *args):
    f5, f45 = make_loop(5), make_loop(45)
    jax.device_get(f5(*args)); jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def kernel_rank3(u_ref, v_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        u_ref[:], v_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def kernel_reshape(u_ref, v_ref, o_ref, *, br, prec):
    v2 = v_ref[:].reshape(kmax, br * 128)
    w = jax.lax.dot_general(
        u_ref[:], v2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[:] = w.reshape(kmax, br, 128)


def kernel_vpu(u_ref, v_ref, o_ref):
    def body(j, acc):
        return acc + u_ref[j, :][:, None, None] * v_ref[j, :, :][None]

    o_ref[:] = jax.lax.fori_loop(
        0, kmax, body, jnp.zeros((kmax, Br, 128), jnp.float32)
    )


def make_transform(kernel, br):
    grid = (R // br,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kmax, kmax), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kmax, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kmax, br, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kmax, R, 128), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)), jnp.float32) / np.sqrt(n)
    U = jnp.asarray(rng.standard_normal((kmax, kmax)), jnp.float32) * 0.1

    cases = []
    for br in (64, 128, 512):
        for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
            cases.append((f"reshape Br={br} {prec}",
                          functools.partial(kernel_reshape, br=br, prec=prec), br))
    for name, kern, br in cases:
        try:
            tr = make_transform(kern, br)
            W = jax.jit(tr)(U, V)
            Wn = np.asarray(W[:, :4])
            want = np.einsum("ji,jrc->irc", np.asarray(U), np.asarray(V[:, :4]))
            err = np.abs(Wn - want).max()

            def make_loop(reps, tr=tr):
                @jax.jit
                def f(U, V):
                    def body(i, V):
                        return tr(U, V)
                    out = jax.lax.fori_loop(0, reps, body, V)
                    return jnp.sum(out[0, 0])
                return f

            dt = slope(make_loop, U, V)
            gb = 2 * kmax * n * 4 / dt / 1e9
            print(f"{name:8s}: {dt*1e3:7.3f} ms  {gb:6.1f} GB/s  maxerr={err:.2e}")
        except Exception as e:
            print(f"{name:8s}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
