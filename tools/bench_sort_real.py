"""On-chip latency of sort_schur_real: worst case (reverse-sorted spectrum).

Methodology per CLAUDE.md perf facts: long in-device loop + single end fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from krylovkit_tpu import dense


def main():
    dt = jnp.float32
    m, k = 31, 30
    rng = np.random.default_rng(0)
    H = np.zeros((m, m), np.float32)
    H[:k, :k] = (rng.standard_normal((k, k)) + np.diag(np.linspace(k, 1, k))).astype(
        np.float32
    )
    T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H, dt), k)
    T.block_until_ready()

    @jax.jit
    def loop(T, Q, reps):
        def body(i, c):
            T, Q, acc = c
            # acc-dependent zero chained into the input defeats XLA's
            # while-loop invariant code motion (the sort must re-run per rep)
            Tin = T + 0.0 * acc
            Ts, Qs = dense.sort_schur_real(Tin, Q, "SR", k)
            return T, Q, acc + Ts[0, 0] + Qs[0, 0]

        return jax.lax.fori_loop(0, reps, body, (T, Q, jnp.float32(0)))[2]

    # slope timing: t(reps2) - t(reps1)
    for reps in (2, 2):  # warm
        loop(T, Q, reps).block_until_ready()
    t0 = time.perf_counter(); float(loop(T, Q, 5)); t1 = time.perf_counter()
    t2 = time.perf_counter(); float(loop(T, Q, 45)); t3 = time.perf_counter()
    per = ((t3 - t2) - (t1 - t0)) / 40
    print(f"sort_schur_real worst-case: {per*1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
