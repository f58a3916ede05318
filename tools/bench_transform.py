"""Microbench: thick-restart basis transform variants on the real chip.

Hypothesis: the (31,31)x(31,n) restart GEMM is COMPUTE-bound because
Precision.HIGHEST emulates f32 with 6 bf16 MXU passes at ~6% utilization
(M=K=31), not memory-bound.

Timing discipline (CLAUDE.md): the axon tunnel lies to block_until_ready on
independent dispatches — so every rep CHAINS its output into the next input
inside one jitted lax.fori_loop, and the cost is the SLOPE between two rep
counts (fixed overhead cancels).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

kmax = 31
keep = 19
n = 1 << 21
R = n // 128


def slope(make_loop, *args):
    # axon: block_until_ready returns early — a device_get of a SCALAR is the
    # only trustworthy fence; its constant round-trip cancels in the slope
    f5 = make_loop(5)
    f45 = make_loop(45)
    jax.device_get(f5(*args))
    jax.device_get(f45(*args))
    t0 = time.perf_counter(); jax.device_get(f5(*args))
    t1 = time.perf_counter(); jax.device_get(f45(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / 40


def main():
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)), jnp.float32) / np.sqrt(n)
    U = jnp.asarray(rng.standard_normal((kmax, kmax)), jnp.float32) * 0.1

    P = jax.lax.Precision

    def mk(prec, m_out):
        def make_loop(reps):
            @jax.jit
            def f(V, U):
                def body(i, V):
                    out = jax.lax.dot_general(
                        U[:, :m_out].T, V, (((1,), (0,)), ((), ())), precision=prec
                    )
                    # write back into the basis (the real restart does this DUS)
                    return jax.lax.dynamic_update_slice(
                        V, out, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
                    )
                Vf_ = jax.lax.fori_loop(0, reps, body, V)
                return jnp.sum(Vf_[0, 0])
            return f
        return make_loop

    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        for m_out in (kmax, keep):
            dt = slope(mk(prec, m_out), V, U)
            gb = (kmax + m_out) * n * 4 / dt / 1e9
            print(f"prec={prec!s:18} m_out={m_out:3d}: {dt*1e3:7.3f} ms  {gb:6.1f} GB/s")

    # folded blockdiag: (G, kmax, kmax) batched against (G, kmax, n/G)
    for G in (4, 16):
        Vf = V.reshape(kmax, G, R // G, 128).transpose(1, 0, 2, 3).copy()
        Ub = jnp.broadcast_to(U.T[None], (G, kmax, kmax)).copy()

        def make_loop(reps):
            @jax.jit
            def f(Vf, Ub):
                def body(i, Vf):
                    out = jax.lax.dot_general(
                        Ub, Vf, (((2,), (1,)), ((0,), (0,))), precision=P.HIGHEST
                    )
                    return out
                o_ = jax.lax.fori_loop(0, reps, body, Vf)
                return jnp.sum(o_[0, 0, 0])
            return f

        dt = slope(make_loop, Vf, Ub)
        gb = 2 * kmax * n * 4 / dt / 1e9
        print(f"folded G={G:3d} batched HIGHEST: {dt*1e3:7.3f} ms  {gb:6.1f} GB/s")

    # numerical: orthogonality drift per precision (U orthogonal)
    Uq, _ = np.linalg.qr(rng.standard_normal((kmax, kmax)))
    Uq = jnp.asarray(Uq, jnp.float32)
    Vm = np.asarray(V.reshape(kmax, n))
    Q, _ = np.linalg.qr(Vm.T)
    Vo = jnp.asarray(Q.T.reshape(kmax, R, 128), jnp.float32)
    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        W = jax.jit(
            lambda V, U, prec=prec: jax.lax.dot_general(
                U.T, V, (((1,), (0,)), ((), ())), precision=prec
            )
        )(Vo, Uq)
        Wm = np.asarray(W.reshape(kmax, n), np.float64)
        err = np.abs(Wm @ Wm.T - np.eye(kmax)).max()
        print(f"prec={prec!s:18}: max|W Wᴴ - I| = {err:.3e}")


if __name__ == "__main__":
    main()
