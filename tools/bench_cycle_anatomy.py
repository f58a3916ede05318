"""Anatomy of one full restart CYCLE of the config-1 Lanczos solve.

bench_fixed_cost measured 11.3 ms per restart cycle; the isolated phase
slopes (bench_expand_anatomy + RESULTS.md per-phase table) only account for
~9.2 ms (12 expansions + process + masked restart).  This ablates the real
cycle with genuinely dynamic ``k`` to localize the missing ~2 ms:

  X  expansions only: inner while_loop k=18→30 (the driver's own loop shape),
     then reset k to 18                       — pure expansion cost, dynamic k
  Y  X + _process (projected eigh + sort + convergence count)
  Z  Y + masked _restart (gate=True)          — the full cycle

All three are slope-timed in-device fori_loops over whole cycles (≥100-cycle
spread — each cycle is ~10 ms, so a 100-cycle spread is ~1 s of device work,
well above tunnel jitter).  Run alone on the chip:
``timeout 1200 python tools/bench_cycle_anatomy.py``.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops.vector import STANDARD
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import _process, _restart

n = 1 << 21
R = n // 128
M = 30
KEEP = 18  # (3*30 + 0) // 5
KEEP_MAX = 19

op = laplacian_1d(n, jnp.float32)
tol = jnp.float32(1e-30)
btol = jnp.float32(np.finfo(np.float32).eps ** 0.75)


def make_state():
    rng = np.random.default_rng(0)
    V = jnp.asarray(
        rng.standard_normal((M + 1, R, 128)).astype("float32") / (n**0.5)
    )
    H = jnp.asarray(np.diag(rng.standard_normal(M + 1).astype("float32")))
    return kf.KrylovState(V, H, jnp.int32(KEEP), jnp.float32(1.0))


def expansions(fact):
    def cond(c):
        fact, j = c
        return jnp.logical_and(fact.k < M, fact.beta > btol)

    def body(c):
        fact, j = c
        fact = kf.expand_hermitian(op.normal, fact, kk.cgs, STANDARD)
        return fact, j + 1

    fact, _ = jax.lax.while_loop(cond, body, (fact, jnp.int32(0)))
    return fact


def variant_X(reps):
    @jax.jit
    def run(fact):
        def body(i, fact):
            fact = expansions(fact)
            return kf.KrylovState(
                fact.V, fact.H, jnp.int32(KEEP), fact.beta * (1 + 1e-9 * i)
            )

        fact = jax.lax.fori_loop(0, reps, body, fact)
        return fact.H.sum() + fact.beta

    return run


def variant_Y(reps):
    @jax.jit
    def run(fact):
        def body(i, carry):
            fact, acc = carry
            fact = expansions(fact)
            nconv, vals, U, res = _process(
                fact.H, fact.k, fact.beta, "LM", tol, 4
            )
            acc = acc + vals[0] + U[0, 0] + res[0] * 0 + nconv * 0
            return (
                kf.KrylovState(
                    fact.V, fact.H, jnp.int32(KEEP), fact.beta * (1 + 1e-9 * i)
                ),
                acc,
            )

        fact, acc = jax.lax.fori_loop(0, reps, body, (fact, jnp.float32(0)))
        return fact.H.sum() + fact.beta + acc

    return run


def variant_Z(reps):
    @jax.jit
    def run(fact):
        def body(i, carry):
            fact, acc = carry
            fact = expansions(fact)
            nconv, vals, U, res = _process(
                fact.H, fact.k, fact.beta, "LM", tol, 4
            )
            acc = acc + vals[0] + res[0] * 0
            # keep PINNED to the real solve's steady-state value: garbage H
            # makes nconv large, which would shrink the expansion count and
            # make the cycle incomparable with X/Y
            keep = jnp.int32(KEEP) + 0 * nconv
            fact = _restart(
                fact, vals, U, fact.beta, keep, KEEP_MAX,
                gate=jnp.asarray(True),
            )
            return fact, acc

        fact, acc = jax.lax.fori_loop(0, reps, body, (fact, jnp.float32(0)))
        return fact.H.sum() + fact.beta + acc

    return run


def slope(make, args, lo=20, hi=120, rounds=3):
    f_lo, f_hi = make(lo), make(hi)
    jax.device_get(f_lo(*args))
    jax.device_get(f_hi(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.device_get(f_lo(*args))
        t1 = time.perf_counter()
        jax.device_get(f_hi(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (hi - lo))
    return best


def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    fact = make_state()
    prev = 0.0
    for name, make in (("X expansions", variant_X),
                       ("Y +process  ", variant_Y),
                       ("Z +restart  ", variant_Z)):
        dt = slope(make, (fact,))
        print(f"{name}: {dt*1e3:8.3f} ms/cycle   (+{(dt-prev)*1e3:6.3f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
