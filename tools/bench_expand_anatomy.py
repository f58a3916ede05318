"""Anatomy of one Lanczos expansion step at n=2M (config 1): where do the
microseconds beyond the two bucket contractions go?

Builds a family of in-device fori_loops, each adding one ingredient of
``kf.expand_hermitian`` (cgs fast path), and slope-times them (≥1000-rep
spread, scalar end-fetch — CLAUDE.md methodology):

  A  project+subtract only (B=24 static prefix, fixed k)   — the contraction pair
  B  A + operator apply (roll Laplacian)
  C  B + norm + normalize
  D  C + DUS row append into the basis carry
  E  full expand_hermitian step at fixed k (incl. H update, bucketed switch)

The A→E increments isolate: apply cost, norm/scale passes, the append RMW,
and the switch/H-update/dispatch residue.  Run alone on the chip:
``timeout 900 python tools/bench_expand_anatomy.py``.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.ops import orthonormal as on
from krylovkit_tpu.ops.vector import STANDARD
from krylovkit_tpu.parallel import laplacian_1d

n = 1 << 21
R = n // 128
M = 30  # krylovdim
B = 24  # static bucket under test
K_FIX = 22  # fixed active length inside the bucket

op = laplacian_1d(n, jnp.float32)


def slope(fn, args, reps_lo=100, reps_hi=1100):
    """Per-iteration time from the spread of two in-device loop lengths."""
    f_lo, f_hi = fn(reps_lo), fn(reps_hi)
    a = jax.device_get(f_lo(*args))
    b = jax.device_get(f_hi(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f_lo(*args))
        t1 = time.perf_counter()
        jax.device_get(f_hi(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps_hi - reps_lo))
    return best


def make_V():
    import numpy as np

    rng = np.random.default_rng(0)
    V = jnp.asarray(
        rng.standard_normal((M + 1, R, 128)).astype("float32") / (n**0.5)
    )
    w = jnp.asarray(rng.standard_normal((R, 128)).astype("float32"))
    return V, w


def variant_A(reps):
    @jax.jit
    def run(V, w):
        def body(i, carry):
            V, w = carry
            Vb = bs.prefix(V, B)
            c = bs.project(Vb, w, K_FIX, STANDARD)
            w2 = jax.tree_util.tree_map(
                lambda a, b: a - b, w, bs.unproject(Vb, c)
            )
            # tiny data dependency so iterations can't collapse
            w2 = w2 * (1 + 1e-9 * i)
            return V, w2

        V, w = jax.lax.fori_loop(0, reps, body, (V, w))
        return w.sum()

    return run


def variant_B(reps):
    @jax.jit
    def run(V, w):
        def body(i, carry):
            V, w = carry
            w = op.normal(w)
            Vb = bs.prefix(V, B)
            c = bs.project(Vb, w, K_FIX, STANDARD)
            w2 = jax.tree_util.tree_map(
                lambda a, b: a - b, w, bs.unproject(Vb, c)
            )
            return V, w2 * (1 + 1e-9 * i)

        V, w = jax.lax.fori_loop(0, reps, body, (V, w))
        return w.sum()

    return run


def variant_C(reps):
    @jax.jit
    def run(V, w):
        def body(i, carry):
            V, w = carry
            w = op.normal(w)
            Vb = bs.prefix(V, B)
            c = bs.project(Vb, w, K_FIX, STANDARD)
            w2 = jax.tree_util.tree_map(
                lambda a, b: a - b, w, bs.unproject(Vb, c)
            )
            beta = STANDARD.norm(w2)
            v = jax.tree_util.tree_map(lambda l: l / beta, w2)
            return V, v

        V, w = jax.lax.fori_loop(0, reps, body, (V, w))
        return w.sum()

    return run


def variant_D(reps):
    @jax.jit
    def run(V, w):
        def body(i, carry):
            V, w = carry
            w = op.normal(w)
            Vb = bs.prefix(V, B)
            c = bs.project(Vb, w, K_FIX, STANDARD)
            w2 = jax.tree_util.tree_map(
                lambda a, b: a - b, w, bs.unproject(Vb, c)
            )
            beta = STANDARD.norm(w2)
            v = jax.tree_util.tree_map(lambda l: l / beta, w2)
            V = bs.set(V, K_FIX + 1, v)
            return V, v

        V, w = jax.lax.fori_loop(0, reps, body, (V, w))
        return w.sum() + bs.get(V, K_FIX + 1).sum()

    return run


def variant_E(reps):
    alg_orth = kk.cgs

    @jax.jit
    def run(V, w):
        H = jnp.zeros((M + 1, M + 1), jnp.float32)

        def body(i, carry):
            V, w, H = carry
            fact = kf.KrylovState(V, H, jnp.int32(K_FIX), jnp.float32(1.0))
            fact = kf.expand_hermitian(op.normal, fact, alg_orth, STANDARD)
            # reset k so every iteration runs the same bucket
            return fact.V, bs.get(fact.V, K_FIX + 1), fact.H

        V, w, H = jax.lax.fori_loop(0, reps, body, (V, w, H))
        return w.sum() + H.sum()

    return run


def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    V, w = make_V()
    passes_gb = {  # expected HBM traffic (GB) per iteration, at 8 MB/row-pass
        "A": (2 * B + 3) * 8e-3,
        "B": (2 * B + 5) * 8e-3,
        "C": (2 * B + 8) * 8e-3,
        "D": (2 * B + 9) * 8e-3,
        "E": (2 * B + 9) * 8e-3,
    }
    for name, make in (
        ("A", variant_A),
        ("B", variant_B),
        ("C", variant_C),
        ("D", variant_D),
        ("E", variant_E),
    ):
        dt = slope(make, (V, w))
        gbs = passes_gb[name] / dt
        print(
            f"{name}: {dt*1e6:8.1f} µs/iter   (~{passes_gb[name]*1e3:.0f} MB "
            f"nominal → {gbs:.0f} GB/s effective)",
            flush=True,
        )


if __name__ == "__main__":
    main()
