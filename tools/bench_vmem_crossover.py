"""Prove (or kill) the ">VMEM Pallas crossover" claim (VERDICT r3 weak #3).

RESULTS.md asserted the Pallas banded kernel "wins only when working sets
exceed VMEM" — but every recorded A/B ran at n=2M (x = 8 MB, VMEM-resident).
This measures the BandedOperator Pallas kernel against its XLA shift-and-add
fallback at working sets far beyond VMEM (128 MB):

    halfband 8 (17 offset planes), n in {2M, 16M, 32M}
    working set per apply = (nd + 2) vector passes = 19 * n * 4 bytes
      n=2M: 152 MB (planes stream; x itself VMEM-resident)
      n=16M: 1.2 GB      n=32M: 2.4 GB

Methodology per CLAUDE.md perf facts: in-device fori_loop slopes with a
data dependency between iterations and a scalar end-fetch; >=1000-rep spread
(or the largest the size allows) and min-of-3 rounds.

Run alone on the chip: ``timeout 1800 python tools/bench_vmem_crossover.py``.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from krylovkit_tpu.ops.pallas_spmv import (
    BandedOperator,
    _spmv_pallas,
    _spmv_xla,
)

HALF = 8
OFFSETS = tuple(range(-HALF, HALF + 1))


def make_planes(n, rng):
    nd = len(OFFSETS)
    R = n // 128
    planes = rng.standard_normal((nd, R, 128)).astype(np.float32) / nd
    # zero out-of-range tails so pallas and xla agree exactly at the edges
    flat = planes.reshape(nd, n)
    for p, d in enumerate(OFFSETS):
        if d < 0:
            flat[p, :-d] = 0
        elif d > 0:
            flat[p, n - d:] = 0
    return jnp.asarray(flat.reshape(nd, R, 128))


def slope(make, args, reps_lo, reps_hi, rounds=3):
    f_lo, f_hi = make(reps_lo), make(reps_hi)
    jax.device_get(f_lo(*args))
    jax.device_get(f_hi(*args))  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.device_get(f_lo(*args))
        t1 = time.perf_counter()
        jax.device_get(f_hi(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (reps_hi - reps_lo))
    return best


def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    rng = np.random.default_rng(0)

    for n in (1 << 21, 1 << 24, 1 << 25):
        R = n // 128
        diags = make_planes(n, rng)
        x2 = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32))

        # correctness cross-check once per size
        yp = jax.device_get(_spmv_pallas(x2, diags, OFFSETS, 512))
        yx = jax.device_get(
            _spmv_xla(x2.reshape(n), diags, OFFSETS, n)
        ).reshape(R, 128)
        err = float(np.max(np.abs(yp - yx)) / (np.max(np.abs(yx)) + 1e-30))
        assert err < 1e-5, f"pallas/xla mismatch at n={n}: {err}"

        def make_pallas(reps):
            @jax.jit
            def run(x2, diags):
                def body(i, x):
                    y = _spmv_pallas(x2 * (1 + 1e-12 * i) + 1e-12 * x,
                                     diags, OFFSETS, 512)
                    return y
                return jax.lax.fori_loop(0, reps, body, x2).sum()
            return run

        def make_xla(reps):
            @jax.jit
            def run(x2, diags):
                xf = x2.reshape(n)
                def body(i, x):
                    return _spmv_xla(xf * (1 + 1e-12 * i) + 1e-12 * x,
                                     diags, OFFSETS, n)
                return jax.lax.fori_loop(0, reps, body, xf).sum()
            return run

        # rep spread scaled so each measured loop runs >= ~2 s of device work
        bytes_per = (len(OFFSETS) + 2) * n * 4
        spread = max(200, min(1000, int(2.0 / (bytes_per / 8e11))))
        lo, hi = 50, 50 + spread
        tp = slope(make_pallas, (x2, diags), lo, hi)
        tx = slope(make_xla, (x2, diags), lo, hi)
        gbs_p = bytes_per / tp / 1e9
        gbs_x = bytes_per / tx / 1e9
        print(
            f"n={n:>9d} ({bytes_per/2**20:6.0f} MB/apply, spread {spread}): "
            f"pallas {tp*1e6:8.1f} us ({gbs_p:5.0f} GB/s)   "
            f"xla {tx*1e6:8.1f} us ({gbs_x:5.0f} GB/s)   "
            f"ratio pallas/xla = {tp/tx:.3f}",
            flush=True,
        )
        del diags, x2


if __name__ == "__main__":
    main()
