"""On-chip A/B of SpMV operator implementations (VERDICT r2 item 2).

Compares, on the 2M-point 1D Laplacian (nnz = 3n):
  roll    — parallel/operators.py laplacian_1d (XLA roll + where)
  stencil — ops/pallas_stencil.py laplacian_1d_pallas (fixed 3-point kernel)
  banded  — ops/pallas_spmv.py BandedOperator (offset-decomposed Pallas)
  banded_xla — the BandedOperator XLA fallback path (flat roll per offset)

Slope methodology (CLAUDE.md): time chained loops of R_HI and R_LO reps with a
single end fetch; report (t_hi - t_lo) / (R_HI - R_LO).  The chained input
defeats common-subexpression caching.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, x, r_lo=100, r_hi=1100):
    """(t(r_hi) - t(r_lo)) / (r_hi - r_lo) of a chained-apply loop.

    Prefers an in-device fori_loop (single dispatch); the remote compiler
    rejects some Pallas kernels under fori_loop, so falls back to chained
    back-to-back dispatch (CLAUDE.md trusted method (c)) on compile failure.
    """

    @jax.jit
    def loop(x, r):
        def body(_, v):
            return fn(v) * 0.25  # keep values bounded; adds 1 VPU op

        # scalar end fetch: block_until_ready returns early for some pallas
        # outputs on the axon tunnel (CLAUDE.md) — a device_get of a reduction
        # is the only trustworthy completion barrier
        return jnp.sum(jax.lax.fori_loop(0, r, body, x))

    def timed_fori(r):
        float(loop(x, r))
        t0 = time.perf_counter()
        float(loop(x, r))
        return time.perf_counter() - t0

    step = jax.jit(lambda v: fn(v) * 0.25)

    def timed_chain(r):
        def run():
            y = x
            for _ in range(r):
                y = step(y)
            return float(jnp.sum(y))

        run()
        t0 = time.perf_counter()
        run()
        return time.perf_counter() - t0

    try:
        timed_fori(r_lo)  # compile both trip counts
        timed_fori(r_hi)
        timed = timed_fori
    except Exception as e:
        print(f"  (fori_loop compile failed — {type(e).__name__}; "
              "falling back to chained dispatch)")
        timed_chain(r_lo)
        timed = timed_chain
    t_lo = min(timed(r_lo) for _ in range(3))
    t_hi = min(timed(r_hi) for _ in range(3))
    return (t_hi - t_lo) / (r_hi - r_lo)


def main():
    from krylovkit_tpu.parallel import laplacian_1d
    from krylovkit_tpu.ops.pallas_stencil import laplacian_1d_pallas
    from krylovkit_tpu.ops import pallas_spmv as psp

    n = 1 << 21
    nnz = 3 * n - 2
    print(f"# devices: {jax.devices()}", flush=True)
    x2 = jnp.ones((n // 128, 128), jnp.float32)
    xf = jnp.ones((n,), jnp.float32)
    jax.block_until_ready(x2)
    print("# buffers allocated", flush=True)

    # build the tridiagonal as COO once
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:]])
    cols = np.concatenate([i, i[1:], i[:-1]])
    vals = np.concatenate(
        [np.full(n, 2.0, np.float32), np.full(n - 1, -1.0, np.float32),
         np.full(n - 1, -1.0, np.float32)]
    )

    def report(k, dt):
        gb = 2 * n * 4 / dt / 1e9  # read x + write y (values stream extra)
        print(f"{k:24s} {dt*1e3:10.4f} {nnz/dt/1e9:8.2f} {gb:7.0f}", flush=True)

    print(f"{'impl':24s} {'ms/apply':>10s} {'Gnnz/s':>8s} {'GB/s':>7s}", flush=True)

    op = laplacian_1d(n, jnp.float32)
    report("roll(n/128,128)", slope(op.normal, x2))

    ops_st = laplacian_1d_pallas(n, jnp.float32)
    report("stencil_pallas(n,)", slope(ops_st.normal, xf))

    for tr in (256, 512, 1024):
        b = psp.banded_from_coo(rows, cols, vals, n, with_adjoint=False,
                                tile_rows=tr)
        y = b.normal(x2)
        ref = op.normal(x2)
        err = float(jnp.max(jnp.abs(y - ref)))
        assert err < 1e-5, err
        print(f"  banded tr={tr} correct (err={err:.2e})", flush=True)
        report(f"banded_pallas tr={tr}", slope(b.normal, x2))

    b = psp.banded_from_coo(rows, cols, vals, n, with_adjoint=False)
    report("banded_xla(n,)", slope(lambda v: psp._spmv_xla(
        v, b.diags.reshape(b.diags.shape[0], -1), b.offsets, n), xf))

    # general gather-ELL (what ShardedELLOperator's local pass uses): XLA
    # gather on the tridiagonal, then on a random bounded-degree matrix
    # (scattered columns defeat any locality in the index pattern)
    from krylovkit_tpu.ops import sparse as sp

    ell = sp.from_coo(rows, cols, vals, (n, n), with_adjoint=False)
    report("ell_gather_xla tri", slope(ell.normal, xf))

    rng = np.random.default_rng(2)
    rr = np.repeat(np.arange(n), 3)
    rc = rng.integers(0, n, 3 * n)
    rv = rng.standard_normal(3 * n).astype(np.float32)
    ell_r = sp.from_coo(rr, rc, rv, (n, n), with_adjoint=False)
    report("ell_gather_xla rand", slope(ell_r.normal, xf))


if __name__ == "__main__":
    main()
