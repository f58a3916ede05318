"""Fused-vs-unfused GMRES beyond VMEM capacity (4M unknowns, 2048² Poisson).

At 1024² (1M unknowns) the 31-row Krylov basis (~128 MB) sits at VMEM
capacity and XLA keeps the unfused two-stream working set resident — fused
and unfused measure equal (benchmarks/RESULTS.md).  At 2048² the basis is
~500 MB (HBM-resident), so the B+3-vs-2B+9 pass count should show.  Run
alone on the chip: ``timeout 1800 python tools/bench_gmres_biggrid.py``.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.parallel import poisson_2d

def main():
    jax.device_get(jnp.ones((8, 128)).sum())
    print("tunnel ok", flush=True)
    nx = ny = 2048
    n = nx * ny
    op = poisson_2d(nx, ny, jnp.float32)
    b = jnp.ones((n // 128, 128), jnp.float32)
    for label, fused in (("fused  ", True), ("unfused", False)):
        kf.use_fused_expansion = fused

        @jax.jit
        def solve(b):
            x, info = kk.linsolve(op, b, alg=kk.GMRES(krylovdim=30, tol=1e-4,
                                                      maxiter=6))
            return x, info.numops, info.normres

        out = solve(b)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            x, numops, nres = solve(b)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / 3
        ops = int(numops)
        print(f"GMRES(30) 2048^2 {label}: {ops * 5 * n / dt / 1e9:6.2f} "
              f"Gnnz/s ({ops} applies / {dt*1e3:.1f} ms, "
              f"normres={float(nres):.2e})", flush=True)
    kf.use_fused_expansion = True

if __name__ == "__main__":
    main()
