"""Planner scaling at ~100M nnz (VERDICT r3 item 5).

Times each stage of ``sharded_ell_from_coo`` separately on a banded matrix of
~100M nonzeros (n = 2M, halfband = 25 → nnz ≈ 1.02e8), on the 8-virtual-device
CPU mesh:

  gen        — synthetic COO generation (not planner cost)
  pack fwd   — ``coo_to_ell`` (the sort + scatter into ELL planes)
  plan fwd   — ``_plan_shard`` (halo-round group-by + boundary compression)
  put fwd    — ``device_put`` of the sharded planes
  (same ×3 for the adjoint direction)

Run: ``python tools/bench_planner.py [n] [halfband]``.
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from krylovkit_tpu.parallel import make_mesh
from krylovkit_tpu.parallel.sparse import (
    _plan_shard,
    _shard_data,
    banded_coo,
    coo_to_ell,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    hb = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    mesh = make_mesh()
    D = mesh.shape["vec"] if "vec" in mesh.shape else list(mesh.shape.values())[0]
    axis = list(mesh.shape.keys())[0]

    t0 = time.perf_counter()
    rows, cols, vals = banded_coo(n, hb, dtype=np.float32)
    t1 = time.perf_counter()
    nnz = len(vals)
    print(f"n={n} halfband={hb} nnz={nnz/1e6:.1f}M  D={D}", flush=True)
    print(f"gen       {t1-t0:8.2f} s", flush=True)

    total_plan = 0.0
    for name, (r, c, v, m_, n_) in (
        ("fwd", (rows, cols, vals, n, n)),
        ("adj", (cols, rows, vals, n, n)),
    ):
        ta = time.perf_counter()
        ec, ev, valid = coo_to_ell(r, c, v, m_)
        ev = np.where(valid, ev, 0)
        tb = time.perf_counter()
        planned = _plan_shard(ec, ev, valid, m_, n_, D)
        tc = time.perf_counter()
        data, plan = _shard_data(mesh, axis, planned)
        jax.block_until_ready(data[0])
        td = time.perf_counter()
        total_plan += tc - tb
        print(
            f"{name}: pack {tb-ta:6.2f} s   plan {tc-tb:6.2f} s   "
            f"device_put {td-tc:6.2f} s   (rounds={plan.deltas}, "
            f"halo={plan.halo_elems}, boundary={plan.boundary_total})",
            flush=True,
        )
    print(f"pure _plan_shard total: {total_plan:.2f} s at {nnz/1e6:.1f}M nnz",
          flush=True)


if __name__ == "__main__":
    main()
