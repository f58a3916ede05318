"""Shard a solve over a device mesh (works on N TPU chips or a virtual CPU
mesh): inner products lower to one psum over ICI, stencil halos to ppermute.

Run with a virtual 8-device mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/04_sharded_mesh.py
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import make_mesh, sharded_laplacian_1d

nd = len(jax.devices())
mesh = make_mesh(nd)
print(f"{nd} devices: {mesh}")

n = 1 << 10
op = sharded_laplacian_1d(n, mesh, jnp.float64)
x0 = jax.device_put(
    jnp.asarray(np.random.default_rng(0).standard_normal(n)),
    NamedSharding(mesh, P("vec")),
)
vals, vecs, info = kk.eigsolve(
    op, x0, 2, "LM", ishermitian=True, krylovdim=30, maxiter=400, tol=1e-7,
)
print("vals:", np.asarray(vals), "converged:", int(info.converged))
print("eigenvector sharding:", jax.tree_util.tree_leaves(vecs)[0].sharding)
