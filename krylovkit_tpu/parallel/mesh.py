"""Device-mesh utilities — the distribution layer (no reference counterpart).

The reference is a single-process shared-memory library whose only parallelism
is threaded BLAS-2 kernels (``src/orthonormal.jl:94-105``, SURVEY.md §5.8).  The
TPU-native scaling axis is the *vector dimension*: every basis vector (and every
leaf of a pytree vector) is sharded over the mesh, so

* ``inner``/``norm``/``project`` end in one ``psum`` over ICI (XLA inserts it),
* ``unproject``/``transform`` (the GEMM kernels) are embarrassingly row-local,
* stencil/SpMV operators exchange halos via collective-permute (``jnp.roll``
  on a sharded axis lowers to ``ppermute``).

A second mesh axis (``BATCH_AXIS``) shards independent problems (multiple
starting vectors / right-hand sides) — the data-parallel analogue.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

VECTOR_AXIS = "vec"  # shards the vector dimension (tensor-parallel analogue)
BATCH_AXIS = "batch"  # shards independent problems (data-parallel analogue)

__all__ = ["make_mesh", "shard_vector", "replicate", "VECTOR_AXIS", "BATCH_AXIS"]


def make_mesh(
    n_devices: Optional[int] = None,
    batch: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ``(batch, vec)`` mesh over the available devices.

    With ``batch=1`` (default) all devices shard the vector dimension.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % batch != 0:
        raise ValueError(f"{n} devices not divisible by batch={batch}")
    arr = np.array(devs).reshape(batch, n // batch)
    return Mesh(arr, (BATCH_AXIS, VECTOR_AXIS))


def shard_vector(x: PyTree, mesh: Mesh, batched: bool = False) -> PyTree:
    """Shard each leaf's trailing (vector) axis over ``VECTOR_AXIS``; with
    ``batched=True`` the leading axis is sharded over ``BATCH_AXIS``."""

    def leaf(l):
        if batched and l.ndim >= 2:
            spec = P(BATCH_AXIS, *([None] * (l.ndim - 2)), VECTOR_AXIS)
        else:
            spec = P(*([None] * (l.ndim - 1)), VECTOR_AXIS)
        return jax.device_put(l, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(leaf, x)


def replicate(x: PyTree, mesh: Mesh) -> PyTree:
    """Fully replicate a pytree over the mesh (small dense projected data)."""
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), x
    )
