"""Probe which gather forms the axon TPU Mosaic compiler supports in-kernel.

Each probe is tiny and independent; failures print the exception class so the
ELL Pallas SpMV design can pick a supported primitive. Run standalone on the
real chip (never concurrently with another TPU process).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"{name}: OK  sample={out.reshape(-1)[:4]}")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    R, C = 64, 128
    x = jnp.arange(R * C, dtype=jnp.float32).reshape(R, C)
    idx_rows = jnp.asarray(np.random.default_rng(0).integers(0, R, (8, C)), jnp.int32)

    # 1) take_along_axis over the sublane (row) axis: y[i,j] = x[idx[i,j], j]
    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    probe("take_along_axis(axis=0 rows)", lambda: pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx_rows))

    # 2) take_along_axis over lanes: y[i,j] = x[i, idx[i,j]]
    idx_lane = jnp.asarray(np.random.default_rng(1).integers(0, C, (R, C)), jnp.int32)

    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    probe("take_along_axis(axis=1 lanes)", lambda: pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx_lane))

    # 3) flat jnp.take (1D gather from a flattened VMEM view)
    idx_flat = jnp.asarray(
        np.random.default_rng(2).integers(0, R * C, (8, C)), jnp.int32
    )

    def k3(x_ref, i_ref, o_ref):
        xf = x_ref[:].reshape(1, R * C)
        o_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(xf, (8 * C // (R * C) + 1, R * C))[:1], i_ref[:].reshape(1, 8 * C), axis=1
        ).reshape(8, C)

    probe("flat take_along_axis(reshape 1,R*C)", lambda: pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx_flat))

    # 4) one-hot matmul gather (always lowerable; measures viability only)
    def k4(x_ref, i_ref, o_ref):
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (8, R), 1)[:, :, None]
            == i_ref[:][:, None, :8]
        ).astype(jnp.float32)
        del onehot
        o_ref[:] = x_ref[0:8, :]

    probe("control (no gather)", lambda: pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx_rows))

    # 5) dynamic row DMA: copy x[pl.ds(j,1), :] for traced j from SMEM scalar
    def k5(j_ref, x_ref, o_ref):
        j = j_ref[0]
        o_ref[:] = x_ref[pl.ds(j, 8), :]

    probe("dynamic sublane slice (traced start)", lambda: pl.pallas_call(
        k5,
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([3], jnp.int32), x))


if __name__ == "__main__":
    main()
