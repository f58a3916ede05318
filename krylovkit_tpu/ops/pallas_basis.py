"""Dynamic-k Pallas kernels for the basis projections (TPU hot path).

The stacked-basis contractions in :mod:`ops.basis` (``project`` = ``Vᴴx``,
``unproject`` = ``V c``; reference ``project!!``/``unproject!!``,
``src/orthonormal.jl:88-196``) are the dominant HBM cost of every Krylov
solver.  The XLA lowering necessarily streams the FULL ``(kmax, R, 128)``
buffer each step and masks the *output* — the active length ``k`` is a traced
integer, so XLA cannot shrink the read.  Measured on v5e (tools/bench_phases.py,
2026-08-19): one Lanczos expansion costs 0.75–0.78 ms at n=2M *independent of
k* — i.e. ~2×31 vector-rows of traffic per step even when only 16 are live.

These kernels recover the traffic: the basis stays in HBM (``pl.ANY``); each
grid step (one ``br``-row tile of the vector dimension) DMAs only
``ceil(k/kb)`` chunks of ``kb`` basis rows with double buffering, so HBM reads
scale with the *traced* ``k`` instead of ``kmax``.  Contractions are M=1 GEMVs
on 2-D reshapes (rank-3 in-kernel ``dot_general`` crashes the axon Mosaic
backend — CLAUDE.md).

Layout contract (same as the rest of ``ops/basis.py``): a single real leaf of
shape ``(kmax, R, 128)`` with ``R % br == 0``; anything else falls back to the
XLA path in the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

__all__ = ["project_pallas", "unproject_pallas", "supported_leaf"]

LANES = 128


def supported_leaf(lV, br: int = 256) -> bool:
    """True if ``lV`` is a basis leaf these kernels can handle."""
    return (
        lV.ndim == 3
        and lV.shape[2] == LANES
        and lV.shape[1] % 8 == 0
        and lV.dtype in (jnp.float32,)
    )


def _pick_br(R: int, br: int) -> int:
    b = min(br, R)
    while R % b != 0:
        b //= 2
    return max(b, 8) if R % max(b, 8) == 0 else next(
        bb for bb in range(min(br, R), 0, -1) if R % bb == 0
    )


def _project_kernel(k_ref, V_hbm, w_ref, acc_ref, buf, sems, *, kb, br, kmax):
    """acc[j, jj] += <V[row(j, jj)], w_tile> for active chunks.

    Chunk ``j`` covers basis rows ``start_j + [0, kb)`` with
    ``start_j = min(j*kb, kmax - kb)`` — the last chunk is clamped so the DMA
    never overruns a ``kmax`` that is not a multiple of ``kb``; rows the clamp
    re-reads (``row < j*kb``) are masked out of the partial sum.
    """
    i = pl.program_id(0)
    k = k_ref[0]
    nkb = jax.lax.div(k + jnp.int32(kb - 1), jnp.int32(kb))  # ceil(k/kb), traced

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w2 = w_ref[...].reshape(1, br * LANES)

    def start_of(j):
        return jnp.minimum(j * kb, kmax - kb)

    def dma(slot, j):
        return pltpu.make_async_copy(
            V_hbm.at[pl.ds(start_of(j), kb), pl.ds(i * br, br), :],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nkb > 0)
    def _():
        dma(0, 0).start()

        def body(j, _):
            slot = jax.lax.rem(j, jnp.int32(2))
            nxt = jax.lax.rem(j + jnp.int32(1), jnp.int32(2))

            @pl.when(j + 1 < nkb)
            def _():
                dma(nxt, j + 1).start()

            dma(slot, j).wait()
            chunk2 = buf[slot].reshape(kb, br * LANES)
            # (1, br*128) x (kb, br*128)^T -> (1, kb)
            part = jax.lax.dot_general(
                w2,
                chunk2,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HI,
            )
            # mask re-read rows (clamped last chunk) and rows >= k
            row = jax.lax.broadcasted_iota(jnp.int32, (1, kb), 1) + start_of(j)
            part = jnp.where((row >= j * kb) & (row < k), part, 0.0)
            acc_ref[pl.ds(j, 1), :] = acc_ref[pl.ds(j, 1), :] + part
            return 0

        jax.lax.fori_loop(0, nkb, body, 0)


def _unproject_kernel(k_ref, V_hbm, c_ref, y_ref, buf, ysc, sems, *, kb, br, kmax):
    """y_tile = sum over active chunks of c_chunk @ V_chunk (c pre-masked).

    Same clamped-last-chunk scheme as :func:`_project_kernel`; re-read rows
    are zeroed in the coefficient slice instead of the output.
    """
    i = pl.program_id(0)
    k = k_ref[0]
    nkb = jax.lax.div(k + jnp.int32(kb - 1), jnp.int32(kb))

    ysc[...] = jnp.zeros_like(ysc)

    def start_of(j):
        return jnp.minimum(j * kb, kmax - kb)

    def dma(slot, j):
        return pltpu.make_async_copy(
            V_hbm.at[pl.ds(start_of(j), kb), pl.ds(i * br, br), :],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nkb > 0)
    def _():
        dma(0, 0).start()

        def body(j, _):
            slot = jax.lax.rem(j, jnp.int32(2))
            nxt = jax.lax.rem(j + jnp.int32(1), jnp.int32(2))

            @pl.when(j + 1 < nkb)
            def _():
                dma(nxt, j + 1).start()

            dma(slot, j).wait()
            chunk2 = buf[slot].reshape(kb, br * LANES)
            c_chunk = c_ref[pl.ds(start_of(j), kb), 0:1]  # (kb, 1), lanes replicated
            row = jax.lax.broadcasted_iota(jnp.int32, (kb, 1), 0) + start_of(j)
            c_chunk = jnp.where(row >= j * kb, c_chunk, 0.0)
            part = jax.lax.dot_general(
                c_chunk,
                chunk2,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HI,
            )  # (1, br*128)
            ysc[...] = ysc[...] + part.reshape(br, LANES)
            return 0

        jax.lax.fori_loop(0, nkb, body, 0)

    y_ref[...] = ysc[...]


@functools.partial(jax.jit, static_argnames=("kb", "br", "interpret"))
def project_pallas(lV, lw, k, *, kb: int = 8, br: int = 256, interpret: bool = False):
    """``c[j] = <V[j], w>`` for ``j < k`` (k traced), zero beyond.

    HBM reads only ``ceil(k/kb)*kb`` basis rows instead of ``kmax``.
    Returns a ``(kmax,)`` f32 coefficient vector.
    """
    kmax, R, C = lV.shape
    if kmax < kb:
        kb = max(1, kmax)
    br = _pick_br(R, br)
    nkb_max = -(-kmax // kb)

    kern = functools.partial(_project_kernel, kb=kb, br=br, kmax=kmax)
    acc = pl.pallas_call(
        kern,
        grid=(R // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nkb_max, kb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nkb_max, kb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, kb, br, C), lV.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kmax * R * C,
            bytes_accessed=(kmax * R * C + R * C) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(k, jnp.int32).reshape(1),
        lV,
        lw,
    )
    # reassemble: chunks j < nkb_max-1 start at j*kb; the last starts at kmax-kb
    head = acc[: nkb_max - 1].reshape((nkb_max - 1) * kb)
    tail = acc[nkb_max - 1, (nkb_max - 1) * kb - (kmax - kb):]
    return jnp.concatenate([head, tail])


@functools.partial(jax.jit, static_argnames=("kb", "br", "interpret"))
def unproject_pallas(lV, c, k, *, kb: int = 8, br: int = 256, interpret: bool = False):
    """``y = Σ_{j<k} c[j] V[j]`` with HBM reads bounded by the traced ``k``.

    ``c`` must already be masked beyond ``k`` (the ``ops.basis`` contract).
    """
    kmax, R, C = lV.shape
    if kmax < kb:
        kb = max(1, kmax)
    br = _pick_br(R, br)
    # lanes replicated so the kernel can slice sublanes dynamically
    c2 = jnp.broadcast_to(c.astype(jnp.float32)[:, None], (kmax, LANES))

    kern = functools.partial(_unproject_kernel, kb=kb, br=br, kmax=kmax)
    return pl.pallas_call(
        kern,
        grid=(R // br,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kmax, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C), lV.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kb, br, C), lV.dtype),
            pltpu.VMEM((br, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kmax * R * C,
            bytes_accessed=(kmax * R * C + R * C) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(k, jnp.int32).reshape(1),
        lV,
        c2,
    )
