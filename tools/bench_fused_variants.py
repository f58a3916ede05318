"""Isolate the fused-expansion kernel's ~270 GB/s bottleneck (all-B flat).

Suspects: (a) M=1 dot_generals at HIGHEST precision land on the MXU as
multi-pass matmuls with 1/128 utilization; (b) the V input->output alias
disables Mosaic's input double-buffering (read/write hazard); (c) the
(T+2,128) concatenated stencil window.

Variants (all stream the same (B, T, 128) @ (0, i, 0) blocks at B=24):

  A  subtract via dot_general (1,B)x(B,N), no alias, no stencil/reductions
  B  subtract via unrolled per-row FMA loop, no alias
  C  B + stencil (no concat window: masked row-shifts) + unrolled reductions
  D  C + alias (write w' into V row kp1) — the full fused math, FMA style
  E  A + alias — dot_general + alias (the shipped kernel's structure)

Compare GB/s = (B + 2..3) * 8 MB / t.  Run alone on the chip:
``timeout 1500 python tools/bench_fused_variants.py``.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_HI = jax.lax.Precision.HIGHEST
B = 24
T = 512
KMAX = 31
R = 16384  # n = 2M
KP1 = 25


def subtract_dot(v_ref, y_ref, g_ref):
    V2 = v_ref[...].reshape(B, T * LANES)
    y2 = y_ref[...].reshape(1, T * LANES)
    gy = g_ref[0, B]
    W2 = gy * y2 - jax.lax.dot_general(
        g_ref[0, :B].reshape(1, B), V2, (((1,), (0,)), ((), ())), precision=_HI
    )
    return W2.reshape(T, LANES)


def subtract_fma(v_ref, y_ref, g_ref):
    acc = g_ref[0, B] * y_ref[...]
    for j in range(B):
        acc = acc - g_ref[0, j] * v_ref[j]
    return acc


def stencil_masked(Wt, wb_lo, wb_hi):
    # 2W - prev_elem - next_elem on the flattened chain, halo rows injected
    # without building a (T+2,128) window
    up = pltpu.roll(Wt, 1, axis=1)      # lane l-1 -> l (prev elem, same row)
    prev_row_last = pltpu.roll(
        jnp.concatenate([wb_lo, Wt[: T - 1, :]], axis=0), 1, axis=1
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    prev = jnp.where(lane == 0, prev_row_last, up)
    dn = pltpu.roll(Wt, LANES - 1, axis=1)
    next_row_first = pltpu.roll(
        jnp.concatenate([Wt[1:], wb_hi], axis=0), LANES - 1, axis=1
    )
    nxt = jnp.where(lane == LANES - 1, next_row_first, dn)
    return 2.0 * Wt - prev - nxt


def make_kernel(style):
    def kern(kp1_ref, v_ref, y_ref, vb_ref, yb_ref, g_ref, *outs):
        i = pl.program_id(0)
        if style in ("A", "E"):
            Wt = subtract_dot(v_ref, y_ref, g_ref)
            w_out = outs[0]
            if style == "A":
                w_out[...] = Wt
            else:
                w_out[0] = Wt
            return
        Wt = subtract_fma(v_ref, y_ref, g_ref)
        if style == "B":
            outs[0][...] = Wt
            return
        # C/D: halo rows of w' + stencil + reductions
        gy = g_ref[0, B]
        wb = gy * yb_ref[0]
        for j in range(B):
            wb = wb - g_ref[0, j] * vb_ref[j, 0]
        yn = stencil_masked(Wt, wb[0:1], wb[1:2])
        if style == "C":
            outs[0][...] = Wt
        else:
            outs[0][0] = Wt
        outs[1][...] = yn
        red = outs[2]
        parts = []
        for j in range(B):
            parts.append(jnp.sum(v_ref[j] * yn).reshape(1, 1))
        parts.append(jnp.sum(Wt * yn).reshape(1, 1))
        parts.append(jnp.sum(Wt * Wt).reshape(1, 1))
        packed = jnp.concatenate(
            parts + [jnp.zeros((1, LANES - B - 2), jnp.float32)], axis=1
        )

        @pl.when(i == 0)
        def _():
            red[...] = jnp.zeros_like(red)

        red[...] += packed

    return kern


def build(style):
    alias = style in ("D", "E")
    w_full = style in ("A", "B", "C")  # w' into its own (R,128) buffer
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((B, T, LANES), lambda i, k: (0, i, 0)),
            pl.BlockSpec((T, LANES), lambda i, k: (i, 0)),
            pl.BlockSpec((B, 1, 2, LANES), lambda i, k: (0, i, 0, 0)),
            pl.BlockSpec((1, 2, LANES), lambda i, k: (i, 0, 0)),
            pl.BlockSpec((1, LANES), lambda i, k: (0, 0)),
        ],
        out_specs=(
            [
                pl.BlockSpec((T, LANES), lambda i, k: (i, 0))
                if w_full
                else pl.BlockSpec((1, T, LANES), lambda i, k: (k[0], i, 0))
            ]
            + (
                [
                    pl.BlockSpec((T, LANES), lambda i, k: (i, 0)),
                    pl.BlockSpec((1, LANES), lambda i, k: (0, 0)),
                ]
                if style in ("C", "D")
                else []
            )
        ),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((R, LANES), jnp.float32)]
        if w_full
        else [jax.ShapeDtypeStruct((KMAX, R, LANES), jnp.float32)]
    )
    if style in ("C", "D"):
        out_shape += [
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        ]
    kwargs = dict(
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    )
    if alias:
        kwargs["input_output_aliases"] = {1: 0}

    call = pl.pallas_call(
        make_kernel(style),
        grid_spec=grid_spec,
        out_shape=out_shape,
        **kwargs,
    )

    @functools.partial(jax.jit, static_argnames=())
    def step(V, y, Vb, yb, g, kp1):
        outs = call(kp1, V, y, Vb, yb, g)
        return outs

    return step


def slope(fn, args, lo=100, hi=1100, rounds=3):
    # in-device loop with a data dependency through y
    def make(reps):
        @jax.jit
        def run(V, y, Vb, yb, g, kp1):
            def body(i, carry):
                V, y = carry
                outs = fn(V, y * (1 + 1e-12 * i), Vb, yb, g, kp1)
                if len(outs) >= 2 and outs[0].ndim == 3:
                    V2, yn = outs[0], outs[1]
                    return V2, yn
                if len(outs) >= 2:
                    return V, outs[1]
                if outs[0].ndim == 2:
                    return V, outs[0]
                return outs[0], y  # aliased V carries the dependency (E)
            V, y = jax.lax.fori_loop(0, reps, body, (V, y))
            # touch BOTH carries so no variant's kernel output is dead
            return y.sum() + jax.lax.dynamic_index_in_dim(
                V, KP1, 0, keepdims=False
            ).sum()
        return run

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
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal((KMAX, R, LANES)).astype("float32") / 1448)
    y = jnp.asarray(rng.standard_normal((R, LANES)).astype("float32"))
    Vb = jnp.asarray(rng.standard_normal((B, R // T, 2, LANES)).astype("float32"))
    yb = jnp.asarray(rng.standard_normal((R // T, 2, LANES)).astype("float32"))
    g = jnp.asarray((rng.standard_normal((1, LANES)) * 1e-3).astype("float32"))
    kp1 = jnp.asarray([KP1], jnp.int32)

    passes = {"A": B + 2, "B": B + 2, "C": B + 3, "D": B + 3, "E": B + 2}
    for style in ("A", "B", "C", "D", "E"):
        fn = build(style)
        dt = slope(fn, (V, y, Vb, yb, g, kp1))
        gb = passes[style] * R * LANES * 4 / 1e9
        print(
            f"{style}: {dt*1e6:8.1f} us  ({gb/dt:5.0f} GB/s over "
            f"{passes[style]} passes)",
            flush=True,
        )


if __name__ == "__main__":
    main()
