"""Fused Lanczos expansion step for stencil operators — one basis stream.

The CGS Lanczos step costs ``2B + 9`` HBM row-passes per expansion at active
bucket ``B`` (project reads the basis, subtract reads it again; see
``tools/bench_expand_anatomy.py``).  The two basis streams are forced by a
global dependency: the subtraction needs the *complete* projection
coefficients.  But the coefficients of step ``k`` are already known when step
``k`` begins — they were reduced at the end of step ``k-1`` — so the steady
state can be restructured as ONE fused stream per step that simultaneously

  1. forms the new residual   ``w' = γ_y·y − Σ_j g_j·V[j]``   (subtract),
  2. writes it in place as basis row ``k+1``                   (append),
  3. applies the operator     ``y' = A w'``                    (stencil),
  4. reduces next step's raw projections ``<V[j], y'>``, ``<w', y'>``,
     and ``‖w'‖²``                                             (project),

for ``B + 3`` row-passes: ``B`` basis reads + 1 read of ``y`` + 1 write of the
new row + 1 write of ``y'``.  Step 3 is what makes the fusion close: it is
only possible when ``A`` is *local* (a constant-coefficient stencil, offsets
``|δ| ≤ 128``), so ``y'`` on a row-tile follows from ``w'`` on that tile plus
a one-row halo, and the halo rows of ``w'`` are recomputed from boundary rows
of ``V``/``y`` passed alongside (a few hundred KB per step).

Scale bookkeeping (why ``γ_y``/``g`` suffice): stored basis rows are the raw
residuals ``w'_j`` (NOT normalized — norms ``β_j`` are known scalars from the
reductions), so normalization never costs a vector pass.  The driver carries
the per-row scale vector ``s`` and folds it into contraction coefficients,
the restart rotation (``diag(s)·U``) and extraction — all O(kmax) scalar
math.  See ``factorizations/krylov.py:expand_fused_*``.

Reference being replaced: the reference's per-step
``matvec + orthogonalize!`` pair (``src/factorizations/lanczos.jl:295-376``
+ ``src/orthonormal.jl``), which is two basis passes by construction.

All matmuls run at ``precision=HIGHEST`` (dense-kernel convention; default
bf16 MXU passes drift over iterated orthogonalization — CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

LANES = 128
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "fused_step",
    "stencil_apply_window",
    "supported_stencil",
    "choose_tile",
    "boundary_cache",
    "cache_from_tile_rows",
]


def choose_tile(R: int, tile_rows: int = 256) -> int:
    """The row-tile size ``fused_step`` will use for ``R`` rows."""
    T = tile_rows
    while T > 8 and (R % T != 0 or R // T < 2):
        T //= 2
    if R % T != 0 or R // T < 2:
        raise ValueError(f"R={R} rows do not tile (need R % T == 0, >= 2 tiles)")
    return T


def boundary_cache(a, T: int):
    """Halo planes of a stacked array: for each leading index and tile ``i``,
    ``[..., i, 0] = row i·T − 1`` (zeros at i=0) and ``[..., i, 1] = row
    (i+1)·T`` (zeros at the last tile) — zero halos ARE the Dirichlet
    truncation of the stencil.  O(rows/T) data; built from a free reshape
    plus one-row slices."""
    lead = a.shape[:-2]
    R, C = a.shape[-2:]
    nt = R // T
    a4 = a.reshape(lead + (nt, T, C))
    last = a4[..., :, T - 1, :]
    first = a4[..., :, 0, :]
    z = jnp.zeros(lead + (1, C), a.dtype)
    lo = jnp.concatenate([z, last[..., :-1, :]], axis=-2)
    hi = jnp.concatenate([first[..., 1:, :], z], axis=-2)
    return jnp.stack([lo, hi], axis=-2)  # lead + (nt, 2, C)


def cache_from_tile_rows(wb):
    """Convert a kernel boundary output ``wb[i] = (first_row_i, last_row_i)``
    into the halo-plane layout of :func:`boundary_cache` for that vector."""
    nt, _, C = wb.shape
    z = jnp.zeros((1, C), wb.dtype)
    lo = jnp.concatenate([z, wb[:-1, 1, :]], axis=0)  # row iT-1 = last of i-1
    hi = jnp.concatenate([wb[1:, 0, :], z], axis=0)  # row (i+1)T = first of i+1
    return jnp.stack([lo, hi], axis=1)  # (nt, 2, C)


def supported_stencil(offsets) -> bool:
    """The fused kernel supports constant-coefficient offsets within one
    lane-row of halo on each side (covers all nearest-neighbour chains and
    bands up to half-width 128)."""
    return all(-LANES <= d <= LANES for d in offsets)


def stencil_apply_window(win, coeffs, offsets, T):
    """Apply the constant-coefficient stencil to a ``(T + 2, 128)`` window
    (one halo row each side); returns the ``(T, 128)`` interior result.

    Same (q, r) offset decomposition as ``pallas_spmv._spmv_kernel`` —
    ``δ = 128·q + r``, lane-roll by ``128 − r`` + sublane row select — but
    with scalar coefficients instead of streamed value planes (zero HBM
    traffic for the matrix)."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    acc = jnp.zeros((T, LANES), jnp.float32)
    QLO = 1
    for coef, d in zip(coeffs, offsets):
        q, r = divmod(int(d), LANES)
        src = win if r == 0 else pltpu.roll(win, LANES - r, axis=1)
        a = src[QLO + q : QLO + q + T, :]
        if r == 0:
            sh = a
        else:
            b = src[QLO + q + 1 : QLO + q + 1 + T, :]
            sh = jnp.where(lane < LANES - r, a, b)
        acc = acc + jnp.float32(coef) * sh.astype(jnp.float32)
    return acc


def _fused_kernel(
    kp1_ref,  # scalar prefetch: [k + 1] — row index to write
    v_ref,  # (B, T, 128) basis rows 0..B-1, tile i
    y_ref,  # (T, 128) current y = A·(pending row), tile i
    vb_ref,  # (B, 1, 2, 128) basis boundary rows (lo, hi) for tile i
    yb_ref,  # (1, 2, 128) y boundary rows for tile i
    g_ref,  # (1, 128): [0, :B] subtract coeffs g, [0, B] = γ_y
    w_out,  # (1, T, 128) → row k+1 of the (aliased) basis buffer
    ynext_out,  # (T, 128) y' = A w', tile i
    red_out,  # (1, 128) accumulated raw reductions (revisited block)
    wb_out,  # (1, 2, 128) first/last rows of w' tile i (boundary cache feed)
    ynb_out,  # (1, 2, 128) first/last rows of y' tile i
    *,
    B: int,
    T: int,
    coeffs: Tuple[float, ...],
    offsets: Tuple[int, ...],
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    nt = pl.num_programs(0)

    g = g_ref[0, :B].astype(jnp.float32)  # (B,)
    gy = g_ref[0, B].astype(jnp.float32)

    V2 = v_ref[...].reshape(B, T * LANES)
    y2 = y_ref[...].reshape(1, T * LANES)

    # 1. subtract: w' = γ_y·y − g·V  (one (1,B)x(B,N) MAC over the stream)
    W2 = gy * y2 - jax.lax.dot_general(
        g.reshape(1, B), V2, (((1,), (0,)), ((), ())), precision=_HI
    )
    Wt = W2.reshape(T, LANES)

    # 2. halo rows of w' from the boundary inputs (same linear combination)
    vb = vb_ref[...].reshape(B, 2 * LANES)
    yb = yb_ref[...].reshape(1, 2 * LANES)
    wb = gy * yb - jax.lax.dot_general(
        g.reshape(1, B), vb, (((1,), (0,)), ((), ())), precision=_HI
    )
    wb = wb.reshape(2, LANES)

    # 3. stencil on the (T+2, 128) window
    win = jnp.concatenate([wb[0:1], Wt, wb[1:2]], axis=0)
    yn = stencil_apply_window(win, coeffs, offsets, T)

    # 4. outputs + raw reductions for the NEXT step
    w_out[0] = Wt.astype(w_out.dtype)
    ynext_out[...] = yn.astype(ynext_out.dtype)
    # first/last rows of this tile, so the DRIVER can update the boundary
    # caches with O(nt) work instead of strided-slicing the 250 MB buffer
    # (XLA lowers that to per-row mini-DMAs costing more than the kernel)
    wb_out[0] = jnp.concatenate([Wt[0:1], Wt[T - 1 : T]], axis=0).astype(
        wb_out.dtype
    )
    ynb_out[0] = jnp.concatenate([yn[0:1], yn[T - 1 : T]], axis=0).astype(
        ynb_out.dtype
    )

    yn2 = yn.reshape(1, T * LANES)
    r_part = jax.lax.dot_general(
        V2, yn2, (((1,), (1,)), ((), ())), precision=_HI
    )  # (B, 1) <V_j, y'>
    rp_part = jnp.sum(Wt.astype(jnp.float32) * yn)  # <w', y'>
    q_part = jnp.sum(Wt.astype(jnp.float32) * Wt.astype(jnp.float32))  # ‖w'‖²

    packed = jnp.concatenate(
        [
            r_part.reshape(1, B),
            rp_part.reshape(1, 1),
            q_part.reshape(1, 1),
            jnp.zeros((1, LANES - B - 2), jnp.float32),
        ],
        axis=1,
    )

    @pl.when(i == 0)
    def _():
        red_out[...] = jnp.zeros_like(red_out)

    red_out[...] += packed.astype(red_out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("B", "coeffs", "offsets", "tile_rows", "interpret"),
)
def fused_step(
    V,  # (kmax, R, 128) f32 basis buffer (rows stored UNNORMALIZED, see module doc)
    y,  # (R, 128) f32: A·(pending row)
    Vb,  # (kmax, nt, 2, 128) boundary cache: [j,i,0]=V[j,iT-1], [j,i,1]=V[j,(i+1)T]
    yb,  # (nt, 2, 128) same for y
    g,  # (kmax + 1,) f32: subtract coeffs [0:kmax] + γ_y at [kmax]
    kp1,  # int32: row index to write (k + 1)
    B: int,
    coeffs: Tuple[float, ...],
    offsets: Tuple[int, ...],
    tile_rows: int = 256,
    interpret: bool = False,
):
    """One fused expansion step.  Returns ``(V_new, y_next, raw, wb, ynb)``:
    ``raw[:B] = <V[j], y'>``, ``raw[B] = <w', y'>``, ``raw[B+1] = |w'|^2``;
    ``wb``/``ynb`` are the per-tile (first, last) rows of ``w'``/``y'`` from
    which the caller updates the boundary caches in O(nt) work
    (:func:`boundary_cache`/:func:`cache_from_tile_rows`).

    ``V_new`` aliases ``V`` with row ``kp1`` overwritten by ``w'``; all other
    rows are bit-identical (the in-place tail-preservation contract of
    ``basis._pallas_transform_inplace``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kmax, R, C = V.shape
    assert C == LANES
    if B + 2 > LANES:
        raise ValueError(
            f"fused_step packs B + 2 = {B + 2} reduction lanes into one "
            f"{LANES}-lane row; krylovdim must satisfy kmax + 2 <= {LANES} "
            "(fused_available gates this — fall back to the unfused path)"
        )
    T = tile_rows
    while T > 8 and (R % T != 0 or R // T < 2):
        T //= 2
    if R % T != 0 or R // T < 2:
        raise ValueError(f"R={R} rows do not tile (need R % T == 0, >= 2 tiles)")
    nt = R // T

    assert Vb.shape == (kmax, nt, 2, C), (Vb.shape, (kmax, nt, 2, C))
    assert yb.shape == (nt, 2, C)
    gbuf = jnp.zeros((1, LANES), jnp.float32)
    gbuf = gbuf.at[0, :B].set(g[:B].astype(jnp.float32))
    gbuf = gbuf.at[0, B].set(g[kmax].astype(jnp.float32))

    kern = functools.partial(
        _fused_kernel, B=B, T=T, coeffs=coeffs, offsets=offsets
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((B, T, C), lambda i, kp1: (0, i, 0)),
            pl.BlockSpec((T, C), lambda i, kp1: (i, 0)),
            pl.BlockSpec((B, 1, 2, C), lambda i, kp1: (0, i, 0, 0)),
            pl.BlockSpec((1, 2, C), lambda i, kp1: (i, 0, 0)),
            pl.BlockSpec((1, LANES), lambda i, kp1: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, C), lambda i, kp1: (kp1[0], i, 0)),
            pl.BlockSpec((T, C), lambda i, kp1: (i, 0)),
            pl.BlockSpec((1, LANES), lambda i, kp1: (0, 0)),
            pl.BlockSpec((1, 2, C), lambda i, kp1: (i, 0, 0)),
            pl.BlockSpec((1, 2, C), lambda i, kp1: (i, 0, 0)),
        ],
    )
    kwargs = {}
    if not interpret:
        # the double-buffered (B, T, 128) stream + reshape staging exceeds the
        # default 16 MB scoped-VMEM budget at larger tiles; raise it (the chip
        # has 128 MB)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        )
    Vnew, ynext, raw, wb, ynb = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(V.shape, V.dtype),
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nt, 2, C), jnp.float32),
            jax.ShapeDtypeStruct((nt, 2, C), jnp.float32),
        ],
        input_output_aliases={1: 0},  # V (first non-prefetch arg) → Vnew
        interpret=interpret,
        **kwargs,
    )(
        jnp.asarray([kp1], jnp.int32), V,
        y, jax.lax.slice_in_dim(Vb, 0, B, axis=0), yb, gbuf,
    )
    return Vnew, ynext, raw[0], wb, ynb
