"""Banded/offset-decomposed sparse SpMV as a Pallas TPU kernel.

The reference applies sparse matrices through Julia's generic ``A*x``
(``src/apply.jl:1-11``).  The TPU-native layout for the bounded-bandwidth
matrices Krylov benchmarks actually use (stencils, banded systems, bounded
halo graphs) is neither CSR nor gather-ELL but an **offset decomposition**:

    A = Σ_δ diag(d_δ) · S_δ          (S_δ x)[i] = x[i + δ]

with one dense diagonal plane ``d_δ`` per distinct column offset.  The column
indices disappear into *static metadata* — the kernel reads only the value
planes plus a windowed slice of ``x``, i.e. ``(nδ + 1)`` vector-reads per
apply versus ``(2·nδ + 1)`` for any gather-based ELL (cols plane + vals plane
+ x), and the shifts become lane-rolls + static sublane slices, which the VPU
does at register speed.

Kernel structure (per ``TR``-row grid step, vectors viewed as ``(R, 128)``):
DMA the x-window ``[i·TR − QLO, i·TR + TR + QHI)`` from HBM into VMEM (edge
tiles copy the valid intersection into a zeroed window), then for each offset
``δ = 128·q + r`` combine ``roll(win, −r, lanes)`` rows ``q``/``q+1`` with a
lane mask and multiply-accumulate against the streamed value plane.

Anything that doesn't fit (too many distinct offsets, non-multiple-of-128
sizes, complex dtypes, CPU) falls back to an XLA shift-and-add with identical
semantics, so :class:`BandedOperator` is portable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .operator import LinearOperator

__all__ = ["BandedOperator", "banded_from_coo", "banded_from_dense", "ell_to_banded"]

LANES = 128


def _spmv_kernel(x_hbm, vals_ref, y_ref, win, sems, *, TR, R, QLO, QHI, offsets):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nt = pl.num_programs(0)
    W = QLO + TR + QHI
    first = i == 0
    last = i == nt - 1

    @pl.when(jnp.logical_or(first, last))
    def _():
        win[...] = jnp.zeros_like(win)

    @pl.when(first)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, W - QLO), :], win.at[pl.ds(QLO, W - QLO), :], sems.at[0]
        )
        cp.start()
        cp.wait()

    @pl.when(last)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TR - QLO, W - QHI), :],
            win.at[pl.ds(0, W - QHI), :],
            sems.at[0],
        )
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(jnp.logical_not(first), jnp.logical_not(last)))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TR - QLO, W), :], win.at[...], sems.at[0]
        )
        cp.start()
        cp.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1)
    acc = jnp.zeros((TR, LANES), jnp.float32)
    for p, d in enumerate(offsets):
        q, r = divmod(d, LANES)
        src = win[...] if r == 0 else pltpu.roll(win[...], LANES - r, axis=1)
        a = src[QLO + q : QLO + q + TR, :]
        if r == 0:
            sh = a
        else:
            b = src[QLO + q + 1 : QLO + q + 1 + TR, :]
            sh = jnp.where(lane < LANES - r, a, b)
        acc = acc + vals_ref[p].astype(jnp.float32) * sh.astype(jnp.float32)
    y_ref[...] = acc.astype(y_ref.dtype)


def _window_extent(offsets) -> Tuple[int, int]:
    qs = [d // LANES for d in offsets]
    qlo = max(0, -min(qs)) if qs else 0
    qhi = (max(qs) if qs else 0) + 1
    return qlo, qhi


@functools.partial(
    jax.jit, static_argnames=("offsets", "TR", "interpret")
)
def _spmv_pallas(x2, diags, offsets, TR: int = 512, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = x2.shape[0]
    tr = min(TR, R)
    while R % tr != 0:
        tr //= 2
    QLO, QHI = _window_extent(offsets)
    # middle tiles read x rows [i·tr − QLO, i·tr + tr + QHI); the first/last
    # tile special-cases only cover one tile of halo each, so wider halos
    # would read out of bounds (silently wrong in interpret mode)
    if not (R // tr >= 2 and QLO <= tr and QHI <= tr):
        raise ValueError(
            f"banded window (QLO={QLO}, QHI={QHI}) does not fit tile rows "
            f"tr={tr} with R={R}; use a larger tile_rows or the XLA fallback"
        )
    W = QLO + tr + QHI
    nd = len(offsets)

    kern = functools.partial(
        _spmv_kernel, TR=tr, R=R, QLO=QLO, QHI=QHI, offsets=offsets
    )
    return pl.pallas_call(
        kern,
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nd, tr, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * R * LANES,
            bytes_accessed=(nd + 2) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, diags)


def _spmv_xla(xf, diags, offsets, n):
    """Identical semantics via XLA roll (any backend / dtype / length)."""
    idx = jnp.arange(n)
    y = jnp.zeros((n,), jnp.result_type(diags.dtype, xf.dtype))
    for p, d in enumerate(offsets):
        shifted = jnp.roll(xf, -d)
        shifted = jnp.where((idx + d >= 0) & (idx + d < n), shifted, 0)
        y = y + diags[p].reshape(-1)[:n] * shifted
    return y


class BandedOperator(LinearOperator):
    """Square sparse operator in offset-decomposed (generalized banded) form.

    ``diags`` has shape ``(nδ, n/128, 128)`` (``(nδ, n)`` reshaped) with
    ``diags[p]`` flattened over rows: ``diags[p][i] = A[i, i + offsets[p]]``
    (zero where absent or out of range).  ``offsets`` is static metadata.
    """

    def __init__(self, offsets: Tuple[int, ...], diags, n: int, adj=None,
                 tile_rows: int = 512):
        object.__setattr__(self, "offsets", tuple(int(d) for d in offsets))
        object.__setattr__(self, "diags", jnp.asarray(diags))
        object.__setattr__(self, "n", int(n))
        object.__setattr__(self, "adj", adj)
        object.__setattr__(self, "tile_rows", int(tile_rows))
        object.__setattr__(self, "normal", self._matvec)
        object.__setattr__(
            self, "adjoint", adj._matvec if adj is not None else None
        )

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.diags)))

    def _pallas_ok(self, x) -> bool:
        if jax.default_backend() != "tpu":
            return False
        if self.n % LANES != 0 or jnp.iscomplexobj(x) or jnp.iscomplexobj(self.diags):
            return False
        if x.dtype != jnp.float32:
            return False
        R = self.n // LANES
        tr = min(self.tile_rows, R)
        while R % tr != 0:
            tr //= 2
        QLO, QHI = _window_extent(self.offsets)
        # window must fit a tile-aligned scheme with ≥2 tiles and edge halos
        # no wider than one tile
        return R // tr >= 2 and QLO <= tr and QHI <= tr

    # VMEM capacity of one v5e core; the dispatch rule below is calibrated on
    # it (tools/bench_vmem_crossover.py + the round-3 tridiagonal A/B)
    _VMEM_BYTES = 128 * 2**20

    def _prefer_pallas(self, x) -> bool:
        """Measured dispatch law (one v5e chip, f32):

        * tridiagonal (3 offsets), n=2M — working set 5·8 MB = 40 MB, VMEM
          resident: XLA shift-and-add wins (27.8 vs 37.8 µs; RESULTS.md).
        * halfband 8 (17 offsets), n ∈ {2M, 16M, 32M} — working sets
          152 MB–2.4 GB: the Pallas kernel wins 1.7–2.7×
          (tools/bench_vmem_crossover.py, 2026-08-20).

        Both are explained by whether the per-apply working set
        ``(nδ + 2)·n·4`` fits VMEM: inside, XLA keeps the vector resident
        across loop iterations and its per-offset rolls are free; beyond,
        XLA pays a pass per offset while the kernel reads ``x`` once per
        tile window."""
        nd = len(self.offsets)
        itemsize = jnp.dtype(x.dtype).itemsize
        return (nd + 2) * self.n * itemsize > self._VMEM_BYTES

    def _matvec(self, x):
        shape = x.shape
        if self._pallas_ok(x) and self._prefer_pallas(x):
            x2 = x.reshape(self.n // LANES, LANES)
            y = _spmv_pallas(x2, self.diags, self.offsets, self.tile_rows)
        else:
            y = _spmv_xla(x.reshape(self.n), self.diags, self.offsets, self.n)
        return y.reshape(shape)


jax.tree_util.register_pytree_node(
    BandedOperator,
    lambda op: (
        (op.diags,) + ((op.adj.diags,) if op.adj is not None else ()),
        (op.offsets, op.n, op.adj.offsets if op.adj is not None else None,
         op.tile_rows),
    ),
    lambda aux, ch: BandedOperator(
        aux[0], ch[0], aux[1],
        adj=(BandedOperator(aux[2], ch[1], aux[1], tile_rows=aux[3])
             if aux[2] is not None else None),
        tile_rows=aux[3],
    ),
)


def _plan(rows, cols, vals, n):
    """COO → (offsets, planes (nδ, n)) with duplicate entries summed."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    deltas = cols - rows
    offs = np.unique(deltas)
    p = np.searchsorted(offs, deltas)
    planes = np.zeros((len(offs), n), vals.dtype)
    np.add.at(planes, (p, rows), vals)
    return tuple(int(d) for d in offs), planes


def banded_from_coo(
    rows, cols, vals, n: int, max_offsets: Optional[int] = 128,
    with_adjoint: bool = True, tile_rows: int = 512,
) -> BandedOperator:
    """Build a :class:`BandedOperator` from COO triplets of a square matrix.

    Raises ``ValueError`` if the matrix has more than ``max_offsets`` distinct
    column offsets (then it is not banded-like — use :class:`ops.sparse.ELLOperator`).
    """
    offs, planes = _plan(rows, cols, vals, n)
    if max_offsets is not None and len(offs) > max_offsets:
        raise ValueError(
            f"{len(offs)} distinct offsets exceed max_offsets={max_offsets}; "
            "matrix is not banded-like — use ELLOperator instead"
        )
    R = -(-n // LANES)
    pad = R * LANES - n
    planes3 = np.pad(planes, ((0, 0), (0, pad))).reshape(len(offs), R, LANES)
    adj = None
    if with_adjoint:
        adj = banded_from_coo(
            np.asarray(cols), np.asarray(rows), np.conj(np.asarray(vals)), n,
            max_offsets=None, with_adjoint=False, tile_rows=tile_rows,
        )
    return BandedOperator(offs, planes3, n, adj=adj, tile_rows=tile_rows)


def banded_from_dense(A, tol: float = 0.0, **kw) -> BandedOperator:
    A = np.asarray(A)
    if A.shape[0] != A.shape[1]:
        raise ValueError("BandedOperator requires a square matrix")
    rows, cols = np.nonzero(np.abs(A) > tol)
    return banded_from_coo(rows, cols, A[rows, cols], A.shape[0], **kw)


def ell_to_banded(op, max_offsets: Optional[int] = 128) -> BandedOperator:
    """Convert an :class:`ops.sparse.ELLOperator` (square) to banded form."""
    n_rows, n_cols = op.shape
    if n_rows != n_cols:
        raise ValueError("offset decomposition requires a square matrix")
    cols = np.asarray(op.cols)
    vals = np.asarray(op.vals)
    rows = np.broadcast_to(np.arange(n_rows)[:, None], cols.shape)
    mask = vals != 0
    return banded_from_coo(
        rows[mask], cols[mask], vals[mask], n_rows, max_offsets=max_offsets
    )
