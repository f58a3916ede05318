"""Row-partitioned distributed sparse operators (BASELINE.json config 5).

The reference parallelizes exactly one axis — the vector dimension — with
shared-memory threads over its BLAS-2 kernels (``src/orthonormal.jl:94-196``).
The TPU-native equivalent partitions the *operator rows and the vector* over a
device mesh axis and turns the per-iteration SpMV into

    local ELL gather  +  a fixed schedule of ``ppermute`` halo exchanges,

with all communication planned **once, host-side, at construction**:

* The matrix rows (and the domain/codomain vectors) are split into ``D``
  contiguous blocks over the mesh axis.
* For every pair (shard ``d``, source shard ``s = (d+δ) mod D``) the exact set
  of remote vector entries shard ``d`` needs is precomputed; round ``δ`` is one
  ``ppermute`` of a static-width packed payload over ICI.  A banded matrix
  needs only δ ∈ {1, D−1} (nearest neighbours); a general graph gets exactly
  the rounds its sparsity requires — never an all-gather.
* Column indices are remapped per shard into a local buffer
  ``[own block | halo δ₁ | halo δ₂ | …]`` so the on-device apply is a single
  vectorized gather + multiply-reduce over static shapes (VPU-friendly ELL,
  see ``ops/sparse.py``).

The adjoint is planned independently from the transposed COO (the adjoint of a
row partition is a column partition — re-planning is the gather-free way), so
rectangular maps work and LSMR/GKL/svdsolve run fully sharded.

Inside solvers nothing changes: inner products on the sharded vectors lower to
one ``psum`` (GSPMD), basis GEMMs stay row-local, and the SpMV halo exchange
is the only neighbour traffic — the overlap-friendly structure of
SURVEY.md §5.8.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.operator import LinearOperator
from .mesh import VECTOR_AXIS

__all__ = [
    "ShardedELLOperator",
    "sharded_ell_from_coo",
    "banded_coo",
    "rect_sparse_coo",
]


# ---------------------------------------------------------------------------
# host-side planning (numpy, vectorized — runs once at construction)
# ---------------------------------------------------------------------------


def coo_to_ell(rows, cols, vals, n_rows: int):
    """Vectorized COO→ELLPACK packing.  Returns ``(ell_cols, ell_vals, valid)``
    of shape ``(n_rows, width)``; padding slots have ``valid=False``.

    (The reference applies sparse matrices through generic ``A*x``,
    ``src/apply.jl:1-2``; ELL is the TPU-friendly layout — see
    ``ops/sparse.py`` module docstring.)
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    order = np.lexsort((cols, rows))
    r, c, v = rows[order], cols[order], vals[order]
    counts = np.bincount(r, minlength=n_rows)
    width = int(counts.max()) if counts.size else 0
    width = max(width, 1)
    starts = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(r), dtype=np.int64) - starts[r]
    ell_cols = np.zeros((n_rows, width), np.int32)
    ell_vals = np.zeros((n_rows, width), vals.dtype)
    valid = np.zeros((n_rows, width), bool)
    ell_cols[r, pos] = c
    ell_vals[r, pos] = v
    valid[r, pos] = True
    return ell_cols, ell_vals, valid


@dataclasses.dataclass(frozen=True)
class _HaloPlan:
    """Static communication schedule for one direction of a sharded SpMV."""

    deltas: Tuple[int, ...]  # ppermute rounds: shard d receives from (d+δ)%D
    lengths: Tuple[int, ...]  # padded payload length per round
    col_block: int  # local domain-vector block (elements)
    row_block: int  # local codomain block (elements)
    width: int  # ELL width

    @property
    def halo_elems(self) -> int:
        return int(sum(self.lengths))


def _plan_shard(ell_cols, valid, m, n, D):
    """Remap ELL columns into per-shard local-buffer coordinates and build the
    per-round send lists.  Returns ``(remapped_cols (m,width) int32,
    send_idx {δ: (D, L_δ) int32}, plan)``."""
    row_block = m // D
    col_block = n // D
    width = ell_cols.shape[1]

    # per-shard needed remote entries, grouped by ring distance δ
    need = [dict() for _ in range(D)]  # need[d][δ] = sorted global col indices
    for d in range(D):
        sub = ell_cols[d * row_block : (d + 1) * row_block]
        subv = valid[d * row_block : (d + 1) * row_block]
        src = sub // col_block
        remote = subv & (src != d)
        if not remote.any():
            continue
        rc = sub[remote]
        rs = src[remote]
        for s in np.unique(rs):
            delta = int((s - d) % D)
            need[d][delta] = np.unique(rc[rs == s])

    deltas = sorted({delta for nd in need for delta in nd})
    lengths = [max(len(nd.get(delta, ())) for nd in need) for delta in deltas]

    # buffer offsets: [local | halo δ₁ | halo δ₂ | …]
    offsets = {}
    off = col_block
    for delta, L in zip(deltas, lengths):
        offsets[delta] = off
        off += L

    remapped = np.zeros((m, width), np.int32)
    for d in range(D):
        sl = slice(d * row_block, (d + 1) * row_block)
        sub = ell_cols[sl].copy()
        subv = valid[sl]
        sub[~subv] = d * col_block  # padding → local slot 0 (value is 0)
        src = sub // col_block
        out = sub - d * col_block  # local entries
        for delta in deltas:
            s = (d + delta) % D
            mask = subv & (src == s) if s != d else np.zeros_like(subv)
            if not mask.any():
                continue
            nd = need[d][delta]
            out[mask] = offsets[delta] + np.searchsorted(nd, sub[mask])
        remapped[sl] = out

    # send lists: in round δ, shard s sends to shard (s-δ)%D the entries that
    # shard needs from s (local indices on s), padded to L_δ with 0
    send_idx = {}
    for delta, L in zip(deltas, lengths):
        tbl = np.zeros((D, L), np.int32)
        for s in range(D):
            dst = (s - delta) % D
            nd = need[dst].get(delta)
            if nd is not None and len(nd):
                tbl[s, : len(nd)] = nd - s * col_block
        send_idx[delta] = tbl

    plan = _HaloPlan(tuple(deltas), tuple(lengths), col_block, row_block, width)
    return remapped, send_idx, plan


# ---------------------------------------------------------------------------
# device-side apply
# ---------------------------------------------------------------------------


def _make_apply(mesh, axis, plan: _HaloPlan, cols, vals, sends, out_template):
    """Build the shard_map'd SpMV closure for one direction."""
    D = mesh.shape[axis]
    perms = [
        [(s, (s - delta) % D) for s in range(D)] for delta in plan.deltas
    ]
    out_local_shape = (out_template[0] // D,) + tuple(out_template[1:])

    def local_spmv(x_loc, cols_loc, vals_loc, *send_loc):
        xf = x_loc.reshape(-1)  # local contiguous element block
        parts = [xf]
        for send, perm in zip(send_loc, perms):
            payload = jnp.take(xf, send[0], axis=0)
            parts.append(jax.lax.ppermute(payload, axis, perm))
        buf = jnp.concatenate(parts) if len(parts) > 1 else xf
        g = jnp.take(buf, cols_loc, axis=0)  # (row_block, width)
        y = jnp.sum(vals_loc.astype(g.dtype) * g, axis=1)
        return y.reshape(out_local_shape)

    nd_out = len(out_template)
    data_spec = P(axis, None)
    smap = jax.shard_map(
        local_spmv,
        mesh=mesh,
        in_specs=(
            P(axis, *([None] * (nd_out - 1))),
            data_spec,
            data_spec,
        )
        + (data_spec,) * len(sends),
        out_specs=P(axis, *([None] * (nd_out - 1))),
    )

    def apply(x):
        return smap(x, cols, vals, *sends)

    return apply


class ShardedELLOperator(LinearOperator):
    """Row-partitioned ELL sparse operator over a device mesh axis.

    ``normal``/``adjoint`` are ``shard_map`` closures doing local ELL gathers
    plus the precomputed ``ppermute`` halo schedule.  Vectors are sharded over
    their leading axis; flat ``(n,)`` and tile-aligned ``(n/C, C)`` layouts are
    both supported (the partition is by contiguous element blocks either way).
    """

    def __init__(self, mesh, axis, shape, fwd, adj=None, tile: Optional[int] = None):
        cols, vals, sends, plan = fwd
        object.__setattr__(self, "mesh", mesh)
        object.__setattr__(self, "axis", axis)
        object.__setattr__(self, "shape", tuple(shape))
        object.__setattr__(self, "tile", tile)
        object.__setattr__(self, "fwd_plan", plan)
        object.__setattr__(self, "adj_plan", adj[3] if adj is not None else None)
        m, n = shape
        dom = (n,) if tile is None else (n // tile, tile)
        cod = (m,) if tile is None else (m // tile, tile)
        object.__setattr__(
            self, "normal", _make_apply(mesh, axis, plan, cols, vals, sends, cod)
        )
        if adj is not None:
            acols, avals, asends, aplan = adj
            object.__setattr__(
                self,
                "adjoint",
                _make_apply(mesh, axis, aplan, acols, avals, asends, dom),
            )
        else:
            object.__setattr__(self, "adjoint", None)

    def comm_summary(self) -> str:
        """Static per-apply communication: ppermute rounds and payload sizes
        (the stand-in scaling diagnostic when only one real chip exists)."""
        f = self.fwd_plan
        s = (
            f"normal: {len(f.deltas)} ppermute round(s) "
            f"(δ={list(f.deltas)}), {f.halo_elems} halo elems/apply"
        )
        if self.adj_plan is not None:
            a = self.adj_plan
            s += (
                f"; adjoint: {len(a.deltas)} round(s) (δ={list(a.deltas)}), "
                f"{a.halo_elems} halo elems/apply"
            )
        return s


jax.tree_util.register_pytree_node(
    # static-by-identity, like LinearOperator: the ELL planes live inside the
    # shard_map closures as committed device arrays; jit caches key on the
    # operator object (one compile per constructed operator)
    ShardedELLOperator,
    lambda op: ((), op),
    lambda aux, _: aux,
)


def _shard_data(mesh, axis, ell_cols, ell_vals, send_idx, plan):
    spec = NamedSharding(mesh, P(axis, None))
    cols = jax.device_put(jnp.asarray(ell_cols), spec)
    vals = jax.device_put(jnp.asarray(ell_vals), spec)
    sends = tuple(
        jax.device_put(jnp.asarray(send_idx[d]), spec) for d in plan.deltas
    )
    return cols, vals, sends, plan


def sharded_ell_from_coo(
    rows,
    cols,
    vals,
    shape: Tuple[int, int],
    mesh,
    *,
    axis: str = VECTOR_AXIS,
    tile: Optional[int] = None,
    with_adjoint: bool = True,
) -> ShardedELLOperator:
    """Plan and build a row-partitioned sparse operator from COO triplets.

    ``shape = (m, n)`` may be rectangular; ``m``, ``n`` must be divisible by
    the mesh-axis size (pad the matrix with empty rows/identity tail columns
    if not — see ``banded_coo``/``rect_sparse_coo`` which emit compliant
    shapes).  With ``tile=C`` vectors are ``(len/C, C)`` tile-aligned arrays
    (the fast TPU layout, ``ops/basis.py`` note); ``C`` must divide the block
    sizes.
    """
    m, n = shape
    D = mesh.shape[axis]
    if m % D or n % D:
        raise ValueError(f"shape {shape} not divisible by mesh axis size {D}")
    if tile is not None and ((m // D) % tile or (n // D) % tile):
        raise ValueError(f"tile={tile} must divide the local blocks of {shape}")
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)

    ec, ev, valid = coo_to_ell(rows, cols, vals, m)
    ev = np.where(valid, ev, 0)
    remapped, send_idx, plan = _plan_shard(ec, valid, m, n, D)
    fwd = _shard_data(mesh, axis, remapped, ev, send_idx, plan)

    adj = None
    if with_adjoint:
        ac, av, avalid = coo_to_ell(cols, rows, np.conj(vals), n)
        av = np.where(avalid, av, 0)
        aremap, asend, aplan = _plan_shard(ac, avalid, n, m, D)
        adj = _shard_data(mesh, axis, aremap, av, asend, aplan)

    return ShardedELLOperator(mesh, axis, shape, fwd, adj, tile=tile)


# ---------------------------------------------------------------------------
# synthetic matrix generators (the config-5 benchmark/test operators)
# ---------------------------------------------------------------------------


def banded_coo(n: int, halfband: int, dtype=np.float64, seed: int = 0, spd: bool = True):
    """Symmetric banded matrix as COO: random band entries, diagonally
    dominant when ``spd``.  nnz = n·(2·halfband+1) − O(halfband²)."""
    rng = np.random.default_rng(seed)
    rows_l, cols_l, vals_l = [], [], []
    for k in range(1, halfband + 1):
        v = rng.standard_normal(n - k).astype(dtype) * (0.5 / k)
        i = np.arange(n - k)
        rows_l += [i, i + k]
        cols_l += [i + k, i]
        vals_l += [v, v]
    off = np.concatenate(vals_l) if vals_l else np.zeros(0, dtype)
    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    diag = rng.standard_normal(n).astype(dtype)
    if spd:
        abssum = np.zeros(n, dtype)
        np.add.at(abssum, rows, np.abs(off))
        diag = abssum + 1.0 + 0.1 * np.abs(diag)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([off, diag])
    return rows, cols, vals


def rect_sparse_coo(m: int, n: int, nnz_per_row: int, dtype=np.float64, seed: int = 0):
    """Rectangular sparse matrix (term-document-like, BASELINE config 3/5 LSMR
    operand): ``nnz_per_row`` random columns per row, random positive values,
    plus a band so every column is touched."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), nnz_per_row)
    cols = rng.integers(0, n, size=m * nnz_per_row)
    vals = rng.random(m * nnz_per_row).astype(dtype) + 0.1
    # deduplicate (r, c) pairs: keep first occurrence
    key = rows.astype(np.int64) * n + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols, vals = rows[idx], cols[idx], vals[idx]
    # guarantee full column rank support: a diagonal-ish band
    i = np.arange(min(m, n))
    rows = np.concatenate([rows, i])
    cols = np.concatenate([cols, i])
    vals = np.concatenate([vals, np.full(len(i), 2.0, dtype)])
    key = rows.astype(np.int64) * n + cols
    _, idx = np.unique(key, return_index=True)
    return rows[idx], cols[idx], vals[idx]
