"""Stacked orthonormal basis — TPU-native analogue of ``OrthonormalBasis``.

The reference stores the Krylov basis as a growable list of vectors
(``src/orthonormal.jl:26-60``) and hand-threads BLAS-2-like kernels over it
(``project!!`` ``src/orthonormal.jl:88-118``, ``unproject!!`` ``:132-196``,
``basistransform!`` ``:291-354``).  On TPU the right layout is a *dense stacked
array*: every pytree leaf of the vector gains a leading axis of static size
``kmax`` (the Krylov dimension), so that

* ``project``   (``Vᴴ x``)  is one GEMV/GEMM per leaf + a scalar tree-sum
  (→ a single ``psum`` when the vector dimension is sharded),
* ``unproject`` (``V c``)   is one GEMV per leaf, purely local under row sharding,
* ``transform`` (``V ← V U``) is one GEMM per leaf — the thick-restart operation,

all mapping straight onto the MXU with static shapes.  The "current length" ``k``
is a traced integer; inactivity is expressed by masks, never by dynamic shapes.

TPU LAYOUT NOTE (measured on v5e): all contractions here run ``dot_general``
over the *trailing* leaf dimensions directly — never ``reshape`` to a flat
``(k, n)`` matrix.  XLA assigns 2-D arrays the ``T(8,128)`` tiled layout over
the LAST TWO dims, so a ``(kmax, n)`` basis puts the basis index into the
sublane dimension: appending a vector becomes a sublane-strided
read-modify-write over every tile (~0.4 ms/step at n=2M) and the flattening
reshape itself forces a full-basis relayout.  With vectors shaped ``(n/128,
128)`` (basis leaves ``(kmax, n/128, 128)``) rows are tile-aligned: the append
is a free in-place ``dynamic_update_slice`` and the projection runs at HBM
speed (0.21 ms vs 0.85 ms for the flat layout).  Vector layout is the caller's
choice — everything here is shape-polymorphic — but flat 1-D vectors pay the
layout tax; prefer ``(rows, 128)`` leaves on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .vector import VectorSpace, STANDARD

PyTree = Any
_HI = jax.lax.Precision.HIGHEST

# Toggle for the dynamic-k Pallas projection kernels (ops/pallas_basis.py).
# OFF by default: on-chip A/B (2026-08-19) showed the flagship solve REGRESSES
# 6.28 → 4.41 Gnnz/s with these kernels — the chunked-DMA dynamic-k stream is
# slower than XLA's full-31-row fused contraction despite reading ~24% less
# HBM (M=1 GEMVs hit the small-matmul wall; see tools/bench_phases.py data in
# benchmarks/RESULTS.md).  Kept as an honest experiment + interpret-mode tests.
use_pallas_projections = False


def _pallas_proj_leaf(V, x, space: "VectorSpace"):
    """Return the (lV, lx) pair if the Pallas projection kernels apply, else None."""
    if not use_pallas_projections or jax.default_backend() != "tpu":
        return None
    if space.inner_fn is not None:
        return None
    lV = jax.tree_util.tree_leaves(V)
    lx = jax.tree_util.tree_leaves(x)
    if len(lV) != 1 or len(lx) != 1:
        return None
    from . import pallas_basis as pb

    if not pb.supported_leaf(lV[0]) or lx[0].dtype != lV[0].dtype:
        return None
    if lx[0].shape != lV[0].shape[1:]:
        return None
    return lV[0], lx[0]

__all__ = [
    "alloc",
    "get",
    "set",
    "project",
    "project_bucketed",
    "unproject",
    "transform",
    "transform_partial",
    "append_scaled",
    "mask_coeffs",
    "gram",
    "batch_inner",
]


def alloc(template: PyTree, kmax: int, dtype=None) -> PyTree:
    """Allocate a zeroed basis of capacity ``kmax`` shaped like ``template``."""
    return jax.tree_util.tree_map(
        lambda l: jnp.zeros((kmax,) + l.shape, dtype=dtype or l.dtype), template
    )


def get(V: PyTree, j) -> PyTree:
    """Basis vector ``V[j]`` (j may be traced)."""
    return jax.tree_util.tree_map(
        lambda l: jax.lax.dynamic_index_in_dim(l, j, axis=0, keepdims=False), V
    )


def set(V: PyTree, j, v: PyTree) -> PyTree:
    """Functional update ``V[j] = v``."""
    return jax.tree_util.tree_map(
        lambda lV, lv: jax.lax.dynamic_update_index_in_dim(
            lV, lv.astype(lV.dtype), j, axis=0
        ),
        V,
        v,
    )


def prefix(V: PyTree, B: int) -> PyTree:
    """Static row-prefix of a stacked basis: the first ``B`` rows of every
    leaf.  A contiguous leading-axis slice — XLA reads it in place (layout
    unchanged), so contractions against the prefix stream only ``B`` rows of
    HBM instead of ``kmax`` (the bucketed-sweep fast path in
    ``ops/orthonormal.py``)."""
    return jax.tree_util.tree_map(
        lambda l: jax.lax.slice_in_dim(l, 0, B, axis=0), V
    )


def buckets_for(kmax: int):
    """Static prefix sizes for bucketed basis reads.

    Step-4 ladder plus ``kmax - 1`` and ``kmax``.  The ``kmax - 1`` bucket
    matters because the capacity is ``krylovdim + 1`` while expansion sweeps
    orthogonalize against at most ``krylovdim`` rows — without it every
    late-stage sweep streams one dead basis row per pass.  On-chip A/B
    (tools/tpu_measure_all.py §1): each prefix contraction runs at the HBM
    roofline, so the saving is exactly the dropped rows (~6-8% of solver HBM
    traffic at krylovdim=30 vs the old quartile ladder).

    Compile-time tradeoff: every bucket is a ``lax.switch`` branch duplicating
    the projection/unprojection contraction inside the solver while_loop, so
    program size grows with the ladder length.  The step therefore coarsens
    for large ``kmax`` (4 up to 64, then 8/16), capping the ladder at ~17
    rungs; the over-read this admits is bounded by ``step/kmax`` of the sweep
    traffic, which shrinks exactly when the ladder would otherwise explode."""
    if kmax < 8:
        return (kmax,)
    step = 4 if kmax <= 64 else 8 if kmax <= 128 else 16
    # NB: builtins.set is shadowed by this module's basis-update `set`
    return tuple(sorted({*range(step, kmax, step), kmax - 1, kmax}))


def bucket_index(k, buckets):
    """Traced index of the smallest bucket ``B >= k``."""
    return sum(
        (jnp.asarray(k, jnp.int32) > b).astype(jnp.int32) for b in buckets[:-1]
    )


def unproject_bucketed(V: PyTree, c: jax.Array, k) -> PyTree:
    """``V c`` reading only the smallest static row-prefix ``B >= k`` of the
    basis (``c`` must be masked beyond ``k``); falls back to the full
    :func:`unproject` when bucketing cannot help."""
    kmax = jax.tree_util.tree_leaves(V)[0].shape[0]
    buckets = buckets_for(kmax)
    if len(buckets) == 1:
        return unproject(V, c)

    def make_branch(B):
        return lambda c, V: unproject(prefix(V, B), jax.lax.slice(c, (0,), (B,)))

    return jax.lax.switch(
        bucket_index(k, buckets), [make_branch(B) for B in buckets], c, V
    )


def project_bucketed(
    V: PyTree, x: PyTree, k, space: VectorSpace = STANDARD
) -> jax.Array:
    """:func:`project` reading only the smallest static row-prefix ``B >= k``
    (the projection half of the bucketed CGS sweep; used standalone by the
    fused-expansion priming step, ``factorizations/krylov.py``)."""
    kmax = jax.tree_util.tree_leaves(V)[0].shape[0]
    buckets = buckets_for(kmax)
    if len(buckets) == 1 or space.inner_fn is not None:
        return project(V, x, k, space)

    def make_branch(B):
        return lambda x, V: jnp.pad(
            project(prefix(V, B), x, k, space), (0, kmax - B)
        )

    return jax.lax.switch(
        bucket_index(k, buckets), [make_branch(B) for B in buckets], x, V
    )


def mask_coeffs(c: jax.Array, k) -> jax.Array:
    """Zero out entries ``j >= k`` of a coefficient vector."""
    idx = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    return jnp.where(idx < k, c, 0)


def project(V: PyTree, x: PyTree, k, space: VectorSpace = STANDARD) -> jax.Array:
    """``c[j] = <V[j], x>`` for ``j < k``, zero beyond — the ``Vᴴx`` kernel.

    Reference: ``project!!`` (``src/orthonormal.jl:88-118``), which the reference
    multithreads per basis vector; here it is a batched contraction (GEMV per
    leaf), one reduction → one ``psum`` on a sharded mesh.
    """
    if space.inner_fn is None:
        hit = _pallas_proj_leaf(V, x, space)
        if hit is not None:
            from . import pallas_basis as pb

            # kernel masks j >= k and reads only ceil(k/kb) basis chunks
            return pb.project_pallas(hit[0], hit[1], k)
        parts = []
        for lV, lx in zip(jax.tree_util.tree_leaves(V), jax.tree_util.tree_leaves(x)):
            nd = lx.ndim
            c = jax.lax.dot_general(
                lV.conj(),
                lx.astype(jnp.result_type(lV.dtype, lx.dtype)),
                ((tuple(range(1, nd + 1)), tuple(range(nd))), ((), ())),
                precision=_HI,
            )
            parts.append(c)
        c = sum(parts[1:], parts[0])
        if space.psum_axis is not None:
            # shard-local rows under shard_map: one psum finishes the batch
            c = jax.lax.psum(c, space.psum_axis)
        if space.real_inner:
            c = jnp.real(c)
    else:
        c = jax.vmap(lambda b: space.inner(b, x))(V)
    return mask_coeffs(c, k)


def unproject(V: PyTree, c: jax.Array, k=None) -> PyTree:
    """``y = Σ_j c[j] V[j]`` — the ``V c`` kernel (reference ``unproject!!``,
    ``src/orthonormal.jl:132-196``).  Caller is responsible for masking ``c``.

    When the active length ``k`` (traced ok) is supplied and the basis has the
    TPU tile layout, a Pallas kernel reads only the first ``k`` basis rows
    from HBM instead of all ``kmax`` (see ``ops/pallas_basis.py``)."""
    if (
        k is not None
        and not jnp.iscomplexobj(c)
        and use_pallas_projections
        and jax.default_backend() == "tpu"
    ):
        lVs = jax.tree_util.tree_leaves(V)
        if len(lVs) == 1:
            from . import pallas_basis as pb

            if pb.supported_leaf(lVs[0]):
                return jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(V),
                    [pb.unproject_pallas(lVs[0], c, k)],
                )

    def leaf(lV):
        return jax.lax.dot_general(
            c.astype(jnp.result_type(c.dtype, lV.dtype)),
            lV,
            (((0,), (0,)), ((), ())),
            precision=_HI,
        )

    return jax.tree_util.tree_map(leaf, V)


def transform(V: PyTree, U: jax.Array) -> PyTree:
    """``V ← V @ U``: new basis vector ``m`` is ``Σ_j U[j, m] V[j]``.

    The thick-restart rotation (reference ``basistransform!``,
    ``src/orthonormal.jl:291-354``).  One GEMM per leaf on the MXU; under row
    sharding of the vector dimension this is embarrassingly local.
    ``U`` has shape ``(kmax, kmax)`` (masked columns for inactive output slots).
    """

    def leaf(lV):
        # out[i, ...] = Σ_j U[j, i] V[j, ...]  (contract U's row dim with dim 0)
        out = jax.lax.dot_general(
            U.T.astype(jnp.result_type(U.dtype, lV.dtype)),
            lV,
            (((1,), (0,)), ((), ())),
            precision=_HI,
        )
        return out.astype(lV.dtype)

    return jax.tree_util.tree_map(leaf, V)


def _pallas_transform_inplace(
    lV: jax.Array, U: jax.Array, m_out: int, *, interpret: bool = False
) -> jax.Array:
    """In-place partial basis rotation on TPU: writes rows ``[0, m_out)`` of
    ``lV`` with ``(Uᵀ lV)[:m_out]``; rows ``>= m_out`` PRESERVE their previous
    contents — this is a CONTRACT, not an accident: the kernel aliases the
    output onto the input (``input_output_aliases={1: 0}``) and each grid step
    writes only ``o_ref[0:m_out]``, so the unwritten tail keeps the input
    values.  The masked-restart drivers rely on it: on gated-off (identity)
    restarts they rotate only ``keep_max+1`` rows and later read basis rows up
    to ``fact.k > m_out`` (``solvers/lanczos.py``), which is exactly the
    preserved tail.  Tested in interpret mode so a kernel change that breaks
    tail preservation fails CI on CPU (``tests/test_pallas.py``).

    Measured on v5e (tools/bench_transform_pallas2.py): 0.69 ms vs 1.63 ms for
    the XLA GEMM at n=2M/kmax=31/m_out=20 — the XLA emitter runs every small-K
    contraction at ~320 GB/s while this kernel streams at ~610 GB/s because it
    (a) writes only the ``m_out`` live rows and (b) aliases the output onto the
    input so no second buffer round-trips through HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kmax, R, C = lV.shape
    br = next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if R % b == 0)

    def kernel(u_ref, v_ref, o_ref):
        v2 = v_ref[:].reshape(kmax, br * C)
        w = jax.lax.dot_general(
            u_ref[:],
            v2,
            (((0,), (0,)), ((), ())),
            preferred_element_type=lV.dtype,
            precision=_HI,
        )
        o_ref[0:m_out] = w.reshape(m_out, br, C)

    return pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[
            pl.BlockSpec((kmax, m_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kmax, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kmax, br, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(lV.shape, lV.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(U[:, :m_out].astype(lV.dtype), lV)


def _pallas_leaf_ok(l) -> bool:
    return (
        l.ndim == 3
        and l.shape[2] % 128 == 0
        and l.shape[1] % 8 == 0
        and l.dtype in (jnp.float32, jnp.bfloat16)
    )


def transform_partial(V: PyTree, U: jax.Array, m_out: int) -> PyTree:
    """``V[:m_out] ← (V @ U)[:m_out]``; rows ``>= m_out`` hold either their
    previous contents (TPU in-place Pallas path — guaranteed, see
    :func:`_pallas_transform_inplace`) or the full rotation ``(V @ U)[m_out:]``
    (XLA fallback).  The two agree whenever ``U`` acts as the identity on the
    tail — in particular for the gated-off identity restarts where the solver
    later reads rows beyond ``m_out``; for genuine restarts the tail is dead
    by masking.

    The thick-restart rotation only needs the ``keep+1`` surviving rows (the
    kept Ritz vectors plus the relocated residual) — every consumer of the
    basis masks inactive slots (``project`` masks coefficients, ``set``
    overwrites whole rows, the next restart's ``U`` has zeroed columns), so
    the tail rows are dead by contract.  ``m_out`` must be a STATIC bound
    (e.g. ``(3·krylovdim + 2·(howmany−1))//5 + 1``).

    On TPU with tile-aligned ``(kmax, R, 128)`` leaves this runs as an
    in-place pallas kernel at the HBM streaming rate (see
    :func:`_pallas_transform_inplace`); any other leaf falls back to the
    full-width GEMM of :func:`transform`.
    """
    use_pallas = jax.default_backend() == "tpu" and not jnp.iscomplexobj(U)

    def leaf(lV):
        if use_pallas and _pallas_leaf_ok(lV):
            return _pallas_transform_inplace(lV, U, m_out)
        out = jax.lax.dot_general(
            U.T.astype(jnp.result_type(U.dtype, lV.dtype)),
            lV,
            (((1,), (0,)), ((), ())),
            precision=_HI,
        )
        return out.astype(lV.dtype)

    return jax.tree_util.tree_map(leaf, V)


def append_scaled(y: PyTree, V: PyTree, c: jax.Array, alpha=1.0) -> PyTree:
    """``y + alpha * (V c)`` fused."""
    vc = unproject(V, c)
    return jax.tree_util.tree_map(lambda ly, lv: ly + alpha * lv, y, vc)


def gram(X: PyTree, Y: PyTree, space: VectorSpace = STANDARD) -> jax.Array:
    """``G[i, j] = ⟨X[i], Y[j]⟩`` between two stacked bases — one GEMM per leaf
    (used e.g. for the GolubYe projected pencil ``HB = VᴴBV``).  With a custom
    inner product the GEMM is replaced by a double vmap over ``space.inner``
    (reference ``block_inner``, ``src/innerproductvec.jl``)."""
    if space.inner_fn is not None:
        return jax.vmap(lambda x: jax.vmap(lambda y: space.inner(x, y))(Y))(X)
    parts = []
    for lX, lY in zip(jax.tree_util.tree_leaves(X), jax.tree_util.tree_leaves(Y)):
        nd = lX.ndim - 1
        dims = tuple(range(1, nd + 1))
        parts.append(
            jax.lax.dot_general(
                lX.conj(), lY, ((dims, dims), ((), ())), precision=_HI
            )
        )
    g = sum(parts[1:], parts[0])
    return jnp.real(g) if space.real_inner else g


def batch_inner(X: PyTree, Y: PyTree, space: VectorSpace = STANDARD) -> jax.Array:
    """``c[i] = ⟨X[i], Y[i]⟩`` row-wise between two stacked bases."""
    if space.inner_fn is not None:
        return jax.vmap(space.inner)(X, Y)
    parts = []
    for lX, lY in zip(jax.tree_util.tree_leaves(X), jax.tree_util.tree_leaves(Y)):
        nd = lX.ndim - 1
        dims = tuple(range(1, nd + 1))
        parts.append(
            jax.lax.dot_general(
                lX.conj(), lY, ((dims, dims), ((0,), (0,))), precision=_HI
            )
        )
    c = sum(parts[1:], parts[0])
    return jnp.real(c) if space.real_inner else c
