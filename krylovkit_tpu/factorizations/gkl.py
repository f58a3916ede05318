"""Golub-Kahan-Lanczos bidiagonalization, TPU-native.

The reference factorization (``src/factorizations/gkl.jl``) maintains two bases —
U in the codomain, V in the domain — with ``A V = U B + r b'`` and
``Aᴴ U = V Bᴴ`` for a lower-bidiagonal ``B`` (``gklrecurrence``,
``src/factorizations/gkl.jl:294-404``; two applies per step,
``src/factorizations/gkl.jl:188-190``).

TPU-native deviations (same rationale as ``krylov.py``):

* both bases are dense stacked arrays; each half-step is one full batched
  orthogonalization sweep (GEMV + one reduction with CGS-family strategies);
* the projected matrix is a dense ``(m+1, m+1)`` buffer ``B[i, j] = ⟨u_i, A v_j⟩``
  rather than two bidiagonal coefficient lists: thick restart then writes a
  *broken-arrow* form (diag(σ) + spike row) and the next expansion sweep
  regenerates the spike row numerically — no Householder restoration of
  bidiagonal form (reference ``src/eigsolve/svdsolve.jl:231-274``) is needed.

Invariants after ``k`` steps (active sizes: ``U[0..k]``, ``V[0..k-1]``):

    A V[:, :k]  = U[:, :k] B[:k, :k] + u_k · B[k, :k]     (residual row)
    Aᴴ U[:, :k] = V[:, :k] B[:k, :k]ᴴ                      (exact)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any

__all__ = ["GKLState", "initialize", "expand"]


class GKLState(NamedTuple):
    """Static-shape GKL factorization state for ``lax.while_loop``."""

    U: PyTree  # stacked codomain basis, capacity m+1
    V: PyTree  # stacked domain basis, capacity m+1 (m used)
    B: jax.Array  # (m+1, m+1) projected-matrix buffer ⟨u_i, A v_j⟩
    k: jax.Array  # completed steps (= number of V vectors), int32
    beta: jax.Array  # current residual norm β_k = ‖A v_k − Σ ...‖


def initialize(
    op,
    x0: PyTree,
    m: int,
    coeff_dtype,
    space: VectorSpace = STANDARD,
    vec_dtype=None,
    verbosity: int = 0,
) -> GKLState:
    """``U[0] = x0/‖x0‖``; the domain basis V is allocated from the abstract
    shape of ``Aᴴ x0`` (no FLOPs).  Reference ``initialize``
    (``src/factorizations/gkl.jl:183-215``)."""
    if vec_dtype is not None:
        x0 = jax.tree_util.tree_map(lambda l: l.astype(vec_dtype), x0)
    nrm = space.norm(x0)
    from ..info import warn_if

    warn_if(
        verbosity, nrm == 0,
        "[krylovkit_tpu] starting vector x0 has zero norm: results are NaN "
        "and converged = 0",
    )
    u0 = jax.tree_util.tree_map(lambda l: l / nrm.astype(l.dtype), x0)
    U = bs.alloc(u0, m + 1)
    U = bs.set(U, 0, u0)
    vshape = jax.eval_shape(op.apply_adjoint, u0)
    V = jax.tree_util.tree_map(
        lambda s: jnp.zeros((m + 1,) + s.shape, s.dtype), vshape
    )
    B = jnp.zeros((m + 1, m + 1), dtype=coeff_dtype)
    return GKLState(U, V, B, jnp.int32(0), jnp.ones((), jnp.finfo(coeff_dtype).dtype))


def expand(
    op,
    state: GKLState,
    orth: on.Orthogonalizer,
    space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> GKLState:
    """One GKL step (two operator applies): ``w = Aᴴ u_k`` → orthonormalize
    against V → ``(α, v_k)``; ``s = A v_k`` → orthonormalize against U →
    ``(β, u_{k+1})``.  Reference ``gklrecurrence``
    (``src/factorizations/gkl.jl:294-404``).

    For the two-pass orthogonalizers (cgs2/mgs2) a **fused** variant runs
    instead (the GKL analogue of ``krylov.py:expand_hermitian``): the exact
    recurrence components are subtracted explicitly and only ONE drift sweep
    follows, cutting basis passes per step from 8 to 5.

    * domain half-step: the components of ``Aᴴ u_k`` along ``V[0..k-1]`` are
      ``conj(B[k, :k])`` *exactly* — ``β_{k-1} e_{k-1}`` at an ordinary step
      (the reference's own subtraction, ``gkl.jl:352-355``), the restart spike
      row after a thick restart (``Aᴴ Ũ = Ṽ Σ`` survives the restart exactly,
      so the buffer row is the truth in both cases);
    * codomain half-step: ``⟨u_i, A v_k⟩ = B[i, k] = α δ_{ik}`` for ``i ≤ k``
      (holds post-restart for the same reason), so a single ``α·u_k`` AXPY
      replaces the first full sweep (reference ``gkl.jl:356-359``).

    The drift-sweep coefficients are discarded; ``B`` keeps the exact
    ``β_{k-1}``/spike entries already in the buffer instead of numerically
    regenerated ones.
    """
    U, V, B, k, _ = state
    m1 = B.shape[0]
    ki = jnp.asarray(k, jnp.int32)
    from ..ops.vector import add

    fused = isinstance(
        orth, (on.ClassicalGramSchmidt2, on.ModifiedGramSchmidt2)
    )
    w = op.apply_adjoint(bs.get(U, k))
    if fused:
        sweep = (
            on.cgs if isinstance(orth, on.ClassicalGramSchmidt2) else on.mgs
        )
        # domain half-step: subtract the known row components, one drift sweep
        rowk = jax.lax.dynamic_slice(B, (ki, jnp.int32(0)), (1, m1))[0]
        rowk = bs.mask_coeffs(rowk, k)
        w = add(w, bs.unproject_bucketed(V, jnp.conj(rowk), k), a=-1)
        v_new, alpha, _ = on.orthonormalize(w, V, k, sweep, space)
        V = bs.set(V, k, v_new)

        # codomain half-step: subtract α u_k, one drift sweep
        s = op.normal(v_new)
        uk = bs.get(U, k)
        s = jax.tree_util.tree_map(
            lambda ls, lu: ls - alpha.astype(ls.dtype) * lu, s, uk
        )
        u_new, beta, _ = on.orthonormalize(s, U, k + 1, sweep, space)
        U = bs.set(U, k + 1, u_new)

        # write α at [k, k] and β at [k+1, k]; everything else in row k /
        # column k is already exact in the buffer
        ek = jax.nn.one_hot(k, m1, dtype=B.dtype)
        ek1 = jax.nn.one_hot(k + 1, m1, dtype=B.dtype)
        mask2 = (ek + ek1)[:, None] * ek[None, :]
        B = B * (1 - mask2) + (
            alpha.astype(B.dtype) * ek[:, None]
            + beta.astype(B.dtype) * ek1[:, None]
        ) * ek[None, :]
        from ..info import EACHITERATION, log_if

        log_if(
            verbosity, EACHITERATION + 1,
            "GKL expansion to dimension {k}: subspace normres = {b}",
            k=k + 1, b=beta,
        )
        return GKLState(U, V, B, k + 1, beta)

    # generic path (cgs/mgs/IR variants): full sweeps, row/column regenerated
    # from the sweep coefficients
    # domain half-step: row k of B gets (conj(c), α)
    v_new, alpha, c = on.orthonormalize(w, V, k, orth, space)
    V = bs.set(V, k, v_new)

    # codomain half-step: column k of B gets (d, β)
    s = op.normal(v_new)
    u_new, beta, d = on.orthonormalize(s, U, k + 1, orth, space)
    U = bs.set(U, k + 1, u_new)

    col = d.astype(B.dtype) + beta.astype(B.dtype) * jax.nn.one_hot(
        k + 1, m1, dtype=B.dtype
    )
    B = jax.lax.dynamic_update_slice(B, col[:, None], (jnp.int32(0), ki))
    row = jnp.conj(c).astype(B.dtype) + alpha.astype(B.dtype) * jax.nn.one_hot(
        k, m1, dtype=B.dtype
    )
    B = jax.lax.dynamic_update_slice(B, row[None, :], (ki, jnp.int32(0)))
    from ..info import EACHITERATION, log_if

    # per-expansion message at EACHITERATION+1 (reference
    # src/factorizations/gkl.jl:266-268)
    log_if(
        verbosity, EACHITERATION + 1,
        "GKL expansion to dimension {k}: subspace normres = {b}",
        k=k + 1, b=beta,
    )
    return GKLState(U, V, B, k + 1, beta)


# --------------------------------------------------------------------------
# Fused one-stream GKL expansion (square stencil operators, (R, 128) f32)
# --------------------------------------------------------------------------

from . import krylov as _kf  # FusedScales + _safe_inv + master switches

_HI = jax.lax.Precision.HIGHEST


def fused_kernel_available(op, x0, space: VectorSpace, kmax: int) -> bool:
    """Eligibility of the fused-KERNEL GKL expansion: a real SQUARE fusable
    stencil (``pf.spec_for`` AND ``pf.adjoint_spec``), single ``(R, 128)``
    f32 leaf in both domain and codomain, standard inner product,
    ``2·kmax + 2 ≤ 128`` (drift packing), TPU backend or interpret mode."""
    from ..ops import pallas_fused_lanczos as pf

    if not _kf.use_fused_expansion:
        return False
    if 2 * kmax + 2 > pf.LANES:
        return False
    if pf.spec_for(op) is None or pf.adjoint_spec(op) is None:
        return False
    if space.inner_fn is not None:
        return False
    leaves = jax.tree_util.tree_leaves(x0)
    if len(leaves) != 1:
        return False
    l = leaves[0]
    if l.ndim != 2 or l.shape[1] != 128 or l.dtype != jnp.float32:
        return False
    if l.shape[0] % 8 != 0 or l.shape[0] < 16:
        return False
    spec = pf.spec_for(op)
    if spec.gc and l.shape[0] * 128 != spec.gr * spec.gc:
        return False
    try:
        pf.choose_tile(l.shape[0], h=max(spec.h, pf.adjoint_spec(op).h))
    except ValueError:
        return False
    if jax.default_backend() != "tpu" and not _kf.fused_interpret:
        return False
    return True


def _correct_col(sc: "_kf.FusedScales", d, q, k):
    """Immediate DGKS correction of column ``k`` of the basis bookkeeping
    given the kernel-measured drift ``d_j = <X_j, X_row_k>`` and ``q =
    ‖row_k‖²`` (same scalar-space second sweep as
    ``krylov._step_coeffs``'s dgks block).  Returns ``(sc', λ = L[k,k])``."""
    L, s, Hs, M = sc
    kmax = L.shape[0]
    idx = jnp.arange(kmax)
    sk = _kf._safe_inv(jnp.sqrt(q))
    s = jnp.where(idx == k, sk, s)
    ohk = jax.nn.one_hot(k, kmax, dtype=jnp.float32)
    d = jnp.where(idx == k, q, d)
    d = jnp.where(idx <= k, d, 0.0)
    c2 = sk * jnp.matmul(L.T, d, precision=_HI)
    c2 = jnp.where(idx < k, c2, 0.0)
    N = 1.0 / jnp.sqrt(jnp.maximum(1.0 - jnp.sum(c2 * c2), 0.25))
    Lcol = N * (sk * ohk - jnp.matmul(L, c2, precision=_HI))
    Lcol = jnp.where(idx <= k, Lcol, 0.0)
    L = L * (1 - ohk)[None, :] + Lcol[:, None] * ohk[None, :]
    return _kf.FusedScales(L, s, Hs, M), N * sk


def _set_col(A, col, k):
    kmax = A.shape[0]
    ohk = jax.nn.one_hot(k, kmax, dtype=A.dtype)
    return A * (1 - ohk)[None, :] + col[:, None] * ohk[None, :]


def fused_expansions(op, state: GKLState, scU: "_kf.FusedScales",
                     scV: "_kf.FusedScales", m: int, btol, space,
                     verbosity: int = 0):
    """Expand a GKL factorization from ``k`` to ``m`` with ONE-STREAM fused
    kernels: per step, one kernel over the domain basis V (subtract + append
    ``v_k`` + in-kernel **normal** stencil apply → ``A v_k``) and one kernel
    over the codomain basis U (subtract + append ``u_{k+1}`` + in-kernel
    **adjoint** stencil apply → ``Aᴴ u_{k+1}``), each ``B + 3`` HBM
    row-passes — vs ~``6B + 10`` for the unfused two-sweep step.  This is the
    GKL analogue of ``krylov.fused_expansions`` (reference recurrence being
    replaced: ``src/factorizations/gkl.jl:294-404``).

    The bidiagonal structure supplies the exact subtraction coefficients
    (``Aᴴ u_k``'s components along V are row ``k`` of the buffer — the
    reference's own subtraction at ``gkl.jl:352-355`` — and ``A v_k``'s along
    U are ``α e_k``); stored rows stay raw with per-basis
    :class:`~.krylov.FusedScales` bookkeeping, and each kernel's same-pass
    drift reduction feeds an IMMEDIATE scalar-space DGKS correction (cgs2
    orthogonality — validated by ``tools/drift_study.py``'s methodology).
    Any subtraction deficiency lands in the drift measurement and is removed
    from the TRUE basis by the correction, so no cross-basis reductions are
    needed.

    Stored-row images ride the scales' ``Hs`` slots: ``scU.Hs[j,i]`` holds
    ``Aᴴ U_i = Σ_j scU.Hs[j,i] V_j`` and ``scV.Hs[j,i]`` holds ``A V_i =
    Σ_j scV.Hs[j,i] U_j`` (after a thick restart these seed from the
    broken-arrow buffer: ``Aᴴ Ũ = Ṽ Σ`` exactly).

    numops: ``2·(m − k)`` operator applications per call — one in-kernel
    apply per half-step, the codomain tail via XLA without the wasted
    adjoint apply — matching the unfused accounting exactly.

    Returns ``(state', scU', scV', numops_inc)``.
    """
    from ..ops import pallas_fused_lanczos as pf

    U, V, B, k0, beta0 = state
    kmax = B.shape[0]
    spec_n = pf.spec_for(op)
    spec_a = pf.adjoint_spec(op)
    h = max(spec_n.h, spec_a.h)
    idx = jnp.arange(kmax)
    buckets = bs.buckets_for(kmax)
    k0 = jnp.asarray(k0, jnp.int32)
    treedefU = jax.tree_util.tree_structure(U)
    treedefV = jax.tree_util.tree_structure(V)

    def leaf_of(t):
        return jax.tree_util.tree_leaves(t)[0]

    Ul, Vl = leaf_of(U), leaf_of(V)
    T = pf.choose_tile(Ul.shape[1], h=h)
    Ubc = pf.boundary_cache(Ul, T, h)
    Vbc = pf.boundary_cache(Vl, T, h)

    # prime: y_d = Aᴴ u_{k0} (stored row k0 is normalized: fresh init or
    # post-restart)
    y_d = leaf_of(op.apply_adjoint(bs.get(U, k0)))
    ybc_d = pf.boundary_cache(y_d, T, h)

    def kernel_call(Xl, y, Xbc, ybc, gfull, kp1, Bsz_idx, spec):
        def make_branch(Bsz):
            def br(Xl, y, Xbc, ybc, gfull):
                Xn, yn, raw, xb, ynb = pf.fused_step(
                    Xl, y, Xbc, ybc, gfull, jnp.asarray(kp1, jnp.int32),
                    Bsz, spec, interpret=_kf.fused_interpret,
                    with_drift=True,
                )
                dn = jnp.pad(raw[Bsz : 2 * Bsz], (0, kmax - Bsz))
                return Xn, yn, dn, raw[2 * Bsz + 1], xb, ynb

            return br

        return jax.lax.switch(
            Bsz_idx, [make_branch(Bz) for Bz in buckets], Xl, y, Xbc, ybc,
            gfull,
        )

    def body(c):
        (Ul, Vl, Ubc, Vbc, y_d, ybc_d, scU, scV, B, k) = c
        # ---- domain half-step: append V-row k, y_c = A·(V-row k) ----
        LU = scU.L
        lamU = jax.lax.dynamic_index_in_dim(
            jnp.diagonal(LU), k, 0, keepdims=False
        )
        LUk = jax.lax.dynamic_slice(
            LU, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (kmax, 1)
        )[:, 0]
        p = jnp.conj(
            jax.lax.dynamic_slice(
                B, (jnp.asarray(k, jnp.int32), jnp.int32(0)), (1, kmax)
            )[0]
        ).astype(jnp.float32)
        p = jnp.where(idx < k, p, 0.0)
        cD = jnp.matmul(scV.L, p, precision=_HI) - jnp.matmul(
            scU.Hs, jnp.where(idx < k, LUk, 0.0), precision=_HI
        )
        cD = jnp.where(idx < k, cD, 0.0)
        gD = jnp.concatenate([cD, lamU[None]])
        iBd = bs.bucket_index(k, buckets)
        Vl, y_c, dV, qV, vb, ycb = kernel_call(
            Vl, y_d, Vbc, ybc_d, gD, k, iBd, spec_n
        )
        Vbc = jax.lax.dynamic_update_slice(
            Vbc, pf.cache_from_tile_rows(vb)[None],
            (jnp.asarray(k, jnp.int32), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )
        ybc_c = pf.cache_from_tile_rows(ycb)
        alpha = jnp.sqrt(qV)
        scV, lamV = _correct_col(scV, dV, qV, k)
        # stored-row image: Aᴴ U_{row k} = (V_row k + Σ cD V)/λ_U
        hsU = jnp.where(
            idx <= k,
            (jax.nn.one_hot(k, kmax, dtype=jnp.float32) + cD) / lamU, 0.0,
        )
        scU = scU._replace(Hs=_set_col(scU.Hs, hsU, k))

        # ---- codomain half-step: append U-row k+1, y_d' = Aᴴ·(U-row k+1) --
        LVk = jax.lax.dynamic_slice(
            scV.L, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (kmax, 1)
        )[:, 0]
        cC = alpha * LUk - jnp.matmul(
            scV.Hs, jnp.where(idx < k, LVk, 0.0), precision=_HI
        )
        cC = jnp.where(idx <= k, cC, 0.0)
        gC = jnp.concatenate([cC, lamV[None]])
        iBc = bs.bucket_index(k + 1, buckets)
        Ul, y_d, dU, qU, ub, ydb = kernel_call(
            Ul, y_c, Ubc, ybc_c, gC, k + 1, iBc, spec_a
        )
        Ubc = jax.lax.dynamic_update_slice(
            Ubc, pf.cache_from_tile_rows(ub)[None],
            (jnp.asarray(k + 1, jnp.int32), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )
        ybc_d = pf.cache_from_tile_rows(ydb)
        beta = jnp.sqrt(qU)
        scU, _ = _correct_col(scU, dU, qU, k + 1)
        hsV = jnp.where(
            idx <= k + 1,
            (jax.nn.one_hot(k + 1, kmax, dtype=jnp.float32) + cC) / lamV, 0.0,
        )
        scV = scV._replace(Hs=_set_col(scV.Hs, hsV, k))

        # ---- B: α at [k, k], β at [k+1, k] (exact rows preserved) ----
        ek = jax.nn.one_hot(k, kmax, dtype=B.dtype)
        ek1 = jax.nn.one_hot(k + 1, kmax, dtype=B.dtype)
        mask2 = (ek + ek1)[:, None] * ek[None, :]
        B = B * (1 - mask2) + (
            alpha.astype(B.dtype) * ek[:, None]
            + beta.astype(B.dtype) * ek1[:, None]
        ) * ek[None, :]
        return (Ul, Vl, Ubc, Vbc, y_d, ybc_d, scU, scV, B, k + 1)

    def cond(c):
        k = c[9]
        ohk = jax.nn.one_hot(k, kmax, dtype=jnp.float32)
        # residual norm of the CURRENT factorization = ‖U-row k‖ = 1/s_U[k]
        bcur = _kf._safe_inv(jnp.sum(c[6].s * ohk))
        return jnp.logical_and(k < m - 1, bcur > btol)

    (Ul, Vl, Ubc, Vbc, y_d, ybc_d, scU, scV, B, k) = jax.lax.while_loop(
        cond, body,
        (Ul, Vl, Ubc, Vbc, y_d, ybc_d, scU, scV, B, k0),
    )

    # ---- tail step (k = m-1): both half-steps in XLA, masked; the domain
    # apply A·v is legitimate (1 op), the adjoint apply is skipped ----
    ohk = jax.nn.one_hot(k, kmax, dtype=jnp.float32)
    bcur = _kf._safe_inv(jnp.sum(scU.s * ohk))
    go = jnp.logical_and(k == m - 1, bcur > btol)
    LUk = jax.lax.dynamic_slice(
        scU.L, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (kmax, 1)
    )[:, 0]
    lamU = jax.lax.dynamic_index_in_dim(
        jnp.diagonal(scU.L), k, 0, keepdims=False
    )
    p = jnp.conj(
        jax.lax.dynamic_slice(
            B, (jnp.asarray(k, jnp.int32), jnp.int32(0)), (1, kmax)
        )[0]
    ).astype(jnp.float32)
    p = jnp.where(idx < k, p, 0.0)
    cD = jnp.matmul(scV.L, p, precision=_HI) - jnp.matmul(
        scU.Hs, jnp.where(idx < k, LUk, 0.0), precision=_HI
    )
    cD = jnp.where(idx < k, cD, 0.0)
    Vtree = jax.tree_util.tree_unflatten(treedefV, [Vl])
    Wl = lamU * y_d - leaf_of(bs.unproject_bucketed(Vtree, cD, k))
    qV = jnp.sum(Wl * Wl)
    alpha = jnp.sqrt(qV)
    old_v = jax.lax.dynamic_index_in_dim(Vl, k, 0, keepdims=False)
    Vl = jax.lax.dynamic_update_index_in_dim(
        Vl, jnp.where(go, Wl, old_v), k, 0
    )
    scV2, lamV = _correct_col(
        scV, jnp.zeros((kmax,), jnp.float32), qV, k
    )
    y_c = leaf_of(op.normal(jax.tree_util.tree_unflatten(treedefV, [Wl])))
    LVk = jax.lax.dynamic_slice(
        scV2.L, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (kmax, 1)
    )[:, 0]
    cC = alpha * LUk - jnp.matmul(
        scV2.Hs, jnp.where(idx < k, LVk, 0.0), precision=_HI
    )
    cC = jnp.where(idx <= k, cC, 0.0)
    Utree = jax.tree_util.tree_unflatten(treedefU, [Ul])
    Sl = lamV * y_c - leaf_of(bs.unproject_bucketed(Utree, cC, k + 1))
    qU = jnp.sum(Sl * Sl)
    beta_m = jnp.sqrt(qU)
    old_u = jax.lax.dynamic_index_in_dim(Ul, k + 1, 0, keepdims=False)
    Ul = jax.lax.dynamic_update_index_in_dim(
        Ul, jnp.where(go, Sl, old_u), k + 1, 0
    )
    # gated bookkeeping: uncorrected placeholder columns for the tail rows
    ohk1 = jax.nn.one_hot(k + 1, kmax, dtype=jnp.float32)
    sU2 = jnp.where(idx == k + 1, _kf._safe_inv(beta_m), scU.s)
    LU2 = _set_col(scU.L, _kf._safe_inv(beta_m) * ohk1, k + 1)
    scU2 = scU._replace(L=LU2, s=sU2)
    ekB = jax.nn.one_hot(k, kmax, dtype=B.dtype)
    ek1B = jax.nn.one_hot(k + 1, kmax, dtype=B.dtype)
    mask2 = (ekB + ek1B)[:, None] * ekB[None, :]
    Bt = B * (1 - mask2) + (
        alpha.astype(B.dtype) * ekB[:, None]
        + beta_m.astype(B.dtype) * ek1B[:, None]
    ) * ekB[None, :]
    B = jnp.where(go, Bt, B)
    scU = jax.tree_util.tree_map(lambda a, b: jnp.where(go, a, b), scU2, scU)
    scV = jax.tree_util.tree_map(lambda a, b: jnp.where(go, a, b), scV2, scV)
    k_out = k + go.astype(jnp.int32)
    beta_out = jnp.where(go, beta_m, bcur).astype(beta0.dtype)

    numops_inc = 2 * (k_out - jnp.asarray(state.k, jnp.int32))
    state_new = GKLState(
        jax.tree_util.tree_unflatten(treedefU, [Ul]),
        jax.tree_util.tree_unflatten(treedefV, [Vl]),
        B, k_out, beta_out,
    )
    return state_new, scU, scV, numops_inc
