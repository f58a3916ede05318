"""General (non-Hermitian) eigsolve / schursolve driver: Krylov-Schur Arnoldi.

Mirrors the reference's ``_schursolve`` core (``src/eigsolve/arnoldi.jl:351-452``)
with the TPU-native restart: instead of restoring Arnoldi form with Householder
sweeps over the basis (``src/eigsolve/arnoldi.jl:468-481``), the factorization is
kept in Krylov-Schur form (sorted triangular block + spike row); the next
processing round re-reduces the small projected matrix on device
(``dense.schur_active`` does Hessenberg reduction internally).

Two arithmetic modes, chosen by the problem's scalar type:

* **real** (new in round 1b): real inputs keep the *basis* real — half the HBM
  traffic of promotion — and the projected problem uses the REAL Schur form
  with standardized 2×2 blocks (``dense.real_schur_active`` /
  ``sort_schur_real`` / ``triangular_eigvecs_real``), exactly like the
  reference's ``dhseqr``/``dtrevc`` path.  Convergence counting and the
  Krylov-Schur ``keep`` never split a 2×2 block (reference
  ``src/eigsolve/arnoldi.jl:404-406, 463``).  This is also the only
  non-Hermitian path on TPU runtimes without complex support.
* **complex**: complex inputs use the complex Schur form (no 2×2 blocks).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import dense
from ..algorithms import Arnoldi
from ..factorizations import krylov as kf
from ..info import ConvergenceInfo, EACHITERATION, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator, probe_dtype
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any

__all__ = ["eigsolve_arnoldi", "schursolve", "realeigsolve_arnoldi"]


class _LoopState(NamedTuple):
    fact: kf.KrylovState
    numiter: jax.Array
    numops: jax.Array
    nconv: jax.Array
    T: jax.Array  # (m+1, m+1) sorted Schur factor of the active block
    Q: jax.Array  # (m+1, m+1) sorted Schur basis (block-diagonal)
    resnorms: jax.Array  # (m+1,) sorted Schur residual norms
    done: jax.Array
    sc: kf.FusedScales  # basis bookkeeping (identity unless fused expansion)


def _process(H, k, beta, which, tol):
    """Schur + sort + convergence count on Schur residuals
    (reference src/eigsolve/arnoldi.jl:395-414)."""
    m1 = H.shape[0]
    T, Q, ok = dense.schur_active(H, k)
    vals = jnp.diagonal(T)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    valid = idx < k
    key = dense.which_key(vals, which)
    key = jnp.where(valid, key, jnp.inf)
    T, Q, key = dense.sort_schur(T, Q, key)
    lastrow = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(k - 1, 0), 0, keepdims=False)
    res = jnp.abs(beta * lastrow)
    res = jnp.where(valid, res, jnp.inf)
    flags = res <= tol
    nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32)))
    return nconv.astype(jnp.int32), T, Q, res


def _restart(fact: kf.KrylovState, T, Q, beta, keep, keep_max: int, gate=None,
             scales=None):
    """Krylov-Schur truncation: keep the leading sorted Schur vectors.

    With ``gate`` the restart is MASKED instead of wrapped in ``lax.cond``
    (identity rotation when gated off — bit-exact), keeping the big basis out
    of cond branch outputs; ``keep_max`` is the static bound on ``keep`` so
    only the surviving rows are written (see ``bs.transform_partial``).
    Mirrors ``lanczos._restart``."""
    V, H, k, _ = fact
    m1 = H.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    Qkeep = jnp.where((cols < keep) & (rows < k), Q, 0)
    Qkeep = Qkeep + jax.nn.one_hot(k, m1, dtype=Q.dtype)[:, None] * jax.nn.one_hot(
        keep, m1, dtype=Q.dtype
    )[None, :]
    if scales is not None:
        # fused-expansion mode: stored rows are unnormalized with true basis
        # v_j = Σ_i L[i,j]·row_i — rotate with L·Q; applied before the
        # identity gate so a gated-off restart preserves the raw rows
        # bit-exactly (lanczos.py)
        Qkeep = jnp.matmul(
            scales.astype(Q.dtype), Qkeep,
            precision=jax.lax.Precision.HIGHEST,
        )
    if gate is not None:
        Qkeep = jnp.where(gate, Qkeep, jnp.eye(m1, dtype=Q.dtype))
    Vnew = bs.transform_partial(V, Qkeep, keep_max + 1)
    # H ← [kept triangular block; spike row s = β·Q[k-1, :keep]]
    lastrow = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(k - 1, 0), 0, keepdims=False)
    s = (beta * lastrow).astype(H.dtype)
    keepblk = (rows < keep) & (cols < keep)
    Hnew = jnp.where(keepblk, T.astype(H.dtype), 0)
    didx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    spike = jnp.where(didx < keep, s, 0)
    Hnew = Hnew + jax.nn.one_hot(keep, m1, dtype=H.dtype)[:, None] * spike[None, :]
    k_new = keep.astype(jnp.int32)
    if gate is not None:
        Hnew = jnp.where(gate, Hnew, H)
        k_new = jnp.where(gate, k_new, jnp.asarray(k, jnp.int32))
    return kf.KrylovState(Vnew, Hnew, k_new, beta)


def _process_real(H, k, beta, which, tol):
    """Real-Schur analogue of :func:`_process`: quasi-triangular sort +
    convergence count that never splits a 2×2 block."""
    m1 = H.shape[0]
    T, Q, ok = dense.real_schur_active(H, k)
    T, Q = dense.sort_schur_real(T, Q, which, k)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    valid = idx < k
    lastrow = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(k - 1, 0), 0, keepdims=False)
    res = jnp.abs(beta * lastrow)
    res = jnp.where(valid, res, jnp.inf)
    flags = res <= tol
    nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32))).astype(jnp.int32)
    # 2×2 guard: if position nconv is the second member of a block, the count
    # would split it — drop the whole block from the converged set
    starts = dense.block_starts(T, k)
    second = jnp.concatenate([jnp.zeros((1,), bool), starts[:-1]])
    splits = jax.lax.dynamic_index_in_dim(
        second, jnp.clip(nconv, 0, m1 - 1), 0, keepdims=False
    ) & (nconv > 0) & (nconv < k)
    nconv = nconv - splits.astype(jnp.int32)
    return nconv, T, Q, res


def _block_safe_keep(T, k, keep, m1):
    """Adjust ``keep`` so the Krylov-Schur truncation does not split a 2×2
    block (reference src/eigsolve/arnoldi.jl:463): prefer keeping the whole
    block, fall back to dropping it at the buffer edge."""
    starts = dense.block_starts(T, k)
    split = jax.lax.dynamic_index_in_dim(
        starts, jnp.clip(keep - 1, 0, m1 - 1), 0, keepdims=False
    ) & (keep > 0) & (keep < k)
    grown = keep + split.astype(jnp.int32)
    fits = grown <= jnp.maximum(k - 1, 1)
    return jnp.where(fits, grown, keep - split.astype(jnp.int32))


def _arnoldi_loop(op, x0, howmany, which, alg: Arnoldi, space, cdt, real=False):
    m = alg.krylovdim
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

    process = _process_real if real else _process
    fact0 = kf.initialize(
        x0, m, cdt, space, vec_dtype=None if real else cdt,
        verbosity=alg.verbosity,
    )
    st0 = _LoopState(
        fact=fact0,
        numiter=jnp.int32(0),
        numops=jnp.int32(0),
        nconv=jnp.int32(0),
        T=jnp.zeros((m + 1, m + 1), cdt),
        Q=jnp.eye(m + 1, dtype=cdt),
        resnorms=jnp.full((m + 1,), jnp.inf, rdt),
        done=jnp.asarray(False),
        sc=kf.fused_scales_init(m + 1),
    )
    from ..ops import orthonormal as on

    # one-stream fused expansion (ops/pallas_fused_lanczos.py), Arnoldi mode:
    # full-Hessenberg column writes; real f32 stencil operators.  Plain cgs
    # runs the single-sweep stream; the DEFAULT cgs2 runs the one-reduce DGKS
    # mode (deferred second sweep in scalar space, same B+3 row-passes)
    dgks = type(alg.orth) is on.ClassicalGramSchmidt2 and 2 * (m + 1) + 2 <= 128
    fused = (
        real
        and not alg.eager
        and (type(alg.orth) is on.ClassicalGramSchmidt or dgks)
        and cdt == jnp.float32
        and kf.fused_available(op, x0, space, kmax=m + 1)
    )

    def expand_one(c):
        fact, numops, j = c
        fact = kf.expand(op.normal, fact, alg.orth, space, alg.verbosity)
        return fact, numops + 1, j + 1

    def outer_body(st: _LoopState) -> _LoopState:
        fact, numops = st.fact, st.numops

        # single while_loop (do-while: ≥1 expansion if possible) — no leading
        # lax.cond, whose branch outputs would defensively copy the basis
        # buffer every outer iteration (see lanczos.py)
        def inner_cond(c):
            fact, numops, j = c
            go = jnp.logical_and(fact.k < m, fact.beta > btol)
            if alg.eager:
                go = jnp.logical_and(
                    go, jnp.logical_or(j == 0, fact.k < max(howmany, 1))
                )
            return go

        if fused:
            fact, sc, dops = kf.fused_expansions(
                op, fact, st.sc, m, btol, space, verbosity=alg.verbosity,
                hermitian=False, dgks=dgks,
            )
            numops = numops + dops
        else:
            sc = st.sc
            fact, numops, _ = jax.lax.while_loop(
                inner_cond, expand_one, (fact, numops, jnp.int32(0))
            )

        nconv, T, Q, res = process(fact.H, fact.k, fact.beta, which, tol)
        full = fact.k >= m
        numiter = st.numiter + full.astype(jnp.int32)
        # ¬(β > btol): NaN β must count as breakdown (see lanczos.py)
        stalled = jnp.logical_and(
            jnp.logical_not(fact.beta > btol), fact.k < m
        )
        done = jnp.logical_or(
            nconv >= howmany,
            jnp.logical_or(full & (numiter >= alg.maxiter), stalled),
        )
        keep_raw = (3 * m + 2 * nconv) // 5
        keep = jnp.clip(keep_raw, 1, jnp.maximum(fact.k - 1, 1))
        if real:
            keep = _block_safe_keep(T, fact.k, keep, m + 1)
        # static bound: restart implies nconv < howmany and k == m; the
        # block-safe adjustment can grow keep by one
        keep_max = min((3 * m + 2 * max(howmany - 1, 0)) // 5 + 1, m - 1)
        restart_now = jnp.logical_and(jnp.logical_not(done), fact.k >= m)
        if alg.eager:
            # eager processes every step — a masked always-run transform would
            # add a basis pass per expansion, so keep the cond here
            fact = jax.lax.cond(
                restart_now,
                lambda a: _restart(a[0], a[1], a[2], a[0].beta, keep, keep_max),
                lambda a: a[0],
                (fact, T, Q),
            )
        else:
            # non-eager: every processing but the last restarts — run the
            # masked (gated) restart unconditionally, avoiding cond copies
            fact = _restart(
                fact, T, Q, fact.beta, keep, keep_max, gate=restart_now,
                scales=sc.L if fused else None,
            )
        # restart renormalizes surviving rows; the Krylov-Schur H (triangular
        # block + spike) seeds the stored-row Hessenberg of the dgks mode
        sc_fresh = kf.fused_scales_init(m + 1, H=fact.H if fused else None)
        sc = jax.tree_util.tree_map(
            lambda a, b: jnp.where(restart_now, a, b), sc_fresh, sc
        )
        log_if(
            alg.verbosity, EACHITERATION,
            "Arnoldi schursolve in iteration {it}: {nc} values converged, "
            "normres = {nr}",
            it=numiter, nc=nconv, nr=res[: min(8, m)],
        )
        return _LoopState(fact, numiter, numops, nconv, T, Q, res, done,
                          sc)

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    return st


def schursolve(
    op: LinearOperator,
    x0: PyTree,
    howmany: int,
    which,
    alg: Arnoldi,
    space: VectorSpace = STANDARD,
):
    """Partial Schur decomposition (reference ``schursolve``,
    ``src/eigsolve/arnoldi.jl:1-150``): returns ``(T, vecs, vals, info)`` where
    ``vecs`` are the leading ``howmany`` Schur vectors and ``T`` the
    ``(howmany, howmany)`` triangular factor.

    Real inputs run the REAL Schur path (real basis + quasi-triangular ``T``
    with standardized 2×2 blocks, like the reference's LAPACK ``dhseqr``);
    ``vals`` is then ``(re, im)`` as a pair of real arrays (no complex arrays
    materialized — TPU-runtimes without complex support stay happy; combine
    with ``re + 1j*im`` if you want complex).  A 2×2 block straddling the
    ``howmany`` boundary is truncated (static shapes); pick ``howmany`` that
    does not split a wanted conjugate pair."""
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    pdt = probe_dtype(op, x0)
    real = not jnp.issubdtype(pdt, jnp.complexfloating)
    cdt = pdt if real else jnp.result_type(pdt, jnp.complex64)
    st = _arnoldi_loop(op, x0, howmany, which, alg, space, cdt, real=real)
    fact = st.fact
    m1 = m + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    Qmask = jnp.where((rows < fact.k) & (cols < howmany), st.Q, 0)
    Qmask = kf.fold_scales(st.sc, Qmask)  # fused row bookkeeping
    Vs = bs.transform(fact.V, Qmask)
    vecs = jax.tree_util.tree_map(lambda l: l[:howmany], Vs)
    Tsmall = st.T[:howmany, :howmany]
    if real:
        re, im = dense.real_schur_eigvals(st.T, fact.k)
        vals = (re[:howmany], im[:howmany])
    else:
        vals = jnp.diagonal(st.T)[:howmany]
    lastrow = jax.lax.dynamic_index_in_dim(
        st.Q, jnp.maximum(fact.k - 1, 0), 0, keepdims=False
    )
    s = fact.beta * lastrow
    Lk = jax.lax.dynamic_slice(
        st.sc.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)), (m1, 1)
    )[:, 0]
    vk = bs.unproject_bucketed(fact.V, Lk.astype(cdt), fact.k + 1)
    residuals = jax.tree_util.tree_map(
        lambda l: s[:howmany].reshape((howmany,) + (1,) * l.ndim) * l[None], vk
    )
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=st.resnorms[:howmany],
        numiter=jnp.maximum(st.numiter, jnp.int32(1)),
        numops=st.numops,
    )
    return Tsmall, vecs, vals, info


def eigsolve_arnoldi(
    op: LinearOperator,
    x0: PyTree,
    howmany: int,
    which,
    alg: Arnoldi,
    space: VectorSpace = STANDARD,
):
    """General eigsolve via Krylov-Schur: returns ``(vals, vecs, info)``;
    eigenvectors extracted from the sorted Schur form with ``trevc``-style
    back-substitution (reference ``src/eigsolve/arnoldi.jl:151-170``).

    Real inputs run the real-arithmetic loop (real basis — half the HBM
    traffic); complex eigenvalues/eigenvectors are materialized only in this
    final extraction, mirroring the reference's real ``dtrevc`` + pair
    combination (``src/dense/linalg.jl:223-246``)."""
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    pdt = probe_dtype(op, x0)
    real = not jnp.issubdtype(pdt, jnp.complexfloating)
    cdt = jnp.result_type(pdt, jnp.complex64)
    st = _arnoldi_loop(
        op, x0, howmany, which, alg, space, pdt if real else cdt, real=real
    )
    fact = st.fact
    m1 = m + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    if real:
        Xre, Xim = dense.triangular_eigvecs_real(st.T, fact.k)
        re, im = dense.real_schur_eigvals(st.T, fact.k)
        vals = (re + 1j * im).astype(cdt)[:howmany]
        QXre, QXim = st.Q @ Xre, st.Q @ Xim
        mask = (rows < fact.k) & (cols < howmany)
        Vre = bs.transform(fact.V, kf.fold_scales(st.sc, jnp.where(mask, QXre, 0)))
        Vim = bs.transform(fact.V, kf.fold_scales(st.sc, jnp.where(mask, QXim, 0)))
        vecs = jax.tree_util.tree_map(
            lambda lr, li: (lr[:howmany] + 1j * li[:howmany]).astype(cdt),
            Vre,
            Vim,
        )
        QX = (QXre + 1j * QXim).astype(cdt)
    else:
        X = dense.triangular_eigvecs(st.T, fact.k)  # eigvecs of T in Schur basis
        QX = st.Q @ X
        QXmask = jnp.where((rows < fact.k) & (cols < howmany), QX, 0)
        QXmask = kf.fold_scales(st.sc, QXmask)
        Ve = bs.transform(fact.V, QXmask)
        vecs = jax.tree_util.tree_map(lambda l: l[:howmany], Ve)
        vals = jnp.diagonal(st.T)[:howmany]
    # eigenvector residuals: A x_i − λ_i x_i = β·(QX)[k-1, i]·v_k
    lastrow = jax.lax.dynamic_index_in_dim(
        QX, jnp.maximum(fact.k - 1, 0), 0, keepdims=False
    )
    s = fact.beta * lastrow
    Lk = jax.lax.dynamic_slice(
        st.sc.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)), (m1, 1)
    )[:, 0]
    vk = bs.unproject_bucketed(fact.V, Lk.astype(fact.H.dtype), fact.k + 1)
    vk = jax.tree_util.tree_map(lambda l: l.astype(cdt), vk)
    residuals = jax.tree_util.tree_map(
        lambda l: s[:howmany].reshape((howmany,) + (1,) * l.ndim) * l[None], vk
    )
    normres = jnp.abs(s)[:howmany]
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=normres,
        numiter=jnp.maximum(st.numiter, jnp.int32(1)),
        numops=st.numops,
    )
    return vals, vecs, info


def realeigsolve_arnoldi(
    op: LinearOperator,
    x0: PyTree,
    howmany: int,
    which,
    alg: Arnoldi,
    space: VectorSpace = STANDARD,
):
    """Eigsolve for real linear maps asserting real eigenvalues — the
    reference's ``realeigsolve`` (``src/eigsolve/arnoldi.jl:293-349``) in
    fully REAL arithmetic: real basis, real Schur form, real eigenvectors;
    no complex arrays anywhere (safe on complex-less TPU runtimes).

    Returns ``(vals, vecs, info, maximag)``: ``maximag`` is the largest
    |Im λ| among the ``howmany`` selected eigenvalues — nonzero means a
    complex conjugate pair entered the wanted window (the reference throws;
    under jit the caller checks/raises on host where possible).
    """
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    pdt = probe_dtype(op, x0)
    if jnp.issubdtype(pdt, jnp.complexfloating):
        raise ValueError(
            "realeigsolve requires a real linear map and vector; got "
            f"scalar type {pdt} (reference src/eigsolve/arnoldi.jl:293-300)"
        )
    st = _arnoldi_loop(op, x0, howmany, which, alg, space, pdt, real=True)
    fact = st.fact
    m1 = m + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    re, im = dense.real_schur_eigvals(st.T, fact.k)
    maximag = jnp.max(jnp.abs(im[:howmany]))
    warn_if(
        alg.verbosity,
        maximag > 0,
        "realeigsolve: a complex conjugate pair entered the wanted window "
        "(max |imag| = {mi}); results are invalid — use eigsolve",
        mi=maximag,
    )
    # real eigenvectors from the quasi-triangular form (imag parts are zero
    # for genuinely real eigenvalues)
    Xre, _ = dense.triangular_eigvecs_real(st.T, fact.k)
    QX = st.Q @ Xre
    mask = (rows < fact.k) & (cols < howmany)
    Ve = bs.transform(fact.V, kf.fold_scales(st.sc, jnp.where(mask, QX, 0)))
    vecs = jax.tree_util.tree_map(lambda l: l[:howmany], Ve)
    vals = re[:howmany]
    lastrow = jax.lax.dynamic_index_in_dim(
        QX, jnp.maximum(fact.k - 1, 0), 0, keepdims=False
    )
    s = fact.beta * lastrow
    Lk = jax.lax.dynamic_slice(
        st.sc.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)), (m1, 1)
    )[:, 0]
    vk = bs.unproject_bucketed(fact.V, Lk.astype(pdt), fact.k + 1)
    residuals = jax.tree_util.tree_map(
        lambda l: s[:howmany].reshape((howmany,) + (1,) * l.ndim) * l[None], vk
    )
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=jnp.abs(s)[:howmany],
        numiter=jnp.maximum(st.numiter, jnp.int32(1)),
        numops=st.numops,
    )
    return vals, vecs, info, maximag
