"""Two-sided eigensolver: BiArnoldi with dual Krylov-Schur restart, fully jitted.

Mirrors the reference ``bieigsolve``/``_bischursolve``
(``src/eigsolve/biarnoldi.jl``): a pair of Arnoldi factorizations for ``A``
(right) and ``Aᴴ`` (left) expanded in lock-step, with

* the oblique-projection correction of the Rayleigh quotients and residuals
  through ``M = WᴴV`` (LU solve on device, reference ``:282-302``);
* dual Schur decompositions, the left side sorted by ``conj ∘ which``
  (``:305-315``);
* convergence on the max of the two Schur residuals (``:326-340``);
* dual thick restart with the ``M ← ZᴴMQ`` update (``:361-445``) — here in
  Krylov-Schur (triangular + spike row) form instead of restoring Hessenberg
  with Householder sweeps;
* left eigenvectors from right ones through the ``ZᴴMQ`` relation (``:156-170``),
  which makes the returned pairs automatically biorthogonal.

Like the one-sided Arnoldi driver, REAL inputs keep both bases and both
projected problems in real arithmetic (REAL Schur forms with 2×2 blocks,
block-integrity-safe convergence counting and restart size; the left side's
``conj ∘ which`` ordering coincides with ``which`` for string sort targets
since real spectra are conjugate-symmetric).  Complex eigenvalues and
eigenvectors are materialized only in the final extraction.  Complex inputs
use complex Schur forms (no 2×2 bookkeeping).
Returns ``(values, (vecsV, vecsW), (infoV, infoW))``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dense
from ..algorithms import BiArnoldi, KrylovDefaults
from ..dense.masking import embed_active
from ..factorizations import krylov as kf
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import as_operator, probe_dtype
from ..ops.vector import STANDARD, VectorSpace, add, scale

PyTree = Any

__all__ = ["bieigsolve"]


class _LoopState(NamedTuple):
    fV: kf.KrylovState
    fW: kf.KrylovState
    M: jax.Array  # (m+1, m+1) oblique Gram WᴴV
    S: jax.Array  # sorted Schur factor (right)
    T: jax.Array  # sorted Schur factor (left)
    Q: jax.Array
    Z: jax.Array
    h: jax.Array  # corrected right coupling row (m+1,)
    kv: jax.Array  # corrected left coupling row (m+1,)
    rV: PyTree  # corrected right residual (unnormalized)
    rW: PyTree
    brV: jax.Array  # ‖rV‖
    brW: jax.Array
    nconv: jax.Array
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def _update_M(M, V, W, j, space):
    """Fill row/column ``j`` of ``M = WᴴV`` for the newly added basis vectors."""
    vj = bs.get(V, j)
    wj = bs.get(W, j)
    colj = bs.project(W, vj, j + 1, space)  # ⟨W_i, v_j⟩, i ≤ j
    rowj = jnp.conj(bs.project(V, wj, j + 1, space))  # ⟨w_j, v_i⟩, i ≤ j
    ji = jnp.asarray(j, jnp.int32)
    M = jax.lax.dynamic_update_slice(M, colj[:, None].astype(M.dtype), (jnp.int32(0), ji))
    M = jax.lax.dynamic_update_slice(M, rowj[None, :].astype(M.dtype), (ji, jnp.int32(0)))
    return M


def bieigsolve_driver(
    op,
    v0: PyTree,
    w0: PyTree,
    howmany: int,
    which,
    alg: BiArnoldi,
    space: VectorSpace = STANDARD,
):
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    pdt = probe_dtype(op, v0)
    real = not jnp.issubdtype(pdt, jnp.complexfloating) and isinstance(which, str)
    cdt = pdt if real else jnp.result_type(pdt, jnp.complex64)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)
    m1 = m + 1

    fV0 = kf.initialize(v0, m, cdt, space, vec_dtype=None if real else cdt)
    fW0 = kf.initialize(w0, m, cdt, space, vec_dtype=None if real else cdt)
    M0 = jnp.zeros((m1, m1), cdt)
    M0 = M0.at[0, 0].set(space.inner(bs.get(fV0.V, 0), bs.get(fW0.V, 0)).conj())

    zvec = jax.tree_util.tree_map(jnp.zeros_like, v0)
    zvec = jax.tree_util.tree_map(lambda l: l.astype(cdt), zvec)
    st0 = _LoopState(
        fV=fV0, fW=fW0, M=M0,
        S=jnp.zeros((m1, m1), cdt), T=jnp.zeros((m1, m1), cdt),
        Q=jnp.eye(m1, dtype=cdt), Z=jnp.eye(m1, dtype=cdt),
        h=jnp.zeros((m1,), cdt), kv=jnp.zeros((m1,), cdt),
        rV=zvec, rW=zvec,
        brV=jnp.ones((), rdt), brW=jnp.ones((), rdt),
        nconv=jnp.int32(0), numiter=jnp.int32(0), numops=jnp.int32(0),
        done=jnp.asarray(False),
    )

    def expand_one(c):
        fV, fW, M, numops = c
        fV = kf.expand(op.normal, fV, alg.orth, space, alg.verbosity)
        fW = kf.expand(op.apply_adjoint, fW, alg.orth, space, alg.verbosity)
        M = _update_M(M, fV.V, fW.V, fV.k, space)
        return fV, fW, M, numops + 2

    def outer_body(st: _LoopState) -> _LoopState:
        fV, fW, M, numops = st.fV, st.fW, st.M, st.numops

        def inner_cond(c):
            fV, fW, M, numops = c
            go = (fV.k < m) & (fV.beta > btol) & (fW.beta > btol)
            if alg.eager:
                go = jnp.logical_and(go, fV.k < max(howmany, 1))
            return go

        can = (fV.k < m) & (fV.beta > btol) & (fW.beta > btol)
        fV, fW, M, numops = jax.lax.cond(
            can, expand_one, lambda c: c, (fV, fW, M, numops)
        )
        fV, fW, M, numops = jax.lax.while_loop(
            inner_cond, expand_one, (fV, fW, M, numops)
        )

        L = fV.k
        Li = jnp.asarray(L, jnp.int32)
        bv = fV.beta.astype(cdt)
        bw = fW.beta.astype(cdt)
        rV0 = bs.get(fV.V, L)  # normalized residual directions
        rW0 = bs.get(fW.V, L)

        # oblique correction through M = WᴴV (reference :282-302)
        Whv = bs.project(fW.V, rV0, L, space)
        Vhw = bs.project(fV.V, rW0, L, space)
        Meff = embed_active(M, L, 1.0)
        x = jnp.linalg.solve(Meff, Whv.astype(cdt))  # M⁻¹ Wᴴv
        y = jnp.linalg.solve(Meff.conj().T, Vhw.astype(cdt))  # M⁻ᴴ Vᴴw
        eL = jax.nn.one_hot(jnp.maximum(Li - 1, 0), m1, dtype=cdt)
        Ht = fV.H + bv * x[:, None] * eL[None, :]
        Kt = fW.H + bw * y[:, None] * eL[None, :]
        rV = add(rV0, bs.unproject(fV.V, x), a=-1)
        rW = add(rW0, bs.unproject(fW.V, y), a=-1)
        brV = space.norm(rV)
        brW = space.norm(rW)

        # dual Schur + sort (left side by conj ∘ which; for real string
        # targets conj∘which == which since the spectrum is conj-symmetric)
        idx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
        valid = idx < L
        if real:
            S, Q, _ = dense.real_schur_active(Ht, L)
            T, Z, _ = dense.real_schur_active(Kt, L)
            S, Q = dense.sort_schur_real(S, Q, which, L)
            T, Z = dense.sort_schur_real(T, Z, which, L)
        else:
            S, Q, _ = dense.schur_active(Ht, L)
            T, Z, _ = dense.schur_active(Kt, L)
            keyS = jnp.where(
                valid, dense.which_key(jnp.diagonal(S), which), jnp.inf
            )
            keyT = jnp.where(
                valid, dense.which_key(jnp.conj(jnp.diagonal(T)), which), jnp.inf
            )
            S, Q, _ = dense.sort_schur(S, Q, keyS)
            T, Z, _ = dense.sort_schur(T, Z, keyT)

        lastQ = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(Li - 1, 0), 0, keepdims=False)
        lastZ = jax.lax.dynamic_index_in_dim(Z, jnp.maximum(Li - 1, 0), 0, keepdims=False)
        h = jnp.conj(lastQ) * bv
        kvv = jnp.conj(lastZ) * bw

        res = jnp.maximum(brV * jnp.abs(h), brW * jnp.abs(kvv))
        res = jnp.where(valid, res, jnp.inf)
        flags = res <= tol
        nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32))).astype(jnp.int32)
        if real:
            # never count or keep half a 2×2 block (either side)
            startsS = dense.block_starts(S, L)
            startsT = dense.block_starts(T, L)
            secS = jnp.concatenate([jnp.zeros((1,), bool), startsS[:-1]])
            secT = jnp.concatenate([jnp.zeros((1,), bool), startsT[:-1]])
            splits = (
                jax.lax.dynamic_index_in_dim(
                    secS | secT, jnp.clip(nconv, 0, m1 - 1), 0, keepdims=False
                )
                & (nconv > 0)
                & (nconv < L)
            )
            nconv = nconv - splits.astype(jnp.int32)

        full = L >= m
        numiter = st.numiter + full.astype(jnp.int32)
        # ¬(β > btol): NaN β must count as breakdown (see lanczos.py)
        stalled = (~(fV.beta > btol) | ~(fW.beta > btol)) & (L < m)
        done = (nconv >= howmany) | (full & (numiter >= alg.maxiter)) | stalled

        keep = jnp.clip((3 * m + 2 * nconv) // 5, 1, jnp.maximum(L - 1, 1)).astype(
            jnp.int32
        )
        if real:
            # decrement-only block-boundary adjustment, alternating sides
            def dec(keep, starts):
                hit = jax.lax.dynamic_index_in_dim(
                    starts, jnp.clip(keep - 1, 0, m1 - 1), 0, keepdims=False
                ) & (keep > 1) & (keep < L)
                return keep - hit.astype(jnp.int32)

            def adj(i, keep):
                return dec(dec(keep, startsS), startsT)

            keep = jnp.maximum(jax.lax.fori_loop(0, 3, adj, keep), 1)

        def do_restart(args):
            fV, fW, M = args
            rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
            kmask = (rows < L) & (cols < keep)
            Qk = jnp.where(kmask, Q, 0)
            Zk = jnp.where(kmask, Z, 0)
            # Ĥ = S_kk + VQᴴv·h̃ᴴ with VQᴴv = −Qₖᴴ x (reference :399-404)
            vqv = -(Qk.conj().T @ x)
            wzw = -(Zk.conj().T @ y)
            keepblk = (rows < keep) & (cols < keep)
            hk = jnp.where(idx < keep, h, 0)
            kk = jnp.where(idx < keep, kvv, 0)
            Hn = jnp.where(keepblk, S + vqv[:, None] * jnp.conj(hk)[None, :], 0)
            Kn = jnp.where(keepblk, T + wzw[:, None] * jnp.conj(kk)[None, :], 0)
            # corrected residuals (reference :406-418)
            rV2 = add(rV, bs.unproject(fV.V, Qk @ vqv), a=-1)
            rW2 = add(rW, bs.unproject(fW.V, Zk @ wzw), a=-1)
            b2v = space.norm(rV2)
            b2w = space.norm(rW2)
            sv = jnp.where(b2v > 0, b2v, 1)
            sw = jnp.where(b2w > 0, b2w, 1)
            rV2n = scale(rV2, (1 / sv).astype(cdt))
            rW2n = scale(rW2, (1 / sw).astype(cdt))
            # spike rows: coupling of the (normalized) residual; the row is
            # h̃ᴴ = conj(h̃) (residual term is r·h̃ᴴ in the reference convention)
            Hn = Hn + jax.nn.one_hot(keep, m1, dtype=cdt)[:, None] * (
                jnp.conj(hk) * b2v.astype(cdt)
            )[None, :]
            Kn = Kn + jax.nn.one_hot(keep, m1, dtype=cdt)[:, None] * (
                jnp.conj(kk) * b2w.astype(cdt)
            )[None, :]
            # bases
            Vn = bs.transform(fV.V, Qk)
            Vn = bs.set(Vn, keep, rV2n)
            Wn = bs.transform(fW.V, Zk)
            Wn = bs.set(Wn, keep, rW2n)
            # M ← ZᴴMQ on the keep block, then entries for the residual slot
            Mn = Zk.conj().T @ (M @ Qk)
            Mn = jnp.where(keepblk, Mn, 0)
            Mn = _update_M(Mn, Vn, Wn, keep, space)
            fVn = kf.KrylovState(Vn, Hn, keep, fV.beta)
            fWn = kf.KrylovState(Wn, Kn, keep, fW.beta)
            return fVn, fWn, Mn

        restart_now = jnp.logical_not(done) & full
        fV, fW, M = jax.lax.cond(restart_now, do_restart, lambda a: a, (fV, fW, M))
        return _LoopState(
            fV=fV, fW=fW, M=M, S=S, T=T, Q=Q, Z=Z, h=h, kv=kvv,
            rV=rV, rW=rW, brV=brV, brW=brW,
            nconv=nconv, numiter=numiter, numops=numops, done=done,
        )

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    log_if(
        alg.verbosity, STARTSTOP,
        "BiArnoldi bieigsolve finished after {it} iterations: {nc} values "
        "converged", it=st.numiter, nc=jnp.minimum(st.nconv, howmany),
    )
    warn_if(
        alg.verbosity, st.nconv < howmany,
        "BiArnoldi bieigsolve stopped without convergence: {nc} of "
        f"{howmany}" + " values converged after {it} iterations",
        nc=st.nconv, it=st.numiter,
    )

    # --- extraction (reference bieigsolve body, :151-200); in real mode this
    # is the only place complex values are materialized ---
    hm = howmany
    L = st.fV.k
    ccdt = jnp.result_type(cdt, jnp.complex64)
    if real:
        re_, im_ = dense.real_schur_eigvals(st.S, L)
        vals = (re_ + 1j * im_).astype(ccdt)[:hm]
        Xre, Xim = dense.triangular_eigvecs_real(st.S, L)
        XS = (Xre + 1j * Xim).astype(ccdt)[:, :hm]
    else:
        vals = jnp.diagonal(st.S)[:hm]
        XS = dense.triangular_eigvecs(st.S, L)[:, :hm]  # eigvecs of S (m1, hm)
    Qc = st.Q.astype(ccdt)
    Zc = st.Z.astype(ccdt)
    Mc = st.M.astype(ccdt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    if real:
        # per-column left eigenvectors: T's eigvec for conj(λ_j), column-wise
        # biorthonormalized through ZᴴMQ.  (The reference's inv((ZᴴMQ·XS)ᴴ)
        # block formula assumes the leading hm Schur columns span an invariant
        # subspace, which fails for a quasi-triangular T when a 2×2 block
        # straddles hm; the per-column form only needs each column.)
        TXre, TXim = dense.triangular_eigvecs_real(st.T, L)
        Yt_full = (TXre - 1j * TXim).astype(ccdt)  # conj: pair-member flip
        amask = (rows < L) & (cols < L)
        Qa = jnp.where(amask, Qc, 0)
        Za = jnp.where(amask, Zc, 0)
        ZMQf = Za.conj().T @ (Mc @ Qa)
        XSf = jnp.zeros((m1, m1), ccdt).at[:, :hm].set(XS)
        g = jnp.einsum("ij,ij->j", Yt_full.conj(), ZMQf @ XSf)[:hm]
        gmag2 = jnp.abs(g) ** 2
        tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
        sc = jnp.conj(g) / jnp.maximum(gmag2, tiny)  # y_j ← y_j·conj(1/g_j)ᴴ
        XT = Yt_full[:hm, :hm] * jnp.conj(sc)[None, :]
        # Yt support beyond hm rows matters: build full (m1, hm) coefficients
        XTcols = Yt_full[:, :hm] * jnp.conj(sc)[None, :]
    else:
        # ZᴴMQ restricted to howmany block
        lmask = (rows < L) & (cols < hm)
        Qh = jnp.where(lmask, Qc, 0)
        Zh = jnp.where(lmask, Zc, 0)
        ZMQ = (Zh.conj().T @ (Mc @ Qh))[:hm, :hm]
        XT = jnp.linalg.inv((ZMQ @ XS[:hm, :hm]).conj().T)  # (hm, hm)
        XTcols = jnp.zeros((m1, hm), ccdt).at[:hm, :hm].set(XT)

    def _transform_cplx(V, C):
        """``V`` (possibly real) basis × complex coefficient matrix."""
        if real:
            Vr = bs.transform(V, jnp.real(C))
            Vi = bs.transform(V, jnp.imag(C))
            return jax.tree_util.tree_map(
                lambda lr, li: (lr + 1j * li).astype(ccdt), Vr, Vi
            )
        return bs.transform(V, C)

    # right eigenvectors: V · (Q · XS); left: W · (Z · XT)
    QXS = Qc @ jnp.where(rows[:, :hm] < L, XS, 0)
    QXSm = jnp.where((rows < L) & (cols < hm), jnp.pad(QXS, ((0, 0), (0, m1 - hm))), 0)
    Vv = _transform_cplx(st.fV.V, QXSm)
    vecsV = jax.tree_util.tree_map(lambda l: l[:hm], Vv)
    XTfull = jnp.zeros((m1, m1), ccdt).at[:, :hm].set(
        jnp.where(rows[:, :hm] < L, XTcols, 0)
    )
    ZXT = Zc @ XTfull
    ZXTm = jnp.where((rows < L) & (cols < hm), ZXT, 0)
    Wv = _transform_cplx(st.fW.V, ZXTm)
    vecsW = jax.tree_util.tree_map(lambda l: l[:hm], Wv)
    # residuals and norms
    hS = jnp.conj(st.h[:hm].astype(ccdt)) @ XS[:hm, :hm]  # hᴴ · xs per column
    kT = jnp.conj(st.kv.astype(ccdt)) @ jnp.where(rows[:, :hm] < L, XTcols, 0)
    nrV = st.brV
    nrW = st.brW
    resnV = nrV * jnp.abs(hS)
    resnW = nrW * jnp.abs(kT)
    rVc = jax.tree_util.tree_map(lambda l: l.astype(ccdt), st.rV)
    rWc = jax.tree_util.tree_map(lambda l: l.astype(ccdt), st.rW)
    residualsV = jax.tree_util.tree_map(
        lambda l: hS.reshape((hm,) + (1,) * l.ndim).astype(l.dtype) * l[None], rVc
    )
    residualsW = jax.tree_util.tree_map(
        lambda l: kT.reshape((hm,) + (1,) * l.ndim).astype(l.dtype) * l[None], rWc
    )
    conv = jnp.minimum(st.nconv, hm)
    # reference numiter starts at 1 (src/eigsolve/biarnoldi.jl)
    _it = jnp.maximum(st.numiter, jnp.int32(1))
    infoV = ConvergenceInfo(conv, residualsV, resnV, _it, st.numops)
    infoW = ConvergenceInfo(conv, residualsW, resnW, _it, st.numops)
    return vals, (vecsV, vecsW), (infoV, infoW)


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space"))
def _bieigsolve_core(op, v0, w0, howmany, which, alg, space):
    return bieigsolve_driver(op, v0, w0, howmany, which, alg, space)


def bieigsolve(
    A,
    v0: Optional[PyTree] = None,
    w0: Optional[PyTree] = None,
    howmany: int = 1,
    which="LM",
    *,
    alg: Optional[BiArnoldi] = None,
    space: VectorSpace = STANDARD,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    eager: Optional[bool] = None,
    verbosity: Optional[int] = None,
):
    """Two-sided eigensolve: returns ``(values, (vecsV, vecsW), (infoV, infoW))``
    with biorthogonal left/right eigenvector pairs.  Reference ``bieigsolve``
    (``src/eigsolve/biarnoldi.jl:1-200``)."""
    op = as_operator(A)
    if v0 is None or w0 is None:
        if isinstance(A, (np.ndarray, jax.Array)) and getattr(A, "ndim", 0) == 2:
            dt = jnp.asarray(A).dtype
            rng = np.random.default_rng(42)
            if v0 is None:
                v0 = jnp.asarray(
                    rng.standard_normal(A.shape[1]), jnp.finfo(dt).dtype
                ).astype(dt)
            if w0 is None:
                w0 = jnp.asarray(
                    rng.standard_normal(A.shape[0]), jnp.finfo(dt).dtype
                ).astype(dt)
        else:
            raise ValueError("v0 and w0 are required unless A is a concrete matrix")
    if op.adjoint is None:
        op = op.with_adjoint_from(v0)
    if alg is None:
        kw = dict(
            tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
            eager=eager, verbosity=verbosity,
        )
        alg = BiArnoldi(**{k: v for k, v in kw.items() if v is not None})
    elif tol is not None and alg.tol != tol:
        alg = dataclasses.replace(alg, tol=tol)
    return _bieigsolve_core(op, v0, w0, howmany, which, alg, space)
