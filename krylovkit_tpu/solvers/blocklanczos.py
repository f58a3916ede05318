"""BlockLanczos eigsolve driver: Hermitian eigenproblems with degenerate
eigenvalues, fully jitted.

Mirrors the reference driver (``src/eigsolve/blocklanczos.jl``): block expansion
(one batched operator application per step), ``eigen(Hermitian(BTD))`` for the
projected problem (``:42``; here ``dense.eigh_active`` on the dense buffer),
residual norms through the coupling of the residual block (``:50-53``), and a
block-aware thick restart that transforms both the basis and the spike rows
(``:71-104``) — expressed here as the same arrowhead form as the Lanczos driver.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import dense
from ..algorithms import BlockLanczos
from ..factorizations import blocklanczos as bf
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator, probe_dtype
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any

__all__ = ["eigsolve_blocklanczos"]


class _LoopState(NamedTuple):
    fact: bf.BlockLanczosState
    numiter: jax.Array
    numops: jax.Array
    nconv: jax.Array
    vals: jax.Array
    U: jax.Array
    resnorms: jax.Array
    done: jax.Array


def _spike(H, k, b):
    """Coupling rows ``S = H[k:k+b, :]`` (block residual couplings)."""
    return jax.lax.dynamic_slice(
        H, (jnp.asarray(k, jnp.int32), jnp.int32(0)), (b, H.shape[1])
    )


def eigsolve_blocklanczos(
    op: LinearOperator,
    X0: PyTree,
    howmany: int,
    which,
    alg: BlockLanczos,
    space: VectorSpace = STANDARD,
):
    """``X0`` is a stacked block pytree (leading axis = block size).
    Returns ``(vals, vecs, info)`` like the Lanczos driver."""
    b = jax.tree_util.tree_leaves(X0)[0].shape[0]
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    x0_single = jax.tree_util.tree_map(lambda l: l[0], X0)
    cdt = probe_dtype(op, x0_single)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    qr_tol = (
        jnp.asarray(alg.qr_tol, rdt)
        if alg.qr_tol >= 0
        else jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)
    )
    btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

    X0c = jax.tree_util.tree_map(lambda l: l.astype(cdt), X0)
    fact0 = bf.initialize(X0c, m, cdt, qr_tol, space)
    mcapb = m + b
    st0 = _LoopState(
        fact=fact0,
        numiter=jnp.int32(0),
        numops=jnp.int32(0),
        nconv=jnp.int32(0),
        vals=jnp.zeros((mcapb,), rdt),
        U=jnp.zeros((mcapb, mcapb), cdt),
        resnorms=jnp.full((mcapb,), jnp.inf, rdt),
        done=jnp.asarray(False),
    )

    def expand_one(c):
        fact, numops = c
        return (
            bf.expand(op.normal, fact, qr_tol, space, alg.verbosity),
            numops + b,  # one batched apply = b operator applications
        )

    def outer_body(st: _LoopState) -> _LoopState:
        fact, numops = st.fact, st.numops

        def inner_cond(c):
            fact, numops = c
            go = (fact.k + fact.r <= m) & (fact.r > 0) & (fact.beta > btol)
            if alg.eager:
                go = jnp.logical_and(go, fact.k < max(howmany, 1))
            return go

        can = (fact.k + fact.r <= m) & (fact.r > 0)
        fact, numops = jax.lax.cond(can, expand_one, lambda c: c, (fact, numops))
        fact, numops = jax.lax.while_loop(inner_cond, expand_one, (fact, numops))

        K = fact.k
        w, U, valid = dense.eigh_active((fact.H + fact.H.conj().T) / 2, K)
        perm = dense.sort_perm(w, valid, which)
        w = w[perm]
        U = U[:, perm]
        valid = valid[perm]
        S = _spike(fact.H, K, b)  # (b, mcapb) coupling rows
        SU = S @ U  # (b, mcapb)
        res = jnp.sqrt(jnp.sum(jnp.abs(SU) ** 2, axis=0))
        res = jnp.where(valid, res, jnp.inf)
        flags = res <= tol
        nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32))).astype(jnp.int32)

        full = fact.k + fact.r > m
        numiter = st.numiter + full.astype(jnp.int32)
        # ¬(β > btol): NaN β must count as breakdown (see lanczos.py)
        exhausted = jnp.logical_or(
            fact.r <= 0, jnp.logical_not(fact.beta > btol)
        )
        done = jnp.logical_or(
            nconv >= howmany,
            jnp.logical_or(full & (numiter >= alg.maxiter), exhausted),
        )

        keep_raw = (3 * m + 2 * nconv) // 5
        keep = jnp.clip(keep_raw, 1, jnp.maximum(fact.k - 1, 1))

        def do_restart(args):
            fact, w, U, SU = args
            rows = jax.lax.broadcasted_iota(jnp.int32, (mcapb, mcapb), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (mcapb, mcapb), 1)
            Ukeep = jnp.where((rows < fact.k) & (cols < keep), U, 0)
            Vnew = bs.transform(fact.V, Ukeep)
            didx = jax.lax.broadcasted_iota(jnp.int32, (mcapb,), 0)
            diag = jnp.where(didx < keep, w.astype(cdt), 0)
            Hnew = jnp.diag(diag)
            # spike rows at [keep, keep+b): S·U columns < keep
            cmask = jax.lax.broadcasted_iota(jnp.int32, (b, mcapb), 1)
            Snew = jnp.where(cmask < keep, SU.astype(cdt), 0)
            Hnew = jax.lax.dynamic_update_slice(
                Hnew, Snew, (jnp.asarray(keep, jnp.int32), jnp.int32(0))
            )
            Hnew = jax.lax.dynamic_update_slice(
                Hnew, Snew.conj().T, (jnp.int32(0), jnp.asarray(keep, jnp.int32))
            )
            return bf.BlockLanczosState(
                V=Vnew, H=Hnew, X=fact.X, r=fact.r,
                k=keep.astype(jnp.int32), beta=fact.beta,
            )

        restart_now = jnp.logical_and(
            jnp.logical_not(done), fact.k + fact.r > m
        )
        fact = jax.lax.cond(restart_now, do_restart, lambda a: a[0], (fact, w, U, SU))
        return _LoopState(fact, numiter, numops, nconv, w, U, res, done)

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    nconv_out = jnp.minimum(st.nconv, howmany)
    log_if(
        alg.verbosity, STARTSTOP,
        "BlockLanczos eigsolve finished after {it} iterations: {nc} values "
        "converged, normres = {nr}",
        it=st.numiter, nc=nconv_out, nr=st.resnorms[:howmany],
    )
    warn_if(
        alg.verbosity, nconv_out < howmany,
        "BlockLanczos eigsolve stopped without convergence: {nc} of "
        f"{howmany}" + " values converged after {it} iterations",
        nc=nconv_out, it=st.numiter,
    )

    fact = st.fact
    rows = jax.lax.broadcasted_iota(jnp.int32, (mcapb, mcapb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mcapb, mcapb), 1)
    Umask = jnp.where((rows < fact.k) & (cols < howmany), st.U, 0)
    Vr = bs.transform(fact.V, Umask)
    vecs = jax.tree_util.tree_map(lambda l: l[:howmany], Vr)
    # residual vectors r_i = Σ_j X[j]·(S U)[j, i]
    S = _spike(fact.H, fact.k, b)
    SU = (S @ st.U)[:, :howmany]
    residuals = jax.tree_util.tree_map(
        lambda lX: jnp.tensordot(SU.T.astype(lX.dtype), lX, axes=[[1], [0]]),
        fact.X,
    )
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=st.resnorms[:howmany],
        numiter=jnp.maximum(st.numiter, jnp.int32(1)),
        numops=st.numops,
    )
    return st.vals[:howmany], vecs, info
