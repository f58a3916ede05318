"""Restarted GMRES(m) driver (reference ``src/linsolve/gmres.jl``), fully jitted.

Per restart cycle: Arnoldi expansion of the residual's Krylov space, incremental
QR of the shifted Hessenberg ``R = a0·I + a1·H`` via Givens rotations, masked
triangular solve, update ``x += V y``.

TPU-first deviations from the reference:

* previous rotations are accumulated in a dense ``(m+1, m+1)`` unitary ``G`` so
  applying them to a new column is one GEMV (the reference chains scalar
  rotations, ``src/linsolve/gmres.jl:72-79``);
* the end-of-cycle residual is reconstructed as ``V · (Gᴴ e_{k} ỹ_k)`` — one
  unproject GEMV — instead of applying adjoint Givens rotations across the big
  basis vectors (``src/linsolve/gmres.jl:110-118``): same mathematics
  (``β e₁ − H̄ y = Gᴴ (ỹ − R̄ y)``), one pass over HBM instead of 2k;
* the true residual is recomputed when the reconstructed one converges
  (``src/linsolve/gmres.jl:120-124``), and the outer loop resumes on drift;
* for fusable stencil operators (real f32 ``StencilOperator`` /
  ``GridStencilOperator`` with ``(R, 128)`` vectors under plain CGS) the
  Arnoldi expansion runs the ONE-STREAM fused kernel
  (``ops/pallas_fused_lanczos.py``): subtract + append + operator apply +
  next-step projections in ``B + 3`` HBM row-passes instead of ``2B + 9``,
  with the Givens QR carried through the fused loop so per-column convergence
  stopping is preserved.  Note the Krylov space of ``a0 + a1·A`` equals that
  of ``A``, so the kernel streams the RAW stencil and the shift enters only
  the small-matrix column (same as the unfused path).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..algorithms import GMRES
from ..dense.givens import givens
from ..dense.triangular import solve_upper_active
from ..factorizations import krylov as kf
from ..info import ConvergenceInfo, EACHITERATION, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator, apply_shifted, probe_dtype
from ..ops.vector import STANDARD, VectorSpace, add

PyTree = Any

__all__ = ["linsolve_gmres"]


class _Outer(NamedTuple):
    x: PyTree
    r: PyTree
    normr: jax.Array
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def _rot2(v, i, j, gc, gs):
    """Apply the Givens rotation (gc, gs) to entries (i, j) of a vector."""
    vi = jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
    vj = jax.lax.dynamic_index_in_dim(v, j, 0, keepdims=False)
    v = v.at[i].set(gc * vi + jnp.conj(gs) * vj)
    return v.at[j].set(-gs * vi + gc * vj)


def _qr_update(G, R, y, col, k, cdt):
    """One incremental-QR column update: rotate ``col`` (the shifted H column
    ``k``) by the accumulated rotations ``G``, compute and apply the new
    Givens pair zeroing entry ``k+1``, update (G, R, y).  Shared by the
    unfused and fused cycles (reference ``src/linsolve/gmres.jl:72-99``)."""
    col = G @ col  # apply all previous rotations: one GEMV
    ck = jax.lax.dynamic_index_in_dim(col, k, 0, keepdims=False)
    ck1 = jax.lax.dynamic_index_in_dim(col, k + 1, 0, keepdims=False)
    gc, gs, grr = givens(ck, ck1)
    col = col.at[k].set(grr).at[k + 1].set(0)
    y = _rot2(y, k, k + 1, gc, gs)
    m1 = G.shape[0]
    rowk = jax.lax.dynamic_slice(
        G, (jnp.asarray(k, jnp.int32), jnp.int32(0)), (2, m1)
    )
    Grot = jnp.stack(
        [
            gc * rowk[0] + jnp.conj(gs) * rowk[1],
            -gs * rowk[0] + gc * rowk[1],
        ]
    )
    G = jax.lax.dynamic_update_slice(
        G, Grot, (jnp.asarray(k, jnp.int32), jnp.int32(0))
    )
    R = jax.lax.dynamic_update_slice(
        R, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
    )
    return G, R, y


def linsolve_gmres(
    op: LinearOperator,
    b: PyTree,
    x0: PyTree,
    a0,
    a1,
    alg: GMRES,
    space: VectorSpace = STANDARD,
):
    m = alg.krylovdim
    cdt = jnp.result_type(probe_dtype(op, b), jnp.asarray(a0).dtype, jnp.asarray(a1).dtype)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    a0c = jnp.asarray(a0, cdt)
    a1c = jnp.asarray(a1, cdt)

    def shifted(x):
        return apply_shifted(op, x, a0c, a1c)

    # loop-carried vectors must have the (possibly promoted) coefficient dtype
    x0 = jax.tree_util.tree_map(lambda l: l.astype(cdt), x0)
    r0 = jax.tree_util.tree_map(
        lambda l: l.astype(cdt), add(b, shifted(x0), a=-1)
    )
    normr0 = space.norm(r0)

    # one-stream fused Arnoldi expansion (ops/pallas_fused_lanczos.py) with
    # the Givens QR carried through the fused loop
    from ..ops import orthonormal as on

    dgks = (
        type(alg.orth) is on.ClassicalGramSchmidt2 and 2 * (m + 1) + 2 <= 128
    )
    fused = (
        (type(alg.orth) is on.ClassicalGramSchmidt or dgks)
        and cdt == jnp.float32
        and kf.fused_available(op, b, space, kmax=m + 1)
    )

    class _Cycle(NamedTuple):
        fact: kf.KrylovState
        G: jax.Array  # accumulated rotations, (m+1, m+1)
        R: jax.Array  # rotated shifted Hessenberg, (m+1, m+1)
        y: jax.Array  # rotated rhs ỹ, (m+1,)
        numops: jax.Array

    def cycle_cond(c: _Cycle):
        k = c.fact.k
        resk = jnp.abs(
            jax.lax.dynamic_index_in_dim(c.y, jnp.minimum(k, m), 0, keepdims=False)
        )
        return jnp.logical_and(k < m, resk > tol)

    def cycle_body(c: _Cycle) -> _Cycle:
        fact = kf.expand(op.normal, c.fact, alg.orth, space, alg.verbosity)
        k = c.fact.k  # column index just produced
        h = jax.lax.dynamic_slice(
            fact.H, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (m + 1, 1)
        )[
            :, 0
        ]
        ek = jax.nn.one_hot(k, m + 1, dtype=cdt)
        col = a1c * h.astype(cdt) + a0c * ek
        G, R, y = _qr_update(c.G, c.R, c.y, col, k, cdt)
        return _Cycle(fact, G, R, y, c.numops + 1)

    def run_cycle_unfused(r, normr, numops):
        fact = kf.initialize(r, m, cdt, space, vec_dtype=cdt)
        c0 = _Cycle(
            fact=fact,
            G=jnp.eye(m + 1, dtype=cdt),
            R=jnp.zeros((m + 1, m + 1), cdt),
            y=(normr.astype(cdt)) * jax.nn.one_hot(0, m + 1, dtype=cdt),
            numops=numops,
        )
        c = jax.lax.while_loop(cycle_cond, cycle_body, c0)
        return (
            c.fact.V, kf.fused_scales_init(m + 1), c.G, c.R, c.y, c.fact.k,
            c.numops,
        )

    def run_cycle_fused(r, normr, numops):
        """Fused Arnoldi cycle on the shared one-stream stepper
        (``kf.make_fused_stepper``): basis rows stored UNNORMALIZED with the
        ``FusedScales`` bookkeeping (dgks mode = one-reduce CGS2 for the
        default ``cgs2`` orthogonalizer); the incremental QR is carried
        through the fused while-loop so per-column convergence stopping is
        preserved.  One extra operator application may occur on early
        convergence (the kernel computes ``A·row_{k+1}`` while column ``k``
        is being judged) — counted honestly in numops."""
        kmax = m + 1
        idx = jnp.arange(kmax)
        btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

        fact = kf.initialize(r, m, cdt, space, vec_dtype=cdt)
        treedef = jax.tree_util.tree_structure(fact.V)
        prime, advance, tail = kf.make_fused_stepper(op, kmax, dgks, space)
        carry0 = prime(fact.V, jnp.int32(0), kf.fused_scales_init(kmax))

        G0 = jnp.eye(m + 1, dtype=cdt)
        R0 = jnp.zeros((m + 1, m + 1), cdt)
        yt0 = (normr.astype(cdt)) * jax.nn.one_hot(0, m + 1, dtype=cdt)

        def shifted_col(h, beta_k, k):
            # shifted Hessenberg column: a1·(h + β e_{k+1}) + a0·e_k
            col = h.astype(cdt) + beta_k.astype(cdt) * jax.nn.one_hot(
                k + 1, kmax, dtype=cdt
            )
            return a1c * col + a0c * jax.nn.one_hot(k, kmax, dtype=cdt)

        def cond(c):
            carry, G, R, yt, numops = c
            q, k = carry[7], carry[9]
            resk = jnp.abs(
                jax.lax.dynamic_index_in_dim(yt, k, 0, keepdims=False)
            )
            return jnp.logical_and(
                k < m - 1,
                jnp.logical_and(resk > tol, jnp.sqrt(q) > btol),
            )

        def body(c):
            carry, G, R, yt, numops = c
            k = carry[9]
            carry, alpha, beta_k, h = advance(carry)
            G, R, yt = _qr_update(G, R, yt, shifted_col(h, beta_k, k), k, cdt)
            return carry, G, R, yt, numops + 1

        carry, G, R, yt, numops = jax.lax.while_loop(
            cond, body, (carry0, G0, R0, yt0, numops + 1)  # +1: priming apply
        )
        q, k = carry[7], carry[9]

        # tail column m-1: no (wasted) next apply — masked bucketed subtract
        resk = jnp.abs(jax.lax.dynamic_index_in_dim(yt, k, 0, keepdims=False))
        go = (k == m - 1) & (resk > tol) & (jnp.sqrt(q) > btol)
        Vl, sc, alpha, beta_m, h = tail(carry, treedef, go)
        Gt, Rt, ytt = _qr_update(G, R, yt, shifted_col(h, beta_m, k), k, cdt)
        G = jnp.where(go, Gt, G)
        R = jnp.where(go, Rt, R)
        yt = jnp.where(go, ytt, yt)
        k = k + go.astype(jnp.int32)
        return (
            jax.tree_util.tree_unflatten(treedef, [Vl]), sc, G, R, yt, k,
            numops,
        )

    run_cycle = run_cycle_fused if fused else run_cycle_unfused

    def outer_body(st: _Outer) -> _Outer:
        V, sc, G, R, yv, k, numops = run_cycle(st.r, st.normr, st.numops)
        # triangular solve on active k×k block
        coeff = solve_upper_active(R[:m, :m], yv[:m], k)
        coeff = jnp.concatenate([coeff, jnp.zeros((1,), cdt)])
        # fused cycles store rows unnormalized: fold the bookkeeping into
        # every basis consumption (identity when unfused)
        x = add(st.x, bs.unproject(V, kf.fold_scales(sc, coeff)))
        # residual reconstruction: r = V · (Gᴴ e_k · ỹ_k)
        yk = jax.lax.dynamic_index_in_dim(yv, k, 0, keepdims=False)
        rc = jnp.conj(G.T) @ (yk * jax.nn.one_hot(k, m + 1, dtype=cdt))
        r = bs.unproject(V, kf.fold_scales(sc, rc))
        normr = jnp.abs(yk)
        numiter = st.numiter + 1

        # true-residual verification on apparent convergence
        def verify(args):
            x, numops = args
            rt = add(b, shifted(x), a=-1)
            return rt, space.norm(rt), numops + 1

        def keep(args):
            return r, normr, numops

        conv = normr <= tol
        r, normr, numops = jax.lax.cond(conv, verify, keep, (x, numops))
        done = jnp.logical_or(normr <= tol, numiter >= alg.maxiter)
        return _Outer(x, r, normr, numiter, numops, done)

    st0 = _Outer(
        x=x0,
        r=r0,
        normr=normr0,
        numiter=jnp.int32(0),
        numops=jnp.int32(1),
        done=normr0 <= tol,
    )
    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    conv = (st.normr <= tol).astype(jnp.int32)
    log_if(
        alg.verbosity, STARTSTOP,
        "GMRES linsolve finished after {it} restarts: converged = {c}, "
        "normres = {nr}, numops = {no}",
        it=st.numiter, c=conv, nr=st.normr, no=st.numops,
    )
    warn_if(
        alg.verbosity, conv == 0,
        "GMRES linsolve stopped without converging after {it} iterations: "
        "normres = {nr}", it=st.numiter, nr=st.normr,
    )
    info = ConvergenceInfo(
        converged=conv,
        residual=st.r,
        normres=st.normr,
        numiter=st.numiter,
        numops=st.numops,
    )
    return st.x, info
