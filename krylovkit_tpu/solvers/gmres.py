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
  (``src/linsolve/gmres.jl:120-124``), and the outer loop resumes on drift.
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
        col = c.G @ col  # apply all previous rotations: one GEMV
        ck = jax.lax.dynamic_index_in_dim(col, k, 0, keepdims=False)
        ck1 = jax.lax.dynamic_index_in_dim(col, k + 1, 0, keepdims=False)
        gc, gs, grr = givens(ck, ck1)
        # rotate col, rhs y, and accumulate into G (rows k, k+1)
        def rot2(v, i, j):
            vi = jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
            vj = jax.lax.dynamic_index_in_dim(v, j, 0, keepdims=False)
            v = v.at[i].set(gc * vi + jnp.conj(gs) * vj)
            return v.at[j].set(-gs * vi + gc * vj)

        col = col.at[k].set(grr).at[k + 1].set(0)
        y = rot2(c.y, k, k + 1)
        rowk = jax.lax.dynamic_slice(
            c.G, (jnp.asarray(k, jnp.int32), jnp.int32(0)), (2, m + 1)
        )
        Grot = jnp.stack(
            [
                gc * rowk[0] + jnp.conj(gs) * rowk[1],
                -gs * rowk[0] + gc * rowk[1],
            ]
        )
        G = jax.lax.dynamic_update_slice(
            c.G, Grot, (jnp.asarray(k, jnp.int32), jnp.int32(0))
        )
        R = jax.lax.dynamic_update_slice(
            c.R, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
        )
        return _Cycle(fact, G, R, y, c.numops + 1)

    def outer_body(st: _Outer) -> _Outer:
        fact = kf.initialize(st.r, m, cdt, space, vec_dtype=cdt)
        c0 = _Cycle(
            fact=fact,
            G=jnp.eye(m + 1, dtype=cdt),
            R=jnp.zeros((m + 1, m + 1), cdt),
            y=(st.normr.astype(cdt)) * jax.nn.one_hot(0, m + 1, dtype=cdt),
            numops=st.numops,
        )
        c = jax.lax.while_loop(cycle_cond, cycle_body, c0)
        k = c.fact.k
        # triangular solve on active k×k block
        coeff = solve_upper_active(c.R[:m, :m], c.y[:m], k)
        coeff = jnp.concatenate([coeff, jnp.zeros((1,), cdt)])
        x = add(st.x, bs.unproject(c.fact.V, coeff))
        # residual reconstruction: r = V · (Gᴴ e_k · ỹ_k)
        yk = jax.lax.dynamic_index_in_dim(c.y, k, 0, keepdims=False)
        rc = jnp.conj(c.G.T) @ (yk * jax.nn.one_hot(k, m + 1, dtype=cdt))
        r = bs.unproject(c.fact.V, rc)
        normr = jnp.abs(yk)
        numiter = st.numiter + 1
        numops = c.numops

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
