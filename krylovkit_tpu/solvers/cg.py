"""Conjugate Gradients driver (reference ``src/linsolve/cg.jl``), fully jitted.

Solves ``(a0 + a1·A) x = b`` for Hermitian positive-definite combined operator.
Keeps the reference's robustness feature: on (apparent) convergence the *true*
residual ``b - (a0 + a1 A)x`` is recomputed and iteration resumes if it fails the
tolerance (``src/linsolve/cg.jl:69-75`` — defeats floating-point drift of the
recurrence residual).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..algorithms import CG
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops.operator import LinearOperator, apply_shifted
from ..ops.vector import STANDARD, VectorSpace, add, zerovector

PyTree = Any

__all__ = ["linsolve_cg"]


class _State(NamedTuple):
    x: PyTree
    r: PyTree
    p: PyTree
    rho: jax.Array  # <r, r>
    normr: jax.Array  # true-ish residual norm (recurrence)
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def linsolve_cg(
    op: LinearOperator,
    b: PyTree,
    x0: PyTree,
    a0,
    a1,
    alg: CG,
    space: VectorSpace = STANDARD,
):
    rdt = jnp.finfo(
        jnp.result_type(*[l.dtype for l in jax.tree_util.tree_leaves(b)])
    ).dtype
    tol = jnp.asarray(alg.tol, rdt)

    def shifted(x):
        return apply_shifted(op, x, a0, a1)

    def true_residual(x):
        return add(b, shifted(x), a=-1)

    r0 = true_residual(x0)
    rho0 = jnp.real(space.inner(r0, r0))
    st0 = _State(
        x=x0,
        r=r0,
        p=r0,
        rho=rho0,
        normr=jnp.sqrt(rho0),
        numiter=jnp.int32(0),
        numops=jnp.int32(1),
        done=jnp.sqrt(rho0) <= tol,
    )

    def body(st: _State) -> _State:
        Ap = shifted(st.p)
        pAp = jnp.real(space.inner(st.p, Ap))
        alpha = st.rho / jnp.where(pAp != 0, pAp, 1)
        x = add(st.x, st.p, a=alpha)
        r = add(st.r, Ap, a=-alpha)
        rho = jnp.real(space.inner(r, r))
        beta = rho / jnp.where(st.rho != 0, st.rho, 1)
        p = add(r, st.p, a=beta)
        normr = jnp.sqrt(rho)
        numiter = st.numiter + 1
        numops = st.numops + 1

        # hard true-residual check on apparent convergence (cg.jl:69-75)
        def verify(args):
            x, r, p, rho, numops = args
            rtrue = true_residual(x)
            rho_t = jnp.real(space.inner(rtrue, rtrue))
            # restart recurrence from the true residual
            return x, rtrue, rtrue, rho_t, numops + 1, jnp.sqrt(rho_t)

        def keep(args):
            x, r, p, rho, numops = args
            return x, r, p, rho, numops, jnp.sqrt(rho)

        conv = normr <= tol
        x, r, p, rho, numops, normr = jax.lax.cond(
            conv, verify, keep, (x, r, p, rho, numops)
        )
        done = jnp.logical_or(normr <= tol, numiter >= alg.maxiter)
        return _State(x, r, p, rho, normr, numiter, numops, done)

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), body, st0)
    conv = (st.normr <= tol).astype(jnp.int32)
    log_if(
        alg.verbosity, STARTSTOP,
        "CG linsolve finished after {it} iterations: converged = {c}, "
        "normres = {nr}, numops = {no}",
        it=st.numiter, c=conv, nr=st.normr, no=st.numops,
    )
    warn_if(
        alg.verbosity, conv == 0,
        "CG linsolve stopped without converging after {it} iterations: "
        "normres = {nr}", it=st.numiter, nr=st.normr,
    )
    info = ConvergenceInfo(
        converged=(st.normr <= tol).astype(jnp.int32),
        residual=st.r,
        normres=st.normr,
        numiter=st.numiter,
        numops=st.numops,
    )
    return st.x, info
