"""MINRES driver for Hermitian (possibly indefinite) systems, fully jitted.

The reference *declares* MINRES but never implements it
(``src/algorithms.jl:397-426``, TODO at ``src/linsolve/linsolve.jl:140-141``);
this build provides it.  Solves ``(a0 + a1·A) x = b`` with ``A`` Hermitian and
``a0, a1`` real, using the Paige–Saunders Lanczos + Givens-QR recurrence with
O(1) vector storage, plus the framework-wide robustness rule: apparent
convergence is re-verified against the freshly computed true residual
(cf. ``src/linsolve/cg.jl:69-75``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..algorithms import MINRES
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops.operator import LinearOperator, apply_shifted, probe_dtype
from ..ops.vector import STANDARD, VectorSpace, add, scale, zerovector

PyTree = Any

__all__ = ["linsolve_minres"]


class _State(NamedTuple):
    x: PyTree
    v: PyTree  # current Lanczos vector v_k
    v_prev: PyTree  # v_{k-1}
    d: PyTree  # direction d_{k-1}
    d_prev: PyTree  # d_{k-2}
    beta: jax.Array  # β_k (subdiagonal entering this step)
    eta: jax.Array  # rotated rhs component η_k
    c1: jax.Array  # cos of G_{k-1}
    s1: jax.Array  # sin of G_{k-1}
    c2: jax.Array  # cos of G_{k-2}
    s2: jax.Array  # sin of G_{k-2}
    normr: jax.Array
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def linsolve_minres(
    op: LinearOperator,
    b: PyTree,
    x0: PyTree,
    a0,
    a1,
    alg: MINRES,
    space: VectorSpace = STANDARD,
):
    cdt = probe_dtype(op, b)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)

    def shifted(x):
        return apply_shifted(op, x, a0, a1)

    x0 = jax.tree_util.tree_map(lambda l: l.astype(cdt), x0)
    r0 = jax.tree_util.tree_map(
        lambda l: l.astype(cdt), add(b, shifted(x0), a=-1)
    )
    beta1 = space.norm(r0)
    safe_b1 = jnp.where(beta1 > 0, beta1, 1)
    v1 = scale(r0, (1 / safe_b1).astype(cdt))
    one = jnp.ones((), rdt)
    zero = jnp.zeros((), rdt)
    st0 = _State(
        x=x0,
        v=v1,
        v_prev=zerovector(v1),
        d=zerovector(v1),
        d_prev=zerovector(v1),
        beta=zero,  # β_1-entering = 0 (no v_0 term)
        eta=beta1,
        c1=one,
        s1=zero,
        c2=one,
        s2=zero,
        normr=beta1,
        numiter=jnp.int32(0),
        numops=jnp.int32(1),
        done=beta1 <= tol,
    )

    def body(st: _State) -> _State:
        w = shifted(st.v)
        w = add(w, st.v_prev, a=-st.beta.astype(cdt))
        alpha = jnp.real(space.inner(st.v, w))  # Hermitian → real
        w = add(w, st.v, a=-alpha.astype(cdt))
        beta_next = space.norm(w)
        safe = jnp.where(beta_next > 0, beta_next, 1)
        v_next = scale(w, (1 / safe).astype(cdt))

        # QR update: rotate new T column (β_k, α_k, β_{k+1}) by G_{k-2}, G_{k-1}
        eps_k = st.s2 * st.beta
        t = st.c2 * st.beta
        delta = st.c1 * t + st.s1 * alpha
        gamma_hat = -st.s1 * t + st.c1 * alpha
        gamma = jnp.sqrt(gamma_hat**2 + beta_next**2)
        safe_g = jnp.where(gamma > 0, gamma, 1)
        c_new = jnp.where(gamma > 0, gamma_hat / safe_g, one)
        s_new = jnp.where(gamma > 0, beta_next / safe_g, zero)

        tau = c_new * st.eta
        eta_next = -s_new * st.eta

        # direction: d_k = (v_k − δ d_{k-1} − ε d_{k-2}) / γ
        dk = add(add(st.v, st.d, a=-delta.astype(cdt)), st.d_prev,
                 a=-eps_k.astype(cdt))
        dk = scale(dk, (1 / safe_g).astype(cdt))
        x = add(st.x, dk, a=tau.astype(cdt))
        normr = jnp.abs(eta_next)
        numiter = st.numiter + 1
        numops = st.numops + 1

        # true-residual verification on apparent convergence
        def verify(args):
            x, numops = args
            rt = add(b, shifted(x), a=-1)
            return space.norm(rt), numops + 1

        def keep(args):
            x, numops = args
            return normr, numops

        conv = normr <= tol
        normr, numops = jax.lax.cond(conv, verify, keep, (x, numops))
        lucky = beta_next <= jnp.finfo(rdt).eps * beta1  # invariant subspace
        done = jnp.logical_or(
            normr <= tol, jnp.logical_or(numiter >= alg.maxiter, lucky)
        )
        return _State(
            x, v_next, st.v, dk, st.d, beta_next, eta_next,
            c_new, s_new, st.c1, st.s1, normr, numiter, numops, done,
        )

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), body, st0)
    conv_ = (st.normr <= tol).astype(jnp.int32)
    log_if(
        alg.verbosity, STARTSTOP,
        "MINRES linsolve finished after {it} iterations: converged = {c}, "
        "normres = {nr}", it=st.numiter, c=conv_, nr=st.normr,
    )
    warn_if(
        alg.verbosity, conv_ == 0,
        "MINRES linsolve stopped without converging after {it} iterations: "
        "normres = {nr}", it=st.numiter, nr=st.normr,
    )
    r_final = add(b, shifted(st.x), a=-1)
    info = ConvergenceInfo(
        converged=(st.normr <= tol).astype(jnp.int32),
        residual=r_final,
        normres=st.normr,
        numiter=st.numiter,
        numops=st.numops + 1,
    )
    return st.x, info
