"""BiCGStab driver (reference ``src/linsolve/bicgstab.jl``), fully jitted.

Solves ``(a0 + a1·A) x = b`` for a general (non-Hermitian) operator with O(1)
vector storage.  Keeps the reference's robustness features:

* shadow residual ``r̃ = r₀`` fixed at the start of the solve;
* *both* the half step (after the BiCG α-update) and the full step (after the
  ω-update) check convergence, and each apparent convergence is verified against
  the freshly recomputed true residual ``b − (a0 + a1 A)x``
  (``src/linsolve/bicgstab.jl:139-155, 172-189``);
* breakdown guard: ``ρ ≈ 0`` or ``⟨r̃, v⟩ ≈ 0`` aborts the recurrence
  (``src/linsolve/bicgstab.jl:39-46``) — expressed here as a ``done`` flag with
  ``converged = 0``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..algorithms import BiCGStab
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops.operator import LinearOperator, apply_shifted, probe_dtype
from ..ops.vector import STANDARD, VectorSpace, add, zerovector

PyTree = Any

__all__ = ["linsolve_bicgstab"]


class _State(NamedTuple):
    x: PyTree
    r: PyTree
    p: PyTree
    v: PyTree
    rho: jax.Array
    alpha: jax.Array
    omega: jax.Array
    normr: jax.Array
    numiter: jax.Array
    numops: jax.Array
    breakdown: jax.Array
    done: jax.Array


def linsolve_bicgstab(
    op: LinearOperator,
    b: PyTree,
    x0: PyTree,
    a0,
    a1,
    alg: BiCGStab,
    space: VectorSpace = STANDARD,
):
    cdt = probe_dtype(op, b)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    eps_break = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** 2

    def shifted(x):
        return apply_shifted(op, x, a0, a1)

    def true_residual(x):
        return add(b, shifted(x), a=-1)

    x0 = jax.tree_util.tree_map(lambda l: l.astype(cdt), x0)
    r0 = jax.tree_util.tree_map(lambda l: l.astype(cdt), true_residual(x0))
    normr0 = space.norm(r0)
    rshadow = r0  # fixed shadow residual (bicgstab.jl:20)

    one = jnp.ones((), cdt)
    st0 = _State(
        x=x0,
        r=r0,
        p=zerovector(r0),
        v=zerovector(r0),
        rho=one,
        alpha=one,
        omega=one,
        normr=normr0,
        numiter=jnp.int32(0),
        numops=jnp.int32(1),
        breakdown=jnp.asarray(False),
        done=normr0 <= tol,
    )

    def body(st: _State) -> _State:
        rho_new = space.inner(rshadow, st.r)
        denom_w = jnp.where(jnp.abs(st.rho * st.omega) > 0, st.rho * st.omega, 1)
        beta = rho_new * st.alpha / denom_w  # β = (ρ_new/ρ)(α/ω)
        # p = r + β (p − ω v)
        p = add(st.r, add(st.p, st.v, a=-st.omega), a=beta)
        v = shifted(p)
        sigma = space.inner(rshadow, v)
        breakdown = jnp.logical_or(
            jnp.abs(rho_new) <= eps_break * normr0 * normr0,
            jnp.abs(sigma) <= eps_break * normr0 * normr0,
        )
        alpha = rho_new / jnp.where(jnp.abs(sigma) > 0, sigma, 1)
        # half step: s = r − α v, x_half = x + α p (bicgstab.jl:123-155)
        s = add(st.r, v, a=-alpha)
        norms = space.norm(s)
        numops = st.numops + 1

        def half_converged(args):
            x, s, numops = args
            xh = add(x, p, a=alpha)
            rt = true_residual(xh)
            return xh, rt, space.norm(rt), numops + 1

        def full_step(args):
            x, s, numops = args
            t = shifted(s)
            tt = jnp.real(space.inner(t, t))
            omega = space.inner(t, s) / jnp.where(tt > 0, tt, 1)
            xf = add(add(x, p, a=alpha), s, a=omega)
            r = add(s, t, a=-omega)
            normr = space.norm(r)

            def verify(args2):
                xf, r, numops = args2
                rt = true_residual(xf)
                return xf, rt, space.norm(rt), numops + 1

            def keep(args2):
                xf, r, numops = args2
                return xf, r, normr, numops

            return jax.lax.cond(
                normr <= tol, verify, keep, (xf, r, numops + 1)
            ) + (omega,)

        half_ok = norms <= tol

        def do_half(args):
            x, r, normr, numops = half_converged(args)
            return x, r, normr, numops, st.omega

        x, r, normr, numops, omega = jax.lax.cond(
            half_ok, do_half, lambda a: full_step(a), (st.x, s, numops)
        )
        numiter = st.numiter + 1
        done = jnp.logical_or(
            normr <= tol, jnp.logical_or(numiter >= alg.maxiter, breakdown)
        )
        return _State(
            x, r, p, v, rho_new, alpha, omega, normr, numiter, numops, breakdown, done
        )

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), body, st0)
    conv = (st.normr <= tol).astype(jnp.int32)
    log_if(
        alg.verbosity, STARTSTOP,
        "BiCGStab linsolve finished after {it} iterations: converged = {c}, "
        "normres = {nr}", it=st.numiter, c=conv, nr=st.normr,
    )
    warn_if(
        alg.verbosity, st.breakdown,
        "BiCGStab linsolve breakdown (rho or sigma ~ 0) after {it} iterations",
        it=st.numiter,
    )
    warn_if(
        alg.verbosity, (conv == 0) & jnp.logical_not(st.breakdown),
        "BiCGStab linsolve stopped without converging after {it} iterations: "
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
