"""φ-function exponential integrator and ``exponentiate``, fully jitted.

Computes ``y = φ₀(tA)u₀ + t·φ₁(tA)u₁ + … + tᵖ·φ_p(tA)u_p`` — the solution of
``ẋ = A x + Σⱼ tʲ/j! u_{j+1}`` at time ``t`` — via the augmented-matrix trick
``exp([[Δτ·H, e₁, 0], [0, J_p]])`` on the Krylov projection, with adaptive
substepping.  Mirrors the reference driver ``src/matrixfun/expintegrator.jl``:

* augmented matrix (``:196-202``): ``H_aug[0, K] = 1``, superdiagonal ones in
  the trailing ``p×p`` Jordan block;
* error model ``ϵ = |Δτᵖ · β · normres · expH[K-1, K+p]|`` and step controller
  with safety factors ``δ=1.2``(implicit), ``γ=0.8`` and order estimate ``q``
  (``:203-221``);
* eager/small-residual early completion for the remaining interval (``:237-258``);
* ``t = Inf`` fixed-point mode (``:127-135``): ``Δτ`` free-runs and the loop
  terminates at ``maxiter`` or when the inhomogeneity residual vanishes;
* Krylov subspace per hermiticity (``:170-175``): a ``Lanczos`` algorithm uses
  the Hermitian 3-term/fused-CGS recurrence (one fewer basis pass per step;
  the Rayleigh quotient is then reconstructed from H's lower triangle), an
  ``Arnoldi`` algorithm the general expansion.

Everything is one ``lax.while_loop``: the augmented exponential is evaluated on
the static ``(krylovdim+p+1)²`` buffer with the active block embedded
(``dense.expm_active``), so the adaptive-Δτ inner loop runs entirely on device.

``t`` must be a concrete (host) number: its sign, finiteness and magnitude shape
the compiled program.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms import Arnoldi, KrylovDefaults, Lanczos
from ..factorizations import krylov as kf
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator, as_operator, probe_dtype
from ..ops.vector import STANDARD, VectorSpace, add, scale, zerovector

PyTree = Any

__all__ = ["expintegrator", "exponentiate"]


class _State(NamedTuple):
    fact: kf.KrylovState
    w: Tuple  # (w₀, w₁, …, w_p): tuple of p+1 pytrees; w[p] is rebuilt per cycle
    wp1: PyTree  # w[p+1] — the Krylov starting vector of the current cycle
    beta: jax.Array  # ‖w[p+1]‖ at cycle start
    tau0: jax.Array  # time reached
    dtau: jax.Array  # current step size
    dtaumin: jax.Array
    totalerr: jax.Array
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array
    fixedpt: jax.Array  # converged to fixed point (t=Inf, p==1 path)
    sc: kf.FusedScales  # basis bookkeeping (identity unless fused expansion)


def _build_aug(H, K, p, coeff, m1p):
    """Augmented matrix ``[[coeff·H_active, e₁ e_{K}ᵀ, J], …]`` on the static
    ``(m+p+1, m+p+1)`` buffer (reference ``src/matrixfun/expintegrator.jl:196-202``)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1p, m1p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1p, m1p), 1)
    m1 = H.shape[0]
    Hpad = jnp.zeros((m1p, m1p), H.dtype).at[:m1, :m1].set(H)
    M = jnp.where((rows < K) & (cols < K), coeff * Hpad, 0)
    # H_aug[0, K] = 1
    M = M + (jnp.equal(rows, 0) & jnp.equal(cols, K)).astype(M.dtype)
    # superdiagonal ones rows K..K+p-1
    M = M + ((cols == rows + 1) & (rows >= K) & (rows <= K + p - 1)).astype(M.dtype)
    return M


def _phi_step(H, K, p, sgn_dtau, beta, normres, m1p, eta_dt):
    """Evaluate the augmented exponential for step ``Δτ`` (inside ``sgn_dtau``);
    returns ``(expH, ϵ, ω)`` with the reference's error model."""
    from .. import dense

    M = _build_aug(H, K, p, sgn_dtau, m1p)
    expH = dense.expm_active(M, K + p + 1)
    Km1 = jnp.maximum(K - 1, 0)
    corr = jax.lax.dynamic_index_in_dim(
        jax.lax.dynamic_index_in_dim(expH, Km1, 0, keepdims=False),
        K + p,
        0,
        keepdims=False,
    )
    dtau_abs = jnp.abs(sgn_dtau)
    eps_ = jnp.abs(dtau_abs**p * beta * normres * corr)
    omega = eps_ / (eta_dt * dtau_abs)
    return expH, eps_, omega


def expintegrator(
    A,
    t,
    u,
    *more_u,
    alg=None,
    space: VectorSpace = STANDARD,
    ishermitian: Optional[bool] = None,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    eager: Optional[bool] = None,
    verbosity: Optional[int] = None,
):
    """``y, info = expintegrator(A, t, (u₀, u₁, …))`` (reference
    ``src/matrixfun/expintegrator.jl:94-101``).  ``info.normres`` is the
    accumulated error estimate; ``info.residual`` is ``None``."""
    if more_u:
        u = (u,) + more_u
    if not isinstance(u, tuple):
        u = (u,)
    op = as_operator(A)
    if alg is None:
        herm = ishermitian
        if herm is None:
            from .eigsolve import _is_concrete, _probe_hermitian

            herm = _probe_hermitian(A) if _is_concrete(A) else False
        cls = Lanczos if herm else Arnoldi
        kw = dict(
            tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
            eager=eager, verbosity=verbosity,
        )
        alg = cls(**{k: v for k, v in kw.items() if v is not None})
    elif tol is not None and alg.tol != tol:
        alg = dataclasses.replace(alg, tol=tol)
    t = complex(t) if isinstance(t, complex) or np.iscomplexobj(t) else float(t)
    return _expintegrator_core(op, t, u, alg, space)


def exponentiate(A, t, v, **kw):
    """``y ≈ exp(t·A)·v`` (reference ``src/matrixfun/exponentiate.jl:83-84`` —
    a thin wrapper over ``expintegrator`` with a single vector)."""
    return expintegrator(A, t, (v,), **kw)


@partial(jax.jit, static_argnames=("t", "alg", "space"))
def _expintegrator_core(op: LinearOperator, t, u: Tuple, alg, space):
    if len(u) == 1:
        u = (u[0], zerovector(u[0]))
    p = len(u) - 1
    m = alg.krylovdim
    m1p = m + p + 1

    cdt = probe_dtype(op, u[0])
    if isinstance(t, complex) and t.imag != 0:
        cdt = jnp.result_type(cdt, jnp.complex64)
    rdt = jnp.finfo(cdt).dtype
    u = tuple(jax.tree_util.tree_map(lambda l: l.astype(cdt), ui) for ui in u)
    eta = jnp.asarray(alg.tol, rdt)

    # time-step parameters (t concrete ⇒ static structure)
    if isinstance(t, complex):
        tau_f = abs(t)
        sgn = t / tau_f if tau_f > 0 else 1.0
    else:
        tau_f = abs(t)
        sgn = math.copysign(1.0, t) if t != 0 else 1.0
    finite = math.isfinite(tau_f)
    tau = jnp.asarray(tau_f if finite else jnp.inf, rdt)
    sgn = jnp.asarray(sgn, cdt)
    if finite:
        dtau0 = tau
        dtaumin0 = tau / alg.maxiter
        maxerr = tau * eta
    else:
        dtau0 = jnp.ones((), rdt)
        dtaumin0 = jnp.zeros((), rdt)
        maxerr = eta

    def build_w(w0, tau0, numops):
        """w[j+1] = A w[j] + Σ_l u[j+l+1]·(sgn·τ₀)ˡ/l!  for j = 0..p-1
        (reference ``:144-158``, ``:289-301``); returns (w tuple, w_{p+1}, ops)."""
        w = [w0]
        for j in range(p):
            wj1 = op.normal(w[j])
            numops = numops + 1
            lfac = 1.0
            for l in range(p - j):
                coef = jnp.asarray(sgn, cdt) ** l * (tau0.astype(cdt) ** l) / lfac
                wj1 = add(wj1, u[j + l + 1], a=coef)
                lfac *= l + 1
            w.append(wj1)
        return tuple(w[: p + 1]), w[p], numops

    w0 = u[0]
    wtuple, wp1, numops0 = build_w(w0, jnp.zeros((), rdt), jnp.int32(0))
    beta0 = space.norm(wp1)

    fact0 = kf.initialize(wp1, m, cdt, space, vec_dtype=cdt)
    # one-stream fused expansion (ops/pallas_fused_lanczos.py): Hermitian
    # Lanczos subspaces of real f32 stencil operators under plain cgs
    from ..ops import orthonormal as on

    dgks = (
        type(alg.orth) is on.ClassicalGramSchmidt2 and 2 * (m + 1) + 2 <= 128
    )
    fused = (
        isinstance(alg, Lanczos)
        and not alg.eager
        and (type(alg.orth) is on.ClassicalGramSchmidt or dgks)
        and cdt == jnp.float32
        and kf.fused_available(op, u[0], space, kmax=m + 1)
    )
    st0 = _State(
        fact=fact0,
        w=wtuple,
        wp1=wp1,
        beta=beta0,
        tau0=jnp.zeros((), rdt),
        dtau=dtau0,
        dtaumin=dtaumin0,
        totalerr=jnp.zeros((), rdt),
        numiter=jnp.int32(1),
        numops=numops0,
        done=jnp.asarray(False),
        fixedpt=jnp.asarray(False),
        sc=kf.fused_scales_init(m + 1),
    )
    # immediate fixed-point detection (reference :127-135); the reference
    # reports numiter = 0 on this exit (":163: ConvergenceInfo(1, …, 0, numops)")
    if p == 1:
        st0 = st0._replace(
            done=beta0 < eta, fixedpt=beta0 < eta,
            numiter=jnp.where(beta0 < eta, jnp.int32(0), jnp.int32(1)),
        )

    def take_step(st, expH, dtau_eff, eps_):
        """Advance w₀ and rebuild nothing yet (reference ``:224-240``)."""
        fact = st.fact
        K = fact.k
        w0 = st.w[0]
        jfac = 1.0
        sgn_dt = sgn * dtau_eff.astype(cdt)
        for j in range(1, p):
            w0 = add(w0, st.w[j], a=(sgn_dt**j) / jfac)
            jfac *= j + 1
        # w_{p+1} ← V·expH[0:K, K+p-1] + residual·expH[K-1, K+p]
        colidx = K + p - 1
        col = jax.lax.dynamic_slice(
            expH, (jnp.int32(0), jnp.asarray(colidx, jnp.int32)), (m1p, 1)
        )[:, 0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (m1p,), 0)
        col = jnp.where(rows < K, col, 0)
        Km1 = jnp.maximum(K - 1, 0)
        corr = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(expH, Km1, 0, keepdims=False),
            K + p,
            0,
            keepdims=False,
        )
        # fused expansion stores rows unnormalized (v_j = Σ_i L[i,j]·row_i):
        # fold L into the unprojection coefficients, and fold the residual
        # correction corr·β·v_K into the SAME unproject (one basis pass)
        LK = jax.lax.dynamic_slice(
            st.sc.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)),
            (m + 1, 1),
        )[:, 0]
        colm = kf.fold_scales(st.sc, col[: m + 1].astype(cdt))
        colm = colm + (corr * fact.beta.astype(cdt)) * LK.astype(cdt)
        wp1 = bs.unproject(fact.V, colm)  # K ≤ m < m+1: no truncation loss
        w0 = add(w0, wp1, a=st.beta.astype(cdt) * sgn_dt**p)
        wnew = (w0,) + st.w[1:]
        return st._replace(
            w=wnew, totalerr=st.totalerr + eps_,
        )

    def outer_body(st: _State) -> _State:
        fact, numops = st.fact, st.numops

        # --- expand to krylovdim (or breakdown / eager) ---
        def inner_cond(c):
            fact, numops = c
            go = jnp.logical_and(fact.k < m, fact.beta > jnp.finfo(rdt).eps)
            # stop early once the factorization residual covers the remaining
            # interval's error budget (reference :237)
            resid_small = fact.beta <= (tau - st.tau0) * eta
            go = jnp.logical_and(go, jnp.logical_not(resid_small))
            if alg.eager:
                go = jnp.logical_and(go, fact.k < 1)
            return go

        def expand_one(c):
            fact, numops = c
            if isinstance(alg, Lanczos):
                # Hermitian: 3-term/fused-CGS recurrence — one fewer basis
                # pass per step than the generic expansion (the reference
                # uses lanczosrecurrence here, src/matrixfun/expintegrator.jl:
                # 170-175); H then carries only the LOWER triangle
                fact = kf.expand_hermitian(
                    op.normal, fact, alg.orth, space, verbosity=alg.verbosity
                )
            else:
                fact = kf.expand(op.normal, fact, alg.orth, space, alg.verbosity)
            return fact, numops + 1

        def _Heff(H):
            # Hermitian path: reconstruct the Rayleigh quotient from the
            # lower triangle (expand_hermitian writes only (alpha, beta))
            if isinstance(alg, Lanczos):
                L = jnp.tril(H)
                return L + jnp.tril(H, -1).conj().T
            return H

        can = jnp.logical_and(fact.k < m, fact.beta > 0)
        if fused:
            # the unfused pair below runs while beta > max(eps, (τ−τ₀)·η)
            # (both loop-exit tests are lower bounds on β) — pass that
            # combined threshold as the fused loop's breakdown tolerance
            btol_eff = jnp.maximum(
                jnp.asarray(jnp.finfo(rdt).eps, rdt), (tau - st.tau0) * eta
            )

            def run_fused(c):
                fact, sc, numops = c
                # min_one: after a REJECTED partial attempt the loop re-enters
                # with β ≤ btol_eff and an unnormalized last row; the
                # reference still expands one step per outer iteration
                # (src/matrixfun/expintegrator.jl:285-287) — without it the
                # outer loop would livelock on the rejected state
                fact, sc, dops = kf.fused_expansions(
                    op, fact, sc, m, btol_eff, space,
                    verbosity=alg.verbosity, hermitian=True, min_one=True,
                    dgks=dgks,
                )
                return fact, sc, numops + dops

            fact, sc, numops = jax.lax.cond(
                can, run_fused, lambda c: c, (fact, st.sc, numops)
            )
            st = st._replace(fact=fact, numops=numops, sc=sc)
        else:
            fact, numops = jax.lax.cond(
                can, expand_one, lambda c: c, (fact, numops)
            )
            fact, numops = jax.lax.while_loop(
                inner_cond, expand_one, (fact, numops)
            )
            st = st._replace(fact=fact, numops=numops)

        K = fact.k
        # "complete": subspace at capacity OR invariant (breakdown) — in the
        # latter case the projected exponential is exact and the adaptive-step
        # branch applies just as well (reference reaches the same through its
        # β < η fixed-point checks)
        complete = jnp.logical_or(K >= m, fact.beta <= jnp.finfo(rdt).eps)

        # --- branch 1: full subspace, adaptive Δτ (reference :178-236) ---
        def process_full(st):
            fact = st.fact
            atmax = st.numiter >= alg.maxiter
            dtau = jnp.where(atmax, tau - st.tau0, jnp.minimum(st.dtau, tau - st.tau0))
            dtaumin = jnp.where(
                jnp.logical_not(atmax) & jnp.isfinite(tau),
                (tau - st.tau0) / jnp.maximum(alg.maxiter - st.numiter + 1, 1),
                st.dtaumin,
            )

            def trial(dt):
                return _phi_step(
                    _Heff(fact.H), fact.k, p, sgn * dt.astype(cdt), st.beta, fact.beta,
                    m1p, eta,
                )

            expH, eps_, omega = trial(dtau)
            q0 = fact.k.astype(rdt) / 2

            def shrink_cond(c):
                dtau, eps_, omega, q, expH, it = c
                return (
                    (st.numiter < alg.maxiter)
                    & (omega >= 1.0)
                    & (dtau > dtaumin)
                    & (it < 64)
                )

            def shrink_body(c):
                dtau, eps_prev, omega, q, expH, it = c
                dtau_prev = dtau
                dtau = jnp.maximum(
                    dtau * (0.8 / omega) ** (1 / (q + 1)), dtaumin
                )
                expH, eps_, omega = trial(dtau)
                q = jnp.maximum(
                    jnp.zeros((), rdt),
                    jnp.log(eps_ / eps_prev) / jnp.log(dtau / dtau_prev) - 1,
                )
                return dtau, eps_, omega, q, expH, it + 1

            dtau, eps_, omega, q, expH, _ = jax.lax.while_loop(
                shrink_cond, shrink_body,
                (dtau, eps_, omega, q0, expH, jnp.int32(0)),
            )
            tau0 = jnp.where(st.numiter < alg.maxiter, st.tau0 + dtau, tau)
            st2 = take_step(st._replace(dtau=dtau, dtaumin=dtaumin), expH, dtau, eps_)
            # grow Δτ for the next cycle (growth capped so an exact step
            # (ω = 0) cannot push Δτ to Inf and poison the next cycle)
            growth = jnp.minimum((0.8 / jnp.maximum(omega, 1e-12)) ** (1 / (q + 1)), 1e3)
            dtau_next = jnp.where(omega < 0.8, dtau * growth, dtau)
            return st2._replace(tau0=tau0, dtau=dtau_next, dtaumin=dtaumin)

        # --- branch 2: partial subspace, attempt remaining interval (:237-258) ---
        def process_partial(st):
            fact = st.fact
            dt = tau - st.tau0
            resid_small = fact.beta <= dt * eta
            do = jnp.logical_or(resid_small, bool(alg.eager))

            def attempt(st):
                expH, eps_, omega = _phi_step(
                    _Heff(fact.H), fact.k, p, sgn * dt.astype(cdt), st.beta, fact.beta,
                    m1p, eta,
                )
                ok = omega < 1.0

                def accept(st):
                    st2 = take_step(st, expH, dt, eps_)
                    return st2._replace(tau0=tau)

                return jax.lax.cond(ok, accept, lambda s: s, st)

            return jax.lax.cond(do, attempt, lambda s: s, st)

        st = jax.lax.cond(complete, process_full, process_partial, st)

        # --- termination ---
        finished = st.tau0 >= tau
        st = st._replace(done=finished)

        # --- restart if not finished and subspace full ---
        def restart(st):
            w0 = st.w[0]
            wnew, wp1, numops = build_w(w0, st.tau0, st.numops)
            beta = space.norm(wp1)
            fixed = jnp.asarray(False)
            if p == 1:
                fixed = beta < eta
            fact = kf.initialize(wp1, m, cdt, space, vec_dtype=cdt)
            # a fixed point detected here exits BEFORE the reference increments
            # numiter (src/matrixfun/expintegrator.jl:299-304 returns, :319 is
            # the increment) — report the pre-restart iteration count
            return st._replace(
                fact=fact, w=wnew, wp1=wp1, beta=beta,
                numiter=jnp.where(fixed, st.numiter, st.numiter + 1),
                numops=numops,
                done=st.done | fixed, fixedpt=fixed,
                sc=kf.fused_scales_init(m + 1),
            )

        need_restart = jnp.logical_not(finished) & complete
        st = jax.lax.cond(need_restart, restart, lambda s: s, st)
        return st

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    log_if(
        alg.verbosity, STARTSTOP,
        "expintegrate finished after {it} iterations: total error = {err}, "
        "numops = {no}", it=st.numiter, err=st.totalerr, no=st.numops,
    )
    warn_if(
        alg.verbosity,
        jnp.logical_not(st.fixedpt) & (st.totalerr > maxerr),
        "expintegrate did not reach sufficiently small error after {it} "
        "iterations: total error = {err}", it=st.numiter, err=st.totalerr,
    )

    converged = jnp.where(
        st.fixedpt | (st.totalerr <= maxerr), jnp.int32(1), jnp.int32(0)
    )
    info = ConvergenceInfo(
        converged=converged,
        residual=None,
        normres=jnp.where(st.fixedpt, st.beta, st.totalerr),
        numiter=st.numiter,
        numops=st.numops,
    )
    return st.w[0], info
