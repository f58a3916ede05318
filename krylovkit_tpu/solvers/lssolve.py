"""Least-squares solver: LSMR on GKL bidiagonalization, fully jitted.

Mirrors the reference driver (``src/lssolve/lsmr.jl``): Fong & Saunders LSMR
with the double plane-rotation recurrence, Tikhonov regularization ``λ``
(rotation ``P̂``, ``src/lssolve/lsmr.jl:93-113``), optional re-orthogonalization
of each new ``v`` against a ``krylovdim``-deep ring buffer of previous vectors
(``src/lssolve/lsmr.jl:76-89``), and a running residual vector ``r`` maintained
through ``Ah̄`` updates (``src/lssolve/lsmr.jl:117-120``) — no extra operator
applications for the residual.

Convergence measure: ``‖Aᴴ(b − A x) − λ² x‖ = |ζ̄|`` (the gradient of the
regularized LS objective), reference ``src/lssolve/lsmr.jl:123-141``.

TPU notes: the ring buffer is a stacked basis (capacity ``krylovdim``); the
reorthogonalization sweep is one batched projection (GEMV + one ``psum``),
written at a rotating slot with ``dynamic_update_index``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms import LSMR, KrylovDefaults
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.operator import LinearOperator, as_operator
from ..ops.vector import REAL, STANDARD, VectorSpace, add, scale, scalartype, zerovector

PyTree = Any

__all__ = ["lssolve", "reallssolve", "lssolve_lsmr"]


class _State(NamedTuple):
    x: PyTree
    u: PyTree
    v: PyTree
    h: PyTree
    hbar: PyTree
    r: PyTree
    Ah: PyTree
    Ahbar: PyTree
    V: PyTree  # ring buffer of v's (capacity K)
    alpha: jax.Array
    beta: jax.Array
    alphabar: jax.Array
    zetabar: jax.Array
    rho: jax.Array
    theta: jax.Array
    rhobar: jax.Array
    cbar: jax.Array
    sbar: jax.Array
    normres: jax.Array  # |ζ̄|
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def lssolve_lsmr(
    op,
    b: PyTree,
    alg: LSMR,
    lam: float = 0.0,
    space: VectorSpace = STANDARD,
):
    """Returns ``(x, info)`` minimizing ``‖b − A x‖² + λ²‖x‖²``."""
    K = alg.krylovdim
    v0 = jax.eval_shape(op.apply_adjoint, b)
    cdt = scalartype(v0, b)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    lamr = jnp.asarray(lam, rdt)

    u = jax.tree_util.tree_map(lambda l: l.astype(cdt), b)
    beta = space.norm(u)
    safe_b = jnp.where(beta > 0, beta, 1)
    u = scale(u, (1 / safe_b).astype(cdt))
    v = op.apply_adjoint(u)
    alpha = space.norm(v)
    safe_a = jnp.where(alpha > 0, alpha, 1)
    v = scale(v, (1 / safe_a).astype(cdt))

    V = bs.alloc(v, K)
    V = bs.set(V, 0, v)

    one = jnp.ones((), rdt)
    zero = jnp.zeros((), rdt)
    zetabar0 = alpha * beta
    st0 = _State(
        x=zerovector(v),
        u=u,
        v=v,
        h=v,
        hbar=zerovector(v),
        r=scale(u, beta.astype(cdt)),
        Ah=zerovector(u),
        Ahbar=zerovector(u),
        V=V,
        alpha=alpha,
        beta=beta,
        alphabar=alpha,
        zetabar=zetabar0,
        rho=one,
        theta=zero,
        rhobar=one,
        cbar=one,
        sbar=zero,
        normres=jnp.abs(zetabar0),
        numiter=jnp.int32(0),
        numops=jnp.int32(1),
        done=jnp.abs(zetabar0) <= tol,
    )

    def body(st: _State) -> _State:
        numiter = st.numiter + 1
        Av = op.normal(st.v)
        numops = st.numops + 1
        # Ah_k = A v_k − (θ_k/ρ_{k−1}) Ah_{k−1}  (matches h update of last iter)
        coef_h = (st.theta / st.rho).astype(cdt)
        Ah = add(Av, st.Ah, a=-coef_h)

        # β_{k+1} u_{k+1} = A v_k − α_k u_k
        u = add(Av, st.u, a=-st.alpha.astype(cdt))
        beta = space.norm(u)
        bgood = beta > tol
        safe_b = jnp.where(bgood, beta, 1)
        u = jax.tree_util.tree_map(
            lambda l: jnp.where(bgood, l / safe_b.astype(l.dtype), l), u
        )

        # α_{k+1} v_{k+1} = Aᴴ u_{k+1} − β_{k+1} v_k  (+ ring reorthogonalization)
        def new_v(args):
            u, v_old, V, numops = args
            w = add(op.apply_adjoint(u), v_old, a=-beta.astype(cdt))
            if K > 1:
                w, _ = on.orthogonalize(
                    w, V, jnp.minimum(jnp.int32(K), numiter), alg.orth, space
                )
            a = space.norm(w)
            agood = a > tol
            safe_a = jnp.where(agood, a, 1)
            w = jax.tree_util.tree_map(
                lambda l: jnp.where(agood, l / safe_a.astype(l.dtype), l), w
            )
            Vn = bs.set(V, jnp.mod(numiter, K), w)
            Vn = jax.tree_util.tree_map(
                lambda ln, lo: jnp.where(agood, ln, lo), Vn, V
            )
            return w, a, Vn, numops + 1

        def keep_v(args):
            u, v_old, V, numops = args
            return v_old, zero, V, numops

        v, alpha, V, numops = jax.lax.cond(
            bgood, new_v, keep_v, (u, st.v, st.V, numops)
        )

        # rotation P̂ (λ-regularization)
        alphahat = jnp.hypot(st.alphabar, lamr)
        # rotation P: bidiagonal → R
        rho_old = st.rho
        rho = jnp.hypot(alphahat, beta)
        c = alphahat / rho
        s = beta / rho
        theta = s * alpha
        alphabar = c * alpha
        # rotation P̄: Rᵀ → R̄
        rhobar_old = st.rhobar
        thetabar = st.sbar * rho
        crho = st.cbar * rho
        rhobar = jnp.hypot(crho, theta)
        cbar = crho / rhobar
        sbar = theta / rhobar
        zeta = cbar * st.zetabar
        zetabar = -sbar * st.zetabar

        # vector updates
        coef1 = (thetabar * rho / (rho_old * rhobar_old)).astype(cdt)
        hbar = add(st.h, st.hbar, a=-coef1)
        Ahbar = add(Ah, st.Ahbar, a=-coef1)
        coef2 = (zeta / (rho * rhobar)).astype(cdt)
        x = add(st.x, hbar, a=coef2)
        r = add(st.r, Ahbar, a=-coef2)
        h = add(v, st.h, a=-(theta / rho).astype(cdt))

        normres = jnp.abs(zetabar)
        done = jnp.logical_or(normres <= tol, numiter >= alg.maxiter)
        return _State(
            x, u, v, h, hbar, r, Ah, Ahbar, V,
            alpha, beta, alphabar, zetabar, rho, theta, rhobar, cbar, sbar,
            normres, numiter, numops, done,
        )

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), body, st0)
    conv = (st.normres <= tol).astype(jnp.int32)
    log_if(
        alg.verbosity, STARTSTOP,
        "LSMR lssolve finished at iteration {it}: converged = {c}, "
        "|| A^H(b - A x) - lam^2 x || = {nr}",
        it=st.numiter, c=conv, nr=st.normres,
    )
    warn_if(
        alg.verbosity, conv == 0,
        "LSMR lssolve finished without converging after {it} iterations: "
        "normres = {nr}", it=st.numiter, nr=st.normres,
    )
    info = ConvergenceInfo(
        converged=(st.normres <= tol).astype(jnp.int32),
        residual=st.r,
        normres=st.normres,
        numiter=st.numiter,
        numops=st.numops,
    )
    return st.x, info


@partial(jax.jit, static_argnames=("alg", "space"))
def _lssolve_core(op, b, lam, alg, space):
    return lssolve_lsmr(op, b, alg, lam, space)


def lssolve(
    A,
    b: PyTree,
    lam: float = 0.0,
    *,
    alg: Optional[LSMR] = None,
    space: VectorSpace = STANDARD,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    verbosity: Optional[int] = None,
):
    """Least-squares solve ``min ‖b − A x‖`` (optionally ``+ λ²‖x‖²``).

    Returns ``(x, info)``; ``info.normres`` is the normal-equation residual
    ``‖Aᴴ(b − A x) − λ² x‖``.  Reference: ``lssolve``
    (``src/lssolve/lssolve.jl:101-110``), tolerance ``max(atol, rtol·‖b‖)``.
    """
    op = as_operator(A)
    if op.adjoint is None:
        op = op.with_adjoint_from(b)
    elif type(op) is LinearOperator:
        # user-supplied (f, fadjoint): GKL adjoint-consistency guard
        # (reference src/factorizations/gkl.jl:192) — eager inputs only
        from ..ops.operator import check_adjoint_compatibility

        check_adjoint_compatibility(op, b, space)
    if tol is None and alg is not None and atol is None and rtol is None:
        # an explicit algorithm carries its own tol (see linsolve front-end)
        tol = alg.tol
    if tol is None:
        a_ = KrylovDefaults.tol if atol is None else atol
        r_ = KrylovDefaults.tol if rtol is None else rtol
        leaves = jax.tree_util.tree_leaves(b)
        concrete = all(
            isinstance(l, (np.ndarray, jax.Array)) and not isinstance(l, jax.core.Tracer)
            for l in leaves
        )
        if r_ != 0 and concrete:
            nb = float(np.sqrt(sum(float(np.sum(np.abs(np.asarray(l)) ** 2)) for l in leaves)))
            tol = max(float(a_), float(r_) * nb)
        else:
            tol = float(a_)
    if alg is None:
        kw = dict(
            tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
            verbosity=verbosity,
        )
        alg = LSMR(**{k: v for k, v in kw.items() if v is not None})
    elif alg.tol != tol:
        alg = dataclasses.replace(alg, tol=tol)
    return _lssolve_core(op, b, jnp.asarray(lam), alg, space)


def reallssolve(A, b: PyTree, lam: float = 0.0, **kw):
    """``lssolve`` over the real inner product, for R-linear maps on complex
    vectors (reference ``reallssolve``, ``src/lssolve/lssolve.jl:190-197``)."""
    space = kw.pop("space", None)
    if space is None:
        space = REAL
    elif not space.real_inner:
        space = dataclasses.replace(space, real_inner=True)
    return lssolve(A, b, lam, space=space, **kw)
