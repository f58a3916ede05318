"""Partial SVD via GKL bidiagonalization with Krylov-Schur thick restart.

Mirrors the reference driver (``src/eigsolve/svdsolve.jl``): GKL expansion, SVD
of the projected matrix (on device, ``dense.svd_active`` — the reference's LAPACK
``bdsqr``, ``src/dense/linalg.jl:123-130``), convergence on ``|β·Q[k-1, i]|``
(``src/eigsolve/svdsolve.jl:198-210``), and thick restart keeping
``(3·krylovdim + 2·nconv) ÷ 5`` triplets.  The restart writes a broken-arrow
projected matrix (see ``factorizations/gkl.py``) instead of restoring lower
bidiagonal form with double Householder sweeps
(``src/eigsolve/svdsolve.jl:231-274``): one GEMM per basis, no small-matrix
bookkeeping.

``which`` ∈ {"LR", "SR"} — largest/smallest singular values (the reference
errors on anything else, ``src/eigsolve/svdsolve.jl:137-142``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import dense
from ..algorithms import GKL, KrylovDefaults
from ..factorizations import gkl as gf
from ..info import ConvergenceInfo, EACHITERATION, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator, as_operator, probe_dtype
from ..ops.vector import REAL, STANDARD, VectorSpace

PyTree = Any

__all__ = ["svdsolve", "realsvdsolve", "svdsolve_gkl"]


class _LoopState(NamedTuple):
    fact: gf.GKLState
    numiter: jax.Array
    numops: jax.Array
    nconv: jax.Array
    svals: jax.Array  # (m+1,) sorted singular values
    P: jax.Array  # (m+1, m+1) sorted left singular vectors of projected B
    Q: jax.Array  # (m+1, m+1) sorted right singular vectors of projected B
    resnorms: jax.Array
    done: jax.Array
    scU: Any  # codomain basis bookkeeping (identity unless fused kernels)
    scV: Any  # domain basis bookkeeping


def _process(B, k, beta, which, tol):
    m1 = B.shape[0]
    s, P, Vh, valid = dense.svd_active(B, k)
    Q = Vh.conj().T
    perm = dense.sort_perm(s.astype(jnp.result_type(s.dtype, jnp.float32)), valid, which)
    s = s[perm]
    P = P[:, perm]
    Q = Q[:, perm]
    valid = valid[perm]
    lastrow = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(k - 1, 0), 0, keepdims=False)
    res = jnp.abs(beta * lastrow)
    res = jnp.where(valid, res, jnp.inf)
    flags = res <= tol
    nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32)))
    return nconv.astype(jnp.int32), s, P, Q, res


def _restart(fact: gf.GKLState, svals, P, Q, beta, keep, keep_max: int,
             gate=None, scales=None):
    """Thick restart to broken-arrow form of size ``keep``:
    ``A Ṽ = Ũ Σ + β u_k Q[k-1, :]`` (see factorizations/gkl.py docstring).

    With ``gate`` the restart is MASKED instead of wrapped in ``lax.cond``
    (identity rotations when gated off — bit-exact), keeping both big bases
    out of cond branch outputs; ``keep_max`` is the static bound on ``keep``
    so only the surviving rows are written (``bs.transform_partial``).
    Mirrors ``lanczos._restart``."""
    U, V, B, k, _ = fact
    m1 = B.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    keepmask = (cols < keep) & (rows < k)
    eye = jnp.eye(m1, dtype=P.dtype)
    # domain basis: kept right singular vectors
    Qkeep = jnp.where(keepmask, Q, 0)
    if scales is not None:
        # fused-kernel mode: stored rows are raw with true basis
        # v_j = Σ_i L[i,j]·row_i — rotations act as L·Q / L·P (lanczos.py)
        Qkeep = jnp.matmul(
            scales[1].astype(Q.dtype), Qkeep,
            precision=jax.lax.Precision.HIGHEST,
        )
    if gate is not None:
        Qkeep = jnp.where(gate, Qkeep, eye)
    Vnew = bs.transform_partial(V, Qkeep, keep_max + 1)
    # codomain basis: kept left singular vectors + old residual u_k at slot keep
    Pkeep = jnp.where(keepmask, P, 0)
    Pkeep = Pkeep + jax.nn.one_hot(k, m1, dtype=P.dtype)[:, None] * jax.nn.one_hot(
        keep, m1, dtype=P.dtype
    )[None, :]
    if scales is not None:
        Pkeep = jnp.matmul(
            scales[0].astype(P.dtype), Pkeep,
            precision=jax.lax.Precision.HIGHEST,
        )
    if gate is not None:
        Pkeep = jnp.where(gate, Pkeep, eye)
    Unew = bs.transform_partial(U, Pkeep, keep_max + 1)
    # projected matrix: diag(σ[:keep]) + spike row at ``keep``
    didx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    diag = jnp.where(didx < keep, svals.astype(B.dtype), 0)
    lastrow = jax.lax.dynamic_index_in_dim(Q, jnp.maximum(k - 1, 0), 0, keepdims=False)
    spike = jnp.where(didx < keep, (beta * lastrow).astype(B.dtype), 0)
    Bnew = jnp.diag(diag) + jax.nn.one_hot(keep, m1, dtype=B.dtype)[:, None] * spike[
        None, :
    ]
    k_new = keep.astype(jnp.int32)
    if gate is not None:
        Bnew = jnp.where(gate, Bnew, B)
        k_new = jnp.where(gate, k_new, jnp.asarray(k, jnp.int32))
    return gf.GKLState(Unew, Vnew, Bnew, k_new, beta)


def svdsolve_gkl(
    op,
    x0: PyTree,
    howmany: int,
    which,
    alg: GKL,
    space: VectorSpace = STANDARD,
):
    """Jit-compatible partial SVD: returns ``(vals, lvecs, rvecs, info)``.

    Reference: ``svdsolve`` GKL driver (``src/eigsolve/svdsolve.jl:144-314``).
    """
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    w = which.upper() if isinstance(which, str) else which
    if w not in ("LR", "SR"):
        raise ValueError(
            "svdsolve accepts which in ('LR', 'SR') — singular values are "
            "real nonnegative (reference src/eigsolve/svdsolve.jl:137-142)"
        )
    # x0 lives in the codomain: probe the scalar type through the adjoint
    from ..ops.vector import scalartype

    cdt = scalartype(jax.eval_shape(op.apply_adjoint, x0), x0)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

    fact0 = gf.initialize(op, x0, m, cdt, space, verbosity=alg.verbosity)
    m1 = m + 1
    from ..factorizations import krylov as kf
    from ..ops import orthonormal as on

    # fused one-stream GKL kernels (factorizations/gkl.py): square fusable
    # stencils, both cgs-family orthogonalizers (the kernel path always runs
    # the immediate scalar-space DGKS correction — cgs2 orthogonality)
    fused = (
        not alg.eager
        and type(alg.orth) in (on.ClassicalGramSchmidt,
                               on.ClassicalGramSchmidt2)
        and cdt == jnp.float32
        and gf.fused_kernel_available(op, x0, space, m1)
    )
    st0 = _LoopState(
        fact=fact0,
        numiter=jnp.int32(0),
        numops=jnp.int32(0),
        nconv=jnp.int32(0),
        svals=jnp.zeros((m1,), rdt),
        P=jnp.zeros((m1, m1), cdt),
        Q=jnp.zeros((m1, m1), cdt),
        resnorms=jnp.full((m1,), jnp.inf, rdt),
        done=jnp.asarray(False),
        scU=kf.fused_scales_init(m1),
        scV=kf.fused_scales_init(m1),
    )

    def expand_one(c):
        fact, numops, j = c
        fact = gf.expand(op, fact, alg.orth, space, alg.verbosity)
        return fact, numops + 2, j + 1

    def outer_body(st: _LoopState) -> _LoopState:
        fact, numops = st.fact, st.numops

        # single while_loop (do-while: ≥1 expansion if possible) — no leading
        # lax.cond, whose branch outputs would defensively copy BOTH basis
        # buffers every outer iteration (see lanczos.py)
        def inner_cond(c):
            fact, numops, j = c
            go = jnp.logical_and(fact.k < m, fact.beta > btol)
            if alg.eager:
                go = jnp.logical_and(
                    go, jnp.logical_or(j == 0, fact.k < max(howmany, 1))
                )
            return go

        if fused:
            fact, scU, scV, dops = gf.fused_expansions(
                op, fact, st.scU, st.scV, m, btol, space,
                verbosity=alg.verbosity,
            )
            numops = numops + dops
        else:
            scU, scV = st.scU, st.scV
            fact, numops, _ = jax.lax.while_loop(
                inner_cond, expand_one, (fact, numops, jnp.int32(0))
            )

        nconv, svals, P, Q, res = _process(fact.B, fact.k, fact.beta, which, tol)
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
        # static bound: restart implies nconv < howmany and k == m
        keep_max = min((3 * m + 2 * max(howmany - 1, 0)) // 5, m - 1)
        restart_now = jnp.logical_and(jnp.logical_not(done), fact.k >= m)
        if alg.eager:
            # eager processes every step — a masked always-run transform would
            # add two basis passes per expansion, so keep the cond here
            fact = jax.lax.cond(
                restart_now,
                lambda a: _restart(a[0], a[1], a[2], a[3], a[0].beta, keep, keep_max),
                lambda a: a[0],
                (fact, svals, P, Q),
            )
        else:
            # non-eager: every processing but the last restarts — run the
            # masked (gated) restart unconditionally, avoiding cond copies
            fact = _restart(
                fact, svals, P, Q, fact.beta, keep, keep_max,
                gate=restart_now,
                scales=(scU.L, scV.L) if fused else None,
            )
        # restart renormalizes both bases; the broken-arrow buffer seeds the
        # stored-row images of the fused mode (A V = U·B, Aᴴ U = V·Bᵀ exact)
        if fused:
            scU_f = kf.fused_scales_init(m1)._replace(
                Hs=jnp.real(fact.B).astype(jnp.float32).T
            )
            scV_f = kf.fused_scales_init(m1)._replace(
                Hs=jnp.real(fact.B).astype(jnp.float32)
            )
            scU = jax.tree_util.tree_map(
                lambda a, b: jnp.where(restart_now, a, b), scU_f, scU
            )
            scV = jax.tree_util.tree_map(
                lambda a, b: jnp.where(restart_now, a, b), scV_f, scV
            )
        return _LoopState(fact, numiter, numops, nconv, svals, P, Q, res,
                          done, scU, scV)

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    nconv_out = jnp.minimum(st.nconv, howmany)
    log_if(
        alg.verbosity, STARTSTOP,
        "GKL svdsolve finished after {it} iterations: {nc} values converged, "
        "normres = {nr}", it=st.numiter, nc=nconv_out, nr=st.resnorms[:howmany],
    )
    warn_if(
        alg.verbosity, nconv_out < howmany,
        "GKL svdsolve finished without convergence: {nc} of "
        f"{howmany}" + " values converged after {it} iterations",
        nc=nconv_out, it=st.numiter,
    )

    fact = st.fact
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    hm = (rows < fact.k) & (cols < howmany)
    from ..factorizations import krylov as kf

    Us = bs.transform(fact.U, kf.fold_scales(st.scU, jnp.where(hm, st.P, 0)))
    Vs = bs.transform(fact.V, kf.fold_scales(st.scV, jnp.where(hm, st.Q, 0)))
    lvecs = jax.tree_util.tree_map(lambda l: l[:howmany], Us)
    rvecs = jax.tree_util.tree_map(lambda l: l[:howmany], Vs)
    # residuals r_i = β·Q[k-1, i]·u_k  (A ṽ_i − σ_i ũ_i)
    lastrow = jax.lax.dynamic_index_in_dim(
        st.Q, jnp.maximum(fact.k - 1, 0), 0, keepdims=False
    )
    s = fact.beta * lastrow
    LUk = jax.lax.dynamic_slice(
        st.scU.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)), (m1, 1)
    )[:, 0]
    uk = bs.unproject_bucketed(fact.U, LUk.astype(cdt), fact.k + 1)
    residuals = jax.tree_util.tree_map(
        lambda l: s[:howmany].reshape((howmany,) + (1,) * l.ndim) * l[None], uk
    )
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=st.resnorms[:howmany],
        numiter=jnp.maximum(st.numiter, jnp.int32(1)),
        numops=st.numops,
    )
    return st.svals[:howmany], lvecs, rvecs, info


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space", "alg_rrule"))
def _svdsolve_core(op, x0, howmany, which, alg, space, alg_rrule=None):
    from ..ad.svdsolve import svdsolve_vjp

    return svdsolve_vjp(howmany, which, alg, alg_rrule, space, op, x0)


def _default_x0(A, x0):
    if x0 is not None:
        return x0
    if isinstance(A, (np.ndarray, jax.Array)) and getattr(A, "ndim", 0) == 2:
        # start in range(A): an out-of-range (left-null) component can never be
        # removed by the GKL recurrence and stalls :SR convergence (the
        # reference's tests start from A[:, 1] for the same reason,
        # test/svdsolve.jl:13)
        dt = jnp.asarray(A).dtype
        v = np.random.default_rng(42).standard_normal(A.shape[1])
        return jnp.asarray(np.asarray(A) @ v.astype(np.asarray(A).dtype)).astype(dt)
    raise ValueError("x0 is required unless the operator is a concrete matrix")


def svdsolve(
    A,
    x0: Optional[PyTree] = None,
    howmany: int = 1,
    which="LR",
    *,
    alg: Optional[GKL] = None,
    space: VectorSpace = STANDARD,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    eager: Optional[bool] = None,
    verbosity: Optional[int] = None,
    alg_rrule=None,
):
    """Find ``howmany`` extremal singular triplets of a linear map.

    Returns ``(vals, lvecs, rvecs, info)``; ``x0`` lives in the **codomain**
    (left side) of the map (reference ``svdsolve``,
    ``src/eigsolve/svdsolve.jl:1-142``).  Operators given as callables must
    provide an adjoint (``(f, fadjoint)`` tuple) or be a matrix; a bare callable
    gets its adjoint derived by linear transposition at trace time.
    """
    op = as_operator(A)
    x0 = _default_x0(A, x0)
    if op.adjoint is None:
        # bare callable: derive the adjoint by linear transposition; the domain
        # template is unknown, so this requires a square map (domain ≅ codomain)
        op = op.with_adjoint_from(x0)
    elif type(op) is LinearOperator:
        # user-supplied (f, fadjoint) pair: consistency guard at init
        # (reference src/factorizations/gkl.jl:192); derived/matrix adjoints
        # are exact by construction and skip the two probe applies
        from ..ops.operator import check_adjoint_compatibility

        check_adjoint_compatibility(op, x0)
    # Cap the Krylov dimension at the (static) domain dimension: beyond it the
    # domain sweep breaks down (α → 0) with nothing left to find.  The codomain
    # side needs no cap — β → 0 there is caught by the breakdown guard.
    dom = jax.eval_shape(op.apply_adjoint, x0)
    domain_dim = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(dom))
    if alg is None:
        kw = dict(
            tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
            eager=eager, verbosity=verbosity,
        )
        alg = GKL(**{k: v for k, v in kw.items() if v is not None})
    elif tol is not None and alg.tol != tol:
        alg = dataclasses.replace(alg, tol=tol)
    if alg.krylovdim > domain_dim:
        alg = dataclasses.replace(alg, krylovdim=domain_dim)
    return _svdsolve_core(op, x0, howmany, which, alg, space, alg_rrule)


def realsvdsolve(A, x0: Optional[PyTree] = None, howmany: int = 1, which="LR", **kw):
    """``svdsolve`` over the real inner product (R-linear maps on complex
    vectors; cf. reference ``reallssolve``/``RealVec`` machinery,
    ``src/KrylovKit.jl:243-256``)."""
    space = kw.pop("space", None)
    if space is None:
        space = REAL
    elif not space.real_inner:
        space = dataclasses.replace(space, real_inner=True)
    return svdsolve(A, x0, howmany, which, space=space, **kw)
