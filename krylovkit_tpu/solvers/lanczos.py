"""Hermitian eigsolve driver: Lanczos with thick restart, fully jitted.

Mirrors the reference's Krylov-Schur loop (``src/eigsolve/lanczos.jl``):

    expand to krylovdim (or breakdown / eager check)
      → dense eig of projected matrix (on device, ``dense.eigh_active``)
      → sort by `which`, count leading converged via |β·U[k-1, i]| ≤ tol
      → thick restart: keep = (3·krylovdim + 2·nconv) ÷ 5 Ritz vectors
        (reference keep rule, src/eigsolve/lanczos.jl:86), one basis GEMM,
        arrowhead projected matrix (see factorizations/krylov.py)

as a single ``lax.while_loop`` nest — no host round-trips inside the solve.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .. import dense
from ..algorithms import Lanczos
from ..factorizations import krylov as kf
from ..info import ConvergenceInfo, EACHITERATION, STARTSTOP, WARN, log_if, warn_if
from ..ops import basis as bs
from ..ops.operator import LinearOperator
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any

__all__ = ["eigsolve_lanczos"]


class _LoopState(NamedTuple):
    fact: kf.KrylovState
    numiter: jax.Array
    numops: jax.Array
    nconv: jax.Array
    vals: jax.Array  # (m+1,) sorted Ritz values (real)
    U: jax.Array  # (m+1, m+1) sorted Ritz coefficient vectors
    resnorms: jax.Array  # (m+1,) sorted Ritz residual norms
    done: jax.Array
    sc: kf.FusedScales  # basis bookkeeping (identity unless fused expansion)


def _process(H, k, beta, which, tol, howmany):
    """Projected eig + sort + convergence count.  Returns (nconv, vals, U, res).

    The Hermitian Rayleigh quotient is reconstructed from the *lower triangle*
    of the buffer: the 3-term expansion (``kf.expand_hermitian``) writes only
    ``(α, β)`` per column (no superdiagonal), while restarts write both
    triangles — the lower triangle is always complete."""
    m1 = H.shape[0]
    L = jnp.tril(H)
    T = L + jnp.tril(H, -1).conj().T
    w, U, valid = dense.eigh_active(T, k)
    perm = dense.sort_perm(w, valid, which)
    w = w[perm]
    U = U[:, perm]
    valid = valid[perm]
    # Ritz residual: |β · U[k-1, i]| (last active row of the eigvec matrix)
    lastrow = jax.lax.dynamic_index_in_dim(U, jnp.maximum(k - 1, 0), 0, keepdims=False)
    res = jnp.abs(beta * lastrow)
    res = jnp.where(valid, res, jnp.inf)
    flags = res <= tol
    nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32)))
    return nconv.astype(jnp.int32), w, U, res


def _restart(
    fact: kf.KrylovState, vals, U, beta, keep, keep_max: int, gate=None,
    scales=None,
):
    """Thick restart to an arrowhead factorization of size ``keep``.

    With ``gate`` (a traced bool), the restart is MASKED rather than wrapped
    in ``lax.cond``: when ``gate`` is false the rotation matrix degenerates to
    the identity (bit-exact on the basis: 1·x + Σ 0·x = x) and ``H``/``k``
    keep their old values.  This keeps the big basis buffer out of a cond —
    branch outputs force defensive copies of the 250 MB buffer — at the cost
    of one (always-run) streaming transform on the final iteration only.
    """
    V, H, k, _ = fact
    m1 = H.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    # basis rotation: keep columns + move residual vector V[k] to slot ``keep``
    Ukeep = jnp.where((cols < keep) & (rows < k), U, 0)
    Ukeep = Ukeep + jax.nn.one_hot(k, m1, dtype=U.dtype)[:, None] * jax.nn.one_hot(
        keep, m1, dtype=U.dtype
    )[None, :]
    if scales is not None:
        # fused-expansion mode stores basis rows unnormalized with the true
        # basis v_j = Σ_i L[i,j]·row_i, so the rotation acting on STORED rows
        # is L·U (this also maps the relocated-residual column to L[:,k]).
        # Applied before the identity gate — a gated-off restart must
        # preserve the raw rows bit-exactly.
        Ukeep = jnp.matmul(
            scales.astype(U.dtype), Ukeep,
            precision=jax.lax.Precision.HIGHEST,
        )
    if gate is not None:
        eye = jnp.eye(m1, dtype=U.dtype)
        Ukeep = jnp.where(gate, Ukeep, eye)
    # only rows < keep+1 survive (kept Ritz vectors + relocated residual);
    # keep_max+1 is the static bound — tail rows become garbage, which every
    # consumer masks (see bs.transform_partial)
    Vnew = bs.transform_partial(V, Ukeep, keep_max + 1)
    # arrowhead H: diag(θ) + spike row s[j] = β·conj(U[k-1, j])
    lastrow = jax.lax.dynamic_index_in_dim(U, jnp.maximum(k - 1, 0), 0, keepdims=False)
    s = (beta * jnp.conj(lastrow)).astype(H.dtype)
    didx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    diag = jnp.where(didx < keep, vals.astype(H.dtype), 0)
    Hnew = jnp.diag(diag)
    spike = jnp.where(didx < keep, s, 0)
    Hnew = Hnew + jax.nn.one_hot(keep, m1, dtype=H.dtype)[:, None] * spike[None, :]
    # Hermitian mirror of the spike (column ``keep``), so processing before the
    # next expansion overwrites it stays consistent
    Hnew = Hnew + jax.nn.one_hot(keep, m1, dtype=H.dtype)[None, :] * jnp.conj(
        spike
    )[:, None]
    k_new = keep.astype(jnp.int32)
    if gate is not None:
        Hnew = jnp.where(gate, Hnew, H)
        k_new = jnp.where(gate, k_new, jnp.asarray(k, jnp.int32))
    return kf.KrylovState(Vnew, Hnew, k_new, beta)


def eigsolve_lanczos(
    op: LinearOperator,
    x0: PyTree,
    howmany: int,
    which,
    alg: Lanczos,
    space: VectorSpace = STANDARD,
    coeff_dtype=None,
):
    """Jit-compatible Hermitian eigsolve.  Returns ``(vals, vecs, info)`` with
    static ``howmany`` leading entries (reference returns a dynamic-length list,
    ``src/eigsolve/lanczos.jl:117-154``; static shapes are the jit contract)."""
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(
            f"howmany={howmany} exceeds krylovdim={m}; enlarge krylovdim"
        )
    if isinstance(which, str) and which.upper() in ("LI", "SI"):
        raise ValueError(
            "which=:LI/:SI invalid for Hermitian eigsolve (real spectrum) — "
            "reference src/eigsolve/eigsolve.jl:209-236"
        )
    from ..ops.operator import probe_dtype

    cdt = coeff_dtype or probe_dtype(op, x0)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)
    btol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)

    fact0 = kf.initialize(x0, m, cdt, space, verbosity=alg.verbosity)
    st0 = _LoopState(
        fact=fact0,
        numiter=jnp.int32(0),
        numops=jnp.int32(0),
        nconv=jnp.int32(0),
        vals=jnp.zeros((m + 1,), rdt),
        U=jnp.zeros((m + 1, m + 1), cdt),
        resnorms=jnp.full((m + 1,), jnp.inf, rdt),
        done=jnp.asarray(False),
        sc=kf.fused_scales_init(m + 1),
    )

    selective = getattr(alg, "reorth", "full") == "selective"
    if selective and alg.eager:
        raise ValueError(
            "reorth='selective' is incompatible with eager=True (the "
            "omega-recurrence state does not persist across eager processings)"
        )
    from ..ops import orthonormal as on

    # one-stream fused expansion (ops/pallas_fused_lanczos.py): plain cgs
    # runs the single-sweep stream (the cgs fast path of kf.expand_hermitian);
    # the DEFAULT cgs2 runs the one-reduce DGKS mode (deferred second sweep in
    # scalar space — same B+3 row-passes, two-sweep orthogonality; see
    # kf.fused_expansions and tools/drift_study.py)
    dgks = type(alg.orth) is on.ClassicalGramSchmidt2 and 2 * (m + 1) + 2 <= 128
    fused = (
        not alg.eager
        and not selective
        and (type(alg.orth) is on.ClassicalGramSchmidt or dgks)
        and cdt == jnp.float32
        and kf.fused_available(op, x0, space, kmax=m + 1)
    )

    def outer_body(st: _LoopState) -> _LoopState:
        fact, numops = st.fact, st.numops
        # ω-recurrence state for selective reorthogonalization; reset to the
        # eps level at every restart (the kept Ritz vectors are orthonormal)
        eps_r = jnp.finfo(rdt).eps
        om0 = jnp.full((m + 1,), eps_r, rdt)
        omp0 = jnp.full((m + 1,), eps_r, rdt)

        def expand_one(c):
            fact, numops, om, omp, j = c
            if selective:
                # first expansion after a restart: force the drift sweep
                force = jnp.logical_and(j == 0, st.numiter > 0)
                fact, om, omp, _ = kf.expand_hermitian_selective(
                    op.normal, fact, om, omp, alg.orth, space,
                    force_sweep=force,
                )
            else:
                fact = kf.expand_hermitian(
                    op.normal, fact, alg.orth, space, verbosity=alg.verbosity
                )
            return fact, numops + 1, om, omp, j + 1

        # --- inner expansion loop (do-while: ≥1 expansion if possible).
        # A single while_loop — no leading lax.cond, whose branch outputs
        # would defensively copy the basis buffer every outer iteration.
        def inner_cond(c):
            fact, numops, om, omp, j = c
            go = jnp.logical_and(fact.k < m, fact.beta > btol)
            if alg.eager:
                # eager: ≥1 expansion per processing, then process early
                go = jnp.logical_and(
                    go, jnp.logical_or(j == 0, fact.k < max(howmany, 1))
                )
            return go

        if fused:
            fact, sc, dops = kf.fused_expansions(
                op, fact, st.sc, m, btol, space, verbosity=alg.verbosity,
                dgks=dgks,
            )
            numops = numops + dops
        else:
            sc = st.sc
            fact, numops, om, omp, _ = jax.lax.while_loop(
                inner_cond, expand_one, (fact, numops, om0, omp0, jnp.int32(0))
            )

        # --- process projected problem ---
        nconv, vals, U, res = _process(
            fact.H, fact.k, fact.beta, which, tol, howmany
        )
        # numiter counts restarts; eager processings at k < m are free
        full = fact.k >= m
        numiter = st.numiter + full.astype(jnp.int32)
        # ¬(β > btol) rather than β ≤ btol: a NaN β (zero-norm x0 or
        # operator-produced NaN) must count as breakdown, or the outer
        # loop spins forever making no progress
        stalled = jnp.logical_and(
            jnp.logical_not(fact.beta > btol), fact.k < m
        )
        done = jnp.logical_or(
            nconv >= howmany,
            jnp.logical_or(full & (numiter >= alg.maxiter), stalled),
        )

        # --- thick restart (skipped when done) ---
        keep_raw = (3 * m + 2 * nconv) // 5
        keep = jnp.clip(keep_raw, 1, jnp.maximum(fact.k - 1, 1))
        # static bound on keep: restart implies nconv < howmany and k == m
        keep_max = min((3 * m + 2 * max(howmany - 1, 0)) // 5, m - 1)

        # restart only when the subspace is full (eager processing at k < m
        # must keep expanding, reference src/eigsolve/lanczos.jl:80-116)
        restart_now = jnp.logical_and(jnp.logical_not(done), fact.k >= m)
        if alg.eager:
            # eager processes every step — a masked always-run transform would
            # add a basis pass per expansion, so keep the cond here
            fact = jax.lax.cond(
                restart_now,
                lambda a: _restart(a[0], a[1], a[2], a[0].beta, keep, keep_max),
                lambda a: a[0],
                (fact, vals, U),
            )
        else:
            # non-eager: every processing but the last restarts — run the
            # masked (gated) restart unconditionally, avoiding cond copies
            fact = _restart(
                fact, vals, U, fact.beta, keep, keep_max, gate=restart_now,
                scales=sc.L if fused else None,
            )
        # a genuine restart renormalizes every surviving row (the rotation
        # folds L in), so the bookkeeping resets to identity; the arrowhead H
        # seeds the stored-row Hessenberg of the dgks mode
        sc_fresh = kf.fused_scales_init(m + 1, H=fact.H if fused else None)
        sc = jax.tree_util.tree_map(
            lambda a, b: jnp.where(restart_now, a, b), sc_fresh, sc
        )
        log_if(
            alg.verbosity, EACHITERATION,
            "Lanczos eigsolve in iteration {it}: {nc} values converged, "
            "normres = {nr}",
            it=numiter, nc=nconv, nr=res[:howmany],
        )
        return _LoopState(
            fact, numiter, numops, nconv, vals, U, res, done, sc
        )

    def outer_cond(st: _LoopState):
        return jnp.logical_not(st.done)

    st = jax.lax.while_loop(outer_cond, outer_body, st0)

    # --- extract results (static howmany) ---
    fact = st.fact
    m1 = m + 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m1, m1), 1)
    Umask = jnp.where((rows < fact.k) & (cols < howmany), st.U, 0)
    # fused expansion stores rows unnormalized (v_j = Σ_i L[i,j]·row_i): fold
    # the bookkeeping into every basis consumption (identity when unfused)
    Umask = kf.fold_scales(st.sc, Umask)
    # read V[k] BEFORE the rotation: transform_partial aliases the basis
    # buffer in place, so reading it first lets XLA skip a defensive copy
    Lk = jax.lax.dynamic_slice(
        st.sc.L, (jnp.int32(0), jnp.asarray(fact.k, jnp.int32)), (m1, 1)
    )[:, 0]
    vk = bs.unproject_bucketed(fact.V, Lk.astype(cdt), fact.k + 1)
    Vr = bs.transform_partial(fact.V, Umask, howmany)
    vecs = jax.tree_util.tree_map(lambda l: l[:howmany], Vr)
    # residual vectors r_i = β·U[k-1,i] · V[k]  (reference src/eigsolve/lanczos.jl:127-133)
    lastrow = jax.lax.dynamic_index_in_dim(
        st.U, jnp.maximum(fact.k - 1, 0), 0, keepdims=False
    )
    s = fact.beta * lastrow
    residuals = jax.tree_util.tree_map(
        lambda l: s[:howmany].reshape((howmany,) + (1,) * l.ndim) * l[None], vk
    )
    nconv_out = jnp.minimum(st.nconv, howmany)
    # reference numiter starts at 1 (src/eigsolve/lanczos.jl:22) — a solve
    # converging before the subspace ever fills still reports numiter = 1
    numiter_out = jnp.maximum(st.numiter, jnp.int32(1))
    log_if(
        alg.verbosity, STARTSTOP,
        "Lanczos eigsolve finished after {it} iterations: {nc} values "
        "converged, numops = {no}, normres = {nr}",
        it=numiter_out, nc=nconv_out, no=st.numops, nr=st.resnorms[:howmany],
    )
    warn_if(
        alg.verbosity, nconv_out < howmany,
        "Lanczos eigsolve stopped without convergence: {nc} of "
        f"{howmany} values converged " + "after {it} iterations",
        nc=nconv_out, it=numiter_out,
    )
    info = ConvergenceInfo(
        converged=nconv_out,
        residual=residuals,
        normres=st.resnorms[:howmany],
        numiter=numiter_out,
        numops=st.numops,
    )
    return st.vals[:howmany], vecs, info
