"""Generalized Hermitian eigensolver: Golub-Ye inverse-free Krylov, fully jitted.

Mirrors the reference driver (``src/eigsolve/golubye.jl``): Lanczos on the
shifted operator ``A − ρ(x)·B`` around the current Rayleigh quotient
``ρ = ⟨x,Ax⟩/⟨x,Bx⟩``, with

* the LOCG-style correction: the previous outer iterate ``x_old`` is appended to
  the search space before processing (``src/eigsolve/golubye.jl:62-76``);
* deflation: converged Ritz vectors are re-appended every cycle (``:77-91``);
* the projected pencil ``(V̄ᴴAV̄, V̄ᴴBV̄)`` solved as a dense generalized Hermitian
  problem on device (reference ``geneigh!`` → LAPACK ``sygvd``, ``:94-99``);
* per-Ritz-vector Rayleigh quotients and residuals (``:109-130``).

TPU-native deviations: alongside ``V`` the driver keeps stacked ``AV``/``BV``
bases (the raw operator images), so the projected pencil is two Gram GEMMs and
Ritz data (``Av``, ``Bv``, ``ρᵢ``, ``rᵢ``) come from basis GEMMs with **zero**
extra operator applications — the reference spends one ``genapply`` per Ritz
vector per restart (``:112``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dense
from ..algorithms import GolubYe, KrylovDefaults
from ..info import ConvergenceInfo, STARTSTOP, log_if, warn_if
from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.operator import LinearOperator, as_generalized_pair
from ..ops.vector import STANDARD, VectorSpace, add, scale, scalartype, zerovector

PyTree = Any

__all__ = ["geneigsolve", "geneigsolve_golubye"]


class _State(NamedTuple):
    V: PyTree  # search-space basis (capacity mcap)
    AV: PyTree  # stacked A·V[i]
    BV: PyTree  # stacked B·V[i]
    vres: PyTree  # current residual direction (unit vector candidate)
    beta: jax.Array  # current residual norm
    rho: jax.Array  # current shift (Rayleigh quotient), real
    vold: PyTree  # previous outer iterate (for the LOCG correction)
    cvecs: PyTree  # stacked converged Ritz vectors (capacity howmany)
    k: jax.Array  # number of basis vectors with AV/BV computed
    nconv: jax.Array
    vals: jax.Array  # leading Ritz values (howmany+1,)
    rvecs: PyTree  # leading Ritz vectors (howmany+1 stacked)
    rress: PyTree  # leading residual vectors
    rnorms: jax.Array
    numiter: jax.Array
    numops: jax.Array
    done: jax.Array


def _append(op_a, op_b, V, AV, BV, k, w, rho, orth, space, numops):
    """Orthonormalize ``w`` against ``V[:k]``, append with its A/B images at
    slot ``k``; no-op (masked) if the orthogonalized vector vanishes."""
    v, beta, _ = on.orthonormalize(w, V, k, orth, space)
    ok = beta > 0
    av = op_a(v)
    bv = op_b(v)
    Vn = bs.set(V, k, v)
    AVn = bs.set(AV, k, av)
    BVn = bs.set(BV, k, bv)
    sel = lambda a, b: jax.tree_util.tree_map(
        lambda x, y: jnp.where(ok, x, y), a, b
    )
    return (
        sel(Vn, V), sel(AVn, AV), sel(BVn, BV),
        jnp.where(ok, k + 1, k), numops + 1,
    )


def geneigsolve_golubye(
    opA: LinearOperator,
    opB: Optional[LinearOperator],
    x0: PyTree,
    howmany: int,
    which,
    alg: GolubYe,
    space: VectorSpace = STANDARD,
):
    """Returns ``(vals, vecs, info)`` for ``A x = λ B x`` with Hermitian ``A``
    and Hermitian positive-definite ``B``."""
    m = alg.krylovdim
    if howmany > m:
        raise ValueError(f"howmany={howmany} exceeds krylovdim={m}")
    hm1 = howmany + 1
    mcap = m + hm1 + 2  # room for the Lanczos space + x_old + deflation vectors

    op_a = opA.normal
    op_b = (opB.normal if opB is not None else (lambda x: x))

    cdt = scalartype(jax.eval_shape(op_a, x0), x0)
    rdt = jnp.finfo(cdt).dtype
    tol = jnp.asarray(alg.tol, rdt)

    x0 = jax.tree_util.tree_map(lambda l: l.astype(cdt), x0)
    nrm = space.norm(x0)
    v0 = scale(x0, (1 / jnp.where(nrm > 0, nrm, 1)).astype(cdt))
    av0 = op_a(v0)
    bv0 = op_b(v0)
    rho0 = jnp.real(space.inner(v0, av0)) / jnp.real(space.inner(v0, bv0))
    r0 = add(av0, bv0, a=-rho0.astype(cdt))

    V = bs.alloc(v0, mcap)
    V = bs.set(V, 0, v0)
    AV = bs.alloc(av0, mcap)
    AV = bs.set(AV, 0, av0)
    BV = bs.alloc(bv0, mcap)
    BV = bs.set(BV, 0, bv0)
    # residual direction orthogonal to v0
    w1, beta0, _ = on.orthonormalize(r0, V, jnp.int32(1), alg.orth, space)

    st0 = _State(
        V=V, AV=AV, BV=BV,
        vres=w1, beta=beta0, rho=rho0,
        vold=v0,
        cvecs=bs.alloc(v0, howmany),
        k=jnp.int32(1),
        nconv=jnp.int32(0),
        vals=jnp.zeros((hm1,), rdt),
        rvecs=bs.alloc(v0, hm1),
        rress=bs.alloc(v0, hm1),
        rnorms=jnp.full((hm1,), jnp.inf, rdt),
        numiter=jnp.int32(1),
        numops=jnp.int32(1),
        done=jnp.asarray(False),
    )

    def expand_one(c):
        """One Lanczos step on (A − ρB): commit vres as V[k], apply, compute
        next residual direction."""
        V, AV, BV, vres, beta, k, numops = c
        V = bs.set(V, k, vres)
        av = op_a(vres)
        bv = op_b(vres)
        AV = bs.set(AV, k, av)
        BV = bs.set(BV, k, bv)
        w = add(av, bv, a=-st_rho[0].astype(cdt))
        vnew, bnew, _ = on.orthonormalize(w, V, k + 1, alg.orth, space)
        return V, AV, BV, vnew, bnew, k + 1, numops + 1

    # st_rho is a 1-element mutable cell so expand_one can close over the
    # current cycle's rho (set inside outer_body before the inner loop)
    st_rho = [None]

    def outer_body(st: _State) -> _State:
        st_rho[0] = st.rho

        def inner_cond(c):
            V, AV, BV, vres, beta, k, numops = c
            return jnp.logical_and(k < m - st.nconv, beta > tol)

        V, AV, BV, vres, beta, k, numops = jax.lax.while_loop(
            inner_cond,
            expand_one,
            (st.V, st.AV, st.BV, st.vres, st.beta, st.k, st.numops),
        )

        # --- append x_old (LOCG correction) and converged vectors ---
        def app_old(args):
            V, AV, BV, k, numops = args
            return _append(
                op_a, op_b, V, AV, BV, k, st.vold, st.rho, alg.orth, space, numops
            )

        V, AV, BV, k, numops = jax.lax.cond(
            st.numiter > 1,
            app_old,
            lambda a: a,
            (V, AV, BV, k, numops),
        )
        for i in range(howmany):
            def app_conv(args, i=i):
                V, AV, BV, k, numops = args
                return _append(
                    op_a, op_b, V, AV, BV, k, bs.get(st.cvecs, i), st.rho,
                    alg.orth, space, numops,
                )

            V, AV, BV, k, numops = jax.lax.cond(
                i < st.nconv, app_conv, lambda a: a, (V, AV, BV, k, numops)
            )

        # --- projected pencil and Ritz data (all GEMMs, no applies) ---
        HA = bs.gram(V, AV, space)
        HB = bs.gram(V, BV, space)
        D, Z, valid = dense.geneigh_active(HA, HB, k)
        perm = dense.sort_perm(D.astype(cdt), valid, which)
        D = D[perm]
        Z = Z[:, perm]
        rows = jax.lax.broadcasted_iota(jnp.int32, (mcap, mcap), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (mcap, mcap), 1)
        Zm = jnp.where((rows < k) & (cols < hm1), Z.astype(cdt), 0)
        Rv = bs.transform(V, Zm)
        Rav = bs.transform(AV, Zm)
        Rbv = bs.transform(BV, Zm)
        num = jnp.real(bs.batch_inner(Rv, Rav, space))
        den = jnp.real(bs.batch_inner(Rv, Rbv, space))
        rhos = num / jnp.where(jnp.abs(den) > 0, den, 1)
        Rres = jax.tree_util.tree_map(
            lambda la, lb: la
            - rhos.reshape((-1,) + (1,) * (la.ndim - 1)).astype(la.dtype) * lb,
            Rav,
            Rbv,
        )
        betas = jnp.sqrt(jnp.maximum(jnp.real(bs.batch_inner(Rres, Rres, space)), 0))
        znorm = jnp.sqrt(jnp.sum(jnp.abs(Zm) ** 2, axis=0))
        flags = betas[:howmany] <= tol * jnp.maximum(znorm[:howmany], 1e-30)
        nconv = jnp.sum(jnp.cumprod(flags.astype(jnp.int32))).astype(jnp.int32)

        numiter = st.numiter
        done = jnp.logical_or(nconv >= howmany, numiter >= alg.maxiter)

        # --- restart seed: first nonconverged Ritz vector ---
        idx = jnp.minimum(nconv, hm1 - 1)
        vnext = bs.get(Rv, idx)
        avnext = bs.get(Rav, idx)
        bvnext = bs.get(Rbv, idx)
        rnext = bs.get(Rres, idx)
        rhonext = jax.lax.dynamic_index_in_dim(rhos, idx, 0, keepdims=False)
        nv = space.norm(vnext)
        inv = (1 / jnp.where(nv > 0, nv, 1)).astype(cdt)
        vnext = scale(vnext, inv)
        avnext = scale(avnext, inv)
        bvnext = scale(bvnext, inv)
        rnext = scale(rnext, inv)
        voldnext = bs.get(V, 0)

        Vn = bs.set(jax.tree_util.tree_map(jnp.zeros_like, V), 0, vnext)
        AVn = bs.set(jax.tree_util.tree_map(jnp.zeros_like, AV), 0, avnext)
        BVn = bs.set(jax.tree_util.tree_map(jnp.zeros_like, BV), 0, bvnext)
        wres, bres, _ = on.orthonormalize(rnext, Vn, jnp.int32(1), alg.orth, space)
        cvecs = jax.tree_util.tree_map(lambda l: l[:howmany], Rv)

        return _State(
            V=Vn, AV=AVn, BV=BVn, vres=wres, beta=bres, rho=rhonext,
            vold=voldnext, cvecs=cvecs, k=jnp.int32(1), nconv=nconv,
            vals=rhos[:hm1],
            rvecs=jax.tree_util.tree_map(lambda l: l[:hm1], Rv),
            rress=jax.tree_util.tree_map(lambda l: l[:hm1], Rres),
            rnorms=betas[:hm1],
            numiter=numiter + 1, numops=numops, done=done,
        )

    st = jax.lax.while_loop(lambda s: jnp.logical_not(s.done), outer_body, st0)
    nconv_out = jnp.minimum(st.nconv, howmany)
    log_if(
        alg.verbosity, STARTSTOP,
        "GolubYe geneigsolve finished after {it} iterations: {nc} values "
        "converged, normres = {nr}",
        it=st.numiter - 1, nc=nconv_out, nr=st.rnorms[:howmany],
    )
    warn_if(
        alg.verbosity, nconv_out < howmany,
        "GolubYe geneigsolve stopped without convergence: {nc} of "
        f"{howmany}" + " values converged",
        nc=nconv_out,
    )
    vals = st.vals[:howmany]
    vecs = jax.tree_util.tree_map(lambda l: l[:howmany], st.rvecs)
    residuals = jax.tree_util.tree_map(lambda l: l[:howmany], st.rress)
    info = ConvergenceInfo(
        converged=jnp.minimum(st.nconv, howmany),
        residual=residuals,
        normres=st.rnorms[:howmany],
        numiter=st.numiter - 1,
        numops=st.numops,
    )
    return vals, vecs, info


@partial(jax.jit, static_argnames=("howmany", "which", "alg", "space", "has_b"))
def _geneigsolve_core(opA, opB, x0, howmany, which, alg, space, has_b):
    return geneigsolve_golubye(opA, opB if has_b else None, x0, howmany, which, alg, space)


def geneigsolve(
    AB,
    x0: Optional[PyTree] = None,
    howmany: int = 1,
    which="SR",
    *,
    alg: Optional[GolubYe] = None,
    space: VectorSpace = STANDARD,
    tol: Optional[float] = None,
    krylovdim: Optional[int] = None,
    maxiter: Optional[int] = None,
    orth=None,
    verbosity: Optional[int] = None,
):
    """Find extremal eigenvalues of the pencil ``(A, B)``: ``A x = λ B x``.

    ``AB`` is ``(A, B)`` (matrices, callables, or operators; ``B=None`` →
    identity) — the reference's ``genapply`` encoding (``src/apply.jl:22-23``).
    ``A`` must be Hermitian, ``B`` Hermitian positive definite.  Reference:
    ``geneigsolve`` (``src/eigsolve/geneigsolve.jl``), driver GolubYe.
    """
    opA, opB = as_generalized_pair(AB)
    if x0 is None:
        A0 = AB[0] if isinstance(AB, tuple) else AB
        if isinstance(A0, (np.ndarray, jax.Array)) and getattr(A0, "ndim", 0) == 2:
            dt = jnp.asarray(A0).dtype
            x0 = jnp.asarray(
                np.random.default_rng(42).standard_normal(A0.shape[1]),
                jnp.finfo(dt).dtype,
            ).astype(dt)
        else:
            raise ValueError("x0 is required unless A is a concrete matrix")
    w = which.upper() if isinstance(which, str) else which
    if isinstance(w, str) and w in ("LI", "SI"):
        raise ValueError("which=LI/SI invalid for Hermitian pencils (real spectrum)")
    if alg is None:
        kw = dict(
            tol=tol, krylovdim=krylovdim, maxiter=maxiter, orth=orth,
            verbosity=verbosity,
        )
        alg = GolubYe(**{k: v for k, v in kw.items() if v is not None})
    elif tol is not None and alg.tol != tol:
        alg = dataclasses.replace(alg, tol=tol)
    return _geneigsolve_core(
        opA, opB if opB is not None else opA, x0, howmany, which, alg, space,
        opB is not None,
    )
