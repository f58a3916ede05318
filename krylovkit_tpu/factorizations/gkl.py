"""Golub-Kahan-Lanczos bidiagonalization, TPU-native.

The reference factorization (``src/factorizations/gkl.jl``) maintains two bases —
U in the codomain, V in the domain — with ``A V = U B + r b'`` and
``Aᴴ U = V Bᴴ`` for a lower-bidiagonal ``B`` (``gklrecurrence``,
``src/factorizations/gkl.jl:294-404``; two applies per step,
``src/factorizations/gkl.jl:188-190``).

TPU-native deviations (same rationale as ``krylov.py``):

* both bases are dense stacked arrays; each half-step is one full batched
  orthogonalization sweep (GEMV + one reduction with CGS-family strategies);
* the projected matrix is a dense ``(m+1, m+1)`` buffer ``B[i, j] = ⟨u_i, A v_j⟩``
  rather than two bidiagonal coefficient lists: thick restart then writes a
  *broken-arrow* form (diag(σ) + spike row) and the next expansion sweep
  regenerates the spike row numerically — no Householder restoration of
  bidiagonal form (reference ``src/eigsolve/svdsolve.jl:231-274``) is needed.

Invariants after ``k`` steps (active sizes: ``U[0..k]``, ``V[0..k-1]``):

    A V[:, :k]  = U[:, :k] B[:k, :k] + u_k · B[k, :k]     (residual row)
    Aᴴ U[:, :k] = V[:, :k] B[:k, :k]ᴴ                      (exact)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any

__all__ = ["GKLState", "initialize", "expand"]


class GKLState(NamedTuple):
    """Static-shape GKL factorization state for ``lax.while_loop``."""

    U: PyTree  # stacked codomain basis, capacity m+1
    V: PyTree  # stacked domain basis, capacity m+1 (m used)
    B: jax.Array  # (m+1, m+1) projected-matrix buffer ⟨u_i, A v_j⟩
    k: jax.Array  # completed steps (= number of V vectors), int32
    beta: jax.Array  # current residual norm β_k = ‖A v_k − Σ ...‖


def initialize(
    op,
    x0: PyTree,
    m: int,
    coeff_dtype,
    space: VectorSpace = STANDARD,
    vec_dtype=None,
    verbosity: int = 0,
) -> GKLState:
    """``U[0] = x0/‖x0‖``; the domain basis V is allocated from the abstract
    shape of ``Aᴴ x0`` (no FLOPs).  Reference ``initialize``
    (``src/factorizations/gkl.jl:183-215``)."""
    if vec_dtype is not None:
        x0 = jax.tree_util.tree_map(lambda l: l.astype(vec_dtype), x0)
    nrm = space.norm(x0)
    from ..info import warn_if

    warn_if(
        verbosity, nrm == 0,
        "[krylovkit_tpu] starting vector x0 has zero norm: results are NaN "
        "and converged = 0",
    )
    u0 = jax.tree_util.tree_map(lambda l: l / nrm.astype(l.dtype), x0)
    U = bs.alloc(u0, m + 1)
    U = bs.set(U, 0, u0)
    vshape = jax.eval_shape(op.apply_adjoint, u0)
    V = jax.tree_util.tree_map(
        lambda s: jnp.zeros((m + 1,) + s.shape, s.dtype), vshape
    )
    B = jnp.zeros((m + 1, m + 1), dtype=coeff_dtype)
    return GKLState(U, V, B, jnp.int32(0), jnp.ones((), jnp.finfo(coeff_dtype).dtype))


def expand(
    op,
    state: GKLState,
    orth: on.Orthogonalizer,
    space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> GKLState:
    """One GKL step (two operator applies): ``w = Aᴴ u_k`` → orthonormalize
    against V → ``(α, v_k)``; ``s = A v_k`` → orthonormalize against U →
    ``(β, u_{k+1})``.  Reference ``gklrecurrence``
    (``src/factorizations/gkl.jl:294-404``).

    For the two-pass orthogonalizers (cgs2/mgs2) a **fused** variant runs
    instead (the GKL analogue of ``krylov.py:expand_hermitian``): the exact
    recurrence components are subtracted explicitly and only ONE drift sweep
    follows, cutting basis passes per step from 8 to 5.

    * domain half-step: the components of ``Aᴴ u_k`` along ``V[0..k-1]`` are
      ``conj(B[k, :k])`` *exactly* — ``β_{k-1} e_{k-1}`` at an ordinary step
      (the reference's own subtraction, ``gkl.jl:352-355``), the restart spike
      row after a thick restart (``Aᴴ Ũ = Ṽ Σ`` survives the restart exactly,
      so the buffer row is the truth in both cases);
    * codomain half-step: ``⟨u_i, A v_k⟩ = B[i, k] = α δ_{ik}`` for ``i ≤ k``
      (holds post-restart for the same reason), so a single ``α·u_k`` AXPY
      replaces the first full sweep (reference ``gkl.jl:356-359``).

    The drift-sweep coefficients are discarded; ``B`` keeps the exact
    ``β_{k-1}``/spike entries already in the buffer instead of numerically
    regenerated ones.
    """
    U, V, B, k, _ = state
    m1 = B.shape[0]
    ki = jnp.asarray(k, jnp.int32)
    from ..ops.vector import add

    fused = isinstance(
        orth, (on.ClassicalGramSchmidt2, on.ModifiedGramSchmidt2)
    )
    w = op.apply_adjoint(bs.get(U, k))
    if fused:
        sweep = (
            on.cgs if isinstance(orth, on.ClassicalGramSchmidt2) else on.mgs
        )
        # domain half-step: subtract the known row components, one drift sweep
        rowk = jax.lax.dynamic_slice(B, (ki, jnp.int32(0)), (1, m1))[0]
        rowk = bs.mask_coeffs(rowk, k)
        w = add(w, bs.unproject_bucketed(V, jnp.conj(rowk), k), a=-1)
        v_new, alpha, _ = on.orthonormalize(w, V, k, sweep, space)
        V = bs.set(V, k, v_new)

        # codomain half-step: subtract α u_k, one drift sweep
        s = op.normal(v_new)
        uk = bs.get(U, k)
        s = jax.tree_util.tree_map(
            lambda ls, lu: ls - alpha.astype(ls.dtype) * lu, s, uk
        )
        u_new, beta, _ = on.orthonormalize(s, U, k + 1, sweep, space)
        U = bs.set(U, k + 1, u_new)

        # write α at [k, k] and β at [k+1, k]; everything else in row k /
        # column k is already exact in the buffer
        ek = jax.nn.one_hot(k, m1, dtype=B.dtype)
        ek1 = jax.nn.one_hot(k + 1, m1, dtype=B.dtype)
        mask2 = (ek + ek1)[:, None] * ek[None, :]
        B = B * (1 - mask2) + (
            alpha.astype(B.dtype) * ek[:, None]
            + beta.astype(B.dtype) * ek1[:, None]
        ) * ek[None, :]
        from ..info import EACHITERATION, log_if

        log_if(
            verbosity, EACHITERATION + 1,
            "GKL expansion to dimension {k}: subspace normres = {b}",
            k=k + 1, b=beta,
        )
        return GKLState(U, V, B, k + 1, beta)

    # generic path (cgs/mgs/IR variants): full sweeps, row/column regenerated
    # from the sweep coefficients
    # domain half-step: row k of B gets (conj(c), α)
    v_new, alpha, c = on.orthonormalize(w, V, k, orth, space)
    V = bs.set(V, k, v_new)

    # codomain half-step: column k of B gets (d, β)
    s = op.normal(v_new)
    u_new, beta, d = on.orthonormalize(s, U, k + 1, orth, space)
    U = bs.set(U, k + 1, u_new)

    col = d.astype(B.dtype) + beta.astype(B.dtype) * jax.nn.one_hot(
        k + 1, m1, dtype=B.dtype
    )
    B = jax.lax.dynamic_update_slice(B, col[:, None], (jnp.int32(0), ki))
    row = jnp.conj(c).astype(B.dtype) + alpha.astype(B.dtype) * jax.nn.one_hot(
        k, m1, dtype=B.dtype
    )
    B = jax.lax.dynamic_update_slice(B, row[None, :], (ki, jnp.int32(0)))
    from ..info import EACHITERATION, log_if

    # per-expansion message at EACHITERATION+1 (reference
    # src/factorizations/gkl.jl:266-268)
    log_if(
        verbosity, EACHITERATION + 1,
        "GKL expansion to dimension {k}: subspace normres = {b}",
        k=k + 1, b=beta,
    )
    return GKLState(U, V, B, k + 1, beta)
