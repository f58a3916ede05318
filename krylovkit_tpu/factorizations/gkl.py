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
) -> GKLState:
    """``U[0] = x0/‖x0‖``; the domain basis V is allocated from the abstract
    shape of ``Aᴴ x0`` (no FLOPs).  Reference ``initialize``
    (``src/factorizations/gkl.jl:183-215``)."""
    if vec_dtype is not None:
        x0 = jax.tree_util.tree_map(lambda l: l.astype(vec_dtype), x0)
    nrm = space.norm(x0)
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
    (``src/factorizations/gkl.jl:294-404``)."""
    U, V, B, k, _ = state
    m1 = B.shape[0]
    ki = jnp.asarray(k, jnp.int32)

    # domain half-step: row k of B gets (conj(c), α)
    w = op.apply_adjoint(bs.get(U, k))
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
