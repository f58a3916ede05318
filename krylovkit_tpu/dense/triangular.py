"""Masked triangular solves and the matrix exponential of the projected matrix.

* ``solve_upper_active`` — the GMRES back-substitution (reference's hand-written
  ``ldiv!`` on ``UpperTriangular``, ``src/dense/linalg.jl:96-106``).
* ``expm_active`` — dense ``exp`` of the augmented projected matrix used by
  ``expintegrator`` (reference ``src/matrixfun/expintegrator.jl:202``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masking import embed_active

__all__ = ["solve_upper_active", "expm_active"]


def solve_upper_active(R: jax.Array, b: jax.Array, k) -> jax.Array:
    """Solve ``R[:k,:k] y = b[:k]`` on the static buffer; ``y[j>=k] = 0``."""
    m = R.shape[0]
    Meff = embed_active(R, k, 1.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    beff = jnp.where(idx < k, b, 0)
    y = jax.scipy.linalg.solve_triangular(Meff, beff, lower=False)
    return jnp.where(idx < k, y, 0)


def expm_active(M: jax.Array, k) -> jax.Array:
    """``exp`` of the active block (inactive part becomes the identity, which the
    caller never reads)."""
    return jax.scipy.linalg.expm(embed_active(M, k, 0.0))
