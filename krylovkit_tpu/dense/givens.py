"""Complex Givens rotations (reference ``src/dense/givens.jl``), used by the
GMRES incremental QR of the shifted Hessenberg (``src/linsolve/gmres.jl:72-94``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["givens"]


def givens(a, b) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute ``(c, s, r)`` with ``c`` real ≥ 0, ``|c|² + |s|² = 1`` and

        [ c         conj(s) ] [a]   [r]
        [-s         c       ] [b] = [0]

    Guarded for ``a = b = 0`` (returns identity rotation).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    n2 = jnp.abs(a) ** 2 + jnp.abs(b) ** 2
    n = jnp.sqrt(n2)
    safe = n > 0
    nn = jnp.where(safe, n, 1)
    absa = jnp.abs(a)
    # phase of a (1 if a == 0)
    pha = jnp.where(absa > 0, a / jnp.where(absa > 0, absa, 1), 1)
    c = jnp.where(safe, absa / nn, 1).real
    s = jnp.where(safe, jnp.conj(pha) * b / nn, 0)
    r = jnp.where(safe, pha * nn, 0)
    return c, s, r
