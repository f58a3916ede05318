"""ConvergenceInfo and verbosity levels.

Mirrors the reference's uniform result record (``src/KrylovKit.jl:185-229``) and
its 4 verbosity levels (``src/KrylovKit.jl:158-162``).  Under ``jit`` the fields
are traced arrays; ``converged``/``numiter``/``numops`` are integer scalars.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "ConvergenceInfo",
    "SILENT",
    "WARN",
    "STARTSTOP",
    "EACHITERATION",
]

# Verbosity levels (reference src/KrylovKit.jl:158-162)
SILENT = 0
WARN = 1
STARTSTOP = 2
EACHITERATION = 3


class ConvergenceInfo(NamedTuple):
    """Result record of every solver (reference ``src/KrylovKit.jl:185-218``).

    Attributes:
      converged: number of converged solutions (0/1 for linear problems).
      residual: the residual(s) — a pytree vector, a stacked basis of residual
        vectors, or ``None`` where the reference returns ``nothing``.
      normres: norm(s) of the residual(s).
      numiter: number of (restart) iterations used.
      numops: number of operator applications (including adjoint applications).
    """

    converged: jax.Array
    residual: Any
    normres: jax.Array
    numiter: jax.Array
    numops: jax.Array

    def __repr__(self):  # pretty-print akin to reference src/KrylovKit.jl:219-229
        try:
            conv = int(self.converged)
            return (
                f"ConvergenceInfo: {conv} converged value(s) after "
                f"{int(self.numiter)} iteration(s) and {int(self.numops)} "
                f"applications of the linear map; norms of residuals are "
                f"{jnp.asarray(self.normres)!s}."
            )
        except (TypeError, jax.errors.TracerArrayConversionError):
            return (
                f"ConvergenceInfo(converged={self.converged}, normres={self.normres},"
                f" numiter={self.numiter}, numops={self.numops})"
            )
