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
    "log_if",
    "warn_if",
]

# Verbosity levels (reference src/KrylovKit.jl:158-162)
SILENT = 0
WARN = 1
STARTSTOP = 2
EACHITERATION = 3


import functools


@functools.lru_cache(maxsize=None)
def _callbacks_supported() -> bool:
    """Some PJRT backends (e.g. the axon TPU tunnel) do not support host
    callbacks, which ``jax.debug.print`` needs; logging is dropped there."""
    try:
        pv = getattr(jax.devices()[0].client, "platform_version", "") or ""
        if "axon" in pv:
            return False
    except Exception:
        pass
    return True


def log_if(verbosity: int, level: int, fmt: str, **kw):
    """Emit a device-side log line when the (static) verbosity allows.

    The reference logs through Julia's ``@info``/``@warn`` at 4 levels
    (``src/KrylovKit.jl:158-162``; per-iteration messages e.g.
    ``src/factorizations/lanczos.jl:218-220``).  Under jit the static
    ``verbosity`` compiles the print in or out — zero cost when silent."""
    if verbosity >= level and _callbacks_supported():
        jax.debug.print(fmt, **kw)


def warn_if(verbosity: int, cond, fmt: str, **kw):
    """Conditional warning (reference ``@warn``): printed only when the traced
    condition holds at runtime and the static verbosity is ≥ WARN.

    Implemented as a host callback that tests ``cond`` host-side rather than
    ``lax.cond``-of-``debug.print``: under ``vmap`` a ``cond`` lowers to
    ``select`` (both branches execute), which would print spurious warnings
    for converged batch elements."""
    if verbosity >= WARN and _callbacks_supported():

        def _cb(cond_, kw_):
            import numpy as np

            c = np.asarray(cond_)
            if c.ndim == 0:
                if c:
                    print(fmt.format(**kw_))
            else:  # batched (vmapped) solve: one line per offending element
                for i in np.flatnonzero(c.reshape(-1)):
                    print(
                        fmt.format(
                            **{
                                k: (np.asarray(v).reshape(c.shape + (-1,))[i]
                                    if np.asarray(v).size > 1 else v)
                                for k, v in kw_.items()
                            }
                        )
                    )

        jax.debug.callback(_cb, cond, kw)


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
