"""Gauge-sensitivity warnings for the AD pullbacks.

The reference warns when eigenvector/singular-vector cotangents have
components along the gauge orbit (phase freedom of each vector), which the
pullback formulas project out — a silent projection can hide a user bug where
the loss depends on the arbitrary phase (reference
``ext/KrylovKitChainRulesCoreExt/eigsolve.jl:150-156, 207-213, 334-341`` and
``svdsolve.jl:129-133, 185-190``).

The check rides the same host-callback machinery as the solvers' runtime
warnings (``info.warn_if``): the gauge magnitude is computed in-graph and the
message fires host-side when it exceeds the primal tolerance.  Works both
eagerly and under ``jit``; on callback-free backends (the axon tunnel) it is
auto-gated off like every other log line.  When warnings are emitted (as for
all warn_if sites) they print via the host callback; for pytest capture they
also go through ``warnings.warn`` so ``pytest.warns`` sees them.
"""

from __future__ import annotations

import warnings

import jax

from ..info import WARN, _callbacks_supported

__all__ = ["warn_gauge_eager"]


def warn_gauge_eager(gauge, tol, verbosity, msg: str) -> None:
    """Warn at runtime if the gauge magnitude exceeds ``tol``.

    ``verbosity`` gates statically like the reference's
    ``alg_rrule.verbosity >= WARN``; the comparison happens host-side in a
    debug callback so it works for traced values.
    """
    if verbosity < WARN or not _callbacks_supported():
        return

    def _cb(g, t):
        import numpy as np

        gv = float(np.asarray(g))
        if gv > float(np.asarray(t)):
            text = msg.format(gauge=gv)
            print(text)
            warnings.warn(text, stacklevel=2)

    jax.debug.callback(_cb, gauge, tol)
