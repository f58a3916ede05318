"""Reverse-mode AD for the solvers — the TPU-native analogue of the reference's
ChainRulesCore extension (``ext/KrylovKitChainRulesCoreExt/``).

Implemented with ``jax.custom_vjp``: the pullbacks are themselves Krylov solves
on (tuple-)pytree vectors, exactly as in the reference (SURVEY.md §3.5) — the
solvers already accept arbitrary pytrees, so the bordered adjoint systems reuse
``linsolve`` unchanged.

Convention note: ChainRules cotangents are "adjoint" (conjugated) gradients;
JAX's vjp uses the plain (unconjugated) transpose.  The formulas here are
derived in JAX's convention and validated against dense jax.vjp oracles.
"""

from .linsolve import linsolve_vjp  # noqa: F401
from .eigsolve import eigsolve_vjp  # noqa: F401
from .svdsolve import svdsolve_vjp  # noqa: F401
