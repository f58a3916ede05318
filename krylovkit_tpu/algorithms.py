"""Algorithm configuration structs + global defaults.

Mirrors the reference's ``src/algorithms.jl``: immutable algorithm structs carrying
``orth / krylovdim / maxiter / tol / eager / verbosity`` (``src/algorithms.jl:83-526``)
and the mutable global ``KrylovDefaults`` (``src/algorithms.jl:556-564``).

All structs are frozen (hashable) dataclasses so they can be passed as *static*
arguments to jitted drivers: the numeric fields (tol, maxiter, ...) shape the
compiled program's constants.

TPU-specific deviation: the default orthogonalizer is ``cgs2`` rather than the
reference's ``mgs2`` — on a sharded mesh CGS2 costs two fused reductions per
Arnoldi step while MGS2 costs ``2k`` dependent ones (SURVEY.md §5.8); their
stability is equivalent for practical purposes (both are "twice is enough").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

from .ops.orthonormal import (
    Orthogonalizer,
    cgs,
    mgs,
    cgs2,
    mgs2,
    cgsir,
    mgsir,
    ClassicalGramSchmidt,
    ModifiedGramSchmidt,
    ClassicalGramSchmidt2,
    ModifiedGramSchmidt2,
    ClassicalGramSchmidtIR,
    ModifiedGramSchmidtIR,
)
from .info import WARN

__all__ = [
    "KrylovDefaults",
    "Lanczos",
    "BlockLanczos",
    "Arnoldi",
    "BiArnoldi",
    "GKL",
    "GolubYe",
    "CG",
    "MINRES",
    "GMRES",
    "BiCGStab",
    "LSMR",
    "EigSorter",
    "cgs",
    "mgs",
    "cgs2",
    "mgs2",
    "cgsir",
    "mgsir",
]


class KrylovDefaults:
    """Mutable module-wide defaults (reference ``src/algorithms.jl:556-564``)."""

    orth: Orthogonalizer = cgs2  # TPU default; reference uses mgs2
    krylovdim: int = 30
    maxiter: int = 100
    blockkrylovdim: int = 100
    tol: float = 1e-12
    verbosity: int = WARN


def _orth_default():
    return KrylovDefaults.orth


@dataclasses.dataclass(frozen=True)
class _KrylovAlgorithm:
    """Shared fields of subspace algorithms (reference src/algorithms.jl:83-117)."""

    orth: Orthogonalizer = dataclasses.field(default_factory=_orth_default)
    krylovdim: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.krylovdim
    )
    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    eager: bool = False
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class Lanczos(_KrylovAlgorithm):
    """Lanczos for Hermitian eigenproblems (reference ``src/algorithms.jl:119-170``).

    ``reorth``: ``"full"`` (reference behavior — one full drift sweep per step)
    or ``"selective"`` (Simon's ω-recurrence partial reorthogonalization: the
    drift sweep runs only when the estimated orthogonality loss crosses
    ``sqrt(eps)`` — semiorthogonality keeps Ritz values accurate to O(eps)
    while skipping most basis sweeps, the dominant HBM cost).
    """

    reorth: str = "full"


@dataclasses.dataclass(frozen=True)
class BlockLanczos(_KrylovAlgorithm):
    """Block Lanczos for Hermitian eigenproblems with degenerate eigenvalues
    (reference ``src/algorithms.jl:172-229``).  ``qr_tol`` is the rank-detection
    tolerance of the block QR (reference ``block_qr!``,
    ``src/factorizations/blocklanczos.jl:312-353``)."""

    qr_tol: float = -1.0  # <0 → auto: eps(dtype)**(3/4)


@dataclasses.dataclass(frozen=True)
class GKL(_KrylovAlgorithm):
    """Golub-Kahan-Lanczos bidiagonalization for SVD (reference
    ``src/algorithms.jl:231-280``)."""


@dataclasses.dataclass(frozen=True)
class Arnoldi(_KrylovAlgorithm):
    """Arnoldi for general eigenproblems / Schur (reference
    ``src/algorithms.jl:282-335``)."""


@dataclasses.dataclass(frozen=True)
class BiArnoldi(_KrylovAlgorithm):
    """Two-sided Arnoldi for simultaneous left/right eigenvectors (reference
    ``src/algorithms.jl:337-390``)."""


@dataclasses.dataclass(frozen=True)
class GolubYe(_KrylovAlgorithm):
    """Golub-Ye inverse-free Krylov for generalized Hermitian eigenproblems
    (reference ``src/algorithms.jl:457-524``)."""


@dataclasses.dataclass(frozen=True)
class CG:
    """Conjugate Gradients (reference ``src/algorithms.jl:529-554`` region; driver
    ``src/linsolve/cg.jl``)."""

    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class MINRES:
    """MINRES for Hermitian indefinite systems.  Declared-but-unimplemented in the
    reference (``src/algorithms.jl:397-426``); implemented here."""

    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class GMRES:
    """Restarted GMRES(m) (reference ``src/algorithms.jl``; driver
    ``src/linsolve/gmres.jl``)."""

    orth: Orthogonalizer = dataclasses.field(default_factory=_orth_default)
    krylovdim: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.krylovdim
    )
    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class BiCGStab:
    """BiCGStab (reference driver ``src/linsolve/bicgstab.jl``)."""

    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class LSMR:
    """LSMR least-squares solver (reference ``src/lssolve/lsmr.jl``).

    ``krylovdim`` is the size of the ring buffer of ``V`` vectors kept for
    re-orthogonalization (reference ``src/lssolve/lsmr.jl:76-89``)."""

    orth: Orthogonalizer = dataclasses.field(default_factory=_orth_default)
    krylovdim: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.krylovdim
    )
    maxiter: int = dataclasses.field(default_factory=lambda: KrylovDefaults.maxiter)
    tol: float = dataclasses.field(default_factory=lambda: KrylovDefaults.tol)
    verbosity: int = dataclasses.field(
        default_factory=lambda: KrylovDefaults.verbosity
    )


@dataclasses.dataclass(frozen=True)
class EigSorter:
    """Custom eigenvalue sorting (reference ``src/eigsolve/eigsolve.jl:187-193``).

    ``by`` maps an array of eigenvalues to sort keys (must be jittable);
    ``rev=True`` sorts descending.
    """

    by: Callable
    rev: bool = False


Which = Union[str, EigSorter]
