"""krylovkit_tpu — a TPU-native Krylov-subspace framework in JAX.

A from-scratch re-design of the capabilities of KrylovKit.jl (the reference at
/root/reference) for TPU hardware: pytree vectors (shardable over a
``jax.sharding.Mesh``), a dense stacked Krylov basis whose hot kernels are MXU
GEMMs, fully-jitted ``lax.while_loop`` solver drivers with static shapes, and
on-device small dense linear algebra for the projected problems.

Public API (mirroring the reference's exported surface, src/KrylovKit.jl:22-44):
  linsolve, lssolve, eigsolve, schursolve, realeigsolve, geneigsolve, svdsolve,
  exponentiate, expintegrator, plus algorithm structs and orthogonalizers.
"""

from .info import ConvergenceInfo, SILENT, WARN, STARTSTOP, EACHITERATION  # noqa: F401
from .algorithms import (  # noqa: F401
    KrylovDefaults,
    Lanczos,
    BlockLanczos,
    Arnoldi,
    BiArnoldi,
    GKL,
    GolubYe,
    CG,
    MINRES,
    GMRES,
    BiCGStab,
    LSMR,
    EigSorter,
    cgs,
    mgs,
    cgs2,
    mgs2,
    cgsir,
    mgsir,
)
from .ops.vector import VectorSpace  # noqa: F401
from .ops.block import Block  # noqa: F401
from .factorizations.iterators import (  # noqa: F401
    LanczosIterator,
    ArnoldiIterator,
    GKLIterator,
    BlockLanczosIterator,
    BiArnoldiIterator,
    basis,
    rayleighquotient,
    residual,
    normres,
)
from .ops.operator import (  # noqa: F401
    GridStencilOperator,
    LinearOperator,
    ParametricOperator,
    StencilOperator,
    as_operator,
)
from .solvers.eigsolve import eigsolve, schursolve, realeigsolve  # noqa: F401
from .solvers.linsolve import linsolve, reallinsolve  # noqa: F401
from .solvers.svdsolve import svdsolve, realsvdsolve  # noqa: F401
from .solvers.lssolve import lssolve, reallssolve  # noqa: F401
from .solvers.expintegrator import expintegrator, exponentiate  # noqa: F401
from .solvers.golubye import geneigsolve  # noqa: F401
from .solvers.biarnoldi import bieigsolve  # noqa: F401

# subpackages for direct access (kk.dense.schur_active, kk.parallel.make_mesh, …)
from . import dense  # noqa: F401
from . import parallel  # noqa: F401
from .ops import sparse  # noqa: F401

__version__ = "0.1.0"
