"""2-D Poisson on a 1024×1024 grid: fused GMRES, CG, and SVD triplets.

Round-5 surface tour: ``poisson_2d`` returns a
:class:`~krylovkit_tpu.GridStencilOperator` — (dy, dx) offsets with Dirichlet
boundaries on both axes as STATIC metadata — so with the prescribed
``(n/128, 128)`` vector layout every Krylov driver runs the fused one-stream
expansion kernel (including the library-default ``cgs2`` orthogonalizer via
the one-reduce DGKS mode).  Run on CPU or TPU: ``python
examples/05_poisson_gmres_fused.py``.
"""

import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.parallel import poisson_2d

nx = ny = 512 if jax.default_backend() != "tpu" else 1024
n = nx * ny
A = poisson_2d(nx, ny, jnp.float32)
b = jnp.ones((n // 128, 128), jnp.float32)

# shifted system (0.5 + A) x = b — κ ≈ 17, convergent in f32
x, info = kk.linsolve(A, b, a0=0.5, alg=kk.GMRES(krylovdim=30, tol=5e-5,
                                                 maxiter=20))
print(f"GMRES: converged={int(info.converged)} in {int(info.numiter)} "
      f"restarts ({int(info.numops)} applies), |r|={float(info.normres):.2e}")

x, info = kk.linsolve(A, b, a0=0.5, ishermitian=True, isposdef=True,
                      alg=kk.CG(tol=5e-5, maxiter=200))
print(f"CG:    converged={int(info.converged)} in {int(info.numiter)} "
      f"iters, |r|={float(info.normres):.2e}")

# largest eigenpairs of the SPD stencil (fused Lanczos, default kwargs)
vals, vecs, info = kk.eigsolve(A, b, 4, "LM", ishermitian=True,
                               krylovdim=30, tol=1e-4)
print(f"eigsolve: λ = {[round(float(v), 5) for v in vals]} "
      f"({int(info.converged)} converged)")

# leading singular triplets of a NON-symmetric grid stencil
# (advection-diffusion): fused GKL — normal + adjoint stencil kernels
Aad = kk.GridStencilOperator(
    (nx, ny), ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
    (4.0, -1.5, -0.5, -1.2, -0.8),
)
S, U, V, info = kk.svdsolve(Aad, b, 4, "LR", krylovdim=30, tol=5e-3,
                            maxiter=40)
print(f"svdsolve: σ = {[round(float(s), 5) for s in S]} "
      f"({int(info.converged)} converged)")
