"""On-chip smoke test: drive every solver family on the real TPU (f32).

The CPU test suite is the correctness oracle; this script validates that each
driver COMPILES AND RUNS on the actual TPU backend (including runtimes
without complex support — everything here is real arithmetic end to end;
note `eigsolve` on a real non-Hermitian map intentionally returns COMPLEX
eigenvalues and so cannot run on complex-less runtimes: use `schursolve` or
`realeigsolve` there). Run: `timeout 900 python tools/tpu_smoke.py`.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import krylovkit_tpu as kk
from krylovkit_tpu.parallel import laplacian_1d, poisson_2d

rng = np.random.default_rng(0)
n = 1 << 14
lap = laplacian_1d(n, jnp.float32)
x2 = jnp.asarray(rng.standard_normal((n // 128, 128)), jnp.float32)
b2 = jnp.asarray(rng.standard_normal((n // 128, 128)), jnp.float32)

results = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        ok, detail = out if isinstance(out, tuple) else (out, "")
        status = "OK " if ok else "FAIL"
    except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
        status, detail = "ERR ", f"{type(e).__name__}: {str(e)[:90]}"
    dt = time.perf_counter() - t0
    results.append((name, status))
    print(f"{status} {name:28s} {dt:6.1f}s  {detail}")


def eigsolve_lanczos():
    vals, vecs, info = kk.eigsolve(lap, x2, 4, "LM", ishermitian=True,
                                   krylovdim=30, maxiter=20, tol=1e-3)
    return bool(np.all(np.abs(np.asarray(vals) - 4.0) < 0.05)), f"vals[0]={float(vals[0]):.4f}"


def schursolve_real():
    def op(x):
        return 2.0 * x - 1.2 * jnp.roll(x, 1, axis=0) - 0.8 * jnp.roll(x, -1, axis=0)
    T, vecs, (re, im), info = kk.schursolve(op, x2, 2, "LM",
                                            krylovdim=25, maxiter=30, tol=1e-2)
    return bool(np.isfinite(np.asarray(re)).all()), f"re={np.asarray(re).round(3)}"


def realeigsolve_smoke():
    d = jnp.asarray(np.linspace(1, 6, n).reshape(n // 128, 128), jnp.float32)
    vals, vecs, info = kk.realeigsolve(lambda x: d * x, x2, 2, "LR",
                                       krylovdim=25, maxiter=40, tol=1e-3)
    return bool(abs(float(vals[0]) - 6.0) < 1e-2), f"vals={np.asarray(vals).round(4)}"


def linsolve_cg():
    shifted = kk.LinearOperator(lambda x: lap.normal(x) + 0.5 * x,
                                lambda x: lap.normal(x) + 0.5 * x)
    x, info = kk.linsolve(shifted, b2, alg=kk.CG(tol=1e-4, maxiter=500))
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def linsolve_gmres():
    def op(x):
        return 3.0 * x - 1.2 * jnp.roll(x, 1, axis=0) - 0.8 * jnp.roll(x, -1, axis=0)
    x, info = kk.linsolve(op, b2, alg=kk.GMRES(krylovdim=30, tol=1e-4, maxiter=50))
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def linsolve_bicgstab():
    def op(x):
        return 3.0 * x - 1.2 * jnp.roll(x, 1, axis=0) - 0.8 * jnp.roll(x, -1, axis=0)
    x, info = kk.linsolve(op, b2, alg=kk.BiCGStab(tol=1e-4, maxiter=300))
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def linsolve_minres():
    # Hermitian indefinite, spectrum in [-2,-1] u [1,2] (bounded away from 0)
    dm = np.linspace(1.0, 2.0, n)
    dm[::2] *= -1.0
    dm = jnp.asarray(dm.reshape(n // 128, 128), jnp.float32)
    x, info = kk.linsolve(lambda x: dm * x, b2,
                          ishermitian=True, isposdef=False,
                          alg=kk.MINRES(tol=1e-3, maxiter=500))
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def lssolve_lsmr():
    d = jnp.asarray(np.linspace(0.5, 2.0, n).reshape(n // 128, 128), jnp.float32)
    x, info = kk.lssolve((lambda x: d * x, lambda y: d * y), b2,
                         tol=1e-4, maxiter=200)
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def svdsolve_gkl():
    d = jnp.asarray(np.linspace(0.1, 3.0, n).reshape(n // 128, 128), jnp.float32)
    S, U, V, info = kk.svdsolve((lambda x: d * x, lambda y: d * y), x2, 2, "LR",
                                krylovdim=25, maxiter=40, tol=1e-3)
    return bool(abs(float(S[0]) - 3.0) < 1e-2), f"S={np.asarray(S).round(4)}"


def exponentiate_herm():
    y, info = kk.exponentiate(lambda x: -lap.normal(x), jnp.float32(0.5), x2,
                              krylovdim=25, tol=1e-4, ishermitian=True)
    nrm = float(jnp.linalg.norm(y))
    return bool(np.isfinite(nrm) and nrm <= float(jnp.linalg.norm(x2)) + 1e-3), f"|y|={nrm:.4f}"


def geneigsolve_smoke():
    dA = jnp.asarray(np.linspace(1, 4, n).reshape(n // 128, 128), jnp.float32)
    dB = jnp.asarray(np.linspace(1, 2, n).reshape(n // 128, 128), jnp.float32)
    vals, vecs, info = kk.geneigsolve((lambda x: dA * x, lambda x: dB * x), x2,
                                      1, "SR", krylovdim=20, maxiter=40, tol=1e-3)
    return bool(np.isfinite(float(vals[0]))), f"val={float(vals[0]):.4f}"


def gmres_fused_grid():
    # round 5: fused Arnoldi cycle w/ in-loop Givens QR on a GridStencil
    op = poisson_2d(256, 256, jnp.float32)
    bg = jnp.ones((256 * 256 // 128, 128), jnp.float32)
    x, info = kk.linsolve(op, bg, a0=0.5,
                          alg=kk.GMRES(krylovdim=30, tol=1e-4, maxiter=20))
    return bool(int(info.converged) == 1), f"normres={float(info.normres):.2e}"


def svdsolve_fused_grid():
    # round 5: fused one-stream GKL (normal + adjoint stencil kernels)
    from krylovkit_tpu.ops.operator import GridStencilOperator

    op = GridStencilOperator(
        (256, 256), ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
        (4.0, -1.5, -0.5, -1.2, -0.8),
    )
    xg = jnp.asarray(rng.standard_normal((256 * 256 // 128, 128)), jnp.float32)
    S, U, V, info = kk.svdsolve(op, xg, 2, "LR", krylovdim=25, maxiter=30,
                                tol=1e-3)
    ok = bool(np.isfinite(float(S[0])) and 6.0 < float(S[0]) < 9.0)
    return ok, f"S={np.asarray(S).round(4)}"


def blocklanczos_smoke():
    blk = kk.Block([x2, b2])
    vals, vecs, info = kk.eigsolve(lap, blk, 2, "LM", krylovdim=None,
                                   alg=kk.BlockLanczos(krylovdim=24, maxiter=15, tol=1e-2))
    return bool(np.all(np.abs(np.asarray(vals) - 4.0) < 0.1)), f"vals={np.asarray(vals).round(4)}"


checks = [
    ("eigsolve/Lanczos", eigsolve_lanczos),
    ("schursolve (real Schur)", schursolve_real),
    ("realeigsolve", realeigsolve_smoke),
    ("linsolve/CG", linsolve_cg),
    ("linsolve/GMRES", linsolve_gmres),
    ("linsolve/BiCGStab", linsolve_bicgstab),
    ("linsolve/MINRES", linsolve_minres),
    ("lssolve/LSMR", lssolve_lsmr),
    ("svdsolve/GKL", svdsolve_gkl),
    ("exponentiate", exponentiate_herm),
    ("geneigsolve/GolubYe", geneigsolve_smoke),
    ("eigsolve/BlockLanczos", blocklanczos_smoke),
    ("GMRES fused 2-D grid", gmres_fused_grid),
    ("svdsolve fused GKL grid", svdsolve_fused_grid),
]

print(f"devices: {jax.devices()}")
for name, fn in checks:
    check(name, fn)

fails = [n_ for n_, s in results if s != "OK "]
print(f"\n{len(results) - len(fails)}/{len(results)} solver families OK on this chip")
if fails:
    print("failing:", fails)
    sys.exit(1)
