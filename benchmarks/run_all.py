"""Benchmark suite over the BASELINE.json configs (one real TPU chip, f32).

Prints one JSON line per config; the driver-facing headline metric stays in
`bench.py` (config 1 at n=2M). Timing follows the bench.py methodology
(warm-up, then back-to-back dispatch with a trailing block_until_ready —
see CLAUDE.md "Perf facts" for why naive timing lies on this backend).

Run: `timeout 1200 python benchmarks/run_all.py`
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import krylovkit_tpu as kk
from krylovkit_tpu.parallel import laplacian_1d, poisson_2d

REPS = 3


def timed(make_solve, x0):
    solve = jax.jit(make_solve)
    out = solve(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = solve(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS, out


def report(name, value, unit, detail=""):
    print(json.dumps({"bench": name, "value": round(value, 3), "unit": unit,
                      "detail": detail}))


# --- config 1: Lanczos eigsolve, 1D Laplacian (driver headline uses n=2M) ---
def config1():
    n = 1 << 21
    op = laplacian_1d(n, jnp.float32)
    alg = kk.Lanczos(krylovdim=30, maxiter=10, tol=1e-30, orth=kk.cgs)
    from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

    def solve(x0):
        vals, vecs, info = eigsolve_lanczos(op, x0, 4, "LM", alg)
        return vals, info.numops

    x0 = jnp.ones((n // 128, 128), jnp.float32)
    dt, (vals, numops) = timed(solve, x0)
    ops = int(numops)
    report("lanczos_laplacian_1d", ops * 3 * n / dt / 1e9, "Gnnz/s",
           f"n={n}, {ops} applies in {dt*1e3:.1f} ms")


# --- config 2: CG + restarted GMRES(30) on the 2D Poisson 5-point stencil ---
def config2():
    nx = ny = 1024  # 1M unknowns, nnz = 5 n
    n = nx * ny
    op = poisson_2d(nx, ny, jnp.float32)
    # (n/128, 128) tile-aligned vectors: the layout the library prescribes —
    # and the one that makes poisson_2d (a GridStencilOperator) eligible for
    # the fused one-stream expansion in GMRES (round 5)
    b = jnp.ones((n // 128, 128), jnp.float32)

    def solve_cg(b):
        # shifted system (0.5 + L) x = b: kappa ~ 17, CONVERGENT in f32
        # (VERDICT r2: the raw Poisson kappa~4e5 solve stagnates in f32 and a
        # fixed-budget run benches nothing) — reports iters-to-tol + throughput.
        # tol is ABSOLUTE ||r||; ||b|| = 1024, so 5e-5 is ~5e-8 relative —
        # just above the measured f32 floor (~1.1e-5) with margin
        x, info = kk.linsolve(op, b, a0=0.5, ishermitian=True, isposdef=True,
                              alg=kk.CG(tol=5e-5, maxiter=400))
        return x, info.numops, info.normres, info.numiter, info.converged

    # Timing note (round 4, arbitrated with an in-device chained-solve
    # slope): the honest per-solve cost is 9.75 ms on device (62 Gnnz/s);
    # free-running dispatch below measures ~13-18 ms (device time + tunnel
    # dispatch). Do NOT host-chain dependent solves on this tunnel — each
    # dependent dispatch pays a 25 ms-1 s round trip (measured 87.7 ms/solve).
    dt, (x, numops, nres, niter, conv) = timed(solve_cg, b)
    ops = int(numops)
    assert int(conv) == 1, f"config-2 CG did not converge: {float(nres)}"
    report("cg_poisson_2d", ops * 5 * n / dt / 1e9, "Gnnz/s",
           f"{nx}x{ny} shifted a0=0.5, converged in {int(niter)} iters "
           f"({ops} applies, {dt*1e3:.1f} ms), normres={float(nres):.1e}")

    def solve_gmres(b):
        # FUSED one-stream Arnoldi cycle (default orth=cgs2 → one-reduce
        # DGKS mode); fixed 14-restart budget (raw kappa~4e5 Poisson does not
        # converge in f32 — throughput row)
        x, info = kk.linsolve(op, b, alg=kk.GMRES(krylovdim=30, tol=1e-4,
                                                  maxiter=14))
        return x, info.numops, info.normres

    dt, (x, numops, nres) = timed(solve_gmres, b)
    ops = int(numops)
    report("gmres30_poisson_2d", ops * 5 * n / dt / 1e9, "Gnnz/s",
           f"{nx}x{ny}, {ops} applies in {dt*1e3:.1f} ms, normres={float(nres):.1e}")

    def solve_gmres_conv(b):
        # CONVERGENT GMRES datapoint (VERDICT r4 #8): same shifted system as
        # the CG row (kappa ~ 17) — wall-clock + true residual recorded
        x, info = kk.linsolve(op, b, a0=0.5,
                              alg=kk.GMRES(krylovdim=30, tol=5e-5,
                                           maxiter=20))
        return x, info.numops, info.normres, info.numiter, info.converged

    dt, (x, numops, nres, niter, conv) = timed(solve_gmres_conv, b)
    ops = int(numops)
    assert int(conv) == 1, f"config-2 GMRES(shifted) did not converge: {float(nres)}"
    report("gmres30_poisson_2d_shifted_convergent", ops * 5 * n / dt / 1e9,
           "Gnnz/s",
           f"{nx}x{ny} a0=0.5, converged in {int(niter)} restarts "
           f"({ops} applies, {dt*1e3:.1f} ms), true normres={float(nres):.1e}")


# --- config 3: GKL svdsolve, 8 largest triplets of a rectangular operator ---
def config3():
    # rectangular "term-document"-like map: banded + decaying weights,
    # matrix-free (rows 2^20, cols 2^19), nnz/apply ~ 3 rows.  Vectors are
    # tile-aligned (rows, 128) — the layout the library prescribes (flat (n,)
    # puts the basis index in the tile sublane dim; see CLAUDE.md perf facts)
    R, C = 1 << 20, 1 << 19
    wr = jnp.asarray(
        np.linspace(1.0, 3.0, C, dtype=np.float32).reshape(C // 128, 128)
    )

    def A(x):      # (C/128, 128) -> (R/128, 128): upsample with banded mixing
        y0 = wr * x
        y1 = 0.5 * jnp.roll(wr * x, 1, axis=0)
        return jnp.concatenate([y0, y1], axis=0)

    def Ah(y):     # adjoint
        y0, y1 = y[: C // 128], y[C // 128 :]
        return wr * y0 + 0.5 * wr * jnp.roll(y1, -1, axis=0)

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((R // 128, 128)), jnp.float32
    )

    def solve(x0):
        S, U, V, info = kk.svdsolve((A, Ah), x0, 8, "LR",
                                    krylovdim=30, maxiter=12, tol=1e-30)
        return S, info.numops

    dt, (S, numops) = timed(solve, x0)
    ops = int(numops)  # counts A and Ah applications
    report("gkl_svdsolve_rect", ops * 3 * C / dt / 1e9, "Gnnz/s",
           f"{R}x{C}, {ops} applies in {dt*1e3:.1f} ms, S0={float(S[0]):.4f}")

    # square non-symmetric grid stencil (advection-diffusion): the
    # stencil-expressible config-3 variant — FUSED one-stream GKL kernels
    # (normal + adjoint stencil applies in-kernel; factorizations/gkl.py)
    from krylovkit_tpu.ops.operator import GridStencilOperator

    gr = gcols = 1024
    nsq = gr * gcols
    opsq = GridStencilOperator(
        (gr, gcols), ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
        (4.0, -1.5, -0.5, -1.2, -0.8),
    )
    x0sq = jnp.asarray(
        np.random.default_rng(2).standard_normal((nsq // 128, 128)),
        jnp.float32,
    )

    def solve_sq(x0):
        S, U, V, info = kk.svdsolve(opsq, x0, 8, "LR",
                                    krylovdim=30, maxiter=12, tol=1e-30)
        return S, info.numops

    dt, (S, numops) = timed(solve_sq, x0sq)
    ops = int(numops)
    report("gkl_svdsolve_square_stencil_fused", ops * 5 * nsq / dt / 1e9,
           "Gnnz/s",
           f"{gr}x{gcols} grid, {ops} applies in {dt*1e3:.1f} ms, "
           f"S0={float(S[0]):.4f}")


# --- config 4: real-Schur Arnoldi + expintegrator Hamiltonian step ---
def config4():
    n = 1 << 20
    # non-normal transport-diffusion stencil (real Schur path on device).
    # As a StencilOperator (static offsets/coeffs, zero BC) the Arnoldi
    # expansion runs the fused one-stream kernel (ops/pallas_fused_lanczos.py)
    from krylovkit_tpu.ops.operator import StencilOperator

    op = StencilOperator((-1, 0, 1), (-1.3, 2.0, -0.7))

    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((n // 128, 128)), jnp.float32
    )

    def solve(x0):
        # DEFAULT kwargs: orth=cgs2 routes through the fused one-reduce DGKS
        T, vecs, (re, im), info = kk.schursolve(
            op, x0, 4, "LM", krylovdim=30, maxiter=8, tol=1e-30)
        return re, info.numops

    dt, (re, numops) = timed(solve, x0)
    ops = int(numops)
    report("arnoldi_realschur_nonsym", ops * 3 * n / dt / 1e9, "Gnnz/s",
           f"n={n}, {ops} applies in {dt*1e3:.1f} ms")

    # −Laplacian as a StencilOperator: static metadata lets exponentiate's
    # Lanczos subspace run the fused one-stream expansion (a plain lambda
    # would hide it — and a fresh lambda per call would also recompile)
    neg_lap = StencilOperator((-1, 0, 1), (1.0, -2.0, 1.0))

    # exponentiate's front-end does host-side setup: call it directly (its
    # core is jitted internally)
    def step(x0):
        y, info = kk.exponentiate(neg_lap, 0.1, x0, krylovdim=30, tol=1e-4,
                                  ishermitian=True)  # default orth
        return y, info.numops

    y, numops = step(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(REPS):
        y, numops = step(x0)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / REPS
    ops = int(numops)
    report("exponentiate_step", ops * 3 * n / dt / 1e9, "Gnnz/s",
           f"n={n}, {ops} applies in {dt*1e3:.1f} ms")


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}")
    config1()
    config2()
    config3()
    config4()
