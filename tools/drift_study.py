"""Orthogonality-drift study: single-sweep fused CGS vs two-sweep cgs2/mgs2.

VERDICT r4 weak-spot #1: the fused one-stream expansion performs ONE full CGS
projection per Lanczos step, while the library default ``cgs2`` performs the
explicit 3-term subtraction + one full drift sweep (``kf.expand_hermitian``).
This tool measures, over ``NCYCLES`` thick-restart cycles in f32 (far beyond
any driver-parity test), the basis orthogonality defect

    d_k = max_offdiag |<v_i, v_j>|   over the active block each cycle

and the converged-eigenvalue error vs the analytic spectrum, for:

  * fused-cgs      — the one-stream kernel (interpret mode off-chip)
  * unfused-cgs    — single full CGS projection (same math, XLA two-stream)
  * unfused-cgs2   — 3-term + CGS drift sweep (library default semantics)
  * unfused-mgs2   — 3-term + MGS drift sweep (reference default semantics)

ORACLE: full (single-sweep) reorthogonalization maintains semiorthogonality;
defects must stay below eps^(1/2) ≈ 3.4e-4 (f32), and Ritz-value errors at
the converged tolerance.  The recorded result (benchmarks/RESULTS.md) is what
justifies routing ``cgs2`` through the fused single-sweep stream.

Run: ``python tools/drift_study.py`` (CPU; ~2 min).  ``--cycles N`` to vary.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # accurate defect MEASUREMENT only

import jax.numpy as jnp
import numpy as np

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops import basis as bs
from krylovkit_tpu.ops.vector import STANDARD
from krylovkit_tpu.solvers.lanczos import _process, _restart
from krylovkit_tpu.parallel import laplacian_1d

N = 1 << 14  # 16384: (128, 128) f32 vectors
M = 30  # krylovdim
HOWMANY = 4

def run(mode, ncycles, seed=0):
    op = laplacian_1d(N, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(seed).standard_normal((N // 128, 128)),
        jnp.float32,
    )
    orth = {"fused-cgs": kk.cgs, "fused-dgks": kk.cgs2, "unfused-cgs": kk.cgs,
            "unfused-cgs2": kk.cgs2, "unfused-mgs2": kk.mgs2}[mode]
    fused = mode.startswith("fused")
    dgks = mode == "fused-dgks"
    kf.fused_interpret = True

    fact = kf.initialize(x0, M, jnp.float32)
    s = kf.fused_scales_init(M + 1)
    btol = jnp.asarray(np.finfo(np.float32).eps, jnp.float32) ** 0.75

    @jax.jit
    def cycle(fact, s):
        if fused:
            fact, s, _ = kf.fused_expansions(
                op, fact, s, M, btol, STANDARD, dgks=dgks
            )
        else:
            def body(c):
                f, _ = c
                f = kf.expand_hermitian(op.normal, f, orth, STANDARD)
                return f, jnp.int32(0)

            def cond(c):
                f, _ = c
                return jnp.logical_and(f.k < M, f.beta > btol)

            fact, _ = jax.lax.while_loop(cond, body, (fact, jnp.int32(0)))
        # defect over the active block with the bookkeeping folded in
        # (true basis v_j = Σ_i L[i,j]·row_i; f64 measure)
        Vl = jax.tree_util.tree_leaves(fact.V)[0].astype(jnp.float64)
        Vl = jnp.einsum("ij,irc->jrc", s.L.astype(jnp.float64), Vl)
        Gm = jnp.einsum("irc,jrc->ij", Vl, Vl)
        act = jnp.arange(M + 1) <= fact.k
        mask = act[:, None] & act[None, :]
        off = jnp.where(
            mask & ~jnp.eye(M + 1, dtype=bool), jnp.abs(Gm - jnp.eye(M + 1)), 0
        )
        defect = jnp.max(off)
        # process + thick restart (exact driver math, solvers/lanczos.py)
        nconv, vals, U, res = _process(
            fact.H, fact.k, fact.beta, "LM", jnp.asarray(0.0, jnp.float32),
            HOWMANY,
        )
        keep_raw = (3 * M + 2 * nconv) // 5
        keep = jnp.clip(keep_raw, 1, jnp.maximum(fact.k - 1, 1))
        keep_max = min((3 * M + 2 * max(HOWMANY - 1, 0)) // 5, M - 1)
        fact = _restart(
            fact, vals, U, fact.beta, keep, keep_max,
            gate=jnp.asarray(True), scales=s.L if fused else None,
        )
        return (
            fact, kf.fused_scales_init(M + 1, H=fact.H if fused else None),
            defect, vals[:HOWMANY],
        )

    defects, vals = [], None
    for c in range(ncycles):
        fact, s, d, vals = cycle(fact, s)
        defects.append(float(d))
    # analytic spectrum of tridiag(-1,2,-1): 2 - 2 cos(k pi / (N+1))
    kk_ = np.arange(1, HOWMANY + 1)
    exact = 2 - 2 * np.cos(np.pi * (N - kk_ + 1) / (N + 1))
    err = np.max(np.abs(np.sort(np.asarray(vals))[::-1] - np.sort(exact)[::-1]))
    return np.asarray(defects), err


def main():
    ncycles = 100
    for a in sys.argv[1:]:
        if a.startswith("--cycles"):
            ncycles = int(a.split("=")[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])
    eps32 = float(np.finfo(np.float32).eps)
    print(f"n={N} krylovdim={M} cycles={ncycles} f32 "
          f"(sqrt(eps)={eps32**0.5:.1e}, eps^(2/3)={eps32**(2/3):.1e})")
    print(f"{'mode':14s} {'max defect':>11s} {'p50':>9s} {'final':>9s} "
          f"{'eig err':>9s}")
    results = {}
    for mode in ("fused-cgs", "fused-dgks", "unfused-cgs", "unfused-cgs2",
                 "unfused-mgs2"):
        d, err = run(mode, ncycles)
        results[mode] = (d, err)
        print(f"{mode:14s} {d.max():11.2e} {np.median(d):9.2e} "
              f"{d[-1]:9.2e} {err:9.2e}", flush=True)
    # oracle: all modes within sqrt(eps) semiorthogonality
    ok = results["fused-dgks"][0].max() < eps32 ** 0.5
    ratio = results["fused-dgks"][0].max() / max(
        results["unfused-cgs2"][0].max(), 1e-12)
    print(f"oracle(fused-dgks < sqrt(eps)): {'PASS' if ok else 'FAIL'}; "
          f"fused-dgks/cgs2 defect ratio = {ratio:.2f}")


if __name__ == "__main__":
    main()
