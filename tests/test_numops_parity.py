"""Exact numops/numiter parity with the reference's op accounting.

The reference reports ``numops`` (operator applications) and ``numiter``
(restart cycles, starting at 1) in every ``ConvergenceInfo``
(``src/KrylovKit.jl:185-218``) and pins counts in its tests
(``test/issues.jl:22-29``).  These tests assert the reference's exact counts,
hand-derived from the drivers:

* Lanczos eigsolve (``src/eigsolve/lanczos.jl:21-22,79,115``): numops starts
  at 1 (initialize applies once) and +1 per expansion — i.e. numops equals the
  subspace size reached; numiter starts at 1 and +1 per thick restart.
* GKL svdsolve (``src/eigsolve/svdsolve.jl:161-165,222,275``): 2 applies at
  initialize and per expansion — numops = 2 × subspace size.
* expintegrator (``src/matrixfun/expintegrator.jl:110,151,176,287,291,318``):
  1 probe apply (reused in the w build) + (p−1) build applies + 1 initialize
  + (krylovdim−1) expansions per cycle = p + krylovdim per full cycle; each
  restart costs p rebuild applies + 1 re-initialize + (krylovdim−1)
  expansions; a fixed point detected at a restart exits BEFORE the numiter
  increment (``:299-304`` vs ``:319``); the immediate fixed point reports
  numiter = 0 (``:163``).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import krylovkit_tpu as kk


def test_eigsolve_numops_full_scale():
    """n=10 "full" mode (reference test scale, test/runtests.jl:15): the
    Krylov space exhausts at the invariant subspace — numops == n (subspace
    size), numiter == 1 (no restart ever happens)."""
    rng = np.random.default_rng(0)
    n = 10
    M = rng.standard_normal((n, n))
    A = jnp.asarray(M + M.T)
    vals, vecs, info = kk.eigsolve(
        A, jnp.asarray(rng.standard_normal(n)), 2, "LM", krylovdim=2 * n,
        tol=1e-12,
    )
    assert int(info.converged) >= 2
    assert int(info.numops) == n
    assert int(info.numiter) == 1


def test_eigsolve_numops_iterative_scale():
    """N=100 "iterative" mode (reference scale, test/runtests.jl:16) with
    krylovdim=30: reference accounting gives numops = 30 for the first cycle
    plus (30 − keep) per restart with keep = (3·30 + 2·converged)//5 = 18
    while converged == 0 (src/eigsolve/lanczos.jl:86) — the pinned totals
    below satisfy numops == 30 + (numiter − 1)·12 exactly."""
    rng = np.random.default_rng(0)
    N, m = 100, 30
    M = rng.standard_normal((N, N))
    A = jnp.asarray(M + M.T)
    # burn one rng draw to match the probe ordering used to pin the numbers
    vals, vecs, info = kk.eigsolve(
        A, jnp.asarray(rng.standard_normal(N)), 2, "LM", krylovdim=m,
        maxiter=100, tol=1e-12,
    )
    assert int(info.converged) >= 2
    numiter = int(info.numiter)
    numops = int(info.numops)
    assert numops == m + (numiter - 1) * (m - 18)
    # pinned for this seeded problem (deterministic on CPU f64)
    assert (numops, numiter) == (66, 4)


def test_svdsolve_numops_full_scale():
    """Square full-rank 10×10 map: GKL exhausts the domain at k = 10 —
    numops == 2·n (two applies per step, src/eigsolve/svdsolve.jl:165,222),
    numiter == 1."""
    rng = np.random.default_rng(0)
    n = 10
    R = jnp.asarray(rng.standard_normal((n, n)))
    vals, lv, rv, info = kk.svdsolve(
        R, jnp.asarray(rng.standard_normal(n)), 2, "LR", krylovdim=2 * n,
        tol=1e-12,
    )
    assert int(info.converged) >= 2
    assert int(info.numops) == 2 * n
    assert int(info.numiter) == 1


def test_svdsolve_numops_iterative_scale():
    """200×100 rectangular map, krylovdim=30: numops == 2·[30 + (numiter−1)·
    (30 − keep)] with keep = 18 while nothing has converged (the reference
    keep rule, src/eigsolve/svdsolve.jl:231)."""
    rng = np.random.default_rng(0)
    N, m = 100, 30
    rng.standard_normal((N, N))  # keep draw order of the pinning probe
    rng.standard_normal(N)
    R = jnp.asarray(rng.standard_normal((200, N)))
    vals, lv, rv, info = kk.svdsolve(
        R, jnp.asarray(rng.standard_normal(200)), 2, "LR", krylovdim=m,
        maxiter=100, tol=1e-12,
    )
    assert int(info.converged) >= 2
    numiter = int(info.numiter)
    numops = int(info.numops)
    assert numops == 2 * (m + (numiter - 1) * (m - 18))
    assert (numops, numiter) == (108, 3)


def test_expintegrator_shrinking_dtau_counts():
    """Stiff spectrum forces the adaptive controller through its shrink loop
    (src/matrixfun/expintegrator.jl:203-221): every substep is a full cycle,
    so numops == (p + krylovdim)·numiter exactly, with p = 1."""
    rng = np.random.default_rng(5)
    lam = np.linspace(1.0, 200.0, 40)
    A = jnp.asarray(np.diag(-lam))
    v = jnp.asarray(rng.standard_normal(40))
    m = 15
    y, info = kk.exponentiate(
        A, 1.0, v, krylovdim=m, tol=1e-8, maxiter=100, ishermitian=True
    )
    assert int(info.converged) == 1
    assert int(info.numiter) > 1  # genuinely substepped (Δτ shrank below τ)
    assert int(info.numops) == (1 + m) * int(info.numiter)
    assert np.allclose(
        np.asarray(y), np.exp(-lam) * np.asarray(v), atol=1e-6
    )


def test_expintegrator_t_inf_counts():
    """t = Inf fixed-point mode (src/matrixfun/expintegrator.jl:127-135,
    289-304): the final w rebuild detects the fixed point and exits BEFORE
    initialize! and the numiter increment, so numops == (p + krylovdim)·
    numiter + p with p = 1 and numiter NOT incremented for the last rebuild."""
    rng = np.random.default_rng(0)
    N, m = 30, 10
    M = rng.standard_normal((N, N))
    A = jnp.asarray(-(M @ M.T + N * np.eye(N)))
    b = jnp.asarray(rng.standard_normal(N))
    x0 = jnp.asarray(rng.standard_normal(N))
    w, info = kk.expintegrator(
        A, np.inf, (x0, b), krylovdim=m, tol=1e-10, maxiter=200,
        ishermitian=True,
    )
    assert int(info.converged) == 1
    assert int(info.numops) == (1 + m) * int(info.numiter) + 1
    want = -np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.allclose(np.asarray(w), want, atol=1e-8)


def test_expintegrator_immediate_fixed_point():
    """x0 already at the fixed point: the reference returns after the single
    probe apply with numiter = 0, numops = 1
    (src/matrixfun/expintegrator.jl:160-163)."""
    rng = np.random.default_rng(0)
    n = 10
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    A = jnp.asarray(np.eye(n) - np.outer(v, v))  # A v = 0
    y, info = kk.exponentiate(A, 1.0, jnp.asarray(v), krylovdim=5, tol=1e-8)
    assert int(info.converged) == 1
    assert int(info.numiter) == 0
    assert int(info.numops) == 1
    assert np.allclose(np.asarray(y), v)


def test_expintegrator_phi_functions_counts():
    """p = 2 φ-function combination: build costs p applies (probe reused),
    each full cycle p + krylovdim applies (src/matrixfun/expintegrator.jl:
    144-158, 289-301)."""
    rng = np.random.default_rng(2)
    N, m = 40, 12
    M = rng.standard_normal((N, N))
    A = jnp.asarray(M + M.T)
    u = tuple(jnp.asarray(rng.standard_normal(N)) for _ in range(3))
    y, info = kk.expintegrator(
        A, 0.05, u, krylovdim=m, tol=1e-10, maxiter=60, ishermitian=True
    )
    assert int(info.converged) == 1
    assert int(info.numops) == (2 + m) * int(info.numiter)
