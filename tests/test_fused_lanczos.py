"""Fused one-stream Lanczos expansion (ops/pallas_fused_lanczos.py) —
interpret-mode tests so the TPU kernel path runs on CPU CI.

Covers: kernel-level correctness vs a pure-XLA reference (including the
in-place row-append aliasing contract), end-to-end driver parity against the
unfused cgs path (values, numops, numiter, residual norms), restart-cycle
parity (the scale vector must fold into the rotation), and the eligibility
gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import krylovkit_tpu as kk
from krylovkit_tpu.factorizations import krylov as kf
from krylovkit_tpu.ops.operator import StencilOperator
from krylovkit_tpu.ops.pallas_fused_lanczos import (
    boundary_cache,
    choose_tile,
    fused_step,
    spec_for,
    supported_stencil,
)
from krylovkit_tpu.ops.pallas_fused_lanczos import cache_from_tile_rows as pf_cache
from krylovkit_tpu.ops.vector import STANDARD
from krylovkit_tpu.parallel import laplacian_1d
from krylovkit_tpu.solvers.lanczos import eigsolve_lanczos

COEFFS = (-1.0, 2.0, -1.0)
OFFSETS = (-1, 0, 1)


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = kf.fused_interpret
    kf.fused_interpret = True
    yield
    kf.fused_interpret = old


def _ref_step(V, y, g, kp1, B):
    kmax, R, C = V.shape
    n = R * C
    W = g[kmax] * y - jnp.einsum("j,jrc->rc", g[:B], V[:B])
    wf = W.reshape(n)
    idx = jnp.arange(n)
    yn = jnp.zeros(n, jnp.float32)
    for coef, d in zip(COEFFS, OFFSETS):
        sh = jnp.roll(wf, -d)
        sh = jnp.where((idx + d >= 0) & (idx + d < n), sh, 0)
        yn = yn + coef * sh
    yn = yn.reshape(R, C)
    r = jnp.einsum("jrc,rc->j", V[:B], yn)
    return V.at[kp1].set(W), yn, r, jnp.sum(W * yn), jnp.sum(W * W)


@pytest.mark.parametrize("B,kp1", [(8, 8), (16, 12), (31, 30)])
def test_fused_step_matches_reference(B, kp1):
    rng = np.random.default_rng(0)
    kmax, R = 31, 32
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)).astype("float32"))
    y = jnp.asarray(rng.standard_normal((R, 128)).astype("float32"))
    g = jnp.asarray(rng.standard_normal(kmax + 1).astype("float32"))
    T = choose_tile(R, 8)
    spec = spec_for(StencilOperator(OFFSETS, COEFFS))
    Vn, yn, raw, wb, ynb = fused_step(
        V, y, boundary_cache(V, T), boundary_cache(y, T), g, jnp.int32(kp1),
        B, spec, tile_rows=8, interpret=True,
    )
    Vr, ynr, r, rp, q = _ref_step(V, y, g, kp1, B)
    sc = float(jnp.max(jnp.abs(ynr)))
    np.testing.assert_allclose(np.asarray(Vn), np.asarray(Vr), atol=2e-4 * sc)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(ynr), atol=2e-4 * sc)
    mask = np.arange(B) != kp1  # raw[kp1] unspecified when kp1 < B
    np.testing.assert_allclose(
        np.asarray(raw[:B])[mask], np.asarray(r)[mask], rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(float(raw[B]), float(rp), rtol=2e-4)
    np.testing.assert_allclose(float(raw[B + 1]), float(q), rtol=2e-4)
    # boundary outputs feed the caches: converted planes must equal a fresh
    # boundary_cache of the written vectors
    np.testing.assert_allclose(
        np.asarray(pf_cache(wb)),
        np.asarray(boundary_cache(jnp.asarray(Vr[kp1]), T)),
        atol=2e-4 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pf_cache(ynb)),
        np.asarray(boundary_cache(ynr, T)),
        atol=2e-4 * sc,
    )
    # rows other than kp1 bit-identical (in-place append contract)
    keep = np.arange(kmax) != kp1
    assert np.array_equal(np.asarray(Vn)[keep], np.asarray(V)[keep])


def _solve(op, x0, alg, fused):
    old = kf.use_fused_expansion
    kf.use_fused_expansion = fused
    try:
        return jax.jit(
            lambda x: eigsolve_lanczos(op, x, 4, "LM", alg)
        )(x0)
    finally:
        kf.use_fused_expansion = old


@pytest.mark.parametrize("maxiter", [1, 6])
def test_fused_driver_matches_unfused(maxiter):
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    assert isinstance(op, StencilOperator)
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((n // 128, 128)), jnp.float32
    )
    alg = kk.Lanczos(krylovdim=18, maxiter=maxiter, tol=1e-5, orth=kk.cgs)
    v0, e0, i0 = _solve(op, x0, alg, fused=False)
    v1, e1, i1 = _solve(op, x0, alg, fused=True)
    assert kf.fused_available(op, x0, STANDARD)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=2e-4)
    assert int(i0.numops) == int(i1.numops)
    assert int(i0.numiter) == int(i1.numiter)
    np.testing.assert_allclose(
        np.asarray(i0.normres), np.asarray(i1.normres), rtol=0.05, atol=1e-5
    )
    for a, b in zip(e0, e1):
        # eigenvectors agree up to sign
        dot = float(jnp.abs(jnp.vdot(a, b)))
        np.testing.assert_allclose(dot, 1.0, rtol=1e-3)


def test_fused_converged_eigenpairs():
    n = 1 << 11
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(2).standard_normal((n // 128, 128)), jnp.float32
    )
    # f32 + clustered cos-spectrum edges: 5e-3 converges all 4 in ~30 cycles
    alg = kk.Lanczos(krylovdim=20, maxiter=30, tol=5e-3, orth=kk.cgs)
    vals, vecs, info = _solve(op, x0, alg, fused=True)
    assert int(info.converged) >= 2
    for i in range(int(info.converged)):
        v = vecs[i]
        np.testing.assert_allclose(float(jnp.linalg.norm(v)), 1.0, rtol=1e-4)
        r = op.normal(v) - vals[i] * v
        assert float(jnp.linalg.norm(r)) < 2e-2


def test_fused_gate():
    n = 1 << 12
    x0_good = jnp.ones((n // 128, 128), jnp.float32)
    op = laplacian_1d(n, jnp.float32)
    assert kf.fused_available(op, x0_good, STANDARD)
    # flat vectors, wrong dtype, non-stencil op, periodic BC → ineligible
    assert not kf.fused_available(op, jnp.ones((n,), jnp.float32), STANDARD)
    assert not kf.fused_available(
        op, jnp.ones((n // 128, 128), jnp.float64), STANDARD
    )
    from krylovkit_tpu.ops.operator import as_operator

    assert not kf.fused_available(
        as_operator(lambda x: 2 * x), x0_good, STANDARD
    )
    assert not kf.fused_available(
        laplacian_1d(n, jnp.float32, dirichlet=False), x0_good, STANDARD
    )
    assert supported_stencil((-128, 0, 128))
    # round-5 widening: multi-row halos admit |δ| > 128 up to MAX_HALO rows
    assert supported_stencil((-200, 0, 200))
    assert not supported_stencil((-33 * 128, 0))


def test_stencil_operator_apply_matches_dense():
    # generic StencilOperator XLA apply: row-major flattening, zero BC
    n = 512
    offsets = (-3, -1, 0, 2)
    coeffs = (0.5, -1.0, 2.0, 0.25)
    op = StencilOperator(offsets, coeffs)
    A = np.zeros((n, n), np.float32)
    for c, d in zip(coeffs, offsets):
        for i in range(n):
            if 0 <= i + d < n:
                A[i, i + d] = c
    x = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    want = A @ x
    got_flat = np.asarray(op.normal(jnp.asarray(x)))
    np.testing.assert_allclose(got_flat, want, atol=1e-5)
    got_2d = np.asarray(op.normal(jnp.asarray(x.reshape(4, 128)))).reshape(n)
    np.testing.assert_allclose(got_2d, want, atol=1e-5)
    # adjoint = transpose
    want_t = A.T @ x
    got_t = np.asarray(op.adjoint(jnp.asarray(x.reshape(4, 128)))).reshape(n)
    np.testing.assert_allclose(got_t, want_t, atol=1e-5)


@pytest.mark.parametrize("maxiter", [1, 5])
def test_fused_arnoldi_matches_unfused(maxiter):
    # Arnoldi mode: full-Hessenberg column writes + real-Schur processing
    n = 1 << 12
    op = StencilOperator((-1, 0, 1), (-1.3, 2.0, -0.7))  # non-normal transport
    x0 = jnp.asarray(
        np.random.default_rng(5).standard_normal((n // 128, 128)), jnp.float32
    )
    kw = dict(krylovdim=18, maxiter=maxiter, tol=1e-5, orth=kk.cgs)

    def run(fused):
        old = kf.use_fused_expansion
        kf.use_fused_expansion = fused
        try:
            return jax.jit(lambda x: kk.schursolve(op, x, 4, "LM", **kw))(x0)
        finally:
            kf.use_fused_expansion = old

    T0, V0, (re0, im0), i0 = run(False)
    T1, V1, (re1, im1), i1 = run(True)
    np.testing.assert_allclose(np.asarray(re0), np.asarray(re1), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(im0), np.asarray(im1), rtol=2e-4, atol=1e-6
    )
    assert int(i0.numops) == int(i1.numops)
    np.testing.assert_allclose(
        np.asarray(i0.normres), np.asarray(i1.normres), rtol=0.05, atol=1e-5
    )
    # Schur vectors agree up to sign and stay orthonormal
    for a, b in zip(V0, V1):
        np.testing.assert_allclose(
            float(jnp.abs(jnp.vdot(a, b))), 1.0, rtol=1e-3
        )


def test_fused_realeigsolve():
    # realeigsolve through the fused Arnoldi path: the symmetric Laplacian is
    # a StencilOperator whose real-Schur values stay real (non-normal real
    # stencils keep unconverged 2x2 blocks at any modest budget — both paths
    # reject those identically, which test_fused_arnoldi covers)
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(6).standard_normal((n // 128, 128)), jnp.float32
    )
    old = kf.use_fused_expansion
    kf.use_fused_expansion = True
    try:
        vals, vecs, info = kk.realeigsolve(
            op, x0, 2, "LM", krylovdim=20, maxiter=30, tol=5e-3, orth=kk.cgs
        )
    finally:
        kf.use_fused_expansion = old
    assert int(info.converged) >= 1
    for i in range(int(info.converged)):
        v = vecs[i]
        r = op.normal(v) - vals[i] * v
        assert float(jnp.linalg.norm(r)) < 2e-2


def test_fused_exponentiate_matches_unfused():
    # expintegrator's Lanczos subspace through the fused path
    n = 1 << 12
    neg_lap = StencilOperator((-1, 0, 1), (1.0, -2.0, 1.0))
    x0 = jnp.asarray(
        np.random.default_rng(7).standard_normal((n // 128, 128)), jnp.float32
    )
    out = {}
    for flag in (False, True):
        from krylovkit_tpu.solvers.expintegrator import _expintegrator_core

        _expintegrator_core.clear_cache()
        old = kf.use_fused_expansion
        kf.use_fused_expansion = flag
        try:
            y, info = kk.exponentiate(
                neg_lap, 0.1, x0, krylovdim=30, tol=1e-4, ishermitian=True,
                orth=kk.cgs,
            )
        finally:
            kf.use_fused_expansion = old
        out[flag] = (np.asarray(y), int(info.numops), int(info.converged))
    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-4, atol=1e-6)
    assert out[True][1] == out[False][1]
    assert out[True][2] == out[False][2] == 1


def test_fused_reentry_with_unnormalized_rows():
    # fused_expansions entered mid-build with unnormalized stored rows (the
    # expintegrator rejected-partial-attempt path): the priming norm must come
    # from the scale vector, not an assumed q = 1 (round-4 advisor finding).
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(11).standard_normal((n // 128, 128)), jnp.float32
    )
    m = 12
    btol = jnp.asarray(1e-12, jnp.float32)
    st0 = kf.initialize(x0, m, jnp.float32)
    sc0 = kf.fused_scales_init(m + 1)

    stA, scA, opsA = kf.fused_expansions(op, st0, sc0, m, btol, STANDARD)
    st1, sc1, ops1 = kf.fused_expansions(op, st0, sc0, 6, btol, STANDARD)
    # row 6 of st1 is stored unnormalized with scale s[6] != 1
    assert abs(float(sc1.s[6]) - 1.0) > 1e-3
    st2, sc2, ops2 = kf.fused_expansions(op, st1, sc1, m, btol, STANDARD)

    assert int(opsA) == int(ops1) + int(ops2)
    np.testing.assert_allclose(
        np.asarray(jnp.tril(st2.H)), np.asarray(jnp.tril(stA.H)),
        rtol=5e-4, atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sc2.s), np.asarray(scA.s), rtol=5e-4
    )
    VA = np.asarray(jax.tree_util.tree_leaves(stA.V)[0])
    V2 = np.asarray(jax.tree_util.tree_leaves(st2.V)[0])
    np.testing.assert_allclose(V2, VA, rtol=5e-4, atol=5e-5)


def test_fused_min_one_forces_progress():
    # min_one=True must expand exactly one step even when the entry residual
    # is below btol (reference expands once per outer iteration while
    # K < krylovdim, src/matrixfun/expintegrator.jl:285-287)
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(12).standard_normal((n // 128, 128)), jnp.float32
    )
    m = 10
    st0 = kf.initialize(x0, m, jnp.float32)
    sc0 = kf.fused_scales_init(m + 1)
    huge = jnp.asarray(1e6, jnp.float32)  # btol above any residual
    st, s, ops = kf.fused_expansions(op, st0, sc0, m, huge, STANDARD)
    assert int(st.k) == 0 and int(ops) == 1  # gate refuses (prime only)
    st, s, ops = kf.fused_expansions(
        op, st0, sc0, m, huge, STANDARD, min_one=True
    )
    assert int(st.k) == 1


def test_fused_gate_kmax_lanes():
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    assert kf.fused_available(op, x0, STANDARD, kmax=126)
    assert not kf.fused_available(op, x0, STANDARD, kmax=127)


def test_stencil_operator_ndim3_leaf_flattening():
    # ndim > 2 leaves follow the documented whole-leaf row-major flattening
    # (cross-slice carries included), not independent per-slice blocks
    n = 1024
    offsets = (-2, 0, 1)
    coeffs = (0.3, -1.0, 0.7)
    op = StencilOperator(offsets, coeffs)
    x = np.random.default_rng(13).standard_normal(n).astype(np.float32)
    want = np.asarray(op.normal(jnp.asarray(x)))
    got = np.asarray(op.normal(jnp.asarray(x.reshape(2, 4, 128)))).reshape(n)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# 2-D grid stencils (round 5): GridStencilOperator + multi-row-halo kernel
# ---------------------------------------------------------------------------

from krylovkit_tpu.ops.operator import GridStencilOperator

POISSON_OFF = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
POISSON_CF = (4.0, -1.0, -1.0, -1.0, -1.0)


def _grid_dense(gr, gc, offsets2, coeffs):
    n = gr * gc
    A = np.zeros((n, n), np.float32)
    for c, (dy, dx) in zip(coeffs, offsets2):
        for iy in range(gr):
            for ix in range(gc):
                jy, jx = iy + dy, ix + dx
                if 0 <= jy < gr and 0 <= jx < gc:
                    A[iy * gc + ix, jy * gc + jx] = c
    return A


@pytest.mark.parametrize("shape", ["grid", "rc", "flat"])
def test_grid_stencil_apply_matches_dense(shape):
    gr, gc = 6, 256  # mrow = 2
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    A = _grid_dense(gr, gc, POISSON_OFF, POISSON_CF)
    x = np.random.default_rng(21).standard_normal(gr * gc).astype(np.float32)
    want = A @ x
    if shape == "grid":
        arg = jnp.asarray(x.reshape(gr, gc))
    elif shape == "rc":
        arg = jnp.asarray(x.reshape(gr * 2, 128))
    else:
        arg = jnp.asarray(x)
    got = np.asarray(op.normal(arg)).reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    want_t = A.T @ x
    got_t = np.asarray(op.adjoint(arg)).reshape(-1)
    np.testing.assert_allclose(got_t, want_t, atol=1e-5)


def test_grid_stencil_asymmetric_offsets():
    # exercise dy = ±2, dx = ±3 with distinct coefficients (non-symmetric)
    gr, gc = 8, 128
    off = ((0, 0), (-2, 3), (1, -3), (2, 1))
    cf = (1.5, -0.3, 0.7, 0.2)
    op = GridStencilOperator((gr, gc), off, cf)
    A = _grid_dense(gr, gc, off, cf)
    x = np.random.default_rng(22).standard_normal(gr * gc).astype(np.float32)
    got = np.asarray(op.normal(jnp.asarray(x.reshape(gr, 128)))).reshape(-1)
    np.testing.assert_allclose(got, A @ x, atol=1e-5)
    got_t = np.asarray(op.adjoint(jnp.asarray(x.reshape(gr, 128)))).reshape(-1)
    np.testing.assert_allclose(got_t, A.T @ x, atol=1e-5)


def test_fused_step_grid_matches_xla():
    # kernel-level: the in-kernel grid apply (multi-row halo + lane masks)
    # must match the XLA GridStencilOperator apply on the fused residual
    gr, gc = 32, 256  # mrow = 2, R = 64 layout rows
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    from krylovkit_tpu.ops import pallas_fused_lanczos as pf

    spec = pf.spec_for(op)
    assert spec is not None and spec.h == 2 and spec.mrow == 2
    rng = np.random.default_rng(23)
    kmax, R = 13, gr * gc // 128
    V = jnp.asarray(rng.standard_normal((kmax, R, 128)).astype("float32"))
    y = jnp.asarray(rng.standard_normal((R, 128)).astype("float32"))
    g = jnp.asarray(rng.standard_normal(kmax + 1).astype("float32"))
    B, kp1 = 8, 9
    T = pf.choose_tile(R, 16, spec.h)
    Vn, yn, raw, wb, ynb = pf.fused_step(
        V, y, pf.boundary_cache(V, T, spec.h), pf.boundary_cache(y, T, spec.h),
        g, jnp.int32(kp1), B, spec, tile_rows=16, interpret=True,
    )
    W = g[kmax] * y - jnp.einsum("j,jrc->rc", g[:B], V[:B])
    ynr = op.normal(W)
    sc = float(jnp.max(jnp.abs(ynr)))
    np.testing.assert_allclose(np.asarray(yn), np.asarray(ynr), atol=2e-4 * sc)
    np.testing.assert_allclose(
        np.asarray(Vn[kp1]), np.asarray(W), atol=2e-4 * sc
    )
    r = jnp.einsum("jrc,rc->j", V[:B], ynr)
    mask = np.arange(B) != kp1
    np.testing.assert_allclose(
        np.asarray(raw[:B])[mask], np.asarray(r)[mask], rtol=2e-4, atol=2e-3
    )
    np.testing.assert_allclose(float(raw[B]), float(jnp.sum(W * ynr)), rtol=2e-4)
    np.testing.assert_allclose(float(raw[B + 1]), float(jnp.sum(W * W)), rtol=2e-4)
    # boundary feeds
    np.testing.assert_allclose(
        np.asarray(pf.cache_from_tile_rows(wb)),
        np.asarray(pf.boundary_cache(W, T, spec.h)),
        atol=2e-4 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pf.cache_from_tile_rows(ynb)),
        np.asarray(pf.boundary_cache(ynr, T, spec.h)),
        atol=2e-4 * sc,
    )


def test_fused_driver_grid_matches_unfused():
    # end-to-end: Lanczos eigsolve on a small 2-D Poisson grid, fused vs
    # unfused (the config-2 operator class)
    gr, gc = 32, 128
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    x0 = jnp.asarray(
        np.random.default_rng(24).standard_normal((gr, 128)), jnp.float32
    )
    assert kf.fused_available(op, x0, STANDARD, kmax=19)
    alg = kk.Lanczos(krylovdim=18, maxiter=4, tol=1e-6, orth=kk.cgs)
    v0, e0, i0 = _solve(op, x0, alg, fused=False)
    v1, e1, i1 = _solve(op, x0, alg, fused=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=2e-4)
    assert int(i0.numops) == int(i1.numops)
    assert int(i0.numiter) == int(i1.numiter)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(
            float(jnp.abs(jnp.vdot(a, b))), 1.0, rtol=1e-3
        )


def _gmres_solve(op, b, alg, fused, a0=0.0):
    old = kf.use_fused_expansion
    kf.use_fused_expansion = fused
    try:
        return jax.jit(
            lambda bb: kk.linsolve(op, bb, a0=a0, alg=alg)
        )(b)
    finally:
        kf.use_fused_expansion = old


@pytest.mark.parametrize("orth_name", ["cgs"])
def test_fused_gmres_grid_matches_unfused(orth_name):
    # fused Arnoldi cycle with in-loop Givens QR on the config-2 operator
    # class (2-D Poisson, shifted for f32 conditioning)
    gr, gc = 32, 128
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    b = jnp.asarray(
        np.random.default_rng(31).standard_normal((gr, 128)), jnp.float32
    )
    orth = getattr(kk, orth_name)
    alg = kk.GMRES(krylovdim=20, maxiter=40, tol=1e-4, orth=orth)
    x0, i0 = _gmres_solve(op, b, alg, fused=False, a0=0.5)
    x1, i1 = _gmres_solve(op, b, alg, fused=True, a0=0.5)
    assert int(i0.converged) == 1 and int(i1.converged) == 1
    # both solve the same system: compare against each other and the truth
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=5e-3,
                               atol=5e-5)
    r1 = b - (0.5 * x1 + op.normal(x1))
    assert float(jnp.linalg.norm(r1)) <= 1.2e-4
    assert int(i0.numiter) == int(i1.numiter)


def test_fused_gmres_chain_full_budget_numops():
    # fixed-budget run (tol unreachable): fused and unfused must perform the
    # SAME number of operator applications per full cycle
    n = 1 << 12
    op = StencilOperator((-1, 0, 1), (-1.0, 2.0, -1.0))
    b = jnp.asarray(
        np.random.default_rng(32).standard_normal((n // 128, 128)), jnp.float32
    )
    alg = kk.GMRES(krylovdim=12, maxiter=3, tol=1e-30, orth=kk.cgs)
    x0, i0 = _gmres_solve(op, b, alg, fused=False)
    x1, i1 = _gmres_solve(op, b, alg, fused=True)
    assert int(i0.numops) == int(i1.numops)
    assert int(i0.numiter) == int(i1.numiter) == 3
    np.testing.assert_allclose(
        float(i1.normres), float(i0.normres), rtol=1e-2
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), rtol=1e-2,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# One-reduce CGS2 (dgks) fused mode — the DEFAULT orth through the fused path
# ---------------------------------------------------------------------------


def test_fused_dgks_driver_matches_unfused_cgs2():
    # default orth (cgs2), fused one-reduce DGKS vs the unfused 3-term+sweep
    n = 1 << 12
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(41).standard_normal((n // 128, 128)), jnp.float32
    )
    alg = kk.Lanczos(krylovdim=18, maxiter=6, tol=1e-5)  # default orth=cgs2
    v0, e0, i0 = _solve(op, x0, alg, fused=False)
    v1, e1, i1 = _solve(op, x0, alg, fused=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=2e-4)
    assert int(i0.numops) == int(i1.numops)
    assert int(i0.numiter) == int(i1.numiter)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(
            float(jnp.abs(jnp.vdot(a, b))), 1.0, rtol=1e-3
        )


def test_fused_dgks_orthogonality_beats_single_sweep():
    # the point of the mode: after a long run, the extracted eigenvectors of
    # the DEFAULT config stay orthonormal at the two-sweep level
    n = 1 << 11
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(42).standard_normal((n // 128, 128)), jnp.float32
    )
    alg = kk.Lanczos(krylovdim=20, maxiter=30, tol=5e-3)  # default cgs2
    vals, vecs, info = _solve(op, x0, alg, fused=True)
    assert int(info.converged) >= 2
    Vm = jnp.stack([v.reshape(-1) for v in vecs])
    G = Vm @ Vm.T
    defect = float(jnp.max(jnp.abs(G - jnp.eye(G.shape[0]))))
    assert defect < 5e-4, defect
    for i in range(int(info.converged)):
        r = op.normal(vecs[i]) - vals[i] * vecs[i]
        assert float(jnp.linalg.norm(r)) < 2e-2


def test_fused_dgks_arnoldi_and_gmres():
    # Arnoldi/Krylov-Schur + GMRES under default cgs2 take the dgks path
    gr, gc = 32, 128
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    b = jnp.asarray(
        np.random.default_rng(43).standard_normal((gr, 128)), jnp.float32
    )
    alg = kk.GMRES(krylovdim=20, maxiter=40, tol=1e-4)  # default cgs2
    x0_, i0 = _gmres_solve(op, b, alg, fused=False, a0=0.5)
    x1_, i1 = _gmres_solve(op, b, alg, fused=True, a0=0.5)
    assert int(i0.converged) == 1 and int(i1.converged) == 1
    r1 = b - (0.5 * x1_ + op.normal(x1_))
    assert float(jnp.linalg.norm(r1)) <= 1.2e-4
    assert int(i0.numiter) == int(i1.numiter)

    # schursolve (non-normal stencil), default orth
    n = 1 << 12
    op_ns = StencilOperator((-1, 0, 1), (-1.3, 2.0, -0.7))
    x0 = jnp.asarray(
        np.random.default_rng(44).standard_normal((n // 128, 128)), jnp.float32
    )
    kw = dict(krylovdim=18, maxiter=5, tol=1e-5)

    def run(fused):
        old = kf.use_fused_expansion
        kf.use_fused_expansion = fused
        try:
            return jax.jit(lambda x: kk.schursolve(op_ns, x, 4, "LM", **kw))(x0)
        finally:
            kf.use_fused_expansion = old

    T0, V0, (re0, im0), i0 = run(False)
    T1, V1, (re1, im1), i1 = run(True)
    np.testing.assert_allclose(np.asarray(re0), np.asarray(re1), rtol=5e-4)
    assert int(i0.numops) == int(i1.numops)


def test_fused_dgks_exponentiate():
    n = 1 << 12
    neg_lap = StencilOperator((-1, 0, 1), (1.0, -2.0, 1.0))
    x0 = jnp.asarray(
        np.random.default_rng(45).standard_normal((n // 128, 128)), jnp.float32
    )
    out = {}
    for flag in (False, True):
        from krylovkit_tpu.solvers.expintegrator import _expintegrator_core

        _expintegrator_core.clear_cache()
        old = kf.use_fused_expansion
        kf.use_fused_expansion = flag
        try:
            y, info = kk.exponentiate(
                neg_lap, 0.1, x0, krylovdim=30, tol=1e-4, ishermitian=True,
            )  # default orth=cgs2
        finally:
            kf.use_fused_expansion = old
        out[flag] = (np.asarray(y), int(info.numops), int(info.converged))
    np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-4,
                               atol=1e-6)
    assert out[True][1] == out[False][1]
    assert out[True][2] == out[False][2] == 1


# ---------------------------------------------------------------------------
# Fused one-stream GKL (svdsolve) — square stencil maps, round 5
# ---------------------------------------------------------------------------


def _svd_solve(op, x0, fused, **kw):
    # the front-end's internal module-level jit caches across the fused
    # toggle (a trace-time global) — clear it so the flag takes effect
    from krylovkit_tpu.solvers.svdsolve import _svdsolve_core

    _svdsolve_core.clear_cache()
    old = kf.use_fused_expansion
    kf.use_fused_expansion = fused
    try:
        return jax.jit(lambda x: kk.svdsolve(op, x, 4, "LR", **kw))(x0)
    finally:
        kf.use_fused_expansion = old


@pytest.mark.parametrize("maxiter", [1, 5])
def test_fused_gkl_chain_matches_unfused(maxiter):
    # non-symmetric square chain stencil: A != A^T exercises the adjoint
    # (reversed) in-kernel stencil
    n = 1 << 12
    op = StencilOperator((-2, 0, 1), (0.4, 1.0, -0.8))
    x0 = jnp.asarray(
        np.random.default_rng(51).standard_normal((n // 128, 128)), jnp.float32
    )
    from krylovkit_tpu.factorizations import gkl as gf
    from krylovkit_tpu.ops.vector import STANDARD as STD

    assert gf.fused_kernel_available(op, x0, STD, 19)
    kw = dict(krylovdim=18, maxiter=maxiter, tol=1e-6)  # default orth=cgs2
    S0, U0, V0, i0 = _svd_solve(op, x0, False, **kw)
    S1, U1, V1, i1 = _svd_solve(op, x0, True, **kw)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S0), rtol=5e-4)
    assert int(i0.numops) == int(i1.numops)
    assert int(i0.numiter) == int(i1.numiter)
    for a, b in zip(U0, U1):
        np.testing.assert_allclose(
            float(jnp.abs(jnp.vdot(a, b))), 1.0, rtol=2e-3
        )
    for a, b in zip(V0, V1):
        np.testing.assert_allclose(
            float(jnp.abs(jnp.vdot(a, b))), 1.0, rtol=2e-3
        )


def test_fused_gkl_grid_and_triplet_quality():
    # grid stencil (advection-diffusion like, non-symmetric); verify the
    # actual SVD triplet residuals A v = s u against the operator
    gr, gc = 32, 128
    op = GridStencilOperator(
        (gr, gc), ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
        (4.0, -1.5, -0.5, -1.2, -0.8),
    )
    x0 = jnp.asarray(
        np.random.default_rng(52).standard_normal((gr, 128)), jnp.float32
    )
    S, U, V, info = _svd_solve(op, x0, True, krylovdim=20, maxiter=25,
                               tol=1e-3)
    assert int(info.converged) >= 2
    for i in range(int(info.converged)):
        u, v = U[i], V[i]
        np.testing.assert_allclose(float(jnp.linalg.norm(u)), 1.0, rtol=1e-3)
        np.testing.assert_allclose(float(jnp.linalg.norm(v)), 1.0, rtol=1e-3)
        r1 = op.normal(v) - S[i] * u
        r2 = op.adjoint(u) - S[i] * v
        assert float(jnp.linalg.norm(r1)) < 5e-3 * float(S[0])
        assert float(jnp.linalg.norm(r2)) < 5e-3 * float(S[0])


def test_fused_gkl_gate():
    from krylovkit_tpu.factorizations import gkl as gf
    from krylovkit_tpu.ops.vector import STANDARD as STD

    n = 1 << 12
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    op = StencilOperator((-1, 0, 1), (-1.0, 2.0, -1.0))
    assert gf.fused_kernel_available(op, x0, STD, 31)
    assert not gf.fused_kernel_available(op, x0, STD, 64)  # 2k+2 > 128
    # rectangular (non-stencil) operators stay on the unfused path
    from krylovkit_tpu.ops.operator import as_operator

    assert not gf.fused_kernel_available(
        as_operator(lambda x: 2 * x), x0, STD, 31
    )


# ---------------------------------------------------------------------------
# Sharded fused expansion (round 5): whole solve inside shard_map
# ---------------------------------------------------------------------------


def _sharded_eigsolve(op_global, x0_global, alg, howmany, fused, grid=False):
    from functools import partial

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from krylovkit_tpu.ops.vector import VectorSpace
    from krylovkit_tpu.parallel import shard_local_stencil

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("vec",))
    space = VectorSpace(psum_axis="vec")
    op_local = shard_local_stencil(op_global, "vec")

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("vec", None),
        out_specs=(P(), P(None, "vec", None), P()),
        check_vma=False,
    )
    def run(x0):
        vals, vecs, info = eigsolve_lanczos(
            op_local, x0, howmany, "LM", alg, space=space
        )
        return vals, vecs, (info.converged, info.numiter, info.numops)

    old = kf.use_fused_expansion
    kf.use_fused_expansion = fused
    try:
        x0s = jax.device_put(
            x0_global, NamedSharding(mesh, P("vec", None))
        )
        return jax.jit(run)(x0s)
    finally:
        kf.use_fused_expansion = old


@pytest.mark.parametrize("orth_name", ["cgs", "cgs2"])
def test_sharded_fused_eigsolve_matches_unsharded(orth_name):
    # full Lanczos eigsolve inside shard_map over a 4-device vec axis:
    # the fused kernel runs per shard with ppermute halo fixes on the
    # boundary caches; compare against the single-device fused result
    n = 1 << 15  # 256 rows -> 64 rows/shard
    op = laplacian_1d(n, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(61).standard_normal((n // 128, 128)), jnp.float32
    )
    alg = kk.Lanczos(krylovdim=16, maxiter=4, tol=1e-6,
                     orth=getattr(kk, orth_name))
    v_ref, e_ref, i_ref = _solve(op, x0, alg, fused=True)

    vals, vecs, (conv, numiter, numops) = _sharded_eigsolve(
        op, x0, alg, 4, fused=True
    )
    np.testing.assert_allclose(np.asarray(vals), np.asarray(v_ref), rtol=2e-4)
    assert int(numiter) == int(i_ref.numiter)
    assert int(numops) == int(i_ref.numops)
    for i in range(4):
        a = np.asarray(vecs[i]).reshape(-1)
        b = np.asarray(e_ref[i]).reshape(-1)
        np.testing.assert_allclose(abs(np.dot(a, b)), 1.0, rtol=1e-3)

    # and against the sharded UNFUSED result (same shard_map harness)
    vals_u, _, (conv_u, numiter_u, numops_u) = _sharded_eigsolve(
        op, x0, alg, 4, fused=False
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(vals_u), rtol=2e-4
    )
    assert int(numops) == int(numops_u)


def test_sharded_fused_grid_eigsolve():
    # 2-D Poisson grid sharded over whole grid rows (64 grid rows of 256
    # columns -> 128 layout rows, 32/shard)
    from krylovkit_tpu.parallel import poisson_2d

    gr, gc = 64, 256
    op = poisson_2d(gr, gc, jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(62).standard_normal((gr * gc // 128, 128)),
        jnp.float32,
    )
    alg = kk.Lanczos(krylovdim=16, maxiter=3, tol=1e-6)
    v_ref, e_ref, i_ref = _solve(op, x0, alg, fused=True)
    vals, vecs, (conv, numiter, numops) = _sharded_eigsolve(
        op, x0, alg, 4, fused=True, grid=True
    )
    np.testing.assert_allclose(np.asarray(vals), np.asarray(v_ref), rtol=2e-4)
    assert int(numops) == int(i_ref.numops)


def test_edge_fix_and_shard_local_stencil():
    # _edge_fix must reproduce the GLOBAL boundary_cache when shards are
    # glued; shard_local_stencil must equal the global apply
    from functools import partial

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from krylovkit_tpu.ops import pallas_fused_lanczos as pf
    from krylovkit_tpu.parallel import shard_local_stencil

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("vec",))
    n = 1 << 14  # 128 rows, 32/shard
    R = n // 128
    op = StencilOperator((-200, 0, 200), (0.3, 1.0, -0.4))  # h = 2
    spec = spec_for(op)
    assert spec.h == 2
    x = jnp.asarray(
        np.random.default_rng(71).standard_normal((R, 128)), jnp.float32
    )
    # global apply vs shard_map-wrapped local apply
    op_loc = shard_local_stencil(op, "vec")

    @partial(jax.shard_map, mesh=mesh, in_specs=P("vec", None),
             out_specs=P("vec", None), check_vma=False)
    def apply_sharded(xl):
        return op_loc.normal(xl)

    y_global = op.normal(x)
    y_sharded = apply_sharded(
        jax.device_put(x, NamedSharding(mesh, P("vec", None)))
    )
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_global), atol=1e-5
    )

    # per-shard boundary_cache + _edge_fix == the global boundary_cache
    T = 8  # tiles within each 32-row shard
    h = spec.h

    @partial(jax.shard_map, mesh=mesh, in_specs=P("vec", None),
             out_specs=P("vec", None, None, None), check_vma=False)
    def cache_sharded(xl):
        c = pf.boundary_cache(xl, T, h)
        return kf._edge_fix(c, xl[:h], xl[-h:], "vec")

    got = np.asarray(
        cache_sharded(jax.device_put(x, NamedSharding(mesh, P("vec", None))))
    )
    want = np.asarray(pf.boundary_cache(x, T, h))
    np.testing.assert_allclose(got, want, atol=0)


def test_grid_shard_cut_gate():
    # sharded grid fused requires shard cuts at whole grid rows: a psum-space
    # with misaligned local rows must be rejected by fused_available
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P

    from krylovkit_tpu.ops.vector import VectorSpace

    gr, gc = 32, 1280  # mrow=10 (halo h=10): an 80-row local leaf = 8 whole
    # grid rows (aligned, T=16 >= h); a 72-row leaf misaligns (9216 % 1280)
    op = GridStencilOperator((gr, gc), POISSON_OFF, POISSON_CF)
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("vec",))
    space = VectorSpace(psum_axis="vec")
    out = {}

    @partial(jax.shard_map, mesh=mesh, in_specs=P(None, None),
             out_specs=P(), check_vma=False)
    def probe(x):
        # local leaf = 80 rows: 80*128 = 8 whole grid rows -> eligible
        ok_aligned = kf.fused_available(op, x[:80], space, kmax=9)
        # local leaf = 72 rows: 9216 % 1280 != 0 -> must be rejected
        bad = kf.fused_available(op, x[:72], space, kmax=9)
        return jnp.asarray([ok_aligned, bad])

    old = kf.fused_interpret
    kf.fused_interpret = True
    try:
        flags = np.asarray(probe(jnp.ones((80, 128), jnp.float32)))
    finally:
        kf.fused_interpret = old
    assert flags[0] and not flags[1], flags
