"""AD tests, mirroring the reference ``test/ad/{linsolve,eigsolve,svdsolve}.jl``:
pullbacks validated against dense differentiable oracles (the reference uses
Zygote vs FiniteDifferences with gauge fixing)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk
from testsetup import hermitize, n, rand_mat, rand_vec


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ad_linsolve_matches_dense(dtype):
    rng = np.random.default_rng(71)
    A = rand_mat(rng, n, n, dtype) + 2 * np.eye(n, dtype=dtype)
    b = rand_vec(rng, n, dtype)
    c = rand_vec(rng, n, dtype)
    a0, a1 = 0.4, 1.3

    def loss_krylov(A, b, a0, a1):
        x, info = kk.linsolve(A, b, a0=a0, a1=a1, tol=1e-12, krylovdim=n)
        return jnp.real(jnp.vdot(c, x))

    def loss_dense(A, b, a0, a1):
        x = jnp.linalg.solve(a0 * jnp.eye(n, dtype=A.dtype) + a1 * A, b)
        return jnp.real(jnp.vdot(c, x))

    args = (jnp.asarray(A), jnp.asarray(b), jnp.asarray(a0, jnp.asarray(A).dtype),
            jnp.asarray(a1, jnp.asarray(A).dtype))
    g1 = jax.grad(loss_krylov, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for a, b_, name in zip(g1, g2, "A b a0 a1".split()):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-8), name


def test_ad_linsolve_cg_hermitian():
    rng = np.random.default_rng(72)
    B = rand_mat(rng, n, n, np.float64)
    A = B @ B.T + 2 * np.eye(n)
    b = rand_vec(rng, n, np.float64)
    c = rand_vec(rng, n, np.float64)

    def loss(A, b):
        x, _ = kk.linsolve(A, b, alg=kk.CG(tol=1e-12, maxiter=200))
        return jnp.vdot(c, x)

    gA, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(A), jnp.asarray(b))

    def loss_d(A, b):
        return jnp.vdot(c, jnp.linalg.solve(A, b))

    gA2, gb2 = jax.grad(loss_d, argnums=(0, 1))(jnp.asarray(A), jnp.asarray(b))
    assert np.allclose(np.asarray(gA), np.asarray(gA2), atol=1e-8)
    assert np.allclose(np.asarray(gb), np.asarray(gb2), atol=1e-8)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ad_eigsolve_hermitian_values(dtype):
    """Gradient of a weighted eigenvalue sum vs the eigh oracle."""
    rng = np.random.default_rng(73)
    A = hermitize(rand_mat(rng, n, n, dtype))
    x0 = rand_vec(rng, n, dtype)
    wts = jnp.asarray([1.0, 0.5])

    def loss_krylov(A):
        vals, vecs, info = kk.eigsolve(
            A, jnp.asarray(x0), 2, "SR", ishermitian=True, tol=1e-12, krylovdim=n
        )
        return jnp.sum(wts * vals)

    def loss_dense(A):
        w = jnp.linalg.eigvalsh(A)
        return jnp.sum(wts * w[:2])

    g1 = jax.grad(loss_krylov)(jnp.asarray(A))
    g2 = jax.grad(loss_dense)(jnp.asarray(A))
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-7)


def test_ad_eigsolve_hermitian_vectors():
    """Gauge-invariant eigenvector loss |<c, v>|^2 vs the eigh oracle."""
    rng = np.random.default_rng(74)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    c = rand_vec(rng, n, np.float64)

    def loss_krylov(A):
        vals, vecs, info = kk.eigsolve(
            A, jnp.asarray(x0), 1, "LR", ishermitian=True, tol=1e-12, krylovdim=n
        )
        v = jax.tree_util.tree_map(lambda l: l[0], vecs)
        return jnp.abs(jnp.vdot(c, v)) ** 2

    def loss_dense(A):
        w, V = jnp.linalg.eigh(A)
        return jnp.abs(jnp.vdot(c, V[:, -1])) ** 2

    g1 = np.asarray(jax.grad(loss_krylov)(jnp.asarray(A)))
    g2 = np.asarray(jax.grad(loss_dense)(jnp.asarray(A)))
    # the Hermitian (Lanczos / eigh) paths define the gradient only up to
    # symmetrization (the primal is insensitive to antisymmetric perturbations)
    assert np.allclose(g1 + g1.T, g2 + g2.T, atol=1e-6)


def test_ad_eigsolve_general_values_fd():
    """Non-Hermitian: eigenvalue gradient vs central finite differences."""
    rng = np.random.default_rng(75)
    A = rand_mat(rng, n, n, np.float64) + np.diag(np.linspace(1, 2, n))
    x0 = rand_vec(rng, n, np.float64)

    def loss(A):
        vals, vecs, info = kk.eigsolve(
            A, jnp.asarray(x0), 1, "LR", tol=1e-12, krylovdim=n
        )
        return jnp.real(vals[0])

    g = np.asarray(jax.grad(lambda A: loss(A))(jnp.asarray(A)))
    eps = 1e-6
    rng2 = np.random.default_rng(0)
    for _ in range(5):
        i, j = rng2.integers(0, n, 2)
        Ap = A.copy(); Ap[i, j] += eps
        Am = A.copy(); Am[i, j] -= eps
        fd = (float(loss(jnp.asarray(Ap))) - float(loss(jnp.asarray(Am)))) / (2 * eps)
        assert abs(g[i, j] - fd) < 1e-5, (i, j, g[i, j], fd)


def test_ad_svdsolve_values():
    """Gradient of a singular-value sum vs the jnp.linalg.svd oracle."""
    rng = np.random.default_rng(76)
    A = rand_mat(rng, 2 * n, n, np.float64)
    x0 = A @ rand_vec(rng, n, np.float64)

    def loss_krylov(A):
        vals, lv, rv, info = kk.svdsolve(
            A, jnp.asarray(x0), 2, "LR", tol=1e-12, krylovdim=n, maxiter=100
        )
        return jnp.sum(vals)

    def loss_dense(A):
        s = jnp.linalg.svd(A, compute_uv=False)
        return s[0] + s[1]

    g1 = jax.grad(loss_krylov)(jnp.asarray(A))
    g2 = jax.grad(loss_dense)(jnp.asarray(A))
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_ad_svdsolve_vectors():
    """Gauge-invariant singular-vector loss vs the svd oracle."""
    rng = np.random.default_rng(77)
    A = rand_mat(rng, 2 * n, n, np.float64)
    x0 = A @ rand_vec(rng, n, np.float64)
    c = rand_vec(rng, 2 * n, np.float64)
    d = rand_vec(rng, n, np.float64)

    def loss_krylov(A):
        vals, lv, rv, info = kk.svdsolve(
            A, jnp.asarray(x0), 1, "LR", tol=1e-12, krylovdim=n, maxiter=100
        )
        u = jax.tree_util.tree_map(lambda l: l[0], lv)
        v = jax.tree_util.tree_map(lambda l: l[0], rv)
        return jnp.vdot(c, u) * jnp.vdot(v, d)  # gauge-invariant product

    def loss_dense(A):
        U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
        return jnp.vdot(c, U[:, 0]) * jnp.vdot(Vh[0, :].conj(), d)

    g1 = jax.grad(loss_krylov)(jnp.asarray(A))
    g2 = jax.grad(loss_dense)(jnp.asarray(A))
    # sign gauge: both losses flip sign together under u,v -> -u,-v, so the
    # gradient is gauge-invariant only up to the common sign of the pair
    ok = np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-6) or np.allclose(
        np.asarray(g1), -np.asarray(g2), atol=1e-6
    )
    assert ok


def test_ad_eigsolve_sylvester_path():
    """alg_rrule=Arnoldi: subspace-aware Sylvester-as-eigenproblem pullback
    (reference ext/.../eigsolve.jl:318-419) matches the dense oracle, including
    a degenerate pair where the per-pair bordered solves are singular."""
    rng = np.random.default_rng(78)
    m = 30
    A0 = rand_mat(rng, m, m, np.float64)
    As = hermitize(A0)
    w, V = np.linalg.eigh(As)
    w[-1] = w[-2]  # doubly-degenerate top pair
    A = (V * w) @ V.T
    x0 = jnp.asarray(rand_vec(rng, m, np.float64))
    rr = kk.Arnoldi(tol=1e-12, krylovdim=m, maxiter=100)

    def loss(A):
        vals, vecs, info = kk.eigsolve(
            A, x0, 2, "LR", ishermitian=True, tol=1e-12, krylovdim=m,
            alg_rrule=rr,
        )
        return jnp.sum(vals)

    def loss_dense(A):
        return jnp.sum(jnp.linalg.eigvalsh(A)[-2:])

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    gd = np.asarray(jax.grad(loss_dense)(jnp.asarray(A)))
    assert np.allclose(g + g.T, gd + gd.T, atol=1e-8)


def test_ad_eigsolve_sylvester_vectors():
    rng = np.random.default_rng(79)
    m = 25
    A = hermitize(rand_mat(rng, m, m, np.float64))
    x0 = jnp.asarray(rand_vec(rng, m, np.float64))
    c = jnp.asarray(rand_vec(rng, m, np.float64))
    rr = kk.Arnoldi(tol=1e-12, krylovdim=m, maxiter=100)

    def loss(A):
        vals, vecs, info = kk.eigsolve(
            A, x0, 1, "SR", ishermitian=True, tol=1e-12, krylovdim=m,
            alg_rrule=rr,
        )
        v = jax.tree_util.tree_map(lambda l: l[0], vecs)
        return jnp.abs(jnp.vdot(c, v)) ** 2

    def loss_dense(A):
        _, V = jnp.linalg.eigh(A)
        return jnp.abs(jnp.vdot(c, V[:, 0])) ** 2

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    gd = np.asarray(jax.grad(loss_dense)(jnp.asarray(A)))
    assert np.allclose(g + g.T, gd + gd.T, atol=1e-7)


def test_ad_eigsolve_sylvester_general():
    """General (non-Hermitian) Arnoldi-path pullback (reference
    ext/.../eigsolve.jl:182-310) vs finite differences."""
    rng = np.random.default_rng(80)
    m = 20
    A = rand_mat(rng, m, m, np.float64) + np.diag(np.linspace(1, 2, m))
    x0 = jnp.asarray(rand_vec(rng, m, np.float64))
    rr = kk.Arnoldi(tol=1e-12, krylovdim=m, maxiter=100)

    def loss(A):
        vals, vecs, info = kk.eigsolve(
            A, x0, 1, "LR", tol=1e-12, krylovdim=m, alg_rrule=rr
        )
        return jnp.real(vals[0])

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    eps = 1e-6
    rng2 = np.random.default_rng(1)
    for _ in range(5):
        i, j = rng2.integers(0, m, 2)
        Ap = A.copy(); Ap[i, j] += eps
        Am = A.copy(); Am[i, j] -= eps
        fd = (float(loss(jnp.asarray(Ap))) - float(loss(jnp.asarray(Am)))) / (2 * eps)
        assert abs(g[i, j] - fd) < 1e-5, (i, j, g[i, j], fd)


def test_ad_svdsolve_sylvester_path():
    """Arnoldi-path svdsolve pullback (reference ext/.../svdsolve.jl:160-273,
    which='LR'): coupled (x,y,z) block eigenproblem vs the svd oracle."""
    rng = np.random.default_rng(81)
    A = rand_mat(rng, 30, 18, np.float64)
    x0 = jnp.asarray(A @ rand_vec(rng, 18, np.float64))
    rr = kk.Arnoldi(tol=1e-12, krylovdim=40, maxiter=200)
    c = jnp.asarray(rand_vec(rng, 30, np.float64))
    d = jnp.asarray(rand_vec(rng, 18, np.float64))

    def loss(A):
        vals, lv, rv, info = kk.svdsolve(
            A, x0, 2, "LR", tol=1e-12, krylovdim=18, maxiter=200, alg_rrule=rr
        )
        u = jax.tree_util.tree_map(lambda l: l[0], lv)
        v = jax.tree_util.tree_map(lambda l: l[0], rv)
        return jnp.sum(vals) + jnp.vdot(c, u) * jnp.vdot(v, d)

    def loss_dense(A):
        U, s, Vh = jnp.linalg.svd(A, full_matrices=False)
        return s[0] + s[1] + jnp.vdot(c, U[:, 0]) * jnp.vdot(Vh[0, :].conj(), d)

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    gd = np.asarray(jax.grad(loss_dense)(jnp.asarray(A)))
    ok = np.allclose(g, gd, atol=1e-6) or np.allclose(g, -gd, atol=1e-6)
    assert ok


def test_parametric_operator_gradient():
    """jax.grad through eigsolve w.r.t. operator PARAMETERS carried as pytree
    data (plain closures cannot be differentiated through custom_vjp)."""
    rng = np.random.default_rng(20)
    n = 24
    S = rng.standard_normal((n, n))
    S = (S + S.T) / 2
    D = jnp.asarray(rng.standard_normal(n))
    x0 = jnp.asarray(rng.standard_normal(n))

    def apply_fn(g, x):
        return jnp.asarray(S) @ x + g * D * x

    def smallest(g):
        op = kk.ParametricOperator(apply_fn, params=g)
        vals, vecs, info = kk.eigsolve(
            op, x0, 1, "SR", ishermitian=True, krylovdim=24, maxiter=100, tol=1e-12
        )
        return vals[0]

    g0 = jnp.float64(0.3)
    dE = float(jax.grad(smallest)(g0))
    eps = 1e-6
    fd = (float(smallest(g0 + eps)) - float(smallest(g0 - eps))) / (2 * eps)
    assert abs(dE - fd) < 1e-6 * max(1.0, abs(fd))


def test_ad_repeated_eigsolve_block_cyclic():
    """Reference ``test/ad/repeatedeigsolve.jl``: gradients through eigsolve on
    the block-cyclic matrix M = [[0,0,C],[A,0,0],[0,B,0]], whose dominant
    eigenvalues form an equal-|λ| triplet (cube-roots-of-unity structure) —
    the stress case for the rrule under clustered/repeated magnitudes.  The
    gauge-invariant loss |λ₀|² is compared against finite differences in the
    blocks A, B, C."""
    rng = np.random.default_rng(97)
    m = 6
    A = rand_mat(rng, m, m, np.float64) + 2 * np.eye(m)
    B = rand_mat(rng, m, m, np.float64) + 2 * np.eye(m)
    C = rand_mat(rng, m, m, np.float64) + 2 * np.eye(m)
    x0 = rand_vec(rng, 3 * m, np.float64)
    Z = jnp.zeros((m, m))

    def build(Aj, Bj, Cj):
        return jnp.block([[Z, Z, Cj], [Aj, Z, Z], [Z, Bj, Z]])

    def loss(Aj, Bj, Cj):
        M = build(Aj, Bj, Cj)
        vals, vecs, info = kk.eigsolve(
            M, jnp.asarray(x0), 1, "LM", tol=1e-12, krylovdim=3 * m,
            maxiter=50,
        )
        lam = vals[0]
        return jnp.real(lam * jnp.conj(lam))

    gA, gB, gC = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)
    )
    eps = 1e-6
    rng2 = np.random.default_rng(1)
    for name, g, block in (("A", gA, A), ("B", gB, B), ("C", gC, C)):
        for _ in range(3):
            i, j = rng2.integers(0, m, 2)
            bp = block.copy(); bp[i, j] += eps
            bm = block.copy(); bm[i, j] -= eps
            args_p = {"A": (bp, B, C), "B": (A, bp, C), "C": (A, B, bp)}[name]
            args_m = {"A": (bm, B, C), "B": (A, bm, C), "C": (A, B, bm)}[name]
            fd = (
                float(loss(*map(jnp.asarray, args_p)))
                - float(loss(*map(jnp.asarray, args_m)))
            ) / (2 * eps)
            assert abs(float(np.asarray(g)[i, j]) - fd) < 1e-4, (
                name, i, j, float(np.asarray(g)[i, j]), fd,
            )


def test_ad_gauge_warning_eager():
    """Debug-mode gauge-sensitivity warnings (reference
    ext/.../eigsolve.jl:150-156, 334-341; svdsolve.jl:129-133): a loss that
    depends on the arbitrary eigenvector phase produces a cotangent with a
    gauge component; outside jit the pullback warns before projecting it out."""
    rng = np.random.default_rng(3)
    M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = jnp.asarray(M + M.conj().T)
    c = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x0 = jnp.asarray(rng.standard_normal(n) + 0j)

    def loss(A, **kw):
        vals, vecs, info = kk.eigsolve(
            A, x0, 1, "LM", tol=1e-10, krylovdim=n, maxiter=40, **kw
        )
        v0 = jax.tree_util.tree_map(lambda l: l[0], vecs)
        return jnp.imag(jnp.vdot(c, v0))  # phase-sensitive functional

    # GMRES pullback path
    with pytest.warns(UserWarning, match="gauge"):
        jax.grad(loss)(A)
    # Sylvester (Lanczos primal, Arnoldi alg_rrule) pullback path
    with pytest.warns(UserWarning, match="gauge"):
        jax.grad(lambda A: loss(A, alg_rrule=kk.Arnoldi(krylovdim=n, tol=1e-10)))(A)

    # svdsolve GMRES path
    R = jnp.asarray(
        rng.standard_normal((n + 2, n)) + 1j * rng.standard_normal((n + 2, n))
    )
    u0 = jnp.asarray(rng.standard_normal(n + 2) + 0j)
    cu = jnp.asarray(rng.standard_normal(n + 2) + 1j * rng.standard_normal(n + 2))

    def loss_svd(R):
        vals, lv, rv, info = kk.svdsolve(
            R, u0, 1, "LR", tol=1e-10, krylovdim=n, maxiter=40
        )
        u = jax.tree_util.tree_map(lambda l: l[0], lv)
        return jnp.imag(jnp.vdot(cu, u))

    with pytest.warns(UserWarning, match="gauge"):
        jax.grad(loss_svd)(R)
