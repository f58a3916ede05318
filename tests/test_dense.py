"""L2 tests: on-device dense kernels vs scipy/numpy oracles (SURVEY.md §4.3)."""

import numpy as np
import scipy.linalg as sla
import jax
import jax.numpy as jnp
import pytest

from krylovkit_tpu import dense
from krylovkit_tpu import EigSorter

from testsetup import rand_mat, precision, hermitize, eig_close


M = 12  # buffer size
K = 8  # active size


def embed(Ak, m=M, dtype=None):
    out = np.zeros((m, m), dtype or Ak.dtype)
    k = Ak.shape[0]
    out[:k, :k] = Ak
    # garbage outside the active block must be ignored by the kernels
    rng = np.random.default_rng(99)
    out[k:, k:] += rand_mat(rng, m - k, m - k, out.dtype) * 7
    return out


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_eigh_active(dtype):
    rng = np.random.default_rng(0)
    Ak = hermitize(rand_mat(rng, K, K, dtype))
    T = jnp.asarray(embed(Ak))
    w, U, valid = jax.jit(dense.eigh_active)(T, K)
    assert int(valid.sum()) == K
    want = np.linalg.eigvalsh(Ak)
    got = np.sort(np.asarray(w)[np.asarray(valid)])
    assert np.allclose(got, want, atol=1e-12)
    # eigenvectors: residual check on active block
    for i in np.where(np.asarray(valid))[0]:
        u = np.asarray(U)[:K, i]
        assert np.linalg.norm(Ak @ u - np.asarray(w)[i] * u) < 1e-11


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_eigh_active_with_zero_eigenvalue(dtype):
    """Active block singular: the sentinel must prevent mixing with the inactive
    subspace."""
    rng = np.random.default_rng(1)
    Q, _ = np.linalg.qr(rand_mat(rng, K, K, dtype))
    w = np.array([0.0, 0.0, 1.0, -1.0, 2.0, 3.0, -2.5, 0.5])
    Ak = (Q * w) @ Q.conj().T
    T = jnp.asarray(embed(Ak))
    got_w, U, valid = dense.eigh_active(T, K)
    assert int(valid.sum()) == K
    assert eig_close(np.asarray(got_w)[np.asarray(valid)], w, 1e-12)
    # all genuine eigenvectors supported on active rows only
    assert np.max(np.abs(np.asarray(U)[K:, np.asarray(valid)])) < 1e-10


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_geneigh_active(dtype):
    rng = np.random.default_rng(2)
    Ak = hermitize(rand_mat(rng, K, K, dtype))
    C = rand_mat(rng, K, K, dtype)
    Bk = C @ C.conj().T + np.eye(K)
    w, X, valid = dense.geneigh_active(
        jnp.asarray(embed(Ak)), jnp.asarray(embed(Bk)), K
    )
    assert int(valid.sum()) == K
    want = sla.eigh(Ak, Bk, eigvals_only=True)
    got = np.sort(np.asarray(w)[np.asarray(valid)])
    assert np.allclose(got, want, atol=1e-11)
    Xa = np.asarray(X)[:K, np.asarray(valid)]
    assert np.allclose(Xa.conj().T @ Bk @ Xa, np.eye(K), atol=1e-10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("kind", ["hessenberg", "general", "kschur"])
def test_schur_active(dtype, kind):
    rng = np.random.default_rng(3)
    Ak = rand_mat(rng, K, K, dtype) * 3
    if kind == "hessenberg":
        Ak = np.triu(Ak, -1)
    elif kind == "kschur":
        # triangular + spike row + one Hessenberg column, as after thick restart
        Ak = np.triu(Ak)
        Ak[K - 2, : K - 2] = rng.standard_normal(K - 2)
        Ak[K - 1, K - 2] = 0.7
    T, Q, ok = jax.jit(dense.schur_active, static_argnums=())(jnp.asarray(embed(Ak)), K)
    assert bool(ok)
    Tn, Qn = np.asarray(T), np.asarray(Q)
    # unitary
    assert np.allclose(Qn.conj().T @ Qn, np.eye(M), atol=1e-11)
    # similarity on the active block: Q^H A Q = T, with Q block-diagonal
    assert np.max(np.abs(Qn[K:, :K])) < 1e-11
    assert np.max(np.abs(Qn[:K, K:])) < 1e-11
    assert np.allclose(
        Qn[:K, :K].conj().T @ Ak @ Qn[:K, :K], Tn[:K, :K], atol=1e-10
    )
    # triangular + correct eigenvalues
    assert np.max(np.abs(np.tril(Tn[:K, :K], -1))) < 1e-10
    assert eig_close(np.diag(Tn[:K, :K]), np.linalg.eigvals(Ak), 1e-10)


def test_schur_active_defective():
    """Jordan-ish block (defective matrix) must still deflate."""
    Ak = np.eye(6) + np.diag(np.ones(5), 1)
    Ak[5, 0] = 1e-3
    T, Q, ok = dense.schur_active(jnp.asarray(embed(Ak.astype(np.float64), M)), 6)
    assert bool(ok)
    assert eig_close(np.diag(np.asarray(T))[:6], np.linalg.eigvals(Ak), 1e-8)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_triangular_eigvecs(dtype):
    rng = np.random.default_rng(4)
    Ak = rand_mat(rng, K, K, dtype) * 2
    T, Q, ok = dense.schur_active(jnp.asarray(embed(Ak)), K)
    X = jax.jit(dense.triangular_eigvecs)(T, K)
    Tn, Xn = np.asarray(T)[:K, :K], np.asarray(X)[:K, :K]
    lam = np.diag(Tn)
    for i in range(K):
        r = Tn @ Xn[:, i] - lam[i] * Xn[:, i]
        assert np.linalg.norm(r) < 1e-10, (i, np.linalg.norm(r))
        assert abs(np.linalg.norm(Xn[:, i]) - 1) < 1e-12


def test_sort_schur():
    rng = np.random.default_rng(5)
    Ak = rand_mat(rng, K, K, np.complex128) * 2
    A = jnp.asarray(embed(Ak))
    T, Q, ok = dense.schur_active(A, K)
    vals = np.diag(np.asarray(T))
    key = dense.which_key(jnp.diagonal(T), "LM")
    # push inactive sentinel entries last
    key = jnp.where(jnp.arange(M) < K, key, jnp.inf)
    T2, Q2, key2 = jax.jit(dense.sort_schur)(T, Q, key)
    T2n, Q2n = np.asarray(T2), np.asarray(Q2)
    d = np.diag(T2n)[:K]
    # sorted by |.| descending
    assert np.all(np.diff(np.abs(d)) < 1e-10)
    # still a Schur form of the active block
    assert np.allclose(Q2n[:K, :K].conj().T @ Ak @ Q2n[:K, :K], T2n[:K, :K], atol=1e-10)
    assert np.max(np.abs(np.tril(T2n[:K, :K], -1))) < 1e-10
    assert eig_close(d, np.linalg.eigvals(Ak), 1e-10)


def test_sort_schur_eigsorter():
    rng = np.random.default_rng(6)
    Ak = rand_mat(rng, K, K, np.complex128)
    T, Q, ok = dense.schur_active(jnp.asarray(embed(Ak)), K)
    key = dense.which_key(jnp.diagonal(T), EigSorter(by=lambda v: jnp.real(v), rev=True))
    key = jnp.where(jnp.arange(M) < K, key, jnp.inf)
    T2, _, _ = dense.sort_schur(T, Q, key)
    d = np.diag(np.asarray(T2))[:K]
    assert np.all(np.diff(np.real(d)) < 1e-10)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_svd_active(dtype):
    rng = np.random.default_rng(7)
    # lower bidiagonal like GKL
    alphas = np.abs(rng.standard_normal(K)) + 0.1
    betas = np.abs(rng.standard_normal(K - 1))
    Bk = np.diag(alphas) + np.diag(betas, -1)
    Bk = Bk.astype(dtype)
    s, U, Vh, valid = jax.jit(dense.svd_active)(jnp.asarray(embed(Bk)), K)
    assert int(valid.sum()) == K
    want = np.linalg.svd(Bk, compute_uv=False)
    got = np.sort(np.asarray(s)[np.asarray(valid)])[::-1]
    assert np.allclose(got, want, atol=1e-12)
    Un, Vhn = np.asarray(U), np.asarray(Vh)
    sv = np.asarray(s)
    mask = np.asarray(valid)
    recon = (Un[:K, mask] * sv[mask]) @ Vhn[mask, :K]
    assert np.allclose(recon, Bk, atol=1e-11)


def test_solve_upper_active():
    rng = np.random.default_rng(8)
    Rk = np.triu(rand_mat(rng, K, K, np.float64)) + 2 * np.eye(K)
    b = rng.standard_normal(M)
    y = jax.jit(dense.solve_upper_active)(jnp.asarray(embed(Rk)), jnp.asarray(b), K)
    assert np.allclose(np.asarray(y)[:K], np.linalg.solve(Rk, b[:K]), atol=1e-12)
    assert np.allclose(np.asarray(y)[K:], 0)


def test_expm_active():
    rng = np.random.default_rng(9)
    Ak = rand_mat(rng, K, K, np.float64)
    E = jax.jit(dense.expm_active)(jnp.asarray(embed(Ak)), K)
    assert np.allclose(np.asarray(E)[:K, :K], sla.expm(Ak), atol=1e-11)


def test_givens():
    rng = np.random.default_rng(10)
    for a, b in [(1.0, 0.0), (0.0, 1.0), (0.0, 0.0), (3.0, -4.0),
                 (1 + 2j, -2 + 1j), (0j, 1j)]:
        c, s, r = dense.givens(jnp.asarray(a), jnp.asarray(b))
        c, s, r = complex(c), complex(s), complex(r)
        assert abs(c * a + s.conjugate() * b - r) < 1e-12
        assert abs(-s * a + c * b) < 1e-12
        assert abs(abs(c) ** 2 + abs(s) ** 2 - 1) < 1e-12


def test_schur_traced_k():
    """k is a traced value inside jitted drivers — exercise that path."""
    rng = np.random.default_rng(11)
    Ak = rand_mat(rng, 5, 5, np.float64)

    @jax.jit
    def f(A, k):
        return dense.schur_active(A, k)

    A = np.zeros((M, M))
    A[:5, :5] = Ak
    T, Q, ok = f(jnp.asarray(A), jnp.int32(5))
    assert bool(ok)
    assert eig_close(np.diag(np.asarray(T))[:5], np.linalg.eigvals(Ak), 1e-10)


# ---------------------------------------------------------------------------
# real Schur path (realschur / reorder_real / trevc_real)


def test_real_schur_active_random():
    rng = np.random.default_rng(0)
    m = 16
    for k in (3, 9, 16):
        H = np.zeros((m, m))
        H[:k, :k] = rng.standard_normal((k, k))
        T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H), k)
        T, Q = np.asarray(T), np.asarray(Q)
        assert bool(ok)
        assert np.abs(Q.T @ Q - np.eye(m)).max() < 1e-12
        assert np.abs(Q[:k, :k].T @ H[:k, :k] @ Q[:k, :k] - T[:k, :k]).max() < 1e-9
        # quasi-triangular, no adjacent 2x2 overlap
        sub = np.abs(np.diagonal(T, -1)[: k - 1]) > 0
        if k > 2:
            assert not np.any(sub[:-1] & sub[1:])
        re, im = dense.real_schur_eigvals(jnp.asarray(T), k)
        lam = np.asarray(re)[:k] + 1j * np.asarray(im)[:k]
        exact = np.linalg.eigvals(H[:k, :k])
        assert np.abs(np.sort_complex(lam) - np.sort_complex(exact)).max() < 1e-7


def test_real_schur_rotation_blocks():
    # orthogonal-similar block-diag of rotations: all complex pairs
    rng = np.random.default_rng(1)
    k = 10
    R = np.zeros((k, k))
    for i, t in enumerate(rng.uniform(0.3, 2.8, k // 2)):
        R[2 * i : 2 * i + 2, 2 * i : 2 * i + 2] = [
            [np.cos(t), -np.sin(t)],
            [np.sin(t), np.cos(t)],
        ]
    P = np.linalg.qr(rng.standard_normal((k, k)))[0]
    H = P @ R @ P.T
    T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H), k)
    re, im = dense.real_schur_eigvals(T, k)
    lam = np.asarray(re) + 1j * np.asarray(im)
    exact = np.linalg.eigvals(H)
    assert np.abs(np.sort_complex(lam) - np.sort_complex(exact)).max() < 1e-10
    # every eigenvalue is complex: 5 standardized 2x2 blocks
    assert int(np.sum(np.asarray(dense.block_starts(T, k)))) == 5


def test_sort_schur_real():
    rng = np.random.default_rng(2)
    m, k = 14, 12
    H = np.zeros((m, m))
    H[:k, :k] = rng.standard_normal((k, k))
    T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H), k)
    for which in ("LM", "LR", "SR"):
        Ts, Qs = jax.jit(dense.sort_schur_real, static_argnums=(2,))(T, Q, which, k)
        Ts, Qs = np.asarray(Ts), np.asarray(Qs)
        assert np.abs(Qs.T @ Qs - np.eye(m)).max() < 1e-12
        assert np.abs(Qs[:k, :k].T @ H[:k, :k] @ Qs[:k, :k] - Ts[:k, :k]).max() < 1e-9
        re, im = dense.real_schur_eigvals(jnp.asarray(Ts), k)
        lam = np.asarray(re)[:k] + 1j * np.asarray(im)[:k]
        keyfn = {"LM": lambda v: -np.abs(v), "LR": lambda v: -v.real,
                 "SR": lambda v: v.real}[which]
        keys = keyfn(lam)
        i, kl = 0, []
        while i < k:
            kl.append(keys[i])
            i += 2 if im[i] != 0 else 1
        kl = np.array(kl)
        assert np.all(kl[:-1] <= kl[1:] + 1e-10)


def test_sort_schur_real_stress():
    """Adversarial orderings for the odd-even block-transposition schedule:
    reverse-sorted spectra (every block travels the full distance), mixed
    1x1/2x2 block patterns, several seeds; checks the similarity invariant,
    orthogonality, standard form of surviving 2x2 blocks, and key ordering."""
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        m, k = 31, 28
        # block-diagonal seed with a known adversarial key order, then rotate
        # by an orthogonal similarity and re-Schur so the sort has real work
        H = np.zeros((m, m))
        H[:k, :k] = rng.standard_normal((k, k)) + np.diag(
            np.linspace(k, 1, k)  # descending real parts: LR sort reverses all
        )
        T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H), k)
        assert bool(ok)
        for which in ("SR", "LR", "LM", "SM"):
            Ts, Qs = jax.jit(dense.sort_schur_real, static_argnums=(2,))(
                T, Q, which, k
            )
            Ts, Qs = np.asarray(Ts), np.asarray(Qs)
            assert np.abs(Qs.T @ Qs - np.eye(m)).max() < 1e-11
            assert (
                np.abs(Qs[:k, :k].T @ H[:k, :k] @ Qs[:k, :k] - Ts[:k, :k]).max()
                < 1e-8
            )
            # quasi-triangular: nothing below the first subdiagonal, no
            # adjacent 2x2 overlap, 2x2 blocks standardized (equal diagonal)
            assert np.abs(np.tril(Ts[:k, :k], -2)).max() == 0.0
            sub = np.abs(np.diagonal(Ts, -1)[: k - 1]) > 0
            if k > 2:
                assert not np.any(sub[:-1] & sub[1:])
            for i in np.nonzero(sub)[0]:
                assert abs(Ts[i, i] - Ts[i + 1, i + 1]) < 1e-8 * max(
                    1, abs(Ts[i, i])
                )
            re, im = dense.real_schur_eigvals(jnp.asarray(Ts), k)
            lam = np.asarray(re)[:k] + 1j * np.asarray(im)[:k]
            exact = np.linalg.eigvals(H[:k, :k])
            assert np.abs(
                np.sort_complex(np.round(lam, 6))
                - np.sort_complex(np.round(exact, 6))
            ).max() < 1e-5
            keyfn = {
                "LM": lambda v: -np.abs(v),
                "SM": lambda v: np.abs(v),
                "LR": lambda v: -v.real,
                "SR": lambda v: v.real,
            }[which]
            keys = keyfn(lam)
            i, kl = 0, []
            while i < k:
                kl.append(keys[i])
                i += 2 if im[i] != 0 else 1
            kl = np.array(kl)
            assert np.all(kl[:-1] <= kl[1:] + 1e-9)


def test_triangular_eigvecs_real():
    rng = np.random.default_rng(3)
    m, k = 14, 11
    H = np.zeros((m, m))
    H[:k, :k] = rng.standard_normal((k, k))
    T, Q, ok = jax.jit(dense.real_schur_active)(jnp.asarray(H), k)
    Xre, Xim = jax.jit(dense.triangular_eigvecs_real)(T, k)
    re, im = dense.real_schur_eigvals(T, k)
    Tn = np.asarray(T)
    X = np.asarray(Xre) + 1j * np.asarray(Xim)
    lam = np.asarray(re) + 1j * np.asarray(im)
    R = Tn[:k, :k] @ X[:k, :k] - X[:k, :k] * lam[None, :k]
    assert np.abs(R).max() < 1e-10
    # conjugate-pair convention: adjacent columns are conjugates
    starts = np.asarray(dense.block_starts(T, k))
    for i in np.nonzero(starts)[0]:
        assert np.abs(X[:, i + 1] - X[:, i].conj()).max() < 1e-12
