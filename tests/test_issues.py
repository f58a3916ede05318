"""Issue-pinned regressions, mirroring the reference ``test/issues.jl``."""

import numpy as np
import jax
import jax.numpy as jnp

import krylovkit_tpu as kk


def test_issue_100_vector_of_vectors_with_shrinking():
    """Reference test/issues.jl:1-19 (Jutho/KrylovKit.jl#100): a two-leaf
    pytree vector through an eigsolve large enough to trigger restarts must
    match the flat solve."""
    N = 32
    rng = np.random.default_rng(100)
    A = rng.standard_normal((N, N))
    A = A + A.T
    h = N // 2

    def f(v):
        vv = jnp.concatenate([v["a"], v["b"]])
        y = jnp.asarray(A) @ vv
        return {"a": y[:h], "b": y[h:]}

    v0 = {"a": jnp.asarray(rng.standard_normal(h)),
          "b": jnp.asarray(rng.standard_normal(h))}
    vals, vecs, info = kk.eigsolve(f, v0, 4, "LM", ishermitian=True,
                                   krylovdim=12, maxiter=100, tol=1e-12)
    vals2, vecs2, info2 = kk.eigsolve(jnp.asarray(A),
                                      jnp.concatenate([v0["a"], v0["b"]]),
                                      4, "LM", ishermitian=True,
                                      krylovdim=12, maxiter=100, tol=1e-12)
    assert int(info.converged) >= 4
    assert np.allclose(np.asarray(vals[:4]), np.asarray(vals2[:4]), atol=1e-8)
    for i in range(4):
        vi = jax.tree_util.tree_map(lambda l: l[i], vecs)
        flat = np.concatenate([np.asarray(vi["a"]), np.asarray(vi["b"])])
        ov = abs(np.vdot(flat, np.asarray(vecs2)[i]))
        assert abs(ov - 1.0) < 1e-6, (i, ov)


def test_issue_133_exact_lssolve():
    """Reference test/issues.jl:21-29 (#133): lssolve on the identity finishes
    in one iteration with zero residual."""
    b = jnp.asarray([1.0, 0.0])
    x, info = kk.lssolve(jnp.eye(2), b)
    assert np.allclose(np.asarray(x), [1.0, 0.0], atol=1e-14)
    assert int(info.converged) == 1
    assert int(info.numiter) == 1
    assert float(info.normres) <= 1e-14


def test_issue_156_identity_eigsolve():
    """Reference test/issues.jl:32-36 (#156): eigsolve of the identity (fully
    degenerate spectrum, immediate breakdown) converges with vals ≈ 1."""
    vals, vecs, info = kk.eigsolve(jnp.eye(2), jnp.ones(2), howmany=1,
                                   which="LM")
    nc = int(info.converged)
    assert nc >= 1
    assert np.allclose(np.real(np.asarray(vals[:nc])), 1.0, atol=1e-10)
