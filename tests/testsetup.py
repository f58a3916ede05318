"""Shared test utilities, mirroring the reference's ``test/testsetup.jl``.

* ``precision(dtype)`` — tolerance ``eps(real(T))^(2/3)`` (reference
  ``test/testsetup.jl:14-15``).
* mode matrix — the reference wraps vectors in minimal wrapper types to enforce
  interface-only access (``test/testsetup.jl:65-98``); the JAX analogue is running
  each solver with (a) raw 1-D arrays, (b) pytrees (dict of arrays), and (c)
  sharded arrays.
* ``mat_with_eigrepition`` — matrices with degenerate eigenvalues for block
  methods (reference ``test/testsetup.jl:46-58``).
"""

import numpy as np
import jax.numpy as jnp

n = 10  # "full" problems: converge in one iteration (reference test/runtests.jl:15)
N = 100  # "iterative" problems with restarts (reference test/runtests.jl:16)

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def precision(dtype, relaxed=False):
    eps = np.finfo(np.dtype(dtype)).eps
    return eps ** (1 / 2) if relaxed else eps ** (2 / 3)


def rand_mat(rng, m, k, dtype):
    dt = np.dtype(dtype)
    if dt.kind == "c":
        a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    else:
        a = rng.standard_normal((m, k))
    return (a / np.sqrt(m)).astype(dt)  # divide first: NEP-50 would promote f32/f64-scalar


def rand_vec(rng, m, dtype):
    dt = np.dtype(dtype)
    if dt.kind == "c":
        v = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    else:
        v = rng.standard_normal(m)
    return v.astype(dt)


def hermitize(A):
    return (A + A.conj().T) / 2


def as_pytree(v):
    """Split a 1-D vector into a two-leaf pytree (mode ':pytree')."""
    m = v.shape[0] // 2
    return {"a": jnp.asarray(v[:m]), "b": jnp.asarray(v[m:])}


def pytree_matvec(A):
    """Wrap a dense matrix as an operator on the two-leaf pytree encoding."""

    def f(x):
        v = jnp.concatenate([x["a"], x["b"]])
        w = A @ v
        m = A.shape[0] // 2
        return {"a": w[:m], "b": w[m:]}

    return f


def mat_with_eigrepition(rng, m, nrep, dtype):
    """Hermitian matrix whose largest eigenvalues have multiplicity
    (reference test/testsetup.jl:46-58)."""
    A = hermitize(rand_mat(rng, m, m, dtype))
    w, V = np.linalg.eigh(A)
    for i in range(1, nrep + 1):
        w[-1 - i] = w[-1]
    return (V * w) @ V.conj().T


def eig_close(got, want, tol):
    """Permutation-tolerant eigenvalue comparison (reference ``≊``,
    test/testsetup.jl:18-29) via greedy nearest matching (robust to sort-order
    flips of numerically-near-conjugate pairs)."""
    got = np.atleast_1d(np.asarray(got, dtype=complex)).copy()
    want = np.atleast_1d(np.asarray(want, dtype=complex))
    if got.shape != want.shape:
        return False
    atol = tol * max(1.0, float(np.max(np.abs(want))))
    used = np.zeros(len(got), bool)
    for w in want:
        d = np.where(used, np.inf, np.abs(got - w))
        i = int(np.argmin(d))
        if d[i] > atol:
            return False
        used[i] = True
    return True
