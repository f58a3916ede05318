"""L0 tests: pytree vector space + operator protocol (property tests vs numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krylovkit_tpu.ops import vector as vec
from krylovkit_tpu.ops import operator as op

from testsetup import DTYPES, rand_vec, rand_mat, precision


@pytest.mark.parametrize("dtype", DTYPES)
def test_inner_norm_matches_numpy(dtype):
    rng = np.random.default_rng(0)
    x = rand_vec(rng, 20, dtype)
    y = rand_vec(rng, 20, dtype)
    tx = {"a": jnp.asarray(x[:8]), "b": jnp.asarray(x[8:])}
    ty = {"a": jnp.asarray(y[:8]), "b": jnp.asarray(y[8:])}
    got = vec.inner(tx, ty)
    want = np.vdot(x, y)
    assert np.allclose(got, want, atol=precision(dtype))
    assert np.allclose(vec.norm(tx), np.linalg.norm(x), atol=precision(dtype))


def test_real_space_projects_inner():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rand_vec(rng, 10, np.complex128))
    y = jnp.asarray(rand_vec(rng, 10, np.complex128))
    got = vec.REAL.inner(x, y)
    assert got.dtype == jnp.float64
    assert np.allclose(got, np.real(np.vdot(x, y)))


def test_custom_inner_space():
    rng = np.random.default_rng(2)
    w = np.abs(rng.standard_normal(10)) + 0.5
    space = vec.VectorSpace(inner_fn=lambda a, b: jnp.vdot(a * w, b))
    x = jnp.asarray(rand_vec(rng, 10, np.float64))
    assert np.allclose(space.norm(x), np.sqrt(np.sum(w * x**2)))


def test_add_scale_zerovector():
    x = {"a": jnp.arange(3.0)}
    y = {"a": jnp.ones(3)}
    out = vec.add(y, x, a=2.0, b=-1.0)
    assert np.allclose(out["a"], -np.ones(3) + 2 * np.arange(3.0))
    assert np.allclose(vec.scale(x, 3)["a"], 3 * np.arange(3.0))
    assert np.allclose(vec.zerovector(x)["a"], 0)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_matrix_operator_and_adjoint(dtype):
    rng = np.random.default_rng(3)
    A = rand_mat(rng, 7, 5, dtype)
    x = jnp.asarray(rand_vec(rng, 5, dtype))
    y = jnp.asarray(rand_vec(rng, 7, dtype))
    O = op.as_operator(jnp.asarray(A))
    assert np.allclose(O(x), A @ np.asarray(x), atol=precision(dtype))
    assert np.allclose(O.apply_adjoint(y), A.conj().T @ np.asarray(y), atol=precision(dtype))


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_auto_adjoint_via_linear_transpose(dtype):
    """The TPU build derives fᴴ automatically (the reference requires the user to
    supply it, src/apply.jl:14-19)."""
    rng = np.random.default_rng(4)
    A = rand_mat(rng, 6, 6, dtype)
    Aj = jnp.asarray(A)

    def f(x):
        return Aj @ x

    x0 = jnp.zeros(6, dtype=dtype)
    O = op.as_operator(f).with_adjoint_from(x0)
    y = jnp.asarray(rand_vec(rng, 6, dtype))
    assert np.allclose(O.apply_adjoint(y), A.conj().T @ np.asarray(y), atol=precision(dtype))


def test_apply_shifted():
    rng = np.random.default_rng(5)
    A = rand_mat(rng, 6, 6, np.float64)
    x = jnp.asarray(rand_vec(rng, 6, np.float64))
    O = op.as_operator(jnp.asarray(A))
    got = op.apply_shifted(O, x, 2.0, -0.5)
    assert np.allclose(got, 2 * np.asarray(x) - 0.5 * (A @ np.asarray(x)))


def test_probe_dtype_spends_no_flops():
    calls = []

    def f(x):
        calls.append(1)
        return x * 1.0

    O = op.as_operator(f)
    dt = op.probe_dtype(O, jnp.zeros(4, jnp.float32))
    assert dt == jnp.float32
