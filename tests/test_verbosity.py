"""Verbosity/logging contract tests, mirroring the reference's ``@test_logs``
assertions (``test/eigsolve.jl:15-60``, ``test/linsolve.jl:18-43``): the log
output at each level is part of the specified behavior."""

import contextlib
import io

import numpy as np
import jax.numpy as jnp

import krylovkit_tpu as kk
from krylovkit_tpu.info import EACHITERATION, SILENT, STARTSTOP, WARN
from testsetup import hermitize, n, rand_mat, rand_vec


def _capture(fn):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out = fn()
        import jax

        jax.effects_barrier()
    return buf.getvalue()


def _solve(verbosity, maxiter=50, tol=1e-10, krylovdim=n):
    rng = np.random.default_rng(91)
    A = hermitize(rand_mat(rng, n, n, np.float64))
    x0 = rand_vec(rng, n, np.float64)
    alg = kk.Lanczos(
        krylovdim=krylovdim, tol=tol, maxiter=maxiter, verbosity=verbosity
    )
    return kk.eigsolve(A, jnp.asarray(x0), 2, "LR", ishermitian=True, alg=alg)


def test_silent_no_output():
    out = _capture(lambda: _solve(SILENT))
    assert out == ""


def test_warn_silent_on_success():
    out = _capture(lambda: _solve(WARN))
    assert out == ""


def test_warn_on_failure():
    # impossible tolerance, subspace smaller than the problem → warning
    out = _capture(lambda: _solve(WARN, maxiter=1, tol=1e-30, krylovdim=5))
    assert "without convergence" in out


def test_startstop_single_message():
    out = _capture(lambda: _solve(STARTSTOP))
    assert out.count("finished") == 1


def test_eachiteration_messages():
    out = _capture(lambda: _solve(EACHITERATION))
    assert "in iteration" in out


def test_gmres_startstop():
    rng = np.random.default_rng(92)
    A = rand_mat(rng, n, n, np.float64) + 2 * np.eye(n)
    b = rand_vec(rng, n, np.float64)

    def run():
        return kk.linsolve(
            A, b, alg=kk.GMRES(tol=1e-10, krylovdim=n, maxiter=10,
                               verbosity=STARTSTOP)
        )

    out = _capture(run)
    assert "GMRES linsolve finished" in out
