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


def test_exact_log_counts_per_level():
    """Exact event-count contract (reference @test_logs, test/eigsolve.jl:15-60):
    the NUMBER of log lines per level is specified behavior, not incidental."""
    # full problem (krylovdim = n): converges/breaks down in exactly 1 iteration
    for verbosity, want_lines in ((SILENT, 0), (WARN, 0), (STARTSTOP, 1)):
        out = _capture(lambda v=verbosity: _solve(v))
        assert len([l for l in out.splitlines() if l.strip()]) == want_lines, (
            verbosity, out)
    # EACHITERATION on the full problem: 1 per-iteration line + 1 finished line
    out = _capture(lambda: _solve(EACHITERATION))
    lines = [l for l in out.splitlines() if l.strip()]
    assert sum("in iteration" in l for l in lines) == 1, out
    assert sum("finished" in l for l in lines) == 1, out
    assert len(lines) == 2, out


def test_per_expansion_log_level():
    """EACHITERATION+1 logs one message per subspace expansion inside the
    iterator (reference src/factorizations/lanczos.jl:268-270)."""
    vals_info = {}

    def run():
        vals, vecs, info = _solve(EACHITERATION + 1)
        vals_info["numops"] = int(info.numops)
        return vals

    out = _capture(run)
    nexp = sum("Lanczos expansion to dimension" in l for l in out.splitlines())
    # one apply per expansion in the Lanczos driver
    assert nexp == vals_info["numops"], (nexp, vals_info, out)


def test_per_expansion_log_level_gmres():
    rng = np.random.default_rng(93)
    A = rand_mat(rng, n, n, np.float64) + 2 * np.eye(n)
    b = rand_vec(rng, n, np.float64)
    info_box = {}

    def run():
        x, info = kk.linsolve(
            A, b, alg=kk.GMRES(tol=1e-10, krylovdim=n, maxiter=10,
                               verbosity=EACHITERATION + 1)
        )
        info_box["numops"] = int(info.numops)
        return x

    out = _capture(run)
    nexp = sum("Krylov expansion to dimension" in l for l in out.splitlines())
    # GMRES: numops = 1 initial residual apply + 1 per expansion (+1 verify)
    assert nexp >= 1 and nexp <= info_box["numops"], (nexp, info_box, out)
