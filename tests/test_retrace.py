"""Retrace guard — the JAX analogue of the reference's ``@constinferred``.

The reference asserts type stability on every driver call
(``test/eigsolve.jl:69``, ``test/linsolve.jl:11``); the jit-world equivalent
regression is *retracing*: a driver that accidentally treats a traced value as
static (or produces weak-type wobble) compiles again on every same-shaped
call, which shows up only as silent slowdown.  Each driver here is traced
under ``chex.assert_max_traces(n=1)`` and called twice with same-shaped,
different-valued inputs — a second trace fails the test.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import krylovkit_tpu as kk
from krylovkit_tpu.ops.block import Block

N = 12
RNG = np.random.default_rng(7)
_A = RNG.standard_normal((N, N))
HERM = jnp.asarray(_A + _A.T + 2 * N * np.eye(N))  # hermitian positive definite
GEN = jnp.asarray(RNG.standard_normal((N, N)))
_B = RNG.standard_normal((N, N))
BPD = jnp.asarray(_B @ _B.T + N * np.eye(N))
RECT = jnp.asarray(RNG.standard_normal((N + 4, N)))
B_VEC = jnp.asarray(RNG.standard_normal(N))
B_RECT = jnp.asarray(RNG.standard_normal(N + 4))
KW = dict(krylovdim=8, maxiter=2, tol=1e-8)
KW0 = dict(maxiter=2, tol=1e-8)  # CG/BiCGStab/MINRES carry no krylovdim


def _cases():
    # (name, fn(x)) — x is the only jit argument; everything else is closed over
    return [
        ("linsolve_cg", lambda x: kk.linsolve(HERM, x, alg=kk.CG(**KW0))),
        ("linsolve_gmres", lambda x: kk.linsolve(GEN, x, alg=kk.GMRES(**KW))),
        (
            "linsolve_bicgstab",
            lambda x: kk.linsolve(GEN, x, alg=kk.BiCGStab(**KW0)),
        ),
        ("linsolve_minres", lambda x: kk.linsolve(HERM, x, alg=kk.MINRES(**KW0))),
        ("lssolve_lsmr", lambda x: kk.lssolve(RECT, x, alg=kk.LSMR(**KW))),
        (
            "eigsolve_lanczos",
            lambda x: kk.eigsolve(HERM, x, 2, "LM", alg=kk.Lanczos(**KW)),
        ),
        (
            "eigsolve_arnoldi",
            lambda x: kk.eigsolve(GEN, x, 2, "LM", alg=kk.Arnoldi(**KW)),
        ),
        (
            "schursolve",
            lambda x: kk.schursolve(GEN, x, 2, "LM", kk.Arnoldi(**KW)),
        ),
        (
            "realeigsolve",
            lambda x: kk.realeigsolve(HERM, x, 2, "LR", alg=kk.Arnoldi(**KW)),
        ),
        (
            "eigsolve_blocklanczos",
            lambda xs: kk.eigsolve(
                HERM,
                Block(xs, stacked=True),
                2,
                "LM",
                alg=kk.BlockLanczos(krylovdim=8, maxiter=2, tol=1e-8),
            ),
        ),
        (
            "bieigsolve",
            lambda x: kk.bieigsolve(
                GEN, x, x + 0.5, 2, "LM", alg=kk.BiArnoldi(**KW)
            ),
        ),
        (
            "geneigsolve",
            lambda x: kk.geneigsolve(
                (HERM, BPD), x, 1, "SR", alg=kk.GolubYe(**KW)
            ),
        ),
        (
            "svdsolve",
            lambda x: kk.svdsolve(RECT, x, 2, "LR", alg=kk.GKL(**KW)),
        ),
        (
            "expintegrator",
            lambda x: kk.expintegrator(
                HERM, 0.1, (x, 0.2 * x), alg=kk.Lanczos(**KW)
            ),
        ),
    ]


@pytest.mark.parametrize("name,fn", _cases(), ids=[c[0] for c in _cases()])
def test_driver_traces_once(name, fn):
    chex.clear_trace_counter()
    guarded = jax.jit(chex.assert_max_traces(fn, n=1))
    if name == "eigsolve_blocklanczos":
        x1 = jnp.asarray(RNG.standard_normal((2, N)))
        x2 = x1 + 0.25
    elif name == "lssolve_lsmr" or name == "svdsolve":
        x1, x2 = B_RECT, B_RECT * 1.5 + 0.1
    else:
        x1, x2 = B_VEC, B_VEC * 1.5 + 0.1
    r1 = fn and guarded(x1)
    # same shape/dtype, different values: must hit the compiled executable
    r2 = guarded(x2)  # chex raises AssertionError on a second trace
    jax.block_until_ready(jax.tree_util.tree_leaves((r1, r2))[0])
