"""Probe + findings for the XLA:CPU segfault behind the conftest
clear_caches() workaround.

FINDINGS (round 5, 2026-08-21):

* NOT a generic compile-count budget: this script performs 400+ fresh
  compilations (simple or while_loop-heavy, unique shapes) in one process
  with zero crashes — run ``python tools/segfault_repro.py loop 400``.
* DETERMINISTIC repro with the library's programs (needs the accumulated
  LIVE executables — large 8-device-mesh while_loop nests)::

      KK_NO_CLEAR_CACHES=1 python -X faulthandler -m pytest \
          tests/test_ad.py tests/test_bieigsolve.py tests/test_block_inner.py \
          tests/test_blocklanczos.py tests/test_dense.py tests/test_eigsolve.py -q

  crashes with SIGSEGV ~44 tests in; faulthandler pins the frame to
  ``jax/_src/compiler.py:353 backend_compile_and_load`` — i.e. INSIDE the
  XLA:CPU client's compile-and-load of the next executable, once enough
  compiled code is live in the process (freeing executables via
  ``jax.clear_caches()`` per module — the conftest workaround — prevents
  it).  Consistent with a CPU-JIT code-memory/placement failure in the
  bundled jaxlib (jax 0.9.0), not with anything in this repo's Python.
"""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "loop"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 400

for i in range(N):
    n = 8 + i  # unique shapes -> unique compilations
    if mode == "simple":
        f = jax.jit(lambda x: jnp.sin(x) @ x.T + i)
        out = f(jnp.ones((n, 4)))
    else:
        # while_loop-heavy like the solver programs
        def body(c):
            x, k = c
            y = jnp.tanh(x @ x.T)[:, :1] * jnp.ones((1, x.shape[1]))
            return x + 0.01 * y, k + 1
        f = jax.jit(lambda x: jax.lax.while_loop(
            lambda c: c[1] < 5, body, (x, 0))[0].sum())
        out = f(jnp.ones((n, n)))
    out.block_until_ready()
    if i % 50 == 0:
        print(i, flush=True)
print("DONE", N, "compilations, no crash", flush=True)
