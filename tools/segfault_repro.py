"""Minimal-repro probe for the XLA:CPU segfault behind the conftest
clear_caches() workaround (many accumulated compilations in one process)."""
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
