"""Differentiate THROUGH an eigensolve: dE0/dg of the TFIM ground energy.

The custom VJP runs the same adjoint Krylov solves as the reference's
ChainRules extension; Hellmann-Feynman gives the oracle:
dE0/dg = <psi0| dH/dg |psi0> = -sum_i <X_i>.
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import krylovkit_tpu as kk

L, J = 8, 1.0
z = [1 - 2 * jax.lax.broadcasted_iota(jnp.float64, (2,) * L, i) for i in range(L)]
zz_diag = sum(z[i] * z[i + 1] for i in range(L - 1))
psi0 = jnp.asarray(np.random.default_rng(1).standard_normal((2,) * L))

def H_apply(g, psi):
    out = -J * zz_diag * psi
    for i in range(L):
        out = out - g * jnp.flip(psi, axis=i)
    return out

def E0(g):
    # parameters the gradient should flow through must be pytree DATA of the
    # operator, not closed-over by a plain callable (docs/man/implementation.md)
    op = kk.ParametricOperator(H_apply, params=g)
    vals, vecs, info = kk.eigsolve(
        op, psi0, 1, "SR", ishermitian=True, krylovdim=25, maxiter=100, tol=1e-12,
    )
    return vals[0]

g = 0.7
dEdg = float(jax.grad(E0)(jnp.float64(g)))
eps = 1e-6
fd = (float(E0(jnp.float64(g + eps))) - float(E0(jnp.float64(g - eps)))) / (2 * eps)
print(f"dE0/dg  AD: {dEdg:.8f}   finite differences: {fd:.8f}")
assert abs(dEdg - fd) < 1e-5
print("gradient through eigsolve matches finite differences")
