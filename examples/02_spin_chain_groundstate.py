"""Ground state of a transverse-field Ising chain, matrix-free.

The Hamiltonian  H = -J sum Z_i Z_{i+1} - g sum X_i  acts on a pytree vector
that is just the state tensor of shape (2,)*L — no matrix is ever built.
This is the workload KrylovKit.jl is famous for (tensor-network ground-state
searches); here the operator is a jit-compiled callable.
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import krylovkit_tpu as kk

L, J, g = 10, 1.0, 0.7

# diagonal of the ZZ part, precomputed once: shape (2,)*L
z = [1 - 2 * jax.lax.broadcasted_iota(jnp.float64, (2,) * L, i) for i in range(L)]
zz_diag = sum(z[i] * z[i + 1] for i in range(L - 1))

def H(psi):
    out = -J * zz_diag * psi
    for i in range(L):
        out = out - g * jnp.flip(psi, axis=i)   # X_i flips spin i
    return out

psi0 = jnp.asarray(np.random.default_rng(1).standard_normal((2,) * L))
vals, vecs, info = kk.eigsolve(
    H, psi0, howmany=2, which="SR", ishermitian=True,
    krylovdim=30, maxiter=100, tol=1e-10,
)
E0, E1 = float(vals[0]), float(vals[1])
print(f"L={L} TFIM: E0 = {E0:.10f}, gap = {E1 - E0:.6f}, "
      f"numops = {int(info.numops)}")

# oracle: dense Hamiltonian via Kronecker products (2^10 = 1024, cheap)
X = np.array([[0, 1], [1, 0]]); Z = np.diag([1.0, -1.0]); I = np.eye(2)
def kron_at(op, i):
    mats = [I] * L; mats[i] = op
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out
Hd = -J * sum(kron_at(Z, i) @ kron_at(Z, i + 1) for i in range(L - 1))
Hd = Hd - g * sum(kron_at(X, i) for i in range(L))
w = np.linalg.eigvalsh(Hd)
print(f"dense oracle:  E0 = {w[0]:.10f}, gap = {w[1] - w[0]:.6f}")
assert abs(E0 - w[0]) < 1e-8 and abs(E1 - w[1]) < 1e-6
print("matrix-free Lanczos matches the dense oracle")
