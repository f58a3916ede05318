"""Krylov factorization state + the unified expansion kernel.

The reference implements five iterator/factorization pairs with per-orthogonalizer
recurrences (``src/factorizations/``).  The TPU build unifies Lanczos and Arnoldi
expansion into a single kernel: one operator application followed by one *full*
orthogonalization sweep against all active basis vectors (this is exactly what the
reference's default ``mgs2``/``cgs2`` Lanczos does anyway — its "3-term
recurrence" still reorthogonalizes against the whole basis,
``src/factorizations/lanczos.jl:330-376``).  The projected matrix ``H`` is kept as
a dense static ``(m+1, m+1)`` buffer; Hermitian drivers simply read it as such.

Contract (reference ``src/factorizations/krylov.jl:30-62``): after ``k`` steps

    A V[:, :k] = V[:, :k+1] @ H[:k+1, :k],      H[k, k-1] = β = ‖residual‖

with the residual vector ``r = β · V[k]``.

Thick restart writes an *arrowhead/Krylov-Schur* ``H`` (diagonal + spike row)
rather than restoring tridiagonal/Hessenberg form via Householder sweeps over the
basis (reference ``src/eigsolve/lanczos.jl:89-105``, ``arnoldi.jl:468-481``):
on TPU the restart is then a single basis GEMM, and the small-matrix form is
irrelevant because the projected problem is solved dense on device.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import basis as bs
from ..ops import orthonormal as on
from ..ops.vector import VectorSpace, STANDARD

PyTree = Any
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "KrylovState",
    "Lanczos3State",
    "initialize",
    "initialize_3term",
    "expand",
    "expand_hermitian",
    "expand_hermitian_selective",
    "expand_3term",
]


class KrylovState(NamedTuple):
    """Static-shape factorization state advanced inside ``lax.while_loop``."""

    V: PyTree  # stacked basis, capacity m+1
    H: jax.Array  # (m+1, m+1) projected-matrix buffer
    k: jax.Array  # current factorization size (int32)
    beta: jax.Array  # current residual norm ‖r‖


def initialize(
    x0: PyTree,
    m: int,
    coeff_dtype,
    space: VectorSpace = STANDARD,
    vec_dtype=None,
    verbosity: int = 0,
) -> KrylovState:
    """Allocate buffers and set ``V[0] = x0/‖x0‖`` (reference ``initialize``,
    ``src/factorizations/lanczos.jl:180-249``).  ``vec_dtype`` promotes the basis
    (e.g. real → complex for the Arnoldi/Schur path).

    A zero-norm ``x0`` cannot raise inside jit (the reference raises host-side,
    ``src/factorizations/lanczos.jl:184``); instead ``v0`` becomes NaN, which
    propagates so every residual comparison fails → ``converged == 0``, and a
    WARN-level message fires in-graph."""
    if vec_dtype is not None:
        x0 = jax.tree_util.tree_map(lambda l: l.astype(vec_dtype), x0)
    nrm = space.norm(x0)
    from ..info import warn_if

    warn_if(
        verbosity, nrm == 0,
        "[krylovkit_tpu] starting vector x0 has zero norm: results are NaN "
        "and converged = 0",
    )
    v0 = jax.tree_util.tree_map(lambda l: l / nrm.astype(l.dtype), x0)
    V = bs.alloc(v0, m + 1)
    V = bs.set(V, 0, v0)
    H = jnp.zeros((m + 1, m + 1), dtype=coeff_dtype)
    return KrylovState(V, H, jnp.int32(0), jnp.ones((), jnp.finfo(coeff_dtype).dtype))


def expand(
    op_apply,
    state: KrylovState,
    orth: on.Orthogonalizer,
    space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> KrylovState:
    """One Krylov step: ``w = A V[k]``; orthonormalize against ``V[0..k]``;
    append.  (reference ``expand!`` + recurrence,
    ``src/factorizations/lanczos.jl:250-272``, ``arnoldi.jl:199-219``)."""
    V, H, k, _ = state
    w = op_apply(bs.get(V, k))
    v_new, beta, c = on.orthonormalize(w, V, k + 1, orth, space)
    V = bs.set(V, k + 1, v_new)
    col = c.astype(H.dtype) + beta.astype(H.dtype) * jax.nn.one_hot(
        k + 1, H.shape[0], dtype=H.dtype
    )
    H = jax.lax.dynamic_update_slice(
        H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
    )
    from ..info import EACHITERATION, log_if

    # per-expansion message at EACHITERATION+1 (reference
    # src/factorizations/arnoldi.jl / lanczos.jl:268-270)
    log_if(
        verbosity, EACHITERATION + 1,
        "Krylov expansion to dimension {k}: subspace normres = {b}",
        k=k + 1, b=beta,
    )
    return KrylovState(V, H, k + 1, beta)


def expand_hermitian(
    op_apply,
    state: KrylovState,
    orth: on.Orthogonalizer,
    space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> KrylovState:
    """Hermitian Lanczos step: 3-term recurrence + ONE full drift sweep.

    This is what the reference's ``lanczosrecurrence`` actually does for its
    default cgs2/mgs2 orthogonalizers (``src/factorizations/lanczos.jl:330-376``):
    subtract ``β v_{k-1}`` and ``α v_k`` explicitly, then a *single* full
    reorthogonalization sweep against the basis.  One fewer basis pass per step
    than the generic :func:`expand` — the dominant HBM cost of the solver.

    The drift coefficients of the sweep are discarded: the Rayleigh-quotient
    column is the exact tridiagonal ``(α, β)`` (after a thick restart the
    arrowhead couplings of the column were already written by the restart, and
    the sweep removes exactly those components from ``w``).
    """
    V, H, k, beta_prev = state
    vk = bs.get(V, k)
    w = op_apply(vk)
    if isinstance(orth, on.ClassicalGramSchmidt):
        # pure-CGS fast path: the full-basis projection already contains the
        # α (at k) and β (at k-1) components, so the explicit 3-term
        # subtraction is redundant — one fewer pass over w per step (the
        # reference's cgs ``lanczosrecurrence``, src/factorizations/lanczos.jl:
        # 295-307, same single-sweep structure)
        v_new, beta, c = on.orthonormalize(w, V, k + 1, on.cgs, space)
        alpha = c[jnp.asarray(k, jnp.int32)]
        V = bs.set(V, k + 1, v_new)
        col = alpha.astype(H.dtype) * jax.nn.one_hot(
            k, H.shape[0], dtype=H.dtype
        ) + beta.astype(H.dtype) * jax.nn.one_hot(k + 1, H.shape[0], dtype=H.dtype)
        colold = jax.lax.dynamic_slice(
            H, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (H.shape[0], 1)
        )[:, 0]
        mask = jax.nn.one_hot(k, H.shape[0], dtype=H.dtype) + jax.nn.one_hot(
            k + 1, H.shape[0], dtype=H.dtype
        )
        col = colold * (1 - mask) + col
        H = jax.lax.dynamic_update_slice(
            H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
        )
        from ..info import EACHITERATION, log_if

        log_if(
            verbosity, EACHITERATION + 1,
            "Lanczos expansion to dimension {k}: subspace normres = {b}",
            k=k + 1, b=beta,
        )
        return KrylovState(V, H, k + 1, beta)
    km1 = jnp.maximum(k - 1, 0)
    vkm1 = bs.get(V, km1)
    bcoef = jnp.where(k > 0, beta_prev, 0)
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - bcoef.astype(lw.dtype) * lv, w, vkm1
    )
    alpha = space.inner(vk, w)
    if jnp.issubdtype(alpha.dtype, jnp.complexfloating):
        # hermiticity check (reference src/factorizations/lanczos.jl:172-178)
        from ..info import warn_if

        rdt = jnp.finfo(alpha.dtype).dtype
        htol = jnp.asarray(jnp.finfo(rdt).eps, rdt) ** jnp.asarray(0.75, rdt)
        warn_if(
            verbosity,
            jnp.abs(jnp.imag(alpha)) > htol * jnp.maximum(jnp.abs(alpha), 1),
            "Lanczos iteration: operator does not appear to be hermitian: "
            "imag(alpha) = {ia}",
            ia=jnp.imag(alpha),
        )
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - alpha.astype(lw.dtype) * lv, w, vk
    )
    # one full drift sweep (single pass regardless of the 2-pass orth variant)
    sweep_orth = (
        on.cgs
        if isinstance(orth, (on.ClassicalGramSchmidt, on.ClassicalGramSchmidt2))
        else on.mgs
        if isinstance(orth, (on.ModifiedGramSchmidt, on.ModifiedGramSchmidt2))
        else orth
    )
    v_new, beta, _ = on.orthonormalize(w, V, k + 1, sweep_orth, space)
    V = bs.set(V, k + 1, v_new)
    col = alpha.astype(H.dtype) * jax.nn.one_hot(
        k, H.shape[0], dtype=H.dtype
    ) + beta.astype(H.dtype) * jax.nn.one_hot(k + 1, H.shape[0], dtype=H.dtype)
    # add (don't overwrite): after a restart, column ``keep`` already carries
    # the arrowhead couplings written by the restart
    colold = jax.lax.dynamic_slice(
        H, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (H.shape[0], 1)
    )[:, 0]
    mask = jax.nn.one_hot(k, H.shape[0], dtype=H.dtype) + jax.nn.one_hot(
        k + 1, H.shape[0], dtype=H.dtype
    )
    col = colold * (1 - mask) + col
    H = jax.lax.dynamic_update_slice(
        H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
    )
    from ..info import EACHITERATION, log_if

    log_if(
        verbosity, EACHITERATION + 1,
        "Lanczos expansion to dimension {k}: subspace normres = {b}",
        k=k + 1, b=beta,
    )
    return KrylovState(V, H, k + 1, beta)


class Lanczos3State(NamedTuple):
    """O(1)-vector-memory pure 3-term Lanczos state (``keepvecs=false``).

    The reference's ``keepvecs=false`` mode drops old basis vectors and keeps
    only the rolling pair ``(v_{k-1}, v_k)`` (``src/factorizations/
    lanczos.jl:133-144``); it is only legal without reorthogonalization
    (guarded at ``lanczos.jl:137-141``).  The tridiagonal coefficients are
    still accumulated in the small ``(m+1, m+1)`` buffer ``H`` so the
    projected problem and the ``rayleighquotient`` accessor work unchanged.
    """

    v_prev: PyTree  # v_{k-1}
    v_cur: PyTree  # v_k (the residual direction)
    H: jax.Array  # (m+1, m+1) projected-matrix buffer (tridiagonal)
    k: jax.Array  # completed steps, int32
    beta: jax.Array  # ‖residual‖ of the last step


def initialize_3term(
    x0: PyTree, m: int, coeff_dtype, space: VectorSpace = STANDARD,
    verbosity: int = 0,
) -> Lanczos3State:
    """``v_0 = x0/‖x0‖`` with no stored basis (reference ``keepvecs=false``
    initialize, ``src/factorizations/lanczos.jl:184-207``)."""
    nrm = space.norm(x0)
    from ..info import warn_if

    warn_if(
        verbosity, nrm == 0,
        "[krylovkit_tpu] starting vector x0 has zero norm: results are NaN "
        "and converged = 0",
    )
    v0 = jax.tree_util.tree_map(lambda l: l / nrm.astype(l.dtype), x0)
    H = jnp.zeros((m + 1, m + 1), dtype=coeff_dtype)
    zero = jax.tree_util.tree_map(jnp.zeros_like, v0)
    return Lanczos3State(
        zero, v0, H, jnp.int32(0), jnp.ones((), jnp.finfo(coeff_dtype).dtype)
    )


def expand_3term(
    op_apply, state: Lanczos3State, space: VectorSpace = STANDARD
) -> Lanczos3State:
    """One pure 3-term step: ``w = A v_k − β_{k-1} v_{k-1} − α_k v_k`` with NO
    reorthogonalization — O(1) vector storage (reference ``lanczosrecurrence``
    for plain cgs/mgs, ``src/factorizations/lanczos.jl:295-328``)."""
    v_prev, v_cur, H, k, beta_prev = state
    m1 = H.shape[0]
    w = op_apply(v_cur)
    bcoef = jnp.where(k > 0, beta_prev, 0)
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - bcoef.astype(lw.dtype) * lv, w, v_prev
    )
    alpha = space.inner(v_cur, w)
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - alpha.astype(lw.dtype) * lv, w, v_cur
    )
    beta = space.norm(w)
    safe = jnp.where(beta > 0, beta, 1).astype(beta.dtype)
    v_new = jax.tree_util.tree_map(
        lambda l: jnp.where(beta > 0, l / safe, 0 * l), w
    )
    # lower-triangle convention (as expand_hermitian): α at [k, k], β at
    # [k+1, k]; the Hermitian Rayleigh quotient is tril(H) + tril(H,-1)ᴴ
    col = alpha.astype(H.dtype) * jax.nn.one_hot(
        k, m1, dtype=H.dtype
    ) + beta.astype(H.dtype) * jax.nn.one_hot(k + 1, m1, dtype=H.dtype)
    H = jax.lax.dynamic_update_slice(
        H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
    )
    return Lanczos3State(v_cur, v_new, H, k + 1, beta)


def expand_hermitian_selective(
    op_apply,
    state: KrylovState,
    omega: jax.Array,
    omega_prev: jax.Array,
    orth: on.Orthogonalizer,
    space: VectorSpace = STANDARD,
    force_sweep=False,
):
    """Hermitian Lanczos step with **partial reorthogonalization**.

    Tracks Simon's ω-recurrence estimating ``|⟨v_j, v_{k+1}⟩|`` from the
    tridiagonal coefficients alone (H. D. Simon, *The Lanczos algorithm with
    partial reorthogonalization*, Math. Comp. 42 (1984)); the full drift sweep
    (the dominant HBM cost — two basis passes) runs only when
    ``max_j ω_j > sqrt(eps)``, preserving *semiorthogonality* which is enough
    for O(eps)-accurate Ritz values.  No reference counterpart (KrylovKit
    always sweeps); this is the TPU build's opt-in fast path
    (``Lanczos(reorth="selective")``).

    Returns ``(state, omega_new, omega, swept)``.
    """
    V, H, k, beta_prev = state
    m1 = H.shape[0]
    rdt = omega.dtype
    eps = jnp.finfo(rdt).eps
    thresh = jnp.sqrt(eps)

    vk = bs.get(V, k)
    w = op_apply(vk)
    km1 = jnp.maximum(k - 1, 0)
    vkm1 = bs.get(V, km1)
    bcoef = jnp.where(k > 0, beta_prev, 0)
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - bcoef.astype(lw.dtype) * lv, w, vkm1
    )
    alpha = space.inner(vk, w)
    w = jax.tree_util.tree_map(
        lambda lw, lv: lw - alpha.astype(lw.dtype) * lv, w, vk
    )
    beta_raw = space.norm(w)

    # --- ω-recurrence for the would-be v_{k+1} against v_j, j <= k ---
    alphas = jnp.real(jnp.diagonal(H))  # α_j at [j, j]
    betas = jnp.abs(
        jnp.concatenate([jnp.diagonal(H, -1), jnp.zeros((1,), H.dtype)])
    ).astype(rdt)  # β_j at [j+1, j]
    a_k = jnp.real(alpha).astype(rdt)
    b_k = jnp.maximum(beta_raw, eps)
    idx = jax.lax.broadcasted_iota(jnp.int32, (m1,), 0)
    om_p1 = jnp.roll(omega, -1)
    om_m1 = jnp.roll(omega, 1)
    b_m1 = jnp.roll(betas, 1)
    scale_n = jnp.maximum(jnp.abs(a_k) + b_k + bcoef, 1.0)
    theta = eps * (betas + b_k) / b_k + eps * scale_n / b_k
    om_new = (
        betas * om_p1
        + (alphas - a_k) * omega
        + b_m1 * om_m1
        - jnp.where(k > 0, bcoef, 0) * omega_prev
    ) / b_k + theta
    om_new = jnp.abs(om_new)
    # boundary values: ω_{k+1,k} ~ eps-level, ω_{k+1,k+1} = 1; mask j > k
    om_new = jnp.where(idx == k, eps * scale_n / b_k, om_new)
    om_new = jnp.where(idx == k + 1, 1.0, om_new)
    om_new = jnp.where(idx > k + 1, 0.0, om_new)

    # force: the first expansion after a thick restart — the arrowhead spike
    # gives A·v_keep O(β) components along all kept Ritz vectors, which the
    # 3-term recurrence does not remove and the ω-recurrence does not model
    need_sweep = jnp.logical_or(
        jnp.max(jnp.where(idx < k, om_new, 0)) > thresh,
        jnp.asarray(force_sweep),
    )

    def do_sweep(w):
        w2, _ = on.orthogonalize(w, V, k + 1, on.cgs, space)
        return w2

    w = jax.lax.cond(need_sweep, do_sweep, lambda w: w, w)
    # after a sweep the basis is orthogonal to eps-level again
    eps_row = jnp.where(idx <= k, eps, 0.0).astype(rdt)
    om_out = jnp.where(need_sweep, eps_row, om_new)
    om_out = jnp.where(idx == k + 1, 1.0, om_out)
    om_cur = jnp.where(need_sweep, eps_row, omega)

    beta = space.norm(w)
    safe = jnp.where(beta > 0, beta, 1)
    v_new = jax.tree_util.tree_map(
        lambda l: jnp.where(beta > 0, l / safe.astype(l.dtype), 0 * l), w
    )
    V = bs.set(V, k + 1, v_new)
    col = alpha.astype(H.dtype) * jax.nn.one_hot(
        k, m1, dtype=H.dtype
    ) + beta.astype(H.dtype) * jax.nn.one_hot(k + 1, m1, dtype=H.dtype)
    colold = jax.lax.dynamic_slice(
        H, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (m1, 1)
    )[:, 0]
    mask = jax.nn.one_hot(k, m1, dtype=H.dtype) + jax.nn.one_hot(
        k + 1, m1, dtype=H.dtype
    )
    col = colold * (1 - mask) + col
    H = jax.lax.dynamic_update_slice(
        H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
    )
    return KrylovState(V, H, k + 1, beta), om_out, om_cur, need_sweep


# --------------------------------------------------------------------------
# Fused expansion loop (stencil operators, single-leaf f32 TPU layout)
# --------------------------------------------------------------------------

# Master switch for the fused Lanczos expansion (ops/pallas_fused_lanczos.py):
# one basis stream per step instead of two.  ``fused_interpret`` runs the
# kernel in Pallas interpret mode so CPU tests exercise the exact same path.
use_fused_expansion = True
fused_interpret = False


def fused_available(op, x0, space: VectorSpace, kmax=None) -> bool:
    """Static eligibility of the one-stream fused expansion: a real
    constant-coefficient :class:`~..ops.operator.StencilOperator` (flat
    chain) or :class:`~..ops.operator.GridStencilOperator` (2-D grid) whose
    offsets fit the kernel's halo window (``pf.spec_for``), a single
    ``(R, 128)`` float32 leaf, the standard inner product, and a TPU backend
    (or interpret mode for tests).  ``kmax`` (the ``(m+1)²`` H-buffer size)
    must leave room for the kernel's packed reduction row:
    ``kmax + 2 <= 128``."""
    from ..ops import pallas_fused_lanczos as pf

    if not use_fused_expansion:
        return False
    if kmax is not None and kmax + 2 > pf.LANES:
        # the kernel packs B coeffs + γ + 2 reductions into one 128-lane row;
        # krylovdim ≥ 126 must fall back to the unfused path, not crash
        return False
    spec = pf.spec_for(op)
    if spec is None:
        return False
    if space.inner_fn is not None:
        return False
    leaves = jax.tree_util.tree_leaves(x0)
    if len(leaves) != 1:
        return False
    l = leaves[0]
    if l.ndim != 2 or l.shape[1] != 128 or l.dtype != jnp.float32:
        return False
    if l.shape[0] % 8 != 0 or l.shape[0] < 16:
        return False
    # grid vectors must cover the grid exactly (zero halos at the array
    # ends ARE the grid's top/bottom Dirichlet boundary); under shard_map
    # (space.psum_axis) the per-shard rows must cut WHOLE grid rows so the
    # kernel's local grid-column phase equals the global one
    if spec.gc:
        nloc = l.shape[0] * 128
        if space.psum_axis is not None:
            if nloc % spec.gc != 0:
                return False
            nloc = nloc * jax.lax.axis_size(space.psum_axis)
        if nloc != spec.gr * spec.gc:
            return False
    try:
        pf.choose_tile(l.shape[0], h=spec.h)
    except ValueError:
        return False
    if jax.default_backend() != "tpu" and not fused_interpret:
        return False
    return True


def _safe_inv(x):
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 1.0)


class FusedScales(NamedTuple):
    """Scalar-space basis bookkeeping of the fused expansion modes.

    Stored basis rows ``R_j`` are raw residuals (unnormalized); the TRUE
    orthonormal basis is ``v_j = Σ_i L[i,j] R_i`` with ``L`` upper-triangular.
    Every basis consumption (restart rotation, extraction, unprojection) folds
    ``L`` — one small matmul; for the plain-cgs mode ``L = diag(s)`` exactly.

    * ``L``  — (kmax, kmax) basis coefficient matrix;
    * ``s``  — (kmax,) inverse stored-row norms ``1/‖R_j‖``;
    * ``Hs`` — (kmax, kmax) stored-row images ``A R_i = Σ_j Hs[j,i] R_j``
      (dgks mode only — lets the deferred correction express ``A v_k`` in
      stored rows without extra vector passes);
    * ``M``  — (kmax, kmax) stored-row Gram ``<R_i, R_j>`` accumulated from
      the kernel's drift reductions (dgks mode only).
    """

    L: jax.Array
    s: jax.Array
    Hs: jax.Array
    M: jax.Array


def fused_scales_init(kmax: int, H=None) -> FusedScales:
    """Identity bookkeeping (all rows normalized/orthonormal).  ``H`` seeds
    the stored-row Hessenberg: after a thick restart the surviving rows are
    re-orthonormalized, so the arrowhead projected matrix IS the stored-row
    relation ``A R_i = Σ_j H[j,i] R_j`` for the kept columns."""
    eye = jnp.eye(kmax, dtype=jnp.float32)
    Hs = jnp.zeros((kmax, kmax), jnp.float32) if H is None else jnp.real(
        H
    ).astype(jnp.float32)
    return FusedScales(eye, jnp.ones((kmax,), jnp.float32), Hs, eye)


def fold_scales(sc: FusedScales, coeffs: jax.Array) -> jax.Array:
    """True-basis coefficient vector/matrix → stored-row coefficients:
    ``V_true @ c = V_stored @ (L @ c)``."""
    return jnp.matmul(
        sc.L.astype(coeffs.dtype), coeffs, precision=_HI
    ).astype(coeffs.dtype)


def _step_coeffs(r, d, rp, q, sc: FusedScales, k, dgks: bool):
    """Scalar front-half of one fused step at top row ``k``: clean the
    measured reductions, apply the deferred DGKS correction of row ``k``
    (dgks mode), and build the subtraction coefficients.

    Math (see ops/pallas_fused_lanczos.py module doc): with the true basis
    ``v_j = Σ_i L[i,j] R_i`` and ``y = A R_k`` in hand,

        A v_k = λ·y + Σ_i u_i R_i,      λ = L[k,k],  u = Hs · (L[:,k]·1_{i<k})
        h_j   = <v_j, A v_k> = λ (Lᵀ r)_j + (Lᵀ M u)_j          (exact)
        w_{k+1} = A v_k − Σ_j h_j v_j = λ·y − Σ_i (L h − u)_i R_i

    The deferred correction (dgks): the kernel measured ``d_i = <R_i, R_k>``
    one step ago; the DGKS second-sweep coefficients of row ``k`` are
    ``c2_j = <v_j, R̂_k> = s_k (Lᵀ d)_j`` and the corrected column is
    ``L[:,k] = N (s_k e_k − L c2)`` with ``N = 1/√(1 − Σ c2²)`` — one-reduce
    CGS2: the second sweep never touches HBM.
    """
    kmax = sc.L.shape[0]
    idx = jnp.arange(kmax)
    L, s, Hs, M = sc
    r = jnp.where(idx == k, rp, r)
    r = jnp.where(idx <= k, r, 0.0)
    b = jnp.sqrt(q)
    sk = _safe_inv(b)
    s = jnp.where(idx == k, sk, s)
    ohk = jax.nn.one_hot(k, kmax, dtype=jnp.float32)
    if dgks:
        d = jnp.where(idx == k, q, d)
        d = jnp.where(idx <= k, d, 0.0)
        # stored-row Gram: column k and row k from the measured drift
        M = M * (1 - ohk)[None, :] + d[:, None] * ohk[None, :]
        M = M * (1 - ohk)[:, None] + d[None, :] * ohk[:, None]
        c2 = sk * jnp.matmul(L.T, d, precision=_HI)
        c2 = jnp.where(idx < k, c2, 0.0)
        N = 1.0 / jnp.sqrt(jnp.maximum(1.0 - jnp.sum(c2 * c2), 0.25))
        Lcol = N * (sk * ohk - jnp.matmul(L, c2, precision=_HI))
        lam = N * sk  # = Lcol[k]: L is upper-triangular, (L c2)[k] = 0
    else:
        Lcol = sk * ohk
        lam = sk
    Lcol = jnp.where(idx <= k, Lcol, 0.0)
    L = L * (1 - ohk)[None, :] + Lcol[:, None] * ohk[None, :]
    if dgks:
        u = jnp.matmul(Hs, jnp.where(idx < k, Lcol, 0.0), precision=_HI)
        h = lam * jnp.matmul(L.T, r, precision=_HI) + jnp.matmul(
            L.T, jnp.matmul(M, u, precision=_HI), precision=_HI
        )
    else:
        u = jnp.zeros_like(r)
        h = lam * jnp.matmul(L.T, r, precision=_HI)
    h = jnp.where(idx <= k, h, 0.0)
    csub = jnp.matmul(L, h, precision=_HI) - u
    csub = jnp.where(idx <= k, csub, 0.0)
    alpha = jax.lax.dynamic_index_in_dim(h, k, 0, keepdims=False)
    return csub, lam, h, alpha, FusedScales(L, s, Hs, M)


def _edge_fix(cache, first, last, axis):
    """Replace the shard-edge halo planes of a per-shard boundary cache with
    the neighbouring shards' edge rows via ``ppermute`` (zeros arrive at the
    global ends — the Dirichlet boundary).  ``cache``: ``lead + (nt, 2, h,
    C)``; ``first``/``last``: ``lead + (h, C)`` — the shard's own outermost
    rows.  This is ALL the communication the sharded fused expansion needs:
    O(h·128) elements per step per direction, vs the unfused path's
    full-vector halo traffic per operator apply."""
    n = jax.lax.axis_size(axis)
    from_left = jax.lax.ppermute(
        last, axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        first, axis, [(i + 1, i) for i in range(n - 1)]
    )
    nt = cache.shape[-4]
    cache = cache.at[..., 0, 0, :, :].set(from_left)
    cache = cache.at[..., nt - 1, 1, :, :].set(from_right)
    return cache


def make_fused_stepper(op, kmax: int, dgks: bool, space: VectorSpace):
    """Bind the static pieces of the fused expansion and return
    ``(prime, advance, tail)`` closures over an explicit carry tuple

        (Vl, yl, Vbc, ybc, r, d, rp, q, scales, k)

    shared by ``fused_expansions`` and the fused GMRES cycle
    (``solvers/gmres.py``).  ``dgks=True`` selects the one-reduce CGS2 mode
    (deferred DGKS second sweep, drift reductions in-kernel); requires
    ``2·kmax + 2 ≤ 128``."""
    from ..ops import pallas_fused_lanczos as pf

    spec = pf.spec_for(op)
    assert spec is not None, "make_fused_stepper requires a fusable stencil op"
    buckets = bs.buckets_for(kmax)
    idx = jnp.arange(kmax)

    def leaf_of(t):
        return jax.tree_util.tree_leaves(t)[0]

    def prime(V, k0, sc: FusedScales):
        """``y = A R_{k0}`` + raw projections.  The priming norm comes from
        the scale vector (rows may enter unnormalized — the expintegrator's
        rejected-partial re-entry)."""
        vk = bs.get(V, k0)
        y = op.normal(vk)
        yl = leaf_of(y)
        Vl = leaf_of(V)
        r = bs.project_bucketed(V, y, k0 + 1, space).astype(jnp.float32)
        rp = r[k0]
        sk0 = jax.lax.dynamic_index_in_dim(sc.s, k0, 0, keepdims=False)
        q = _safe_inv(sk0) ** 2
        d = jnp.zeros((kmax,), jnp.float32)  # top-row drift unmeasured: no
        # deferred correction for the entry row (fresh/restart rows are
        # orthonormal; the re-entry row forgoes one correction)
        h = spec.h
        T = pf.choose_tile(Vl.shape[1], h=h)
        Vbc = pf.boundary_cache(Vl, T, h)
        ybc = pf.boundary_cache(yl, T, h)
        if space.psum_axis is not None:
            ax = space.psum_axis
            Vbc = _edge_fix(Vbc, Vl[:, :h, :], Vl[:, -h:, :], ax)
            ybc = _edge_fix(ybc, yl[:h, :], yl[-h:, :], ax)
        return (Vl, yl, Vbc, ybc, r, d, rp, q, sc, jnp.asarray(k0, jnp.int32))

    def advance(carry):
        """One fused step: scalar front-half + kernel + bookkeeping.
        Returns ``(carry', alpha, beta_new, hcol)`` — ``hcol`` is the full
        normalized-units projection column (``j ≤ k``; callers add β at
        ``k+1``)."""
        Vl, yl, Vbc, ybc, r, d, rp, q, sc, k = carry
        csub, lam, h, alpha, sc = _step_coeffs(r, d, rp, q, sc, k, dgks)
        gfull = jnp.concatenate([csub, lam[None]])

        def make_branch(B):
            def br(Vl, yl, Vbc, ybc, gfull):
                Vn, yn, raw, wb, ynb = pf.fused_step(
                    Vl, yl, Vbc, ybc, gfull, jnp.asarray(k + 1, jnp.int32),
                    B, spec, interpret=fused_interpret, with_drift=dgks,
                )
                rn = jnp.pad(raw[:B], (0, kmax - B))
                if dgks:
                    dn = jnp.pad(raw[B : 2 * B], (0, kmax - B))
                    rpn, qn = raw[2 * B], raw[2 * B + 1]
                else:
                    dn = jnp.zeros((kmax,), jnp.float32)
                    rpn, qn = raw[B], raw[B + 1]
                return Vn, yn, rn, dn, rpn, qn, wb, ynb

            return br

        iB = bs.bucket_index(k + 1, buckets)
        Vn, yn, rn, dn, rpn, qn, wb, ynb = jax.lax.switch(
            iB, [make_branch(B) for B in buckets], Vl, yl, Vbc, ybc, gfull
        )
        from ..ops import pallas_fused_lanczos as pf2

        if space.psum_axis is not None:
            # per-shard kernel partials → global reductions (one fused psum)
            ax = space.psum_axis
            rn, dn, rpn, qn = jax.lax.psum((rn, dn, rpn, qn), ax)
        wplane = pf2.cache_from_tile_rows(wb)
        yplane = pf2.cache_from_tile_rows(ynb)
        if space.psum_axis is not None:
            # shard-edge halos of the new row / its image from the neighbours
            ax = space.psum_axis
            wplane = _edge_fix(wplane, wb[0, 0], wb[-1, 1], ax)
            yplane = _edge_fix(yplane, ynb[0, 0], ynb[-1, 1], ax)
        Vbc = jax.lax.dynamic_update_slice(
            Vbc, wplane[None],
            (jnp.asarray(k + 1, jnp.int32), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )
        ybc = yplane
        beta = jnp.sqrt(qn)
        L, s, Hs, M = sc
        s = jnp.where(idx == k + 1, _safe_inv(beta), s)
        # placeholder L column for the new row (overwritten with its deferred
        # correction next step; consumed as-is if the loop exits here)
        ohk1 = jax.nn.one_hot(k + 1, kmax, dtype=jnp.float32)
        L = L * (1 - ohk1)[None, :] + (
            _safe_inv(beta) * ohk1
        )[:, None] * ohk1[None, :]
        if dgks:
            # stored-row image of R_k: y = (R_{k+1} + Σ csub_i R_i)/λ
            hscol = jnp.where(
                idx <= k + 1, (ohk1 + csub) / lam, 0.0
            )
            ohk = jax.nn.one_hot(k, kmax, dtype=jnp.float32)
            Hs = Hs * (1 - ohk)[None, :] + hscol[:, None] * ohk[None, :]
        sc = FusedScales(L, s, Hs, M)
        carry = (Vn, yn, Vbc, ybc, rn, dn, rpn, qn, sc, k + 1)
        return carry, alpha, beta, h

    def tail(carry, V_treedef, go):
        """Masked final append WITHOUT the (wasted) next operator apply:
        plain bucketed subtract in XLA.  Returns ``(Vl', scales', alpha,
        beta, hcol)`` — all bookkeeping gated by ``go``."""
        Vl, yl, Vbc, ybc, r, d, rp, q, sc0, k = carry
        csub, lam, h, alpha, sc = _step_coeffs(r, d, rp, q, sc0, k, dgks)
        Vtree = jax.tree_util.tree_unflatten(V_treedef, [Vl])
        Wl = lam * yl - leaf_of(bs.unproject_bucketed(Vtree, csub, k + 1))
        qn = jnp.sum(Wl * Wl)
        if space.psum_axis is not None:
            qn = jax.lax.psum(qn, space.psum_axis)
        beta = jnp.sqrt(qn)
        old_row = jax.lax.dynamic_index_in_dim(Vl, k + 1, 0, keepdims=False)
        Vl = jax.lax.dynamic_update_index_in_dim(
            Vl, jnp.where(go, Wl, old_row), k + 1, 0
        )
        L, s, Hs, M = sc
        ohk1 = jax.nn.one_hot(k + 1, kmax, dtype=jnp.float32)
        s = jnp.where(idx == k + 1, _safe_inv(beta), s)
        L = L * (1 - ohk1)[None, :] + (
            _safe_inv(beta) * ohk1
        )[:, None] * ohk1[None, :]
        sc = FusedScales(
            jnp.where(go, L, sc0.L),
            jnp.where(go, s, sc0.s),
            jnp.where(go, Hs, sc0.Hs),
            jnp.where(go, M, sc0.M),
        )
        return Vl, sc, alpha, beta, h

    return prime, advance, tail


def fused_expansions(op, state: KrylovState, scales: FusedScales, m: int,
                     btol, space, verbosity=0, hermitian: bool = True,
                     min_one: bool = False, dgks: bool = False):
    """Expand ``state`` from ``k`` to ``m`` with the one-stream fused kernel.

    Basis rows appended here are stored UNNORMALIZED (the raw residuals); the
    :class:`FusedScales` bundle carries the bookkeeping — the caller must fold
    ``scales.L`` into any basis use (restart rotation, extraction,
    unprojection; see :func:`fold_scales`).  Entry does NOT require normalized
    rows: the priming norm of row ``k`` is derived from ``scales.s[k]``, so
    re-entering with a partially built unnormalized subspace — the
    expintegrator's rejected-partial-attempt path — continues correctly.

    Per restart cycle this performs exactly ``m - k`` operator applications
    (1 priming apply + 1 in-kernel apply per fused step, none in the tail
    step), matching the unfused loop's ``numops`` accounting.

    ``hermitian=False`` runs the ARNOLDI variant: identical stream, but the
    ``H`` column write keeps the full projection coefficients (upper
    Hessenberg) instead of the tridiagonal ``(α, β)`` pair — the reference's
    ``arnoldirecurrence`` + cgs ``orthogonalize!`` pair
    (``src/factorizations/arnoldi.jl``).

    ``min_one=True`` forces at least one expansion step even when the entry
    residual is already below ``btol`` — the expintegrator outer loop must
    make progress after a rejected partial attempt, exactly as the reference
    unconditionally expands once per outer iteration while ``K < krylovdim``
    (``src/matrixfun/expintegrator.jl:285-287``).

    ``dgks=True`` is the ONE-REDUCE CGS2 mode (deferred DGKS second sweep):
    full two-sweep orthogonality at the same ``B + 3`` HBM row-passes — the
    kernel additionally reduces the new row's drift against the streamed
    basis and the correction is applied entirely in scalar space one step
    later (``_step_coeffs``).  This is what routes the library-default
    ``cgs2`` through the fused path (the recorded drift study,
    ``tools/drift_study.py``, shows single-sweep CGS plateaus at ~2e-3
    orthogonality defect over 100 cycles while this mode holds the cgs2
    level).  Mirrors the semantics of :func:`expand_hermitian`'s cgs2 branch
    (3-term + drift sweep, reference ``src/factorizations/lanczos.jl:330-376``).

    Returns ``(state_new, scales_new, numops_increment)``.
    """
    V, H, k0, beta0 = state
    kmax = H.shape[0]
    treedef = jax.tree_util.tree_structure(V)
    idx = jnp.arange(kmax)
    k0 = jnp.asarray(k0, jnp.int32)
    prime, advance, tail = make_fused_stepper(op, kmax, dgks, space)

    def h_column(H, k, alpha, beta, c=None):
        # identical column-write pattern to the cgs paths of
        # expand_hermitian / expand; ``c`` (full projection coefficients of
        # the NORMALIZED basis) switches to the Arnoldi full-column write
        oh_k = jax.nn.one_hot(k, kmax, dtype=H.dtype)
        oh_k1 = jax.nn.one_hot(k + 1, kmax, dtype=H.dtype)
        if c is None:
            col = alpha.astype(H.dtype) * oh_k + beta.astype(H.dtype) * oh_k1
            mask = oh_k + oh_k1
        else:
            col = c.astype(H.dtype) + beta.astype(H.dtype) * oh_k1
            mask = (idx <= k).astype(H.dtype) + oh_k1
        colold = jax.lax.dynamic_slice(
            H, (jnp.int32(0), jnp.asarray(k, jnp.int32)), (kmax, 1)
        )[:, 0]
        col = colold * (1 - mask) + col
        return jax.lax.dynamic_update_slice(
            H, col[:, None], (jnp.int32(0), jnp.asarray(k, jnp.int32))
        )

    carry0 = prime(V, k0, scales)

    # ---- fused steady loop: append rows k0+1 .. m-1
    def cond(c):
        carry, H = c
        q, k = carry[7], carry[9]
        go = jnp.sqrt(q) > btol
        if min_one:
            go = jnp.logical_or(go, k == k0)
        return jnp.logical_and(k < m - 1, go)

    def body(c):
        carry, H = c
        k = carry[9]
        carry, alpha, beta_k, h = advance(carry)
        if hermitian:
            H = h_column(H, k, alpha, beta_k)
        else:
            H = h_column(H, k, alpha, beta_k, c=h)
        return carry, H

    carry, H = jax.lax.while_loop(cond, body, (carry0, H))
    Vl, yl, Vbc, ybc, r, d, rp, q, sc, k = carry

    # ---- tail step: append row m WITHOUT the (wasted) next apply.  Masked,
    # not cond-wrapped: branch outputs would defensively copy the basis
    # buffer (same reasoning as the masked restart in solvers/lanczos.py).
    go_tail = jnp.sqrt(q) > btol
    if min_one:
        go_tail = jnp.logical_or(go_tail, k == k0)
    go = jnp.logical_and(k == m - 1, go_tail)
    Vl, sc, alpha, beta_m, h = tail(carry, treedef, go)
    if hermitian:
        Htail = h_column(H, k, alpha, beta_m)
    else:
        Htail = h_column(H, k, alpha, beta_m, c=h)
    H = jnp.where(go, Htail, H)
    k_out = k + go.astype(jnp.int32)
    beta_out = jnp.where(go, beta_m, jnp.sqrt(q)).astype(beta0.dtype)

    numops_inc = (k - k0) + 1  # prime + one in-kernel apply per fused step
    state_new = KrylovState(
        jax.tree_util.tree_unflatten(treedef, [Vl]), H, k_out, beta_out
    )
    return state_new, sc, numops_inc
