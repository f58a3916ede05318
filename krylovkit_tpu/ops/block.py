"""Block of vectors for block Krylov methods.

Mirrors the reference's ``Block`` type (``src/factorizations/blocklanczos.jl:10-17``):
a list of vectors treated as a unit.  TPU-natively a block is a *stacked pytree*
(every leaf gains a leading axis of the block size), so blockwise operator
application is ``jax.vmap`` and block inner products are single GEMMs.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp

PyTree = Any

__all__ = ["Block"]


class Block:
    """Wrap a list of same-structured vectors (or an already-stacked pytree).

    ``Block([v1, v2, ...])`` stacks along a new leading axis;
    ``Block(stacked, stacked=True)`` adopts an existing stacked pytree.
    """

    def __init__(self, vectors: Union[Sequence[PyTree], PyTree], stacked: bool = False):
        if stacked:
            self.stacked = vectors
        else:
            vecs = list(vectors)
            if len(vecs) == 0:
                raise ValueError("Block requires at least one vector")
            self.stacked = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *vecs
            )

    @property
    def size(self) -> int:
        return jax.tree_util.tree_leaves(self.stacked)[0].shape[0]

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, i: int) -> PyTree:
        return jax.tree_util.tree_map(lambda l: l[i], self.stacked)
