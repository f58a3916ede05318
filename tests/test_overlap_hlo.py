"""HLO-level check of the halo-exchange/compute overlap structure.

``parallel/sparse.py`` issues the halo ``ppermute``s first and keeps the
interior (all-local-column) pass free of any data dependency on them, relying
on XLA's latency-hiding scheduler to overlap ICI transfers with interior
compute.  That property is only real if it survives compilation — a scheduler
or partitioner regression that chains the interior pass behind the collectives
would be invisible to numerical tests.  This test compiles the sharded SpMV on
the 8-device CPU mesh and asserts, on the optimized HLO:

1. the planned ``collective-permute`` ops are present (one per δ round);
2. the instruction graph contains a compute fusion feeding the final
   combination that does NOT transitively depend on any collective-permute
   (the interior pass), alongside one that does (the boundary pass) — i.e.
   the overlap opportunity exists in the compiled module;
3. on backends that split collectives into ``collective-permute-start/done``
   pairs (TPU), the pairs are split (checked conditionally — the CPU backend
   emits synchronous permutes).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krylovkit_tpu.parallel import make_mesh
from krylovkit_tpu.parallel.sparse import banded_coo, sharded_ell_from_coo

_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\(([^)]*)\)")
_OPERAND = re.compile(r"%([\w.\-]+)")


def _computation_blocks(hlo: str):
    """Split HLO text into computation bodies (name -> list of lines)."""
    blocks, cur, name = {}, None, None
    for line in hlo.splitlines():
        if line.rstrip().endswith("{") and "%" in line:
            name = line.split("%", 1)[1].split()[0]
            cur = []
        elif line.strip() == "}" and cur is not None:
            blocks[name] = cur
            cur, name = None, None
        elif cur is not None:
            cur.append(line)
    return blocks


def _parse(lines):
    """(name -> (opcode, [operands])) for one computation body."""
    out = {}
    for ln in lines:
        m = _INSTR.match(ln)
        if not m:
            continue
        nm, opcode, args = m.groups()
        out[nm] = (opcode, _OPERAND.findall(args))
    return out


def test_interior_pass_independent_of_halo_permutes():
    mesh = make_mesh()
    n = 1024
    r, c, v = banded_coo(n, 3)
    op = sharded_ell_from_coo(r, c, v, (n, n), mesh)
    x = jnp.ones(n)
    hlo = jax.jit(op.normal).lower(x).compile().as_text()

    # (1) the planned rounds are present (banded: δ ∈ {1, D-1} → 2 permutes,
    # possibly start/done split)
    n_perm = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
    assert n_perm >= len(op.fwd_plan.deltas), hlo[:2000]

    # (3) async split, where the backend supports it
    starts = hlo.count("collective-permute-start")
    dones = hlo.count("collective-permute-done")
    assert starts == dones  # either both present (split) or both absent

    # (2) dependency analysis inside the computation holding the permutes
    blocks = _computation_blocks(hlo)
    target = None
    for name, lines in blocks.items():
        if any("collective-permute" in ln for ln in lines):
            target = _parse(lines)
            break
    assert target is not None, "no computation contains the collective-permutes"

    tainted = set()
    changed = True
    while changed:
        changed = False
        for nm, (opcode, operands) in target.items():
            if nm in tainted:
                continue
            if opcode.startswith("collective-permute") or any(
                o in tainted for o in operands
            ):
                tainted.add(nm)
                changed = True

    # the final combination consumes both a tainted (boundary) and an
    # untainted compute fusion (interior) — the overlap structure survived
    combiners = [
        (nm, ops)
        for nm, (opcode, ops) in target.items()
        if nm in tainted
        and any(o in tainted for o in ops)
        and any(
            o not in tainted and target.get(o, ("", []))[0] == "fusion"
            for o in ops
        )
    ]
    assert combiners, (
        "no instruction combines a permute-dependent boundary operand with a "
        "permute-independent interior fusion — the interior pass appears to "
        "be chained behind the collectives:\n" + hlo[:4000]
    )
