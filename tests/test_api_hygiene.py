"""API-surface hygiene — the reference's Aqua.jl static-analysis analogue
(test/runtests.jl:81-88): exports exist, __all__ entries resolve, and every
name the documentation references is importable."""
import importlib
import pathlib
import pkgutil
import re

import krylovkit_tpu as kk


def test_package_exports():
    expected = [
        "eigsolve", "linsolve", "lssolve", "svdsolve", "schursolve",
        "realeigsolve", "reallinsolve", "reallssolve", "realsvdsolve",
        "geneigsolve", "bieigsolve", "exponentiate", "expintegrator",
        "Lanczos", "Arnoldi", "BlockLanczos", "BiArnoldi", "GKL", "GolubYe",
        "CG", "GMRES", "BiCGStab", "MINRES", "LSMR", "EigSorter",
        "KrylovDefaults", "VectorSpace", "LinearOperator",
        "ParametricOperator", "Block", "cgs", "mgs", "cgs2", "mgs2",
        "cgsir", "mgsir", "ConvergenceInfo",
    ]
    missing = [n for n in expected if not hasattr(kk, n)]
    assert not missing, f"missing package exports: {missing}"


def test_all_entries_resolve():
    bad = []
    for mod in pkgutil.walk_packages(kk.__path__, "krylovkit_tpu."):
        m = importlib.import_module(mod.name)
        for n in getattr(m, "__all__", []):
            if not hasattr(m, n):
                bad.append(f"{mod.name}.{n}")
    assert not bad, f"broken __all__ entries: {bad}"


def test_docs_reference_real_names():
    root = pathlib.Path(__file__).resolve().parents[1]
    names = set()
    for p in list((root / "docs").rglob("*.md")) + [root / "README.md"]:
        for m in re.finditer(r"kk\.(\w+)", p.read_text()):
            names.add(m.group(1))
    missing = [n for n in sorted(names) if not hasattr(kk, n)]
    assert not missing, f"docs reference nonexistent names: {missing}"
