from . import lanczos, arnoldi, eigsolve  # noqa: F401
