from . import krylov  # noqa: F401
