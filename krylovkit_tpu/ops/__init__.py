from . import vector, operator, basis, orthonormal  # noqa: F401
