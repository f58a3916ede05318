from .mesh import make_mesh, shard_vector, replicate, VECTOR_AXIS, BATCH_AXIS  # noqa: F401
from .operators import laplacian_1d, poisson_2d, sharded_laplacian_1d  # noqa: F401
