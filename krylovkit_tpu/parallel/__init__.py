from .mesh import make_mesh, shard_vector, replicate, VECTOR_AXIS, BATCH_AXIS  # noqa: F401
from .operators import laplacian_1d, poisson_2d, sharded_laplacian_1d  # noqa: F401
from .sparse import (  # noqa: F401
    ShardedELLOperator,
    sharded_ell_from_coo,
    banded_coo,
    powerlaw_rect_coo,
    rect_sparse_coo,
)
