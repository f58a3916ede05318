from .mesh import make_mesh, shard_vector, replicate, VECTOR_AXIS, BATCH_AXIS  # noqa: F401
from .operators import (  # noqa: F401
    laplacian_1d,
    poisson_2d,
    shard_local_stencil,
    sharded_laplacian_1d,
)
from .sparse import (  # noqa: F401
    ShardedELLOperator,
    sharded_ell_from_coo,
    banded_coo,
    powerlaw_rect_coo,
    rect_sparse_coo,
)
