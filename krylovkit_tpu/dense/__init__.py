from .masking import (  # noqa: F401
    active_mask,
    embed_active,
    spectrum_sentinel,
    active_support,
    which_key,
    which_key_ri,
    sort_perm,
)
from .hermitian import eigh_active, geneigh_active  # noqa: F401
from .schur import schur_active, schur_eigvals  # noqa: F401
from .realschur import (  # noqa: F401
    lanv2_rotation,
    real_schur_active,
    real_schur_eigvals,
    block_starts,
)
from .reorder_real import sort_schur_real  # noqa: F401
from .trevc import triangular_eigvecs  # noqa: F401
from .trevc_real import triangular_eigvecs_real  # noqa: F401
from .reorder import sort_schur, partition_schur  # noqa: F401
from .givens import givens  # noqa: F401
from .svd import svd_active  # noqa: F401
from .triangular import solve_upper_active, expm_active  # noqa: F401
