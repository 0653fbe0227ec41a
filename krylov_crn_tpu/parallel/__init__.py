from krylov_crn_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    replicated,
    row_sharded,
)
from krylov_crn_tpu.parallel.sharded import (  # noqa: F401
    ShardedDual,
    build_sharded_dual,
    partition_rows,
    sharded_rmatvec,
    sharded_spmv,
)
