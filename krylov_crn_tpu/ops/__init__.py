from krylov_crn_tpu.ops.spmv import spmv, rmatvec, hvp_sparse  # noqa: F401
from krylov_crn_tpu.ops.math import logsig, sigmoid  # noqa: F401
from krylov_crn_tpu.ops.lanczos import lanczos  # noqa: F401
from krylov_crn_tpu.ops.cg import cg_solve  # noqa: F401
from krylov_crn_tpu.ops.subproblem import (  # noqa: F401
    cubic_solve_eigh,
    cubic_subproblem_eigh,
    secular_newton,
)
