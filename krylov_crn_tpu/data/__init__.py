from krylov_crn_tpu.data.formats import SparseMatrix, DualSparse  # noqa: F401
from krylov_crn_tpu.data.synthetic import (  # noqa: F401
    random_sparse,
    powerlaw_sparse,
    synthetic_logreg,
)
from krylov_crn_tpu.data.libsvm import load_libsvm, parse_libsvm_bytes  # noqa: F401
