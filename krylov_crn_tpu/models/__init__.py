from krylov_crn_tpu.models.base import Oracle, Regularizer  # noqa: F401
from krylov_crn_tpu.models.logistic import LogisticRegression  # noqa: F401
