from krylov_crn_tpu.utils.trace import Trace  # noqa: F401
