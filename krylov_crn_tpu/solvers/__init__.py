from krylov_crn_tpu.solvers.base import Optimizer  # noqa: F401
from krylov_crn_tpu.solvers.crn import CubicNewton  # noqa: F401
from krylov_crn_tpu.solvers.krylov_crn import CubicKrylov  # noqa: F401
from krylov_crn_tpu.solvers.sscn import SSCN  # noqa: F401

# Reference-name aliases (cubic.py class names)
Cubic_LS = CubicNewton
Cubic_Krylov_LS = CubicKrylov
