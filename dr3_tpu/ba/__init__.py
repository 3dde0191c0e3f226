from dr3_tpu.ba.problem import BAProblem  # noqa: F401
from dr3_tpu.ba.schur_lm import BAResult, bundle_adjust  # noqa: F401
