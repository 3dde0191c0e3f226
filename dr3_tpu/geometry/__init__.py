from dr3_tpu.geometry import lie  # noqa: F401
from dr3_tpu.geometry.lie import SE3, SO3  # noqa: F401
