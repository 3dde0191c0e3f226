from dr3_tpu.utils.config import Config  # noqa: F401
from dr3_tpu.utils.timing import Monitor, Timer  # noqa: F401
