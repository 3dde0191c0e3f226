from dr3_tpu.models.camera import Pinhole  # noqa: F401
