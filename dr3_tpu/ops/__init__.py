from dr3_tpu.ops import corners, lk, pyramid, warp  # noqa: F401
