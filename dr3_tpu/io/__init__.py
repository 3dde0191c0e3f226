from dr3_tpu.io.image import load_image, load_image_dir, save_image  # noqa: F401
