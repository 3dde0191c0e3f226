"""Image IO (reference utils.hpp:31-33 load/save; panorama.cpp:5-30 dir load).

Python path uses PIL; the native C++ prefetching loader in
``dr3_tpu/native`` (see io/kitti.py) covers the sequence-streaming hot path.
Convention: images are float32, range [0, 1]; grayscale [H, W] or color
[H, W, 3].
"""

from __future__ import annotations

import os
from typing import List

import numpy as np


def load_image(path: str, gray: bool = False) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("L" if gray else "RGB")
        return np.asarray(im, dtype=np.float32) / 255.0


def save_image(img: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = np.asarray(img)
    arr = np.clip(arr * 255.0 if arr.dtype != np.uint8 else arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image_dir(dir_name: str, gray: bool = False) -> List[np.ndarray]:
    """All images in a directory, sorted by filename (panorama.cpp:5-30)."""
    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    files = sorted(
        os.path.join(dir_name, f) for f in os.listdir(dir_name)
        if os.path.splitext(f)[1].lower() in exts
    )
    return [load_image(f, gray=gray) for f in files]


def to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img
    return img @ np.asarray([0.299, 0.587, 0.114], img.dtype)
