"""KITTI odometry sequence loading.

Parity with the reference's loaders (reference tests/slam/test_slam.cc:15-44
reads times.txt + image_0/%06d.png; scripts/slam.sh hardcodes dataset
paths). Falls back to the ten consecutive frames checked into the
reference's imgs/ when no full dataset is present. Uses the native C++
prefetching decoder from dr3_tpu.native when built, else PIL.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from dr3_tpu.io.image import load_image
from dr3_tpu.models.camera import Pinhole

REFERENCE_FIXTURES = "/root/reference/imgs"


@dataclass
class KittiSequence:
    image_paths: List[str]
    times: Optional[np.ndarray] = None
    cam: Pinhole = None

    def __post_init__(self):
        if self.cam is None:
            self.cam = Pinhole.kitti()

    def __len__(self) -> int:
        return len(self.image_paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        loader = _native_loader(self.image_paths)
        if loader is not None:
            yield from loader
        else:
            for p in self.image_paths:
                yield load_image(p, gray=True)

    def frame(self, i: int) -> np.ndarray:
        return load_image(self.image_paths[i], gray=True)


def _native_loader(paths):
    """Prefetching C++ PNG pipeline if the native library is built."""
    try:
        from dr3_tpu.native import dataloader

        if dataloader.available():
            return dataloader.iter_images(paths)
    except Exception:
        pass
    return None


def open_sequence(path: str) -> KittiSequence:
    """KITTI odometry layout: <path>/image_0/%06d.png + <path>/times.txt
    (test_slam.cc:15-44)."""
    img_dir = os.path.join(path, "image_0")
    times_file = os.path.join(path, "times.txt")
    files = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir) if f.endswith(".png")
    )
    times = None
    if os.path.exists(times_file):
        times = np.loadtxt(times_file)
    return KittiSequence(image_paths=files, times=times)


def open_fixture_sequence(root: str = REFERENCE_FIXTURES) -> KittiSequence:
    """The 10 consecutive KITTI frames checked into the reference repo
    (imgs/kitti0-9.png) as a mini-sequence."""
    files = [os.path.join(root, f"kitti{i}.png") for i in range(10)]
    files = [f for f in files if os.path.exists(f)]
    return KittiSequence(image_paths=files)
