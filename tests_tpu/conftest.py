"""Compiled-TPU kernel numerics gate.

These tests run the Pallas kernels COMPILED on the real chip and compare
against the jnp oracles — the automated version of the checks that lived in
tools/profile_kernels.py prose (VERDICT round 1: one Mosaic mis-lowering
— negative dynamic roll — was caught manually; this suite catches the next
one as a test failure, not a corrupted panorama).

Run with: python -m pytest tests_tpu/ -q        (needs the TPU platform)
The suite self-skips on CPU so a plain `pytest tests_tpu/` on a dev box is
a no-op, and bench.py / the round driver run it once per round on hardware.
"""

import numpy as np
import pytest

from dr3_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    if jax.devices()[0].platform not in ("tpu", "axon"):
        skip = pytest.mark.skip(reason="needs a real TPU chip")
        for item in items:
            item.add_marker(skip)


@pytest.fixture()
def rng(request):
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
