"""Image pyramids by 2x2 box-average half-sampling.

Replaces the reference's hand-written SSE2/NEON half-sampling kernels
(reference src/utils.cpp:323-430, create_img_pyramid at :421-430) with an
XLA ``reduce_window``-style formulation: reshape [H, W] -> [H/2, 2, W/2, 2]
and mean over the 2x2 cells — the compiler lowers this to a single fused
vectorized pass on the VPU, batched over leading axes.

Levels have static shapes (H/2^l, W/2^l); odd trailing rows/cols are
dropped exactly like the reference (it halves integer dimensions).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def half_sample(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H//2, W//2] by 2x2 box average."""
    h, w = img.shape[-2], img.shape[-1]
    h2, w2 = h // 2, w // 2
    img = img[..., : 2 * h2, : 2 * w2]
    shaped = img.reshape(img.shape[:-2] + (h2, 2, w2, 2))
    return shaped.mean(axis=(-3, -1))


def build_pyramid(img: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """List of n_levels images, level 0 = input (utils.cpp:421-430)."""
    pyr = [img]
    for _ in range(1, n_levels):
        pyr.append(half_sample(pyr[-1]))
    return pyr


def gaussian_blur3(img: jnp.ndarray) -> jnp.ndarray:
    """Separable [1 2 1]/4 blur — cheap pre-smoothing for LK image pyramids."""
    def conv1d(x, axis):
        a = jnp.roll(x, 1, axis=axis)
        b = jnp.roll(x, -1, axis=axis)
        out = 0.25 * a + 0.5 * x + 0.25 * b
        # replicate borders: roll wraps, overwrite edge lanes with clamped avg
        if axis in (-2, x.ndim - 2):
            out = out.at[..., 0, :].set(0.75 * x[..., 0, :] + 0.25 * x[..., 1, :])
            out = out.at[..., -1, :].set(0.75 * x[..., -1, :] + 0.25 * x[..., -2, :])
        else:
            out = out.at[..., 0].set(0.75 * x[..., 0] + 0.25 * x[..., 1])
            out = out.at[..., -1].set(0.75 * x[..., -1] + 0.25 * x[..., -2])
        return out

    return conv1d(conv1d(img, -1), -2)
