"""Feathered alpha blending for panoramas.

Parity with the reference's RGBA accumulation canvas
(reference src/panorama.cpp:144-229): each warped image gets per-column
weights ramping 0->1 over a feathering width at its left edge, 1 in the
middle, 1->0 at its right edge (add_img_to_canvas, :165-176); weighted RGB +
the weight itself accumulate into an RGBA canvas, skipping empty pixels
(:191-212); the final panorama divides RGB by accumulated alpha (:215-229).

Here the weight profile is computed from the warped bbox (host-side floats),
applied as a broadcast multiply, and accumulation is pure ``+`` on [H, W, 4]
arrays — XLA fuses warp + weight + accumulate into one pass per image.
"""

from __future__ import annotations

import jax.numpy as jnp


def column_feather(canvas_w: int, min_x: float, max_x: float,
                   feather_width: int) -> jnp.ndarray:
    """[canvas_w] per-column weight: linear 0->1 ramp over ``feather_width``
    columns starting at min_x, flat 1, then 1->0 ending at max_x; zero
    outside [min_x, max_x] (linspace ramp-1-ramp, panorama.cpp:165-176)."""
    span = max_x - min_x
    fw = jnp.minimum(jnp.asarray(feather_width, jnp.float32),
                     jnp.maximum(span / 2.0 - 1.0, 1.0))
    x = jnp.arange(canvas_w, dtype=jnp.float32)
    up = (x - min_x) / fw
    down = (max_x - x) / fw
    w = jnp.clip(jnp.minimum(up, down), 0.0, 1.0)
    return jnp.where((x >= min_x) & (x <= max_x), w, 0.0)


def accumulate(canvas_rgba: jnp.ndarray, warped_rgb: jnp.ndarray,
               warped_valid: jnp.ndarray, col_weight: jnp.ndarray) -> jnp.ndarray:
    """Accumulate one warped image into the RGBA canvas.

    canvas_rgba [H, W, 4]; warped_rgb [H, W, C] (C=1 or 3) already on the
    canvas grid; warped_valid [H, W] bool from the warp (replaces the
    reference's is-black-pixel test, panorama.cpp:199-206 — a mask is
    correct where the black test drops true-black content)."""
    w = jnp.where(warped_valid, col_weight[None, :], 0.0)
    rgb = canvas_rgba[..., :-1] + warped_rgb * w[..., None]
    a = canvas_rgba[..., -1] + w
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def normalize(canvas_rgba: jnp.ndarray) -> jnp.ndarray:
    """RGB / accumulated alpha; empty pixels stay 0 (panorama.cpp:215-229)."""
    a = canvas_rgba[..., -1:]
    return jnp.where(a > 0, canvas_rgba[..., :-1] / jnp.maximum(a, 1e-9), 0.0)
