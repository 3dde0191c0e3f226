"""Pallas TPU kernel for fused corner detection: FAST-10 score + 3x3 NMS +
Shi-Tomasi response in ONE pass over the image.

Why a kernel: the jnp formulation (ops/corners.py) builds ~60 full-image
temporaries — 16 ring shifts, 2x16x4 arc min-windows, 8 NMS shifts, 16 box
shifts — each a separate HBM round-trip once XLA's fusion budget is
exhausted (~4 ms/frame measured for 3 levels). Fused in VMEM the whole
stage is one image read + one score-map write per level; every shift is an
in-register sublane/lane rotate. This replaces the reference's SIMD
detection stack (uzh-rpg ``fast`` corner detect/score + nonmax_3x3 at
src/features.cpp:55-73 and the Shi-Tomasi patch score at
src/utils.cpp:282-321) with dense VPU work.

Semantics: ``corner_response_map(img, t)`` ==
``jnp.where(nms3x3(fast_score_map(img, t)), shi_tomasi_map(img), 0)``
(the jnp path stays as the CPU/test oracle). Both are zero outside the
Shi-Tomasi inner border [5, H-5) x [5, W-5); inside it, every input the
fused value depends on is at least 5 px from the image edge, so halo
handling (zero pad + wrap-around lane rolls) never leaks into live output.

Arc trick: FAST-10's "all 10 contiguous ring diffs exceed t" is equivalent
to "the min over the 10-window exceeds t", so the per-start score is a
circular sliding-window min computed by doubling (win10 = min(win8,
win2 rotated 8)) — 64 ``minimum``s per sign instead of 160, and no separate
boolean all-ok chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dr3_tpu.ops.corners import FAST_OFFSETS

TH = 32    # output rows per grid step (multiple of 8)
HALO = 8   # rows of context above/below (need 5; 8 keeps slices aligned)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _detect_kernel(img_ref, out_ref, *, h: int, w: int, wp: int,
                   fast_threshold: float):
    i = pl.program_id(0)
    r = TH + 2 * HALO
    y0 = i * TH  # region top in padded coords; absolute image row = row - HALO
    x = img_ref[pl.ds(y0, r), :] * 255.0            # [r, wp]

    def sh(a, dy: int, dx: int):
        """a shifted so result[y, x] = a[y + dy, x + dx] (wrap; borders are
        masked in absolute coords below)."""
        if dy:
            a = jnp.roll(a, (r - dy) % r, axis=0)
        if dx:
            a = jnp.roll(a, (wp - dx) % wp, axis=1)
        return a

    def ring_score(sign: float):
        """Max over ring starts of the 10-window min of sign*(ring - x),
        zero where the min does not clear the threshold."""
        d = [sign * (sh(x, dy, dx) - x) for dx, dy in FAST_OFFSETS]
        m2 = [jnp.minimum(d[s], d[(s + 1) % 16]) for s in range(16)]
        m4 = [jnp.minimum(m2[s], m2[(s + 2) % 16]) for s in range(16)]
        m8 = [jnp.minimum(m4[s], m4[(s + 4) % 16]) for s in range(16)]
        m10 = [jnp.minimum(m8[s], m2[(s + 8) % 16]) for s in range(16)]
        sc = None
        for m in m10:
            v = jnp.where(m > fast_threshold, m, 0.0)
            sc = v if sc is None else jnp.maximum(sc, v)
        return sc

    fscore = jnp.maximum(ring_score(1.0), ring_score(-1.0))
    ys = jax.lax.broadcasted_iota(jnp.int32, (r, wp), 0) + (y0 - HALO)
    xs = jax.lax.broadcasted_iota(jnp.int32, (r, wp), 1)
    fast_ok = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    fscore = jnp.where(fast_ok, fscore, 0.0)

    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = sh(fscore, dy, dx)
            neigh = v if neigh is None else jnp.maximum(neigh, v)
    keep = (fscore > neigh) & (fscore > 0)

    # Shi-Tomasi: 8x8 box of central-difference gradients (offsets [-4, 3]
    # each axis, matching ops.corners._box_sum8), min eigenvalue / (2*64)
    gx = sh(x, 0, 1) - sh(x, 0, -1)
    gy = sh(x, 1, 0) - sh(x, -1, 0)

    def box(a):
        hs = None
        for o in range(-4, 4):
            v = sh(a, 0, o)
            hs = v if hs is None else hs + v
        vs = None
        for o in range(-4, 4):
            v = sh(hs, o, 0)
            vs = v if vs is None else vs + v
        return vs

    inv = 1.0 / (2.0 * 64.0)
    dxx = box(gx * gx) * inv
    dyy = box(gy * gy) * inv
    dxy = box(gx * gy) * inv
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    st = 0.5 * (tr - disc)
    inner = (ys >= 5) & (ys < h - 5) & (xs >= 5) & (xs < w - 5)

    out = jnp.where(keep & inner, st, 0.0)
    out_ref[:] = out[HALO:HALO + TH, :]


@functools.partial(jax.jit, static_argnums=(1, 2))
def corner_response_map(img: jnp.ndarray, fast_threshold: float = 20.0,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Fused FAST-10 + NMS + Shi-Tomasi response map [H, W] (zero at
    non-corners). Equals the jnp oracle
    ``where(nms3x3(fast_score_map(img, t)), shi_tomasi_map(img), 0)``."""
    if interpret is None:
        interpret = not _is_tpu()
    h, w = img.shape
    hp = _round_up(h, TH)
    wp = _round_up(w, 128)
    src = jnp.pad(img.astype(jnp.float32),
                  ((HALO, hp - h + HALO), (0, wp - w)))
    out = pl.pallas_call(
        functools.partial(_detect_kernel, h=h, w=w, wp=wp,
                          fast_threshold=float(fast_threshold)),
        grid=(hp // TH,),
        in_specs=[pl.BlockSpec(src.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(src)
    return out[:h, :w]
