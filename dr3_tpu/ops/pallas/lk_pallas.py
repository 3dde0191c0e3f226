"""Pallas TPU kernel for pyramidal Lucas-Kanade tracking.

Why a kernel: the jnp LK (ops/lk.py) expresses patch access as XLA gathers
— [N, W, W] arbitrary-index loads, 4 per bilinear sample, ~13 samples per
track per level. On TPU those lower to scalarized gathers and dominate the
VO front-end (~316 ms/frame measured at N=546, W=15, 4 levels, 10 iters).

Kernel design — all constraints of the Mosaic memory model respected:

* TPU vector loads and DMAs require tile-aligned starts/extents (8 sublanes
  x 128 lanes), so arbitrary patch windows cannot be addressed directly.
  Instead each access loads an **aligned** [32, 256] region (base rounded
  down to the tile grid, `pl.multiple_of` hints) from the VMEM-resident
  padded image, then shifts the window to its origin with two tiny one-hot
  **selection matmuls on the MXU**: rows = Sr @ region, cols = rows @ Sc,
  where Sr/Sc encode the in-tile residual offsets (iota == compare). Zero
  gathers, zero DMAs, dense VPU/MXU work only.
* One grid step per track; track centers arrive via scalar prefetch (SMEM)
  because they compute the load bases.
* Images are edge-padded in XLA so every aligned load is in-bounds and
  border behavior matches the jnp path's clamp sampling.

Outputs match ops/lk.py's contract: (pos, ok, err).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dr3_tpu.ops.lk import TrackResult

PAD = 16           # top/left padding; must exceed half_window + 2
_ROWS = 32         # aligned region rows loaded per access (8 | _ROWS)
_LANES = 256       # aligned region lanes loaded per access (128 | _LANES)


def _select_window_matmul(region, ry, rx, size):
    """Extract region[ry:ry+size, rx:rx+size] for *dynamic* in-tile
    residuals ry in [0,8), rx in [0,128) via one-hot selection matmuls."""
    rows = region.shape[0]
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 1)
    sel_r = (rows_idx == (ry + jax.lax.broadcasted_iota(
        jnp.int32, (size, rows), 0))).astype(region.dtype)
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, size), 0)
    sel_c = (cols_idx == (rx + jax.lax.broadcasted_iota(
        jnp.int32, (_LANES, size), 1))).astype(region.dtype)
    rows = jax.lax.dot_general(sel_r, region, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jax.lax.dot_general(rows, sel_c, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _select_window_roll(region, ry, rx, size):
    """Same extraction with pure VPU ops: the 8 possible sublane residuals
    resolve with an unrolled masked sum of static slices; the lane residual
    resolves with one dynamic lane rotate (tpu.dynamic_rotate)."""
    rows = jnp.zeros((size, _LANES), region.dtype)
    for k in range(8):
        rows = rows + jnp.where(ry == k, 1.0, 0.0) * region[k:k + size, :]
    rolled = pltpu.roll(rows, -rx, axis=1)
    return rolled[:, :size]


def _select_window_roll2(region, ry, rx, size):
    """Fastest extraction: both residuals resolve with one dynamic rotate
    each (sublane then lane) instead of the 8-term masked sum — ~6 native
    VPU ops per access vs ~50. Shifts are passed as positive equivalents:
    compiled Mosaic mis-lowers *negative* dynamic roll shifts on some
    shapes (measured on 384-lane arrays; see warp_pallas)."""
    rows = region.shape[0]
    r0 = pltpu.roll(region, rows - ry, axis=0)     # r0[i] = region[i + ry]
    r1 = pltpu.roll(r0, _LANES - rx, axis=1)       # r1[:, j] = r0[:, j + rx]
    return r1[:size, :size]


def _aligned_window(img_ref, y0, x0, size, variant: str, rows: int = _ROWS):
    """Load the window img[y0:y0+size, x0:x0+size] at arbitrary integer
    (y0, x0) using an aligned vector load + in-register selection.
    ``rows`` = aligned region rows; must cover 7 (max sublane residual)
    + size. The per-iteration target loads use 24 instead of 32 — 25%
    less data through the dynamic rotates on the hottest path.

    Load bases are clamped to the padded image: an OOB vector load crashes
    the TPU worker process, so the kernel must stay in-bounds for ANY
    (y0, x0) — including garbage from non-finite track positions (a
    clamped-out window reads border pixels and fails the ok gate later).
    The clamp bounds are tile multiples (``_pad_image`` pads to 8/128
    multiples plus slack), so the ``multiple_of`` alignment hints hold."""
    h_pad, w_pad = img_ref.shape
    y0 = jnp.clip(y0, 0, h_pad - rows)      # keeps residual y0-y8 in [0, 8)
    x0 = jnp.clip(x0, 0, w_pad - _LANES)    # ... and x0-x128 in [0, 128)
    y8 = pl.multiple_of((y0 // 8) * 8, 8)
    x128 = pl.multiple_of((x0 // 128) * 128, 128)
    region = img_ref[pl.ds(y8, rows), pl.ds(x128, _LANES)]
    if variant == "roll2":
        return _select_window_roll2(region, y0 - y8, x0 - x128, size)
    if variant == "roll":
        return _select_window_roll(region, y0 - y8, x0 - x128, size)
    return _select_window_matmul(region, y0 - y8, x0 - x128, size)


def _bil(reg, off_y, off_x, fy_, fx_, size):
    a = reg[off_y:off_y + size, off_x:off_x + size]
    b = reg[off_y:off_y + size, off_x + 1:off_x + size + 1]
    c = reg[off_y + 1:off_y + size + 1, off_x:off_x + size]
    d = reg[off_y + 1:off_y + size + 1, off_x + 1:off_x + size + 1]
    return ((1 - fy_) * (1 - fx_) * a + (1 - fy_) * fx_ * b
            + fy_ * (1 - fx_) * c + fy_ * fx_ * d)


def _lk_kernel(meta_ref, img_prev_ref, img_next_ref, pos_ref, ok_ref, err_ref,
               *, half: int, iters: int, eps: float, min_eig: float,
               variant: str, batch: int):
    """One grid step = ``batch`` tracks whose GN chains share one loop, so
    the per-iteration loads of independent tracks interleave and hide each
    other's latency. Coordinates are in *padded* image space. meta_ref
    (SMEM) rows: [px, py, gx, gy] at this level's scale."""
    step = pl.program_id(0)
    W = 2 * half + 1
    RT = W + 3  # template window incl. gradient + bilinear margins

    h_pad, w_pad = img_next_ref.shape
    lo_x = float(half + 1)
    lo_y = float(half + 1)
    hi_x = float(w_pad - _LANES + half)
    hi_y = float(h_pad - _ROWS + half)

    # per-track template setup (straight-line; interleaves across the batch)
    Ts, gxs, gys, csts, conds, inits = [], [], [], [], [], []
    for j in range(batch):
        i = step * batch + j
        px = meta_ref[i, 0]
        py = meta_ref[i, 1]
        bx = jnp.floor(px).astype(jnp.int32) - half - 1
        by = jnp.floor(py).astype(jnp.int32) - half - 1
        fx = px - jnp.floor(px)
        fy = py - jnp.floor(py)
        region = _aligned_window(img_prev_ref, by, bx, RT, variant)
        T = _bil(region, 1, 1, fy, fx, W)
        gx = (_bil(region, 1, 2, fy, fx, W) - _bil(region, 1, 0, fy, fx, W)) * 0.5
        gy = (_bil(region, 2, 1, fy, fx, W) - _bil(region, 0, 1, fy, fx, W)) * 0.5
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tr = gxx + gyy
        n_px = float(W * W)
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / n_px
        Ts.append(T)
        gxs.append(gx)
        gys.append(gy)
        csts.append((gxx, gxy, gyy, det_safe))
        conds.append(eig_min > (min_eig / (255.0 ** 2)))
        inits.append((jnp.clip(meta_ref[i, 2], lo_x, hi_x),
                      jnp.clip(meta_ref[i, 3], lo_y, hi_y)))

    def load_target(cx, cy):
        tbx = jnp.floor(cx).astype(jnp.int32) - half
        tby = jnp.floor(cy).astype(jnp.int32) - half
        tfx = cx - jnp.floor(cx)
        tfy = cy - jnp.floor(cy)
        # max sublane residual 7 + window rows; never beyond the _ROWS pad
        # slack (loads past it would be OOB -> TPU worker crash)
        rows = min(_round_up(8 + W + 1, 8), _ROWS)
        win = _aligned_window(img_next_ref, tby, tbx, W + 1, variant, rows)
        return _bil(win, 0, 0, tfy, tfx, W)

    # every aligned load must stay inside the padded image even when a GN
    # step diverges — clamp iterates after every update (a clamped-out
    # track reads replicated border pixels and fails the ok gate later).
    # eps-freeze matches ops/lk.py:95-97: once a track's step falls under
    # eps it stops moving (previous-iteration flag gates the step).
    eps2 = float(eps) * float(eps)

    def body(_, state):
        out = []
        for j in range(batch):
            cx, cy, cv = state[3 * j], state[3 * j + 1], state[3 * j + 2]
            I = load_target(cx, cy)
            r = I - Ts[j]
            bx_ = jnp.sum(r * gxs[j])
            by_ = jnp.sum(r * gys[j])
            gxx, gxy, gyy, det_safe = csts[j]
            dx = (gyy * bx_ - gxy * by_) / det_safe
            dy = (gxx * by_ - gxy * bx_) / det_safe
            live = 1.0 - cv
            out.append(jnp.clip(cx - dx * live, lo_x, hi_x))
            out.append(jnp.clip(cy - dy * live, lo_y, hi_y))
            out.append(jnp.maximum(cv, (dx * dx + dy * dy < eps2)
                                   .astype(jnp.float32)))
        return tuple(out)

    state0 = tuple(v for pair in inits
                   for v in (pair[0], pair[1], jnp.float32(0.0)))
    state = jax.lax.fori_loop(0, iters, body, state0)

    for j in range(batch):
        i = step * batch + j
        cx, cy = state[3 * j], state[3 * j + 1]
        I = load_target(cx, cy)
        err = jnp.mean(jnp.abs(I - Ts[j])) * 255.0
        pos_ref[pl.ds(i, 1), :] = jnp.stack([cx, cy]).reshape(1, 2)
        ok_ref[pl.ds(i, 1), :] = conds[j].astype(jnp.float32).reshape(1, 1)
        err_ref[pl.ds(i, 1), :] = err.reshape(1, 1)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_image(img):
    """Edge-replicate pad: PAD on top/left; bottom to an 8-multiple plus
    _ROWS slack; right to a 128-multiple plus _LANES slack — every aligned
    [_ROWS, _LANES] load stays in-bounds."""
    h, w = img.shape
    ph = _round_up(h + 2 * PAD, 8) + _ROWS
    pw = _round_up(w + 2 * PAD, 128) + _LANES
    return jnp.pad(img, ((PAD, ph - h - PAD), (PAD, pw - w - PAD)), mode="edge")


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def track_level_pallas(img_prev, img_next, pts_prev, guess,
                       half_window: int = 7, iters: int = 10,
                       eps: float = 1e-2, min_eig: float = 1e-4,
                       interpret: bool = False,
                       variant: str = "roll", batch: int = 4):
    """Pallas counterpart of ops.lk.track_level (inverse-compositional GN).

    pts_prev/guess [N, 2] at this level's scale. Returns (pos, ok, err).
    ``batch`` = tracks per grid step (independent GN chains interleave to
    hide each other's load latency; the kernel is latency-bound).
    """
    assert half_window + 2 <= PAD, "half_window too large for padding"
    n = pts_prev.shape[0]
    h, w = img_next.shape          # track positions live in img_next coords
    hp, wp = img_prev.shape        # template source (may differ: atlas mode)
    n_pad = _round_up(n, batch)

    ip = _pad_image(img_prev)
    inx = _pad_image(img_next)

    max_xy_prev = jnp.asarray([wp - 1 + PAD, hp - 1 + PAD], jnp.float32)
    max_xy = jnp.asarray([w - 1 + PAD, h - 1 + PAD], jnp.float32)
    # clip passes NaN through, and floor(NaN)->int32 is undefined inside
    # the kernel — replace non-finite coordinates (diverged/garbage track
    # slots) with a safe interior point; such tracks fail the ok gate
    pts_pad = jnp.clip(pts_prev + PAD, float(PAD), max_xy_prev)
    guess_pad = jnp.clip(guess + PAD, float(PAD), max_xy)
    pts_pad = jnp.where(jnp.isfinite(pts_pad), pts_pad, float(PAD))
    guess_pad = jnp.where(jnp.isfinite(guess_pad), guess_pad, float(PAD))
    meta = jnp.concatenate([pts_pad, guess_pad], axis=-1)  # [N, 4]
    if n_pad != n:
        filler = jnp.full((n_pad - n, 4), float(PAD + half_window + 2), meta.dtype)
        meta = jnp.concatenate([meta, filler], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // batch,),
        in_specs=[
            pl.BlockSpec(ip.shape, lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(inx.shape, lambda i, m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_pad, 2), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_lk_kernel, half=half_window, iters=iters,
                               eps=eps, min_eig=min_eig, variant=variant,
                               batch=batch)
    pos, ok, err = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(meta, ip, inx)
    pos = pos[:n] - PAD
    ok = ok[:n]
    err = err[:n]
    center_in = (pos[:, 0] >= 0) & (pos[:, 1] >= 0) & \
        (pos[:, 0] <= w - 1) & (pos[:, 1] <= h - 1)
    return pos, (ok[:, 0] > 0.5) & center_in, err[:, 0]


def track_pyramid_pallas(pyr_prev: List[jnp.ndarray], pyr_next: List[jnp.ndarray],
                         pts: jnp.ndarray, valid: jnp.ndarray,
                         init: jnp.ndarray | None = None,
                         half_window: int = 7, iters: int = 10,
                         eps: float = 1e-2, max_err: float = 40.0,
                         interpret: bool | None = None,
                         variant: str = "roll2", batch: int = 8) -> TrackResult:
    """Drop-in replacement for ops.lk.track_pyramid using the TPU kernel.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (CPU tests run the same kernel code path through the Pallas interpreter).
    """
    if interpret is None:
        interpret = not _is_tpu()
    n_levels = len(pyr_prev)
    guess = (pts if init is None else init) / (2.0 ** (n_levels - 1))
    # a garbage slot sanitized to a safe interior point can still "track"
    # there — non-finite inputs must report ok=False, not a fake success
    finite_in = jnp.all(jnp.isfinite(pts), -1)
    if init is not None:
        finite_in = finite_in & jnp.all(jnp.isfinite(init), -1)
    ok_all = finite_in
    err = jnp.zeros(pts.shape[0], pts.dtype)
    for lvl in range(n_levels - 1, -1, -1):
        pts_l = pts / (2.0 ** lvl)
        pos, ok, err = track_level_pallas(pyr_prev[lvl], pyr_next[lvl], pts_l,
                                          guess, half_window, iters, eps,
                                          1e-4, interpret, variant, batch)
        ok_all = ok_all & ok
        guess = pos * 2.0 if lvl > 0 else pos
    ok_final = ok_all & valid & (err < max_err)
    return TrackResult(pos=guess, ok=ok_final, err=err)


def _sample_kernel(meta_ref, img_ref, out_ref, *, half: int, batch: int):
    """One grid step = ``batch`` patch loads: aligned-window load + full-
    tile dynamic rotates + bilinear blend on an [8, 128] tile, written as
    one aligned [8, 128] row block per patch (Mosaic rejects the
    [W, W] -> [1, W*W] shape cast a flattened layout would need, and an
    8-row store keeps the sublane start aligned). W <= 8 required."""
    step = pl.program_id(0)
    W = 2 * half + 1
    assert W <= 8, W
    rows = 16
    h_pad, w_pad = img_ref.shape
    for j in range(batch):
        i = step * batch + j
        cx = meta_ref[i, 0]
        cy = meta_ref[i, 1]
        bx = jnp.floor(cx).astype(jnp.int32) - half
        by = jnp.floor(cy).astype(jnp.int32) - half
        fx = cx - jnp.floor(cx)
        fy = cy - jnp.floor(cy)
        y0 = jnp.clip(by, 0, h_pad - rows)
        x0 = jnp.clip(bx, 0, w_pad - _LANES)
        y8 = pl.multiple_of((y0 // 8) * 8, 8)
        x128 = pl.multiple_of((x0 // 128) * 128, 128)
        region = img_ref[pl.ds(y8, rows), pl.ds(x128, _LANES)]
        r1 = pltpu.roll(region, rows - (y0 - y8), axis=0)
        r1 = pltpu.roll(r1, _LANES - (x0 - x128), axis=1)
        a = r1[0:8, 0:128]
        b = r1[0:8, 1:129]
        c = r1[1:9, 0:128]
        d = r1[1:9, 1:129]
        patch8 = ((1 - fy) * (1 - fx) * a + (1 - fy) * fx * b
                  + fy * (1 - fx) * c + fy * fx * d)
        out_ref[pl.ds(pl.multiple_of(i * 8, 8), 8), :] = patch8


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sample_patches_pallas(img: jnp.ndarray, coords: jnp.ndarray, half: int,
                          interpret: bool = False,
                          batch: int = 8) -> jnp.ndarray:
    """Batched bilinear patch extraction: [N, 2] centers -> [N, W, W]
    patches (W <= 8) with clamp (edge-replicate) border semantics — the
    Pallas replacement for ``bilinear_sample`` patch gathers (XLA gathers
    are the reason sparse_align cost ~16 ms/frame in-scan on a v5e; this
    kernel makes patch access dense VPU work like the LK kernel)."""
    assert half + 2 <= PAD
    n = coords.shape[0]
    W = 2 * half + 1
    assert W <= 8, "sample_patches_pallas supports patches up to 8x8"
    h, w = img.shape
    n_pad = _round_up(n, batch)
    ip = _pad_image(img)
    max_xy = jnp.asarray([w - 1 + PAD, h - 1 + PAD], jnp.float32)
    pts = jnp.clip(coords + PAD, float(PAD), max_xy)
    pts = jnp.where(jnp.isfinite(pts), pts, float(PAD))
    if n_pad != n:
        pts = jnp.concatenate(
            [pts, jnp.full((n_pad - n, 2), float(PAD), pts.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // batch,),
        in_specs=[pl.BlockSpec(ip.shape, lambda i, m: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad * 8, 128), lambda i, m: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_sample_kernel, half=half, batch=batch)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad * 8, 128), jnp.float32),
        interpret=interpret,
    )(pts, ip)
    return out.reshape(n_pad, 8, 128)[:n, :W, :W]
