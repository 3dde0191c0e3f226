"""Pallas TPU kernels for dense image warps (remap / perspective /
spherical / cylindrical).

Why a kernel: the jnp warps (ops/warp.py) express "for every output pixel,
bilinearly sample an arbitrary source coordinate" as XLA gathers — 4
per-pixel gathers that scalarize on TPU (~19 ms for one KITTI-sized
warp_perspective, measured). This replaces the reference's OpenCV
``cv::remap`` / ``cv::warpPerspective`` hot loops (reference
src/utils.cpp:189-194, src/stitch.cpp:73-74, src/panorama.cpp:192) with
dense VPU work.

Key observation: every warp this framework needs is *smooth* — within an
(8k, 128) output tile the source coordinates deviate from an affine-ish
base by only a few pixels. So a 2-D warp decomposes into two 1-D remap
kernels (Catmull–Smith two-pass resampling), and each 1-D remap becomes:

* subtract the identity component of the coordinate field (``v - i`` rows /
  ``u - j`` lanes), leaving a small-range *shift field* per tile;
* load one **aligned** source region per tile (8-aligned sublane starts /
  128-aligned lane starts via ``pl.multiple_of`` — Mosaic requires aligned
  vector loads), with one dynamic lane rotate (``pltpu.roll``) to cancel
  the 128-residual in the horizontal case;
* resolve the residual per-pixel shifts with a masked sum over K static
  slices of the region (compare + select on the VPU — zero gathers).

The two-pass composition is mathematically *exact* (equal to direct
bilinear) for spherical/cylindrical warps, whose horizontal coordinate
depends only on the output column; for perspective warps the first pass
samples each source row at that row's own x-intercept (the classic
Catmull–Smith decomposition), which agrees with direct bilinear to
interpolation order.

Shift capacity: each kernel resolves per-tile shift ranges up to ``K - 1``
pixels (default 32). ``tile_shift_spread`` computes the actual per-tile
spread of a coordinate field so callers can verify capacity (or fall back
to the XLA gather path for pathological warps, e.g. near a homography
horizon). All fields are border-clamped, so out-of-image samples replicate
edges; callers apply the usual validity mask for fill semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dr3_tpu.geometry.homography import apply_homography
from dr3_tpu.geometry.linalg import inv3x3
from dr3_tpu.ops.warp import output_grid

TS = 32     # output tile sublanes (multiple of 8)
TL = 128    # output tile lanes
RX = 384    # aligned lane extent loaded per horizontal-remap tile
_BIG = 1e9  # capacity sentinel for far-out-of-bounds coordinates


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_edge(img, rows, cols, top: int = 0, left: int = 0):
    """Edge-replicate pad [H, W] -> [rows, cols] with optional top/left pad
    (rows/cols include the top/left pad)."""
    h, w = img.shape
    return jnp.pad(img, ((top, rows - h - top), (left, cols - w - left)),
                   mode="edge")


# ---------------------------------------------------------------------------
# vertical remap: out[i, j] = bilinear_y( src[v(i, j), j] )
# ---------------------------------------------------------------------------

def _vremap_kernel(src_ref, t_ref, out_ref, *, kt: int, ry: int):
    i0 = pl.program_id(0) * TS
    j0 = pl.multiple_of(pl.program_id(1) * TL, TL)
    t = t_ref[:]                                   # v - i_global, [TS, TL]
    tmin = jnp.floor(jnp.min(t)).astype(jnp.int32)
    base = jnp.clip(tmin + i0, 0, src_ref.shape[0] - ry)
    by8 = pl.multiple_of((base // 8) * 8, 8)
    region = src_ref[pl.ds(by8, ry), pl.ds(j0, TL)]

    # local float row offset of the sample relative to region row i_local
    dt = t + (i0 - by8).astype(t.dtype)
    dt = jnp.clip(dt, 0.0, float(kt - 1) - 1e-3)
    dti = jnp.floor(dt).astype(jnp.int32)
    fy = dt - jnp.floor(dt)

    acc = jnp.zeros((TS, TL), jnp.float32)
    for k in range(kt + 1):
        w = jnp.where(dti == k, 1.0 - fy, 0.0) + jnp.where(dti == k - 1, fy, 0.0)
        acc = acc + w * region[k:k + TS, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(2, 3))
def remap_rows(src: jnp.ndarray, v: jnp.ndarray, kt: int = 32,
               interpret: bool | None = None) -> jnp.ndarray:
    """out[i, j] = bilinear row-sample src[v[i, j], j] (border-replicate).

    src [H, W]; v [Ho, W] float row coordinates. Per-(TS, TL) output tile,
    ``v - i`` must span < kt pixels (see tile_shift_spread).
    """
    if interpret is None:
        interpret = not _is_tpu()
    H, W = src.shape
    Ho, Wo = v.shape
    assert Wo == W, "vertical remap keeps columns"
    ry = _round_up(TS + kt + 2, 8)

    Hp = _round_up(Ho, TS)
    Wp = _round_up(W, TL)
    PADT = TS  # top pad: keeps region bases >= 0 for negative shifts
    Hs = _round_up(H + PADT + 8, 8) + ry
    src_p = _pad_edge(src.astype(jnp.float32), Hs, Wp, top=PADT)
    # coords within a small margin outside the image replicate the border
    # (clamp); coords far outside are *capacity sentinels* (_BIG): they must
    # not drag down the per-tile min that places the aligned region, and
    # their output is garbage the caller masks to fill anyway
    margin = float(max(kt // 4, 2))
    in_cap = (v >= -margin) & (v <= H - 1 + margin)
    vc = jnp.clip(v.astype(jnp.float32), 0.0, float(H - 1)) + PADT
    # shift field computed on the REAL extent, then edge-padded — padding v
    # itself would give pad rows shifts of v[H-1] - i (unboundedly negative),
    # poisoning the per-tile min
    t = vc - jnp.arange(Ho, dtype=jnp.float32)[:, None]
    t = jnp.where(in_cap, t, _BIG)
    t = _pad_edge(t, Hp, Wp)

    out = pl.pallas_call(
        functools.partial(_vremap_kernel, kt=kt, ry=ry),
        grid=(Hp // TS, Wp // TL),
        in_specs=[
            pl.BlockSpec(src_p.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, TL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TS, TL), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        interpret=interpret,
    )(src_p, t)
    return out[:Ho, :W]


# ---------------------------------------------------------------------------
# horizontal remap: out[i, j] = bilinear_x( src[i, u(i, j)] )
# ---------------------------------------------------------------------------

def _hremap_kernel(src_ref, s_ref, out_ref, *, kx: int):
    i0 = pl.multiple_of(pl.program_id(0) * TS, 8)
    j0 = pl.multiple_of(pl.program_id(1) * TL, TL)
    s = s_ref[:]                                   # u - j_global, [TS, TL]
    smin = jnp.floor(jnp.min(s)).astype(jnp.int32)
    base = jnp.clip(j0 + smin, 0, src_ref.shape[1] - RX)
    b128 = pl.multiple_of((base // 128) * 128, 128)
    r0 = base - b128                               # [0, 128)
    region = src_ref[pl.ds(i0, TS), pl.ds(b128, RX)]
    # rolled[:, m] = src[:, base + m]. NB: compiled Mosaic mis-lowers
    # *negative* dynamic roll shifts on 384-lane arrays (measured: wrong by
    # whole tiles); the positive equivalent RX - r0 is exact.
    rolled = pltpu.roll(region, RX - r0, axis=1)

    # lane offset of the sample relative to rolled lane j_local
    q = s + (j0 - base).astype(s.dtype)
    q = jnp.clip(q, 0.0, float(kx - 1) - 1e-3)
    qi = jnp.floor(q).astype(jnp.int32)
    fx = q - jnp.floor(q)

    acc = jnp.zeros((TS, TL), jnp.float32)
    for k in range(kx + 1):
        w = jnp.where(qi == k, 1.0 - fx, 0.0) + jnp.where(qi == k - 1, fx, 0.0)
        acc = acc + w * rolled[:, k:k + TL]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=(2, 3))
def remap_cols(src: jnp.ndarray, u: jnp.ndarray, kx: int = 32,
               interpret: bool | None = None) -> jnp.ndarray:
    """out[i, j] = bilinear col-sample src[i, u[i, j]] (border-replicate).

    src [H, W]; u [H, Wo] float column coordinates. Per-(TS, TL) output
    tile, ``u - j`` must span < kx pixels.
    """
    if interpret is None:
        interpret = not _is_tpu()
    H, W = src.shape
    Ho, Wo = u.shape
    assert Ho == H, "horizontal remap keeps rows"
    assert kx + TL + 128 <= RX, "kx exceeds region capacity"

    Hp = _round_up(H, TS)
    Wop = _round_up(Wo, TL)
    PADL = 128  # left pad: keeps region bases >= 0 for negative shifts
    Ws = _round_up(W + PADL + 128, 128) + RX
    src_p = _pad_edge(src.astype(jnp.float32), Hp, Ws, left=PADL)
    margin = float(max(kx // 4, 2))
    in_cap = (u >= -margin) & (u <= W - 1 + margin)
    uc = jnp.clip(u.astype(jnp.float32), 0.0, float(W - 1)) + PADL
    # shift field on the REAL extent, then edge-padded (see remap_rows)
    s = uc - jnp.arange(Wo, dtype=jnp.float32)[None, :]
    s = jnp.where(in_cap, s, _BIG)
    s = _pad_edge(s, Hp, Wop)

    out = pl.pallas_call(
        functools.partial(_hremap_kernel, kx=kx),
        grid=(Hp // TS, Wop // TL),
        in_specs=[
            pl.BlockSpec(src_p.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, TL), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TS, TL), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wop), jnp.float32),
        interpret=interpret,
    )(src_p, s)
    return out[:H, :Wo]


# ---------------------------------------------------------------------------
# capacity check
# ---------------------------------------------------------------------------

def tile_shift_spread(field: jnp.ndarray, identity_axis: int,
                      mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Max per-(TS, TL)-tile spread of (field - identity component).

    identity_axis=0: field is a row-coordinate map (subtract i);
    identity_axis=1: column-coordinate map (subtract j). ``mask`` marks
    pixels that count toward capacity (the kernels sentinel far-out-of-
    bounds coords out of the tile min). The kernels require the returned
    spread + 2 <= kt/kx.
    """
    h, w = field.shape
    if identity_axis == 0:
        f = field - jnp.arange(h, dtype=field.dtype)[:, None]
    else:
        f = field - jnp.arange(w, dtype=field.dtype)[None, :]
    if mask is not None:
        f = jnp.where(mask, f, jnp.nan)
    hp, wp = _round_up(h, TS), _round_up(w, TL)
    f = _pad_edge(f, hp, wp)
    tiles = f.reshape(hp // TS, TS, wp // TL, TL)
    spread = (jnp.nanmax(tiles, axis=(1, 3)) - jnp.nanmin(tiles, axis=(1, 3)))
    return jnp.nanmax(jnp.nan_to_num(spread, nan=0.0))


# ---------------------------------------------------------------------------
# compositions: perspective / spherical / cylindrical
# ---------------------------------------------------------------------------

def _channels(img):
    """Iterate [H, W] planes of [H, W] or [H, W, C]."""
    if img.ndim == 2:
        return [img], lambda outs: outs[0]
    return ([img[..., c] for c in range(img.shape[-1])],
            lambda outs: jnp.stack(outs, axis=-1))


def perspective_fields(Hinv: jnp.ndarray, src_hw, out_hw):
    """Catmull–Smith fields for out(p) = img(Hinv p).

    Returns (x_pass [Hs, Wo]: per-source-row column intercepts,
             y_pass [Ho, Wo]: source row for each output pixel,
             valid  [Ho, Wo]).
    Pass 1 samples source row y at column X(u, v'(u, y)) where v'(u, y)
    solves Y(u, v) = y; pass 2 picks row Y(u, v) from pass-1 column u.
    """
    hs, ws = src_hw
    ho, wo = out_hw
    a, b, c = Hinv[0, 0], Hinv[0, 1], Hinv[0, 2]
    d, e, f = Hinv[1, 0], Hinv[1, 1], Hinv[1, 2]
    g, h, one = Hinv[2, 0], Hinv[2, 1], Hinv[2, 2]
    a, b, c, d, e, f, g, h = (x / one for x in (a, b, c, d, e, f, g, h))

    grid_o = output_grid(ho, wo)
    u_o, v_o = grid_o[..., 0], grid_o[..., 1]
    den = g * u_o + h * v_o + 1.0
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    X = (a * u_o + b * v_o + c) / den
    Y = (d * u_o + e * v_o + f) / den
    valid = (X >= 0) & (Y >= 0) & (X <= ws - 1) & (Y <= hs - 1) & (den > 0)

    ys = jnp.arange(hs, dtype=jnp.float32)[:, None]
    us = jnp.arange(wo, dtype=jnp.float32)[None, :]
    den_v = e - ys * h
    den_v = jnp.where(jnp.abs(den_v) < 1e-9, 1e-9, den_v)
    v_prime = (ys * (g * us + 1.0) - d * us - f) / den_v
    den_x = g * us + h * v_prime + 1.0
    den_x = jnp.where(jnp.abs(den_x) < 1e-9, 1e-9, den_x)
    x_pass = (a * us + b * v_prime + c) / den_x
    return x_pass, Y, valid


def warp_perspective(img: jnp.ndarray, H: jnp.ndarray, out_hw,
                     fill: float = 0.0, kx: int = 32, kt: int = 32,
                     interpret: bool | None = None):
    """Pallas counterpart of ops.warp.warp_perspective -> (out, valid)."""
    Hinv = inv3x3(H)
    planes, join = _channels(img)
    x_pass, Y, valid = perspective_fields(Hinv, planes[0].shape, out_hw)
    outs = []
    for p in planes:
        tmp = remap_cols(p, x_pass, kx=kx, interpret=interpret)
        outs.append(remap_rows(tmp, Y, kt=kt, interpret=interpret))
    out = join(outs)
    vmask = valid if out.ndim == 2 else valid[..., None]
    return jnp.where(vmask, out, fill), valid


def perspective_spread_ok(H, src_hw, out_hw, kx: int = 32, kt: int = 32) -> bool:
    """Concrete-H capacity check for warp_perspective's two passes."""
    import numpy as np
    x_pass, Y, _ = perspective_fields(inv3x3(jnp.asarray(H, jnp.float32)),
                                      src_hw, out_hw)
    hs, ws = src_hw
    mx = (x_pass >= -(kx // 4)) & (x_pass <= ws - 1 + kx // 4)
    my = (Y >= -(kt // 4)) & (Y <= hs - 1 + kt // 4)
    x_c = jnp.clip(x_pass, 0.0, float(ws - 1))
    y_c = jnp.clip(Y, 0.0, float(hs - 1))
    sx = float(tile_shift_spread(x_c, identity_axis=1, mask=mx))
    sy = float(tile_shift_spread(y_c, identity_axis=0, mask=my))
    return bool(np.isfinite(sx) and np.isfinite(sy)
                and sx + 2 <= kx and sy + 2 <= kt)


def _np_warp_fields(kind: str, h: int, w: int, f: float):
    """NumPy mirror of ops.warp.{spherical,cylindrical}_warp_field — used
    for the concrete capacity decision, which must not trace (h, w, f are
    static at every call site)."""
    import numpy as np
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    xf = (gx - 0.5 * w) / f
    yf = (gy - 0.5 * h) / f
    if kind == "spherical":
        xhat = np.sin(xf) * np.cos(yf)
        yhat = np.sin(yf)
        zhat = np.cos(xf) * np.cos(yf)
    else:
        xhat = np.sin(xf)
        yhat = yf
        zhat = np.cos(xf)
    zhat = np.where(np.abs(zhat) < 1e-9, 1e-9, zhat)
    return 0.5 * w + f * xhat / zhat, 0.5 * h + f * yhat / zhat


def _np_row_spread_ok(v, h: int, kt: int) -> bool:
    """NumPy per-tile spread check of a row-coordinate field vs kt."""
    import numpy as np
    margin = max(kt // 4, 2)
    t = np.where((v >= -margin) & (v <= h - 1 + margin),
                 np.clip(v, 0.0, h - 1.0)
                 - np.arange(v.shape[0], dtype=np.float32)[:, None], np.nan)
    hp = _round_up(v.shape[0], TS)
    wp = _round_up(v.shape[1], TL)
    t = np.pad(t, ((0, hp - v.shape[0]), (0, wp - v.shape[1])), mode="edge")
    tiles = t.reshape(hp // TS, TS, wp // TL, TL)
    # all-NaN (fully out-of-capacity) tiles legitimately have zero spread
    hi = np.max(np.where(np.isnan(tiles), -np.inf, tiles), axis=(1, 3))
    lo = np.min(np.where(np.isnan(tiles), np.inf, tiles), axis=(1, 3))
    spread = np.maximum(hi - lo, 0.0)
    s = float(np.max(np.where(np.isfinite(spread), spread, 0.0)))
    return bool(np.isfinite(s) and s + 2 <= kt)


def warp_spherical(img: jnp.ndarray, f: float, kt: int = 48,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Pallas/MXU counterpart of ops.warp.warp_spherical (exact two-pass:
    the spherical u-field depends only on the output column)."""
    from dr3_tpu.ops.warp import spherical_warp_field
    h, w = img.shape[:2]
    u, v = spherical_warp_field(h, w, f)
    un, vn = _np_warp_fields("spherical", h, w, f)
    return _axis_separable_warp(img, u, v, _np_row_spread_ok(vn, h, kt),
                                kt, interpret)


def warp_cylindrical(img: jnp.ndarray, f: float, kt: int = 48,
                     interpret: bool | None = None) -> jnp.ndarray:
    from dr3_tpu.ops.warp import cylindrical_warp_field
    h, w = img.shape[:2]
    u, v = cylindrical_warp_field(h, w, f)
    un, vn = _np_warp_fields("cylindrical", h, w, f)
    return _axis_separable_warp(img, u, v, _np_row_spread_ok(vn, h, kt),
                                kt, interpret)


def _row_resample_matrix(u_row: jnp.ndarray, w_src: int) -> jnp.ndarray:
    """[Wo] column coords -> [Wo, Ws] bilinear row-resample matrix (two
    nonzeros per row; border-replicate via index clamping)."""
    uc = jnp.clip(u_row, 0.0, float(w_src - 1))
    u0 = jnp.floor(uc)
    fx = uc - u0
    i0 = u0.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, w_src - 1)
    cols = jnp.arange(w_src, dtype=jnp.int32)[None, :]
    return ((cols == i0[:, None]) * (1.0 - fx[:, None])
            + (cols == i1[:, None]) * fx[:, None]).astype(jnp.float32)


def _axis_separable_warp(img, u, v, capacity_ok: bool, kt, interpret):
    """remap(img, u, v) where u varies only along columns: exact 2-pass.

    Pass 1 (columns) is one selection **matmul on the MXU** — the per-column
    map is shared by every row, so no per-tile capacity limit applies even
    for strong spherical distortion. Pass 2 (rows) is the Pallas vertical
    remap; if the v-field exceeds its per-tile capacity (``capacity_ok``,
    decided concretely by the caller — the fields depend only on static
    shape and focal length), fall back to the XLA gather path.
    Out-of-bounds samples get 0 like ops.warp.remap.
    """
    h, w = img.shape[:2]
    valid = (u >= 0) & (v >= 0) & (u <= w - 1) & (v <= h - 1)

    if not capacity_ok:
        from dr3_tpu.ops.warp import remap as xla_remap
        return xla_remap(img, u, v)

    M = _row_resample_matrix(u[0, :], w)            # [Wo, Ws]
    planes, join = _channels(img)
    outs = []
    for p in planes:
        tmp = jax.lax.dot_general(
            p.astype(jnp.float32), M,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)     # [H, Wo]
        outs.append(remap_rows(tmp, v, kt=kt, interpret=interpret))
    out = join(outs)
    vmask = valid if out.ndim == 2 else valid[..., None]
    return jnp.where(vmask, out, 0.0)
