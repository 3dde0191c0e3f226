"""Golden-artifact parity: our pipeline outputs vs the reference's
checked-in expected results (/root/reference/imgs/results/ and imgs/slam/,
SURVEY §4 — the only outputs the reference author ever published).

Comparison protocol: the reference used OpenCV warps + its own canvas math,
so outputs can differ by a few border pixels; each test gates on (a) canvas
dimensions within a tolerance of the golden's and (b) normalized cross-
correlation (NCC) of our canvas resized onto the golden, over the golden's
non-black support. NCC thresholds were calibrated against the actual
artifacts (stitch pairs reach 0.94-0.97; the 4-image projective chain
drifts more, 0.60).
"""

import os

import numpy as np
import pytest

R = "/root/reference/imgs"

pytestmark = pytest.mark.skipif(not os.path.isdir(R),
                                reason="reference fixtures unavailable")


def _gray(a: np.ndarray) -> np.ndarray:
    if a.ndim == 3:
        a = a[..., :3].mean(-1)
    return a.astype(np.float32)


def _load(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0


def ncc_vs_golden(ours: np.ndarray, golden: np.ndarray) -> float:
    """NCC of ours resized to the golden's canvas, over golden support."""
    from PIL import Image

    go = _gray(golden)
    ou = _gray(ours)
    im = Image.fromarray((np.clip(ou, 0, 1) * 255).astype(np.uint8)).resize(
        (go.shape[1], go.shape[0]), Image.BILINEAR)
    ou = np.asarray(im, np.float32) / 255.0
    m = go > 0.02
    a, b = ou[m] - ou[m].mean(), go[m] - go[m].mean()
    return float((a * b).sum() /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def _dims_close(ours, golden, tol: float):
    for d_o, d_g in zip(ours.shape[:2], golden.shape[:2]):
        assert abs(d_o - d_g) <= tol * d_g, (ours.shape, golden.shape)


@pytest.mark.slow
@pytest.mark.parametrize("pair,golden", [((1, 2), "y12.jpg"),
                                         ((2, 3), "y23.jpg")])
def test_golden_stitch_yosemite_pair(pair, golden):
    """Stitch::process on yosemite pairs vs imgs/results/stitch/y{ij}.jpg
    (reference results README: y{i}{j} = stitching yosemite{i}+{j})."""
    from dr3_tpu.io.image import load_image
    from dr3_tpu.pipelines.stitch import Stitch
    from dr3_tpu.utils.config import Config

    i, j = pair
    a = load_image(f"{R}/yosemite/yosemite{i}.jpg")
    b = load_image(f"{R}/yosemite/yosemite{j}.jpg")
    out, _ = Stitch(Config()).process(a, b)
    out = np.asarray(out)
    gold = _load(f"{R}/results/stitch/{golden}")
    _dims_close(out, gold, 0.05)
    assert ncc_vs_golden(out, gold) > 0.90


@pytest.mark.slow
@pytest.mark.parametrize("pair,golden,min_ncc", [
    (("drone/00.png", "drone/01.png"), "drone01.jpg", 0.88),
    (("drone/00.png", "drone/04.png"), "drone04.jpg", 0.88),
    (("drone/00.png", "drone/05.png"), "drone05.jpg", 0.88),
    # forward-motion KITTI: homography stitching is ill-posed (parallax),
    # the reference's own result is smeary -> looser gate (calibrated 0.61)
    (("KITTI/000000.png", "KITTI/000001.png"), "KITTI01.jpg", 0.5),
])
def test_golden_stitch_other_sets(pair, golden, min_ncc):
    """Stitch::process on the reference's drone/KITTI fixture pairs vs the
    checked-in imgs/results/stitch outputs (drone pairs reach NCC 0.93
    with canvas dims within 1 px)."""
    from dr3_tpu.io.image import load_image
    from dr3_tpu.pipelines.stitch import Stitch
    from dr3_tpu.utils.config import Config

    a = load_image(f"{R}/{pair[0]}")
    b = load_image(f"{R}/{pair[1]}")
    out, _ = Stitch(Config()).process(a, b)
    out = np.asarray(out)
    gold = _load(f"{R}/results/stitch/{golden}")
    _dims_close(out, gold, 0.08)
    assert ncc_vs_golden(out, gold) > min_ncc


def _translation_aligned_regions(ours: np.ndarray, gold: np.ndarray):
    """Translation-align ours onto the golden (FFT cross-correlation — the
    canvases share image 1's frame, so they differ by the bbox translation
    only) and return (global NCC, [4 quarter-column NCCs] left->right)."""
    ou, go = _gray(ours), _gray(gold)
    H = min(ou.shape[0], go.shape[0])
    W = min(ou.shape[1], go.shape[1])
    a = ou[:H, :W] - ou[:H, :W].mean()
    g = go[:H, :W] - go[:H, :W].mean()
    cc = np.fft.irfft2(np.fft.rfft2(a) * np.conj(np.fft.rfft2(g)), s=(H, W))
    sy, sx = np.unravel_index(np.argmax(cc), cc.shape)
    dy = sy if sy < H // 2 else sy - H
    dx = sx if sx < W // 2 else sx - W
    oy0, gy0 = max(dy, 0), max(-dy, 0)
    ox0, gx0 = max(dx, 0), max(-dx, 0)
    hh = min(ou.shape[0] - oy0, go.shape[0] - gy0)
    ww = min(ou.shape[1] - ox0, go.shape[1] - gx0)
    o = ou[oy0:oy0 + hh, ox0:ox0 + ww]
    g2 = go[gy0:gy0 + hh, gx0:gx0 + ww]

    def ncc(x, y):
        x = x - x.mean()
        y = y - y.mean()
        d = np.linalg.norm(x) * np.linalg.norm(y)
        return float((x * y).sum() / d) if d > 0 else 0.0

    quarters = [ncc(o[:, k * ww // 4:(k + 1) * ww // 4],
                    g2[:, k * ww // 4:(k + 1) * ww // 4]) for k in range(4)]
    return ncc(o, g2), quarters


@pytest.mark.slow
def test_golden_panorama_yosemite_normal():
    """4-image projective panorama vs imgs/results/panorama/
    yosemite_normal.jpg — compared TRANSLATION-ALIGNED (both canvases are
    in image 1's frame; whole-canvas resize misregisters everything
    because the bboxes differ).

    Round-4 analysis of the old NCC-0.61 gate: aligned, the quarters read
    0.998 / 0.981 / 0.80 / 0.29 left->right — images 1-3 match the golden
    essentially pixel-for-pixel and the divergence is the 4th image's
    projective tail, where small pairwise-H differences amplify with
    distance from the chain anchor (local displacement grows smoothly 0 ->
    ~25 px across the canvas). Our H_34 aligns the raw pair 3-4 at
    photometric NCC 0.967 (near-optimal), our estimator is seed-invariant,
    and both pairwise goldens we have (y12/y23) match at 0.94-0.97 — the
    tail is a different-but-equally-valid draw of the reference's UNSEEDED
    500-iteration RANSAC, not a defect, so exact tail parity is not an
    achievable target. Gates: left half >= 0.95 (exact-placement parity),
    aligned global >= 0.75 (calibrated 0.81)."""
    from dr3_tpu.pipelines.panorama import Panorama

    out = Panorama(feathering_width=40).process_dir(f"{R}/yosemite")
    gold = _load(f"{R}/results/panorama/yosemite_normal.jpg")
    _dims_close(out, gold, 0.12)
    g_ncc, quarters = _translation_aligned_regions(np.asarray(out), gold)
    assert quarters[0] > 0.95, quarters
    assert quarters[1] > 0.95, quarters
    assert g_ncc > 0.75, (g_ncc, quarters)


@pytest.mark.slow
@pytest.mark.parametrize("focal,min_ncc,dim_tol", [(1900, 0.90, 0.05),
                                                   (1700, 0.80, 0.12)])
def test_golden_panorama_field_spherical(focal, min_ncc, dim_tol):
    """8-image field spherical panoramas at the reference's published
    focal lengths vs imgs/results/panorama/field_focal_length_*.jpg
    (calibrated: f=1900 reaches NCC 0.94 with dims within 1%; the f=1700
    golden has a ~10% narrower canvas, so its gate is looser)."""
    from dr3_tpu.pipelines.panorama import Panorama, PanType

    out = Panorama(focal_length=float(focal), pan_type=PanType.TRANSLATE,
                   feathering_width=40).process_dir(f"{R}/field")
    gold = _load(
        f"{R}/results/panorama/field_focal_length_{focal}_spherical.jpg")
    _dims_close(out, gold, dim_tol)
    assert ncc_vs_golden(out, gold) > min_ncc


@pytest.mark.slow
def test_golden_panorama_yosemite_spherical():
    """Spherical panorama at the reference's published focal length vs
    imgs/results/panorama/yosemite_focal_length_678_spherical.jpg."""
    from dr3_tpu.pipelines.panorama import Panorama, PanType

    out = Panorama(focal_length=678.0, pan_type=PanType.TRANSLATE,
                   feathering_width=40).process_dir(f"{R}/yosemite")
    gold = _load(f"{R}/results/panorama/yosemite_focal_length_678_spherical.jpg")
    _dims_close(out, gold, 0.05)
    assert ncc_vs_golden(out, gold) > 0.90


def _extract_golden_lines(rgb: np.ndarray, rng, n_lines: int = 12):
    """RANSAC line extraction from the colored epipolar-line overlay of a
    golden render: returns [(nx, ny, c)] TLS-refit line normals."""
    diff = rgb.max(-1) - rgb.min(-1)
    ys, xs = np.nonzero(diff > 40.0 / 255.0)
    pts = np.stack([xs, ys], -1).astype(np.float64)
    lines = []
    work = pts
    for _ in range(n_lines):
        if len(work) < 300:
            break
        best = None
        for _ in range(600):
            i, j = rng.integers(0, len(work), 2)
            p, q = work[i], work[j]
            if np.linalg.norm(p - q) < 200:
                continue
            d = q - p
            n = np.array([-d[1], d[0]])
            n /= np.linalg.norm(n)
            c = -n @ p
            inl = np.abs(work @ n + c) < 1.5
            span = np.ptp(work[inl] @ (d / np.linalg.norm(d)))
            if inl.sum() > 250 and span > 500 and \
                    (best is None or inl.sum() > best[0]):
                best = (inl.sum(), inl)
        if best is None:
            break
        sel = work[best[1]]
        mu = sel.mean(0)
        _, _, vt = np.linalg.svd(sel - mu)
        nrm = vt[1]
        lines.append((nrm[0], nrm[1], -nrm @ mu, mu))
        work = work[~best[1]]
    return lines


@pytest.mark.slow
def test_golden_epipoles_geometry(rng):
    """Two-view F on the reference's slam pair (imgs/slam/img_l.png,
    img_r.png) vs the drawn lines in imgs/slam/epipoles_left.png.

    The pair is a rectified KITTI stereo pair, so the TRUE epipolar lines
    are horizontal and the epipole sits at infinity — a near-degenerate
    pencil where the epipole's position along the axis is ill-conditioned.
    The golden render's own lines slope 4-10 degrees (the reference
    verified visually only, SURVEY §4), so exact epipole distance is not a
    usable gate. Gates: (a) our inlier epipolar residual < 0.5 px;
    (b) at each golden line's midpoint, the direction our F predicts
    (midpoint -> our epipole) agrees with the golden line direction to a
    loose 12-degree median — catches transposed F / wrong pencil
    orientation while tolerating the degeneracy."""
    import jax
    import jax.numpy as jnp

    from dr3_tpu.geometry.ransac import ransac_fundamental
    from dr3_tpu.pipelines.stitch import find_correspondences
    from dr3_tpu.utils.config import Config

    il = _gray(_load(f"{R}/slam/img_l.png"))
    ir = _gray(_load(f"{R}/slam/img_r.png"))
    cfg = Config()
    p1, p2, w = find_correspondences(jnp.asarray(il), jnp.asarray(ir), cfg)
    fr = ransac_fundamental(jax.random.PRNGKey(0), p1, p2, w,
                            n_samples=cfg.init_ransac_iters,
                            sigma=cfg.init_sigma)
    F = np.asarray(fr.model)
    inl = np.asarray(fr.inliers)
    assert inl.sum() >= 40

    x1 = np.hstack([np.asarray(p1)[inl], np.ones((inl.sum(), 1))])
    x2 = np.hstack([np.asarray(p2)[inl], np.ones((inl.sum(), 1))])
    l2 = x1 @ F.T
    d = np.abs(np.sum(l2 * x2, 1)) / np.linalg.norm(l2[:, :2], axis=1)
    assert np.median(d) < 0.5, np.median(d)

    # left epipole of our F (F e1 = 0)
    _, _, vt = np.linalg.svd(F)
    e1 = vt[-1]
    e1 = e1[:2] / e1[2]

    gold = _load(f"{R}/slam/epipoles_left.png")
    lines = _extract_golden_lines(gold, rng)
    assert len(lines) >= 6, "golden line extraction failed"
    gaps = []
    for nx, ny, _c, mid in lines:
        golden_dir = np.array([ny, -nx])
        ours_dir = e1 - mid
        cosg = abs(golden_dir @ ours_dir) / (
            np.linalg.norm(golden_dir) * np.linalg.norm(ours_dir) + 1e-12)
        gaps.append(np.degrees(np.arccos(np.clip(cosg, 0, 1))))
    assert np.median(gaps) < 12.0, np.sort(gaps)
