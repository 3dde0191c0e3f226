"""Distributed Schur BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.ba.schur_lm import bundle_adjust
from dr3_tpu.parallel.dist_ba import dist_bundle_adjust, partition_problem
from tests.test_ba import synthetic_ba


def test_partition_covers_everything(rng):
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=50)
    sp = partition_problem(prob, 4)
    # every observation is preserved with weight > 0 exactly once
    assert float(sp.obs_w.sum()) == float(jnp.sum(prob.obs_w))
    # every point appears exactly once in the permutation
    perm = sp.point_perm[sp.point_perm >= 0]
    assert sorted(perm.tolist()) == list(range(prob.n_points))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_matches_single_device(rng, n_dev):
    prob, cams_true, pts_true = synthetic_ba(rng, n_cams=5, n_pts=96,
                                             noise_px=0.3)
    single = bundle_adjust(prob, 10)
    dist = dist_bundle_adjust(prob, n_devices=n_dev, max_iters=10)
    # identical algorithm, identical damping schedule -> same costs
    np.testing.assert_allclose(float(dist.initial_cost),
                               float(single.initial_cost), rtol=1e-4)
    np.testing.assert_allclose(float(dist.final_cost),
                               float(single.final_cost), rtol=0.05, atol=1e-6)
    # and the solutions agree
    np.testing.assert_allclose(np.asarray(dist.problem.cam_t),
                               np.asarray(single.problem.cam_t), atol=1e-2)


def test_dist_with_distortion_matches_single_device(rng):
    from tests.test_ba import DIST

    prob, cams_true, _ = synthetic_ba(rng, n_cams=5, n_pts=96, dist=DIST)
    single = bundle_adjust(prob, 10)
    dist = dist_bundle_adjust(prob, n_devices=4, max_iters=10)
    np.testing.assert_allclose(float(dist.final_cost),
                               float(single.final_cost), rtol=0.05, atol=1e-6)
    assert float(dist.final_cost) < float(dist.initial_cost) * 1e-3
    err_t = np.abs(np.asarray(dist.problem.cam_t)
                   - np.asarray(cams_true.t)).max()
    assert err_t < 2e-2


def test_dist_converges_to_truth(rng):
    prob, cams_true, pts_true = synthetic_ba(rng, n_cams=6, n_pts=120)
    res = dist_bundle_adjust(prob, n_devices=8, max_iters=15)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    err_t = np.abs(np.asarray(res.problem.cam_t) - np.asarray(cams_true.t)).max()
    assert err_t < 2e-2
    err_p = np.abs(np.asarray(res.problem.points) - pts_true).max()
    assert err_p < 5e-2


def test_dist_uneven_points(rng):
    # point count not divisible by device count exercises padding
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=103)
    res = dist_bundle_adjust(prob, n_devices=8, max_iters=8)
    assert float(res.final_cost) < float(res.initial_cost)
    assert int(res.n_accepted) >= 3


def test_dist_ba_executable_is_cached(rng):
    """Repeated same-shape calls (the per-keyframe pattern from the VO
    driver) must reuse ONE compiled executable — round-1 rebuilt the
    shard_map per call and retraced every keyframe."""
    from dr3_tpu.parallel.dist_ba import _build_dist_ba
    from dr3_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=64)
    mapped = _build_dist_ba(mesh, 5, 5.0, 1e-3)
    n0 = mapped._cache_size()
    dist_bundle_adjust(prob, max_iters=5, mesh=mesh)
    assert mapped._cache_size() == n0 + 1
    # second call, same shapes: zero new traces
    prob2 = prob._replace(points=prob.points + 0.01)
    dist_bundle_adjust(prob2, max_iters=5, mesh=mesh)
    assert mapped._cache_size() == n0 + 1


def test_stitch_pair_program_shared_across_instances(rng):
    """Panorama builds a new Stitch per run; the jitted pair program must be
    module-level so instance #2 pays zero recompiles."""
    from dr3_tpu.pipelines.stitch import Stitch, _pair_program
    from dr3_tpu.utils.config import Config

    img = rng.uniform(0, 1, (96, 128)).astype(np.float32)
    img2 = np.roll(img, 5, axis=1)
    cfg = Config(cell_size=16, fast_threshold=6.0)
    s1 = Stitch(cfg)
    s1.align_pair(img, img2)
    n = _pair_program._cache_size()
    s2 = Stitch(cfg)
    s2.align_pair(img, img2)
    assert _pair_program._cache_size() == n


def test_dist_2d_mesh_matches_single_device(rng):
    """2-level [hosts, points] mesh (SURVEY §7 config 5): psum reduces over
    ICI then DCN; results must match the single-device solve."""
    from dr3_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(n_hosts=2, n_devices=8)
    assert mesh.devices.shape == (2, 4)
    prob, cams_true, _ = synthetic_ba(rng, n_cams=5, n_pts=96, noise_px=0.3)
    single = bundle_adjust(prob, 10)
    dist = dist_bundle_adjust(prob, max_iters=10, mesh=mesh)
    np.testing.assert_allclose(float(dist.initial_cost),
                               float(single.initial_cost), rtol=1e-4)
    np.testing.assert_allclose(float(dist.final_cost),
                               float(single.final_cost), rtol=0.05, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.problem.cam_t),
                               np.asarray(single.problem.cam_t), atol=1e-2)


def test_distributed_init_noop_single_process():
    from dr3_tpu.parallel.mesh import distributed_init

    assert distributed_init() is False  # no env contract -> single process
