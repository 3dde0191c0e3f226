"""Generic LM solver (reference tests/ceres/{powell,curve_fitting,
robust_curve_fitting}.cc) and BAL file I/O (tests/ceres/ba.cc)."""

import os

import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.lm import least_squares
from dr3_tpu.ba.problem import residuals_only
from dr3_tpu.ba.schur_lm import bundle_adjust
from dr3_tpu.io.bal import (BALData, bal_to_problem, load_bal,
                            problem_to_bal, save_bal)
from tests.test_ba import synthetic_ba


def _powell(x):
    # Powell's singular function, same residual blocks as powell.cc
    return jnp.stack([
        x[0] + 10.0 * x[1],
        jnp.sqrt(5.0) * (x[2] - x[3]),
        (x[1] - 2.0 * x[2]) ** 2,
        jnp.sqrt(10.0) * (x[0] - x[3]) ** 2,
    ])


def test_powell():
    res = least_squares(_powell, jnp.asarray([3.0, -1.0, 0.0, 1.0]),
                        max_iters=60)
    assert float(res.final_cost) < 1e-8
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=2e-2)
    assert int(res.n_accepted) > 0


def _curve_data(rng, n=67, m=0.3, c=0.1, noise=0.01, outlier_frac=0.0):
    x = np.linspace(0.0, 5.0, n).astype(np.float32)
    y = np.exp(m * x + c) + rng.normal(0, noise, n).astype(np.float32)
    k = int(outlier_frac * n)
    if k:
        idx = rng.choice(n, k, replace=False)
        y[idx] += rng.uniform(1.5, 3.0, k).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_curve_fitting(rng):
    x, y = _curve_data(rng)
    res = least_squares(lambda p: jnp.exp(p[0] * x + p[1]) - y,
                        jnp.zeros(2), max_iters=40)
    m, c = np.asarray(res.x)
    assert abs(m - 0.3) < 0.02 and abs(c - 0.1) < 0.05
    assert float(res.final_cost) < float(res.initial_cost)


def test_robust_curve_fitting(rng):
    x, y = _curve_data(rng, outlier_frac=0.15)
    fit = lambda delta: least_squares(  # noqa: E731
        lambda p: jnp.exp(p[0] * x + p[1]) - y, jnp.zeros(2),
        max_iters=40, huber_delta=delta)
    m_plain = float(fit(None).x[0])
    m_rob = float(fit(0.05).x[0])
    # Huber recovers the true slope; the plain L2 fit is dragged off by
    # the outliers (robust_curve_fitting.cc's point)
    assert abs(m_rob - 0.3) < 0.02
    assert abs(m_rob - 0.3) < abs(m_plain - 0.3)


def test_bal_roundtrip_and_solve(rng, tmp_path):
    prob, _, _ = synthetic_ba(rng, n_cams=4, n_pts=60, noise_px=0.3)
    bal = problem_to_bal(prob)
    path = os.path.join(tmp_path, "prob.bal")
    save_bal(path, bal)
    bal2 = load_bal(path)
    for a, b in zip(bal, bal2):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10)

    res = bundle_adjust(bal_to_problem(bal2), 15)
    assert float(res.final_cost) < float(res.initial_cost)


def test_bal_conversion_preserves_residuals(rng, tmp_path):
    # with principal point at 0 the BAL mapping is exactly representable:
    # residuals of the converted problem match the original
    prob, _, _ = synthetic_ba(rng, n_cams=4, n_pts=60)
    prob = prob._replace(intrinsics=prob.intrinsics.at[2:].set(0.0))
    path = os.path.join(tmp_path, "r.bal")
    save_bal(path, problem_to_bal(prob))
    p2 = bal_to_problem(load_bal(path))
    np.testing.assert_allclose(np.asarray(residuals_only(p2)),
                               np.asarray(residuals_only(prob)),
                               atol=1e-2)


def _make_neg_z_bal(rng, n_cams=3, n_pts=50, f=500.0, pt_noise=0.0):
    """A genuine BAL-convention scene: cameras look down -z (visible points
    have z < 0 in the camera frame) and project u = -f * x/z (Snavely)."""
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(-6, -4, n_pts)], axis=1)
    cam_params = np.zeros((n_cams, 9))
    cam_params[:, 3] = np.linspace(-0.2, 0.2, n_cams)  # t_x offsets, R = I
    cam_params[:, 6] = f
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    pc = pts[obs_pt] + cam_params[obs_cam, 3:6]  # camera-frame points, z<0
    uv = -f * pc[:, :2] / pc[:, 2:3]
    return BALData(cam_params, pts + pt_noise * rng.normal(size=pts.shape),
                   obs_cam, obs_pt, uv)


def test_bal_negative_z_cameras_are_valid(rng):
    # regression: BAL's -z frame must convert to +z pinhole (S-conjugation),
    # otherwise every observation fails linearize's z>0 mask and the solver
    # silently no-ops on real BAL data
    from dr3_tpu.ba.problem import linearize

    bal = _make_neg_z_bal(rng)
    prob = bal_to_problem(bal)
    lin = linearize(prob)
    assert bool(np.all(np.asarray(lin.valid)))
    np.testing.assert_allclose(np.asarray(residuals_only(prob)), 0.0,
                               atol=1e-2)


def test_bal_negative_z_solve_reduces_cost(rng):
    bal = _make_neg_z_bal(rng, pt_noise=0.05)
    prob = bal_to_problem(bal)
    res = bundle_adjust(prob, 15)
    assert float(res.initial_cost) > 1.0  # the perturbation is visible
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2


def test_bal_solver_reduces_cost_on_perturbed_problem(rng, tmp_path):
    # build a BAL file whose init is perturbed; the jitted Schur-LM should
    # pull the cost down by orders of magnitude (ba.cc's demo behavior)
    prob, _, _ = synthetic_ba(rng, n_cams=5, n_pts=80, pose_noise=0.03)
    # zero principal point so BAL roundtrip is exactly representable
    prob = prob._replace(intrinsics=prob.intrinsics.at[2:].set(0.0))
    path = os.path.join(tmp_path, "p.bal")
    save_bal(path, problem_to_bal(prob))
    p2 = bal_to_problem(load_bal(path))
    res = bundle_adjust(p2, 20)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
