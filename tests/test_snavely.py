"""Exact-BAL (Snavely 9-param camera) bundle adjustment
(reference tests/ceres/ba.cc:105-118)."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.snavely import (SnavelyProblem, apply_update, bal_to_snavely,
                                bundle_adjust_snavely, linearize,
                                project_snavely, residuals_only,
                                snavely_to_bal)
from dr3_tpu.geometry.lie import SE3
from dr3_tpu.io.bal import BALData


def _snavely_np(cam9, X, uv):
    """Independent numpy evaluation of the BAL residual (ba.cc:105-118)."""
    from scipy.spatial.transform import Rotation

    aa, t, f, k1, k2 = cam9[:3], cam9[3:6], cam9[6], cam9[7], cam9[8]
    p = Rotation.from_rotvec(aa).as_matrix() @ X + t
    q = -p[:2] / p[2]
    r2 = float(q @ q)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * dist * q - uv


def _rand_bal(rng, n_cams=4, n_pts=60, noise=0.0, pt_noise=0.0,
              k_radial=True):
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(-8, -4, n_pts)], 1)
    cam = np.zeros((n_cams, 9))
    cam[:, 0] = rng.normal(0, 0.02, n_cams)      # small angle-axis
    cam[:, 3] = np.linspace(-0.5, 0.5, n_cams)
    cam[:, 4] = rng.normal(0, 0.1, n_cams)
    cam[:, 6] = rng.uniform(400, 600, n_cams)    # per-camera focals
    if k_radial:
        cam[:, 7] = rng.uniform(-0.1, 0.1, n_cams)
        cam[:, 8] = rng.uniform(-0.01, 0.01, n_cams)
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = np.stack([_snavely_np(cam[c], pts[p], np.zeros(2))
                   for c, p in zip(obs_cam, obs_pt)])
    uv += rng.normal(0, noise, uv.shape)
    return BALData(cam, pts + pt_noise * rng.normal(size=pts.shape),
                   obs_cam, obs_pt, uv)


def test_snavely_residuals_match_numpy(rng):
    bal = _rand_bal(rng, pt_noise=0.05)
    prob = bal_to_snavely(bal)
    r = np.asarray(residuals_only(prob))
    want = np.stack([
        _snavely_np(bal.cam_params[c], bal.points[p], uv)
        for c, p, uv in zip(bal.obs_cam, bal.obs_pt, bal.obs_uv)])
    np.testing.assert_allclose(r, want, atol=5e-2, rtol=1e-3)


def test_snavely_jacobians_match_autodiff(rng):
    bal = _rand_bal(rng, n_cams=2, n_pts=5, pt_noise=0.02)
    prob = bal_to_snavely(bal)
    lin = linearize(prob, huber_delta=1e9)  # no robust reweighting

    def res_of(tangent, dpt, o):
        dc = jnp.zeros((prob.n_cams, 9)).at[prob.obs_cam[o]].set(tangent)
        dp = jnp.zeros_like(prob.points).at[prob.obs_pt[o]].set(dpt)
        p2 = apply_update(prob._replace(cam_fixed=jnp.zeros(prob.n_cams, bool)),
                          dc, dp)
        return residuals_only(p2)[o]

    for o in [3, 7]:
        Jc_num = jax.jacfwd(lambda tg: res_of(tg, jnp.zeros(3), o))(jnp.zeros(9))
        Jp_num = jax.jacfwd(lambda dp: res_of(jnp.zeros(9), dp, o))(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(lin.Jc[o]), np.asarray(Jc_num),
                                   atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(lin.Jp[o]), np.asarray(Jp_num),
                                   atol=1e-2, rtol=1e-2)


def test_snavely_solve_reduces_cost(rng):
    bal = _rand_bal(rng, n_cams=6, n_pts=120, noise=0.2, pt_noise=0.08)
    prob = bal_to_snavely(bal)
    res = bundle_adjust_snavely(prob, 25)
    assert float(res.initial_cost) > 100.0
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
    # per-camera focals and radial terms survive (never median-folded)
    assert np.asarray(res.problem.cam_fkk).shape == (6, 3)


def test_snavely_recovers_focal_and_radial(rng):
    bal = _rand_bal(rng, n_cams=8, n_pts=200, noise=0.0, pt_noise=0.0)
    true_fkk = bal.cam_params[:, 6:9].copy()
    # perturb non-gauge cameras' internals; solver must pull them back
    cam = bal.cam_params.copy()
    cam[1:, 6] *= 1.03
    cam[1:, 7] += 0.02
    bal = bal._replace(cam_params=cam)
    prob = bal_to_snavely(bal)
    # poses are exact: freeze them being near-exact is fine; optimize all
    res = bundle_adjust_snavely(prob, 40, huber_delta=1e9)
    fkk = np.asarray(res.problem.cam_fkk)
    assert float(res.final_cost) < 1e-4 * float(res.initial_cost)
    np.testing.assert_allclose(fkk[1:, 0], true_fkk[1:, 0], rtol=2e-3)


def test_snavely_pcg_path(rng):
    bal = _rand_bal(rng, n_cams=6, n_pts=100, noise=0.1, pt_noise=0.05)
    prob = bal_to_snavely(bal)
    res_e = bundle_adjust_snavely(prob, 15, solver="explicit")
    res_p = bundle_adjust_snavely(prob, 15, solver="pcg")
    assert float(res_p.final_cost) < float(res_p.initial_cost) * 5e-2
    # both solvers land in the same basin
    assert abs(float(res_e.final_cost) - float(res_p.final_cost)) < \
        0.1 * float(res_e.initial_cost)


def test_snavely_bal_roundtrip(rng):
    bal = _rand_bal(rng)
    prob = bal_to_snavely(bal)
    bal2 = snavely_to_bal(prob)
    np.testing.assert_allclose(bal2.cam_params, bal.cam_params, atol=1e-5)
    np.testing.assert_allclose(bal2.points, bal.points, atol=1e-6)
    np.testing.assert_allclose(bal2.obs_uv, bal.obs_uv, atol=1e-5)


def test_assemble_direct_matches_generic(rng):
    """The fused scalarized linearize+assembly (_assemble_direct — the
    BAL-scale fast path, round-5) must reproduce the generic
    linearize + assemble_blocks normal equations to f32 rounding,
    including robust weights, invalid-observation masking, and the cost."""
    from dr3_tpu.ba.schur_core import assemble_blocks, cam_onehot_matrix
    from dr3_tpu.ba.snavely import _assemble_direct, linearize

    d = _rand_bal(rng, n_cams=5, n_pts=80, noise=6.0, pt_noise=0.2)
    p = bal_to_snavely(d)
    # exercise the masking: zero some weights, blow up one point
    w = np.ones(p.n_obs, np.float32)
    w[::7] = 0.0
    pts = np.array(p.points)
    pts[3] = np.array([1e18, 1e18, 1e18])
    p = p._replace(obs_w=jnp.asarray(w), points=jnp.asarray(pts))

    hd = 2.0
    E = cam_onehot_matrix(p.obs_cam, p.n_cams)
    blocks_f, cost_f = _assemble_direct(p, E, hd)

    res = linearize(p, hd)
    active = (p.obs_w > 0) & res.valid
    blocks_g = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                               active, p.n_cams, p.n_points)

    np.testing.assert_allclose(float(cost_f), float(res.cost),
                               rtol=1e-5, atol=1e-4)
    O, P = p.n_obs, p.n_points
    # rebuild the coupling from the factored columns: AtB = Jc^T Jp
    atb = np.stack(
        [np.asarray(blocks_f.Jcu[i]) * np.asarray(blocks_f.Jpu[j])
         + np.asarray(blocks_f.Jcv[i]) * np.asarray(blocks_f.Jpv[j])
         for i in range(9) for j in range(3)], axis=-1).reshape(O, 9, 3)
    pairs = (("Hcc", np.asarray(blocks_f.Hcc)),
             ("bc", np.asarray(blocks_f.bc)),
             ("Hpp", np.asarray(blocks_f.Hpp9).reshape(P, 3, 3)),
             ("bp", np.asarray(blocks_f.bp)),
             ("AtB", atb))
    for name, a in pairs:
        b = np.asarray(getattr(blocks_g, name))
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-5 * scale,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(blocks_f.active),
                                  np.asarray(active))


def test_solve_pcg_direct_matches_generic(rng):
    """The scalarized PCG solve must reproduce schur_core's pcg path
    (same preconditioner, same termination) on identical blocks."""
    from dr3_tpu.ba.schur_core import (assemble_blocks, cam_onehot_matrix,
                                       solve_schur)
    from dr3_tpu.ba.snavely import (_assemble_direct, _solve_pcg_direct,
                                    linearize)

    d = _rand_bal(rng, n_cams=6, n_pts=100, noise=3.0, pt_noise=0.1)
    p = bal_to_snavely(d)
    hd = 2.0
    lam = jnp.asarray(1e-3)
    E = cam_onehot_matrix(p.obs_cam, p.n_cams)
    blocks_f, _ = _assemble_direct(p, E, hd)
    dc_f, dp_f = _solve_pcg_direct(blocks_f, lam, p.cam_fixed, E,
                                   cg_iters=200, cg_tol=1e-7, q_eta=0.0)

    res = linearize(p, hd)
    active = (p.obs_w > 0) & res.valid
    blocks_g = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                               active, p.n_cams, p.n_points)
    dc_g, dp_g, _ = solve_schur(blocks_g, lam, p.cam_fixed, method="pcg",
                                cg_iters=200, cg_tol=1e-7, q_eta=0.0)
    scale_c = np.abs(np.asarray(dc_g)).max() + 1e-9
    scale_p = np.abs(np.asarray(dp_g)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(dc_f), np.asarray(dc_g),
                               atol=5e-3 * scale_c)
    np.testing.assert_allclose(np.asarray(dp_f), np.asarray(dp_g),
                               atol=5e-3 * scale_p)


def test_solve_explicit_direct_matches_generic(rng):
    """The square-root dense-Schur fast path (Z^T Z factorization) must
    reproduce schur_core's explicit DENSE_SCHUR step on identical blocks,
    and the 'auto'-routed solver must reach the same final cost as pcg."""
    from dr3_tpu.ba.schur_core import assemble_blocks, cam_onehot_matrix, \
        solve_schur
    from dr3_tpu.ba.snavely import (_assemble_direct, _solve_explicit_direct,
                                    linearize)

    d = _rand_bal(rng, n_cams=6, n_pts=100, noise=3.0, pt_noise=0.1)
    p = bal_to_snavely(d)
    hd = 2.0
    lam = jnp.asarray(1e-3)
    E = cam_onehot_matrix(p.obs_cam, p.n_cams)
    blocks_f, _ = _assemble_direct(p, E, hd)
    dc_f, dp_f = _solve_explicit_direct(blocks_f, lam, p.cam_fixed, E)

    res = linearize(p, hd)
    active = (p.obs_w > 0) & res.valid
    blocks_g = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                               active, p.n_cams, p.n_points)
    dc_g, dp_g, _ = solve_schur(blocks_g, lam, p.cam_fixed,
                                method="explicit")
    scale_c = np.abs(np.asarray(dc_g)).max() + 1e-9
    scale_p = np.abs(np.asarray(dp_g)).max() + 1e-9
    np.testing.assert_allclose(np.asarray(dc_f), np.asarray(dc_g),
                               atol=2e-3 * scale_c)
    np.testing.assert_allclose(np.asarray(dp_f), np.asarray(dp_g),
                               atol=2e-3 * scale_p)

    # cost-trajectory parity: auto (-> zexplicit here) vs pcg
    r_z = bundle_adjust_snavely(p, 10, huber_delta=hd, solver="auto")
    r_p = bundle_adjust_snavely(p, 10, huber_delta=hd, solver="pcg",
                                cg_tol=1e-6, q_eta=0.0)
    cz, cp = float(r_z.final_cost), float(r_p.final_cost)
    assert cz <= cp * 1.05 + 1e-6, (cz, cp)
