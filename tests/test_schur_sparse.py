"""Observation-keyed Schur core vs a dense-W oracle, PCG path, and joint
intrinsics optimization (reference src/optimizer.cpp:144-166)."""

import jax
import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.problem import apply_update, linearize, make_problem, project
from dr3_tpu.ba.schur_core import (assemble_blocks, group_by_point,
                                   solve_schur)
from dr3_tpu.ba.schur_lm import bundle_adjust
from dr3_tpu.geometry.lie import SE3
from dr3_tpu.geometry.linalg import inv3x3
from tests.test_ba import INTR, synthetic_ba


def dense_schur_oracle(p, lam, huber_delta=5.0, jacobi=True):
    """The round-1 dense-[K, P, 6, 3] Schur solve, kept as the small-problem
    oracle for the observation-keyed assembly."""
    res = linearize(p, huber_delta)
    K, P = p.n_cams, p.n_points

    AtA = jnp.einsum("oij,oik->ojk", res.Jc, res.Jc)
    BtB = jnp.einsum("oij,oik->ojk", res.Jp, res.Jp)
    AtB = jnp.einsum("oij,oik->ojk", res.Jc, res.Jp)
    Atr = jnp.einsum("oij,oi->oj", res.Jc, res.r)
    Btr = jnp.einsum("oij,oi->oj", res.Jp, res.r)

    Hcc = jax.ops.segment_sum(AtA, p.obs_cam, num_segments=K)
    Hpp = jax.ops.segment_sum(BtB, p.obs_pt, num_segments=P)
    bc = -jax.ops.segment_sum(Atr, p.obs_cam, num_segments=K)
    bp = -jax.ops.segment_sum(Btr, p.obs_pt, num_segments=P)
    W = jnp.zeros((K, P, 6, 3), AtB.dtype).at[p.obs_cam, p.obs_pt].add(AtB)

    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + eye3 * (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None, :]
    Hcc_d = Hcc + eye6 * (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None, :]
    Hpp_inv = inv3x3(Hpp_d)

    WHinv = jnp.einsum("kpij,pjl->kpil", W, Hpp_inv)
    S = -jnp.einsum("kpil,qpml->kiqm", WHinv, W)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
    rhs = (bc - jnp.einsum("kpil,pl->ki", WHinv, bp)).reshape(K * 6)
    S = S.reshape(K * 6, K * 6)

    fixed = jnp.repeat(p.cam_fixed, 6)
    keep = (~fixed).astype(S.dtype)
    S = S * keep[:, None] * keep[None, :] + jnp.diag(fixed.astype(S.dtype))
    rhs = rhs * keep
    if jacobi:
        d = jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))
        dinv = 1.0 / d
        S = S * dinv[:, None] * dinv[None, :]
        rhs = rhs * dinv
    S = S + 1e-6 * jnp.eye(S.shape[0], dtype=S.dtype)
    L = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    dc = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    if jacobi:
        dc = dc * dinv
    dc = dc.reshape(K, 6)
    Wt_dc = jnp.einsum("kpil,ki->pl", W, dc)
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dc)
    return dc, dp


def _sparse_step(p, lam, method, huber_delta=5.0, d_max=None):
    res = linearize(p, huber_delta)
    active = (p.obs_w > 0) & res.valid
    blocks = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                             active, p.n_cams, p.n_points)
    return solve_schur(blocks, lam, p.cam_fixed, method=method,
                       d_max=d_max or p.n_cams, cg_iters=400, cg_tol=1e-7)


def test_explicit_matches_dense_oracle(rng):
    prob, *_ = synthetic_ba(rng, n_cams=5, n_pts=60, noise_px=0.4,
                            pose_noise=0.03)
    for lam in (1e-3, 1e-1):
        dc_o, dp_o = dense_schur_oracle(prob, lam)
        dc, dp, dg = _sparse_step(prob, lam, "explicit")
        assert dg is None
        np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_o),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o),
                                   atol=2e-4, rtol=1e-3)


def test_explicit_matches_dense_with_masked_obs(rng):
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=40, noise_px=0.2)
    w = np.ones(prob.n_obs, np.float32)
    w[:: 3] = 0.0  # masked padding rows
    prob = prob._replace(obs_w=jnp.asarray(w))
    dc_o, dp_o = dense_schur_oracle(prob, 1e-2)
    dc, dp, _ = _sparse_step(prob, 1e-2, "explicit")
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_o),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o),
                               atol=2e-4, rtol=1e-3)


def test_zexplicit_matches_dense_oracle(rng):
    """Square-root correction (Z^T Z, one scatter + one matmul) == the
    dense-W oracle — the exact-solve guarantee behind making zexplicit the
    window-BA default."""
    prob, *_ = synthetic_ba(rng, n_cams=5, n_pts=60, noise_px=0.4,
                            pose_noise=0.03)
    for lam in (1e-3, 1e-1):
        dc_o, dp_o = dense_schur_oracle(prob, lam)
        dc, dp, dg = _sparse_step(prob, lam, "zexplicit")
        assert dg is None
        np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_o),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o),
                                   atol=2e-4, rtol=1e-3)


def test_zexplicit_matches_dense_with_masked_obs(rng):
    """Masked/padding rows (zero-weight, clipped ids that collide with real
    observations) must contribute exactly zero through the Z scatter-add."""
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=40, noise_px=0.2)
    w = np.ones(prob.n_obs, np.float32)
    w[:: 3] = 0.0
    prob = prob._replace(obs_w=jnp.asarray(w))
    dc_o, dp_o = dense_schur_oracle(prob, 1e-2)
    dc, dp, _ = _sparse_step(prob, 1e-2, "zexplicit")
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_o),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o),
                               atol=2e-4, rtol=1e-3)


def test_zexplicit_intrinsics_matches_explicit(rng):
    """The bordered global-intrinsics system is shared code between the
    explicit and zexplicit branches; pin the joint solve anyway."""
    prob, *_ = synthetic_ba(rng, n_cams=5, n_pts=60, noise_px=0.4,
                            pose_noise=0.03)
    res = linearize(prob, 5.0, with_intrinsics=True)
    active = (prob.obs_w > 0) & res.valid
    blocks = assemble_blocks(res.r, res.Jc, res.Jp, prob.obs_cam,
                             prob.obs_pt, active, prob.n_cams,
                             prob.n_points, Jg=res.Jg)
    dc_e, dp_e, dg_e = solve_schur(blocks, 1e-2, prob.cam_fixed,
                                   method="explicit", d_max=prob.n_cams)
    dc_z, dp_z, dg_z = solve_schur(blocks, 1e-2, prob.cam_fixed,
                                   method="zexplicit")
    np.testing.assert_allclose(np.asarray(dc_z), np.asarray(dc_e),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dp_z), np.asarray(dp_e),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_z), np.asarray(dg_e),
                               atol=2e-4, rtol=1e-3)


def test_pcg_matches_dense_oracle(rng):
    prob, *_ = synthetic_ba(rng, n_cams=5, n_pts=60, noise_px=0.4,
                            pose_noise=0.03)
    dc_o, dp_o = dense_schur_oracle(prob, 1e-3)
    dc, dp, _ = _sparse_step(prob, 1e-3, "pcg")
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_o),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_o),
                               atol=5e-3, rtol=5e-3)


def test_pcg_q_eta_not_premature(rng):
    """The Q-stagnation exit (q_eta > 0) must implement Ceres' criterion
    ``i*(Q_{i-1} - Q_i) <= q_eta*|Q_i|``. A round-3 sign inversion
    (``q_cur - q_prev``, always <= 0) made it a tautology: EVERY q_eta>0
    solve exited after exactly 2 CG iterations regardless of q_eta's value.
    Discriminator: with a tiny forcing (q_eta=1e-6) the solve must keep
    iterating until Q truly stagnates — near the tight-tolerance solution —
    while a literal 2-iteration solve (the broken behavior, identical for
    any q_eta under the tautology) stays far from it."""
    prob, *_ = synthetic_ba(rng, n_cams=6, n_pts=80, noise_px=0.4,
                            pose_noise=0.03)
    res = linearize(prob, 5.0)
    active = (prob.obs_w > 0) & res.valid
    blocks = assemble_blocks(res.r, res.Jc, res.Jp, prob.obs_cam,
                             prob.obs_pt, active, prob.n_cams, prob.n_points)

    def solve(cg_iters, cg_tol, q_eta):
        dc, dp, _ = solve_schur(blocks, 1e-3, prob.cam_fixed, method="pcg",
                                d_max=prob.n_cams, cg_iters=cg_iters,
                                cg_tol=cg_tol, q_eta=q_eta)
        return np.asarray(dc), np.asarray(dp)

    dc_ref, dp_ref = solve(400, 1e-7, 0.0)    # near-exact
    dc_eta, dp_eta = solve(400, 1e-7, 1e-6)   # tiny Q-stagnation forcing
    dc_two, _ = solve(2, 1e-12, 0.0)          # the broken-criterion behavior

    err_eta = np.abs(dc_eta - dc_ref).max()
    err_two = np.abs(dc_two - dc_ref).max()
    assert err_two > 5e-3, err_two            # 2 iters is genuinely far off
    assert err_eta < 1e-3, (err_eta, err_two)  # tiny eta -> keeps iterating
    np.testing.assert_allclose(dp_eta, dp_ref, atol=1e-3, rtol=1e-3)
    # the production loose forcing is inexact by design (the outer LM loop
    # absorbs it) but must stay finite and within the same order of
    # magnitude as the exact camera step
    dc_l, dp_l = solve(400, 1e-7, 0.1)
    assert np.all(np.isfinite(dc_l)) and np.all(np.isfinite(dp_l))
    assert np.abs(dc_l - dc_ref).max() < 10 * err_two


def test_group_by_point_table(rng):
    P, O, D = 7, 20, 4
    obs_pt = jnp.asarray(rng.integers(0, P, O), jnp.int32)
    active = jnp.asarray(rng.uniform(size=O) > 0.3)
    tbl = np.asarray(group_by_point(obs_pt, active, P, D))
    opt = np.asarray(obs_pt)
    act = np.asarray(active)
    for p_id in range(P):
        want = set(np.nonzero((opt == p_id) & act)[0][:D])
        got = set(int(i) for i in tbl[p_id] if i < O)
        # every listed index must be a real active obs of this point;
        # all active obs (up to capacity D) must be listed
        assert got <= set(np.nonzero((opt == p_id) & act)[0])
        assert len(got) == min(len(np.nonzero((opt == p_id) & act)[0]), D)
        if len(want) <= D:
            assert got == want


def test_bundle_adjust_pcg_converges(rng):
    prob, cams_true, pts_true = synthetic_ba(rng, n_cams=8, n_pts=150,
                                             pose_noise=0.02)
    res = bundle_adjust(prob, 15, solver="pcg")
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    err_t = np.abs(np.asarray(res.problem.cam_t) - np.asarray(cams_true.t)).max()
    assert err_t < 2e-2


def test_bundle_adjust_auto_picks_pcg_for_many_cams(rng):
    # 80 cameras > _EXPLICIT_MAX_CAMS -> auto must route to PCG and converge
    n_cams, n_pts = 80, 300
    pts = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(8, 16, n_pts)], -1).astype(np.float32)
    taus = np.zeros((n_cams, 6), np.float32)
    taus[:, 0] = np.linspace(0, 4, n_cams)
    cams_true = SE3.exp(jnp.asarray(taus))
    # each camera sees a point window -> sparse coupling like a real sequence
    obs_cam, obs_pt = [], []
    for k in range(n_cams):
        lo = int(k * (n_pts - 60) / max(n_cams - 1, 1))
        obs_cam += [k] * 60
        obs_pt += list(range(lo, lo + 60))
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    uv = project(INTR, cams_true[obs_cam].apply(jnp.asarray(pts)[obs_pt]))
    uv = np.array(uv) + rng.normal(0, 0.2, (len(obs_cam), 2)).astype(np.float32)

    d = rng.normal(0, 0.01, (n_cams, 6)).astype(np.float32)
    d[:2] = 0.0
    cams0 = SE3.exp(jnp.asarray(d)) @ cams_true
    pts0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    prob = make_problem(cams0, pts0, INTR, obs_cam, obs_pt,
                        jnp.asarray(uv), cam_fixed=fixed)
    res = bundle_adjust(prob, 20)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2


def test_intrinsics_recovery(rng):
    # reference global_BA optimizes the shared 4-param intrinsics block
    # (src/optimizer.cpp:144-153): perturb fx/fy by 2% and recover to <0.1%.
    # The trajectory needs vertical motion + roll: under purely horizontal
    # translation fy is gauge-degenerate with a y-scale of the scene.
    n_cams, n_pts = 8, 200
    pts = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(8, 16, n_pts)], -1).astype(np.float32)
    taus = np.zeros((n_cams, 6), np.float32)
    i = np.arange(n_cams)
    taus[:, 0] = 0.4 * i
    taus[:, 1] = 0.35 * (-1.0) ** i          # vertical baseline
    taus[:, 4] = 0.015 * i                    # yaw
    taus[:, 5] = 0.12 * np.sin(i)             # roll couples fx/fy
    cams_true = SE3.exp(jnp.asarray(taus))
    obs_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    obs_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = project(INTR, cams_true[obs_cam].apply(jnp.asarray(pts)[obs_pt]))
    d = rng.normal(0, 0.01, (n_cams, 6)).astype(np.float32)
    d[:2] = 0.0
    cams0 = SE3.exp(jnp.asarray(d)) @ cams_true
    pts0 = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    bad = INTR * jnp.asarray([1.02, 0.98, 1.0, 1.0])
    prob = make_problem(cams0, pts0, bad, obs_cam, obs_pt, uv,
                        cam_fixed=fixed)
    res = bundle_adjust(prob, 25, optimize_intrinsics=True)
    fx, fy = float(res.problem.intrinsics[0]), float(res.problem.intrinsics[1])
    assert abs(fx - float(INTR[0])) / float(INTR[0]) < 1e-3, fx
    assert abs(fy - float(INTR[1])) / float(INTR[1]) < 1e-3, fy
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3


def test_intrinsics_fixed_without_flag(rng):
    prob, *_ = synthetic_ba(rng, n_cams=4, n_pts=60)
    res = bundle_adjust(prob, 8)
    np.testing.assert_array_equal(np.asarray(res.problem.intrinsics),
                                  np.asarray(prob.intrinsics))


def test_apply_update_intrinsics():
    prob, *_ = synthetic_ba(np.random.default_rng(0), n_cams=3, n_pts=20)
    d = jnp.asarray([1.0, -2.0, 0.5, 0.25])
    p2 = apply_update(prob, jnp.zeros((3, 6)), jnp.zeros_like(prob.points), d)
    np.testing.assert_allclose(np.asarray(p2.intrinsics - prob.intrinsics),
                               np.asarray(d), atol=1e-6)


def _step_with_g(p, lam, method, huber_delta=5.0):
    res = linearize(p, huber_delta, with_intrinsics=True)
    active = (p.obs_w > 0) & res.valid
    blocks = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                             active, p.n_cams, p.n_points, Jg=res.Jg)
    return solve_schur(blocks, lam, p.cam_fixed, method=method,
                       d_max=p.n_cams, cg_iters=600, cg_tol=1e-8)


def test_pcg_intrinsics_matches_explicit(rng):
    """The bordered-system CG (matrix-free cameras + explicit tiny global
    couplings) must reproduce the explicit joint solve — the round-2 gap
    where pcg raised NotImplementedError for G>0."""
    prob, *_ = synthetic_ba(rng, n_cams=6, n_pts=80, noise_px=0.4,
                            pose_noise=0.03)
    for lam in (1e-3, 1e-1):
        dc_e, dp_e, dg_e = _step_with_g(prob, lam, "explicit")
        dc_p, dp_p, dg_p = _step_with_g(prob, lam, "pcg")
        assert dg_e is not None and dg_p is not None
        np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_e),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(dc_p), np.asarray(dc_e),
                                   atol=5e-3, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(dp_p), np.asarray(dp_e),
                                   atol=5e-3, rtol=5e-3)


def test_intrinsics_recovery_pcg_many_cams(rng):
    """Joint intrinsics past _EXPLICIT_MAX_CAMS: the auto solver routes to
    PCG and must still recover a 2% focal perturbation (global_refine with
    optimize_intrinsics at global-BA scale, src/optimizer.cpp:144-153)."""
    n_cams, n_pts = 72, 260
    pts = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts),
                    rng.uniform(8, 16, n_pts)], -1).astype(np.float32)
    taus = np.zeros((n_cams, 6), np.float32)
    i = np.arange(n_cams)
    taus[:, 0] = 0.05 * i
    taus[:, 1] = 0.35 * (-1.0) ** i
    taus[:, 4] = 0.01 * i
    taus[:, 5] = 0.12 * np.sin(i)
    cams_true = SE3.exp(jnp.asarray(taus))
    obs_cam, obs_pt = [], []
    for k in range(n_cams):
        lo = int(k * (n_pts - 120) / (n_cams - 1))
        obs_cam += [k] * 120
        obs_pt += list(range(lo, lo + 120))
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    uv = project(INTR, cams_true[obs_cam].apply(jnp.asarray(pts)[obs_pt]))
    d = rng.normal(0, 0.005, (n_cams, 6)).astype(np.float32)
    d[:2] = 0.0
    cams0 = SE3.exp(jnp.asarray(d)) @ cams_true
    pts0 = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    bad = INTR * jnp.asarray([1.02, 0.98, 1.0, 1.0])
    prob = make_problem(cams0, pts0, bad, obs_cam, obs_pt, uv,
                        cam_fixed=fixed)
    res = bundle_adjust(prob, 25, optimize_intrinsics=True)  # auto -> pcg
    fx, fy = float(res.problem.intrinsics[0]), float(res.problem.intrinsics[1])
    assert abs(fx - float(INTR[0])) / float(INTR[0]) < 2e-3, fx
    assert abs(fy - float(INTR[1])) / float(INTR[1]) < 2e-3, fy
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2


def test_sorted_segment_sum_exact_and_precise(rng):
    """sorted_segment_sum == f64 ground truth to ~f32 eps per segment, even
    when the global prefix dwarfs individual segment sums (the case a plain
    f32 cumsum-difference loses completely)."""
    from dr3_tpu.ba.schur_core import sorted_segment_sum

    O, P = 40000, 3000
    seg = np.sort(rng.integers(0, P, O)).astype(np.int32)
    # positive-heavy magnitudes: prefix grows to ~O * avg, the adversarial
    # regime for cumsum-based segment sums
    x = (rng.uniform(0.5, 2.0, (O, 3)) *
         np.sign(rng.uniform(-0.2, 1.0, (O, 3)))).astype(np.float32)
    want = np.zeros((P, 3), np.float64)
    np.add.at(want, seg, x.astype(np.float64))
    got = np.asarray(sorted_segment_sum(jnp.asarray(x), jnp.asarray(seg), P))
    scale = np.abs(x).astype(np.float64)
    denom = np.zeros((P, 3), np.float64)
    np.add.at(denom, seg, scale)
    err = np.abs(got - want) / np.maximum(denom, 1e-12)
    assert err.max() < 1e-5, err.max()
    # empty segments exactly zero
    empty = np.setdiff1d(np.arange(P), seg)
    if empty.size:
        assert np.all(got[empty] == 0.0)


def test_solve_schur_point_sorted_matches_unsorted(rng):
    """point_sorted=True (compensated-scan reductions) reproduces the
    scatter-add path on a sorted problem, both solve methods."""
    p, *_ = synthetic_ba(rng, n_cams=6, n_pts=160, noise_px=0.3)
    order = np.argsort(np.asarray(p.obs_pt), kind="stable")
    p = p._replace(obs_cam=p.obs_cam[order], obs_pt=p.obs_pt[order],
                   obs_uv=p.obs_uv[order], obs_w=p.obs_w[order])
    res = linearize(p, 5.0)
    active = (p.obs_w > 0) & res.valid
    blocks = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                             active, p.n_cams, p.n_points)
    blocks_s = assemble_blocks(res.r, res.Jc, res.Jp, p.obs_cam, p.obs_pt,
                               active, p.n_cams, p.n_points,
                               point_sorted=True)
    np.testing.assert_allclose(np.asarray(blocks_s.Hpp),
                               np.asarray(blocks.Hpp), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(blocks_s.bp),
                               np.asarray(blocks.bp), rtol=2e-5, atol=1e-4)
    lam = jnp.asarray(1e-3)
    for method in ("explicit", "pcg"):
        dc0, dp0, _ = solve_schur(blocks, lam, p.cam_fixed, method=method,
                                  cg_tol=1e-6)
        dc1, dp1, _ = solve_schur(blocks_s, lam, p.cam_fixed, method=method,
                                  cg_tol=1e-6, point_sorted=True)
        np.testing.assert_allclose(np.asarray(dc1), np.asarray(dc0),
                                   rtol=5e-3, atol=5e-5)
        np.testing.assert_allclose(np.asarray(dp1), np.asarray(dp0),
                                   rtol=5e-3, atol=5e-4)
