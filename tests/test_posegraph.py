"""Pose-graph optimization tests: chains with loop closures."""

import jax.numpy as jnp
import numpy as np

from dr3_tpu.ba.posegraph import graph_cost, make_graph, optimize_pose_graph
from dr3_tpu.geometry.lie import SE3


def chain_poses(rng, n=8, noise=0.0):
    """Ground-truth chain of poses + noisy odometry estimates."""
    taus = np.zeros((n, 6), np.float32)
    taus[:, 0] = 0.5 * np.arange(n)
    taus[:, 4] = 0.04 * np.arange(n)
    gt = SE3.exp(jnp.asarray(taus))
    if noise == 0:
        return gt, gt
    pert = np.concatenate([rng.normal(0, noise, (n, 3)),
                           rng.normal(0, noise / 2, (n, 3))], -1).astype(np.float32)
    pert[0] = 0  # gauge pose exact
    est = SE3.exp(jnp.asarray(pert)) @ gt
    return gt, est


def edges_from(gt: SE3, pairs):
    i = [a for a, _ in pairs]
    j = [b for _, b in pairs]
    rel = gt[jnp.asarray(i)] @ gt[jnp.asarray(j)].inverse()
    return i, j, rel


def test_perfect_graph_zero_cost(rng):
    gt, _ = chain_poses(rng, 6)
    pairs = [(k + 1, k) for k in range(5)]
    i, j, rel = edges_from(gt, pairs)
    g = make_graph(gt, i, j, rel)
    assert float(graph_cost(g)) < 1e-8


def test_chain_with_loop_closure_converges(rng):
    n = 8
    gt, est = chain_poses(rng, n, noise=0.05)
    pairs = [(k + 1, k) for k in range(n - 1)] + [(n - 1, 0)]  # loop closure
    i, j, rel = edges_from(gt, pairs)
    g = make_graph(SE3(est.wxyz, est.t), i, j, rel)
    poses, c0, c1 = optimize_pose_graph(g, 15)
    assert float(c1) < float(c0) * 1e-3
    # translations must land on ground truth (gauge = pose 0 fixed)
    np.testing.assert_allclose(np.asarray(poses.t), np.asarray(gt.t), atol=2e-3)


def test_fixed_pose_untouched(rng):
    gt, est = chain_poses(rng, 5, noise=0.05)
    pairs = [(k + 1, k) for k in range(4)]
    i, j, rel = edges_from(gt, pairs)
    g = make_graph(SE3(est.wxyz, est.t), i, j, rel)
    poses, _, _ = optimize_pose_graph(g, 10)
    np.testing.assert_allclose(np.asarray(poses.t[0]), np.asarray(est.t[0]), atol=1e-7)


def test_weighted_edges(rng):
    # zero-weight (padding) edges must not affect the solution
    gt, est = chain_poses(rng, 5, noise=0.04)
    pairs = [(k + 1, k) for k in range(4)]
    i, j, rel = edges_from(gt, pairs)
    # append a bogus edge with weight 0
    i2 = list(i) + [0]
    j2 = list(j) + [4]
    bogus = SE3.exp(jnp.asarray([[5.0, 5, 5, 0.5, 0.5, 0.5]]))
    rel2 = SE3(jnp.concatenate([rel.wxyz, bogus.wxyz]),
               jnp.concatenate([rel.t, bogus.t]))
    w = jnp.asarray([1.0] * 4 + [0.0])
    g = make_graph(SE3(est.wxyz, est.t), i2, j2, rel2, weights=w)
    poses, c0, c1 = optimize_pose_graph(g, 15)
    assert float(c1) < float(c0) * 1e-2
    np.testing.assert_allclose(np.asarray(poses.t), np.asarray(gt.t), atol=5e-3)
