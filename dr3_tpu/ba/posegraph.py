"""Keyframe pose-graph optimization.

The reference README's explicit TODOs — "Add only KeyFrames for graph
optimization" and "Reduce the number of points for graph optimization"
(reference README.md:47-48) — describe exactly this component, which the
reference never built: optimize keyframe poses against relative-pose
constraints only (no landmarks), so the backend cost scales with keyframes
instead of points. Used as the cheap cross-host stage in the distributed
design (SURVEY §2 parallelism inventory: pose-graph over DCN, point-sharded
BA over ICI).

Formulation: constraints (i, j, T_ij_meas) with residual
    r = log( T_ij_meas^-1 · T_i · T_j^-1 )        in se(3), [6]
for world->frame poses T (so T_i T_j^-1 maps frame j -> frame i). Jacobians
are taken numerically-free via the standard small-angle approximation
(J_i = Ad stuff ~ identity-level accuracy is enough for GN on good
initializations); we instead build them exactly with jax.jacrev on the
residual — the graph is small (K keyframes), so autodiff cost is trivial
and correctness is guaranteed.

Solved by damped Gauss-Newton on the dense [6K, 6K] system with the first
pose fixed (gauge).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr3_tpu.geometry.lie import SE3


class PoseGraph(NamedTuple):
    wxyz: jnp.ndarray      # [K, 4] world->frame
    t: jnp.ndarray         # [K, 3]
    edge_i: jnp.ndarray    # [E] int32
    edge_j: jnp.ndarray    # [E] int32
    edge_wxyz: jnp.ndarray # [E, 4] measured T_ij (frame j expressed in i... see residual)
    edge_t: jnp.ndarray    # [E, 3]
    edge_w: jnp.ndarray    # [E] weight (0 = padding)
    fixed: jnp.ndarray     # [K] bool


def make_graph(poses: SE3, edge_i, edge_j, rel: SE3, weights=None,
               fixed=None) -> PoseGraph:
    """rel[e] must equal poses[i] @ poses[j]^-1 for a perfect graph."""
    e_i = jnp.asarray(edge_i, jnp.int32)
    if weights is None:
        weights = jnp.ones(e_i.shape[0], jnp.float32)
    if fixed is None:
        fixed = jnp.zeros(poses.wxyz.shape[0], bool).at[0].set(True)
    return PoseGraph(wxyz=poses.wxyz, t=poses.t, edge_i=e_i,
                     edge_j=jnp.asarray(edge_j, jnp.int32),
                     edge_wxyz=rel.wxyz, edge_t=rel.t,
                     edge_w=jnp.asarray(weights), fixed=jnp.asarray(fixed))


def _residuals(tangents, g: PoseGraph):
    """[E, 6] residuals at poses perturbed by per-pose tangents [K, 6]."""
    poses = SE3.exp(tangents) @ SE3(g.wxyz, g.t)
    Ti = poses[g.edge_i]
    Tj = poses[g.edge_j]
    meas = SE3(g.edge_wxyz, g.edge_t)
    err = meas.inverse() @ Ti @ Tj.inverse()
    return err.log() * g.edge_w[:, None]


def graph_cost(g: PoseGraph) -> jnp.ndarray:
    K = g.wxyz.shape[0]
    r = _residuals(jnp.zeros((K, 6)), g)
    return 0.5 * jnp.sum(r * r)


@functools.partial(jax.jit, static_argnums=(1,))
def optimize_pose_graph(g: PoseGraph, max_iters: int = 10,
                        lambda0: float = 1e-4):
    """Damped GN; returns (optimized SE3 poses, initial cost, final cost)."""
    K = g.wxyz.shape[0]
    E = g.edge_i.shape[0]

    def body(_, state):
        g_cur, lam, best = state
        zero = jnp.zeros((K, 6))
        r = _residuals(zero, g_cur).reshape(-1)
        J = jax.jacrev(lambda tau: _residuals(tau, g_cur).reshape(-1))(zero)
        J = J.reshape(E * 6, K * 6)
        H = J.T @ J
        b = -J.T @ r
        # gauge + damping
        fixed = jnp.repeat(g_cur.fixed, 6)
        keep = (~fixed).astype(H.dtype)
        H = H * keep[:, None] * keep[None, :] + jnp.diag(fixed.astype(H.dtype))
        b = b * keep
        H = H + (lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(K * 6, dtype=H.dtype))
        dx = jnp.linalg.solve(H, b).reshape(K, 6)
        dx = jnp.where(g_cur.fixed[:, None], 0.0, dx)
        poses_new = SE3.exp(dx) @ SE3(g_cur.wxyz, g_cur.t)
        poses_new = poses_new.normalize()
        g_new = g_cur._replace(wxyz=poses_new.wxyz, t=poses_new.t)
        new_cost = graph_cost(g_new)
        ok = (new_cost < best) & jnp.isfinite(new_cost)
        g_next = jax.tree.map(lambda a, b_: jnp.where(ok, b_, a), g_cur, g_new)
        lam2 = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                         jnp.minimum(lam * 4.0, 1e5))
        return g_next, lam2, jnp.where(ok, new_cost, best)

    c0 = graph_cost(g)
    g_fin, _, c_fin = jax.lax.fori_loop(
        0, max_iters, body, (g, jnp.asarray(lambda0, jnp.float32), c0))
    return SE3(g_fin.wxyz, g_fin.t), c0, c_fin
