"""Distributed Schur-complement bundle adjustment over a device mesh.

The SLAM analogue of sequence parallelism (SURVEY §5/§7): the growth axis of
the problem is landmarks/observations, so **points shard across the mesh**
and cameras replicate:

* each device owns P/n point blocks + exactly the observations of those
  points (co-partitioned on the host, since Hpp is 3x3 block-diagonal the
  point elimination is embarrassingly parallel);
* per-device partial reduced systems  S_d = Hcc_d - W_d Hpp_d^-1 W_d^T and
  rhs_d combine with one ``psum`` over ICI (this is the reduce stage the
  reference's Ceres DENSE_SCHUR does on 8 CPU threads,
  src/optimizer.cpp:155-166);
* the [6K, 6K] reduced camera solve is tiny and runs replicated — no
  broadcast needed afterward;
* point back-substitution is local (zero communication).

Per LM iteration the only collectives are: psum of the partial S/rhs
([6K,6K]+[6K]) and psum of the scalar cost — bandwidth independent of P.
Everything runs under one ``shard_map``; the host wrapper partitions the
observation table once and reassembles results.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from dr3_tpu.ba.problem import BAProblem, apply_update, linearize
from dr3_tpu.ba.schur_lm import BAResult
from dr3_tpu.geometry.linalg import inv3x3
from dr3_tpu.parallel.mesh import POINT_AXIS, make_mesh


class ShardedProblem(NamedTuple):
    """Host-side partition of a BAProblem over n shards (leading axis)."""

    base: BAProblem              # original (cams, intrinsics, gauge)
    points: np.ndarray           # [n, P_loc, 3]
    obs_cam: np.ndarray          # [n, O_loc]
    obs_pt_local: np.ndarray     # [n, O_loc] indices into the shard's points
    obs_uv: np.ndarray           # [n, O_loc, 2]
    obs_w: np.ndarray            # [n, O_loc]
    point_perm: np.ndarray       # [n * P_loc] original index per padded slot (-1 pad)


def partition_problem(p: BAProblem, n_shards: int) -> ShardedProblem:
    """Co-partition points and their observations across shards (host-side,
    done once per problem build; obs of point i go to i's shard)."""
    P_tot = p.n_points
    p_loc = -(-P_tot // n_shards)
    pt_shard = np.arange(P_tot) // p_loc  # contiguous blocks

    points = np.zeros((n_shards, p_loc, 3), np.float32)
    perm = np.full((n_shards, p_loc), -1, np.int64)
    pts_np = np.array(p.points)
    for s in range(n_shards):
        idx = np.nonzero(pt_shard == s)[0]
        points[s, : len(idx)] = pts_np[idx]
        perm[s, : len(idx)] = idx

    obs_cam = np.array(p.obs_cam)
    obs_pt = np.array(p.obs_pt)
    obs_uv = np.array(p.obs_uv)
    obs_w = np.array(p.obs_w)
    shard_of_obs = pt_shard[obs_pt]
    counts = [int((shard_of_obs == s).sum()) for s in range(n_shards)]
    o_loc = max(1, max(counts))

    oc = np.zeros((n_shards, o_loc), np.int32)
    op = np.zeros((n_shards, o_loc), np.int32)
    ouv = np.zeros((n_shards, o_loc, 2), np.float32)
    ow = np.zeros((n_shards, o_loc), np.float32)  # padding weight 0
    for s in range(n_shards):
        idx = np.nonzero(shard_of_obs == s)[0]
        k = len(idx)
        oc[s, :k] = obs_cam[idx]
        op[s, :k] = obs_pt[idx] - s * p_loc  # local point index
        ouv[s, :k] = obs_uv[idx]
        ow[s, :k] = obs_w[idx]
    return ShardedProblem(base=p, points=points, obs_cam=oc, obs_pt_local=op,
                          obs_uv=ouv, obs_w=ow, point_perm=perm.reshape(-1))


def _local_problem(cam_wxyz, cam_t, intr, cam_fixed, pts_l, oc, op, ouv, ow) -> BAProblem:
    return BAProblem(cam_wxyz=cam_wxyz, cam_t=cam_t, points=pts_l,
                     intrinsics=intr, obs_cam=oc, obs_pt=op, obs_uv=ouv,
                     obs_w=ow, cam_fixed=cam_fixed)


def _dist_ba_shardfn(cam_wxyz, cam_t, intr, cam_fixed, pts_l, oc, op, ouv, ow,
                     max_iters: int, huber_delta: float, lambda0: float):
    """Runs on each device under shard_map; *_l args are the local shard."""
    pts_l, oc, op, ouv, ow = (x[0] for x in (pts_l, oc, op, ouv, ow))
    K = cam_wxyz.shape[0]
    P_loc = pts_l.shape[0]
    eye3 = jnp.eye(3, dtype=pts_l.dtype)
    eye6 = jnp.eye(6, dtype=pts_l.dtype)

    def total_cost(prob):
        return jax.lax.psum(linearize(prob, huber_delta).cost, POINT_AXIS)

    def body(_, state):
        cw, ct, pts, lam, best_cost, n_acc = state
        prob = _local_problem(cw, ct, intr, cam_fixed, pts, oc, op, ouv, ow)
        res = linearize(prob, huber_delta)

        AtA = jnp.einsum("oij,oik->ojk", res.Jc, res.Jc)
        BtB = jnp.einsum("oij,oik->ojk", res.Jp, res.Jp)
        AtB = jnp.einsum("oij,oik->ojk", res.Jc, res.Jp)
        Atr = jnp.einsum("oij,oi->oj", res.Jc, res.r)
        Btr = jnp.einsum("oij,oi->oj", res.Jp, res.r)

        Hcc_part = jax.ops.segment_sum(AtA, oc, num_segments=K)
        bc_part = -jax.ops.segment_sum(Atr, oc, num_segments=K)
        Hpp = jax.ops.segment_sum(BtB, op, num_segments=P_loc)
        bp = -jax.ops.segment_sum(Btr, op, num_segments=P_loc)
        W = jnp.zeros((K, P_loc, 6, 3), AtB.dtype).at[oc, op].add(AtB)

        Hpp_d = Hpp + eye3 * (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1)
                              + 1e-8)[..., None, :]
        Hpp_inv = inv3x3(Hpp_d)
        WHinv = jnp.einsum("kpij,pjl->kpil", W, Hpp_inv)
        S_off_part = jnp.einsum("kpil,qpml->kiqm", WHinv, W)
        rhs_corr_part = jnp.einsum("kpil,pl->ki", WHinv, bp)

        # the ONE communication step per iteration: combine partial reduced
        # systems over ICI
        Hcc, bc, S_off, rhs_corr = jax.lax.psum(
            (Hcc_part, bc_part, S_off_part, rhs_corr_part), POINT_AXIS)

        Hcc_d = Hcc + eye6 * (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1)
                              + 1e-8)[..., None, :]
        S = -S_off
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
        rhs = (bc - rhs_corr).reshape(K * 6)
        S = S.reshape(K * 6, K * 6)

        fixed = jnp.repeat(cam_fixed, 6)
        keep = (~fixed).astype(S.dtype)
        S = S * keep[:, None] * keep[None, :] + jnp.diag(fixed.astype(S.dtype))
        rhs = rhs * keep
        d = jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))
        dinv = 1.0 / d
        S = S * dinv[:, None] * dinv[None, :] + 1e-6 * jnp.eye(K * 6, dtype=S.dtype)
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, rhs * dinv, lower=True)
        dc = (jax.scipy.linalg.solve_triangular(L.T, y, lower=False) * dinv
              ).reshape(K, 6)

        # local back-substitution (no comms)
        Wt_dc = jnp.einsum("kpil,ki->pl", W, dc)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dc)

        newp = apply_update(prob, dc, dp)
        new_cost = total_cost(newp)
        ok = (new_cost < best_cost) & jnp.isfinite(new_cost)
        cw2 = jnp.where(ok, newp.cam_wxyz, cw)
        ct2 = jnp.where(ok, newp.cam_t, ct)
        pts2 = jnp.where(ok, newp.points, pts)
        lam2 = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                         jnp.minimum(lam * 2.0, 1e6))
        best2 = jnp.where(ok, new_cost, best_cost)
        return cw2, ct2, pts2, lam2, best2, n_acc + ok.astype(jnp.int32)

    prob0 = _local_problem(cam_wxyz, cam_t, intr, cam_fixed, pts_l, oc, op, ouv, ow)
    cost0 = total_cost(prob0)
    init = (cam_wxyz, cam_t, pts_l, jnp.asarray(lambda0, jnp.float32), cost0,
            jnp.asarray(0, jnp.int32))
    cw, ct, pts, lam, cost, n_acc = jax.lax.fori_loop(0, max_iters, body, init)
    return cw, ct, pts[None], cost0, cost, n_acc, lam


def dist_bundle_adjust(problem: BAProblem, n_devices: int | None = None,
                       max_iters: int = 20, huber_delta: float = 5.0,
                       lambda0: float = 1e-3, mesh=None) -> BAResult:
    """Drop-in distributed counterpart of ba.bundle_adjust."""
    mesh = mesh or make_mesh(n_devices)
    n = mesh.devices.size
    sp = partition_problem(problem, n)

    fn = functools.partial(_dist_ba_shardfn, max_iters=max_iters,
                           huber_delta=huber_delta, lambda0=lambda0)
    shard = P(POINT_AXIS)
    rep = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep, rep, rep, rep, shard, shard, shard, shard, shard),
        out_specs=(rep, rep, shard, rep, rep, rep, rep),
        check_vma=False,
    )
    cw, ct, pts_sharded, cost0, cost, n_acc, lam = mapped(
        problem.cam_wxyz, problem.cam_t, problem.intrinsics, problem.cam_fixed,
        jnp.asarray(sp.points), jnp.asarray(sp.obs_cam),
        jnp.asarray(sp.obs_pt_local), jnp.asarray(sp.obs_uv),
        jnp.asarray(sp.obs_w))

    # reassemble points into original order
    flat = np.array(pts_sharded).reshape(-1, 3)
    pts_out = np.array(problem.points)
    mask = sp.point_perm >= 0
    pts_out[sp.point_perm[mask]] = flat[mask]

    new_prob = problem._replace(cam_wxyz=jnp.asarray(np.array(cw)),
                                cam_t=jnp.asarray(np.array(ct)),
                                points=jnp.asarray(pts_out))
    return BAResult(problem=new_prob, initial_cost=jnp.asarray(np.array(cost0)),
                    final_cost=jnp.asarray(np.array(cost)),
                    n_accepted=jnp.asarray(np.array(n_acc)),
                    lambda_final=jnp.asarray(np.array(lam)))
