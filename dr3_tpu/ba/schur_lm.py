"""Levenberg-Marquardt bundle adjustment on the Schur complement.

JAX-native replacement for the reference's Ceres solve — LM with
DENSE_SCHUR + SCHUR_JACOBI on 8 CPU threads (reference
src/optimizer.cpp:155-170). The reference's two recorded failure modes —
"Cholesky Decomposition fails during BA" and "Optimization is ridiculously
slow" (README.md:44-45) — are addressed by construction:

* **Jacobi (diagonal) scaling** of the reduced camera system plus Marquardt
  damping keeps the Cholesky well-conditioned in f32;
* the entire solve is one fused XLA program: Hessian blocks assemble via
  ``segment_sum`` over the observation table, the point blocks Hpp are 3x3
  block-diagonal and invert in closed form (embarrassingly parallel), and
  the reduced system S = Hcc - W Hpp^-1 W^T is a pair of einsums that land
  on the MXU. No sparse bookkeeping, no per-residual dispatch.

Structure (standard Schur trick, matching DENSE_SCHUR's math):
    [Hcc  W ] [dc]   [bc]
    [W^T Hpp] [dp] = [bp]
    S dc = bc - W Hpp^-1 bp,   dp = Hpp^-1 (bp - W^T dc)

The LM loop runs a fixed number of iterations under ``lax.fori_loop`` with
accept/reject by cost comparison (lambda x2 up on reject, /3 down on
accept) — static control flow, fully jittable and differentiable-free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dr3_tpu.ba.problem import BAProblem, apply_update, linearize
from dr3_tpu.geometry.linalg import chol_solve_small, inv3x3


class BAResult(NamedTuple):
    problem: BAProblem
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    n_accepted: jnp.ndarray
    lambda_final: jnp.ndarray


def _assemble(p: BAProblem, huber_delta: float):
    """Build all normal-equation blocks from one linearization pass."""
    res = linearize(p, huber_delta)
    K, P = p.n_cams, p.n_points

    # per-observation blocks
    AtA = jnp.einsum("oij,oik->ojk", res.Jc, res.Jc)  # [O, 6, 6]
    BtB = jnp.einsum("oij,oik->ojk", res.Jp, res.Jp)  # [O, 3, 3]
    AtB = jnp.einsum("oij,oik->ojk", res.Jc, res.Jp)  # [O, 6, 3]
    Atr = jnp.einsum("oij,oi->oj", res.Jc, res.r)     # [O, 6]
    Btr = jnp.einsum("oij,oi->oj", res.Jp, res.r)     # [O, 3]

    Hcc = jax.ops.segment_sum(AtA, p.obs_cam, num_segments=K)   # [K, 6, 6]
    Hpp = jax.ops.segment_sum(BtB, p.obs_pt, num_segments=P)    # [P, 3, 3]
    bc = -jax.ops.segment_sum(Atr, p.obs_cam, num_segments=K)   # [K, 6]
    bp = -jax.ops.segment_sum(Btr, p.obs_pt, num_segments=P)    # [P, 3]

    # dense coupling W as [K, 6, P, 3] via scatter-add over (cam, pt)
    W = jnp.zeros((K, P, 6, 3), AtB.dtype).at[p.obs_cam, p.obs_pt].add(AtB)
    return res.cost, Hcc, Hpp, W, bc, bp


def _solve_schur(Hcc, Hpp, W, bc, bp, lam, cam_fixed, jacobi: bool = True):
    """One damped Schur solve -> (dcam [K,6], dpt [P,3])."""
    K, P = Hcc.shape[0], Hpp.shape[0]
    eye3 = jnp.eye(3, dtype=Hpp.dtype)
    eye6 = jnp.eye(6, dtype=Hcc.dtype)

    # Marquardt damping: lambda * diag (with absolute floor for empty blocks)
    Hpp_d = Hpp + eye3 * (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8)[..., None, :]
    Hcc_d = Hcc + eye6 * (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8)[..., None, :]

    Hpp_inv = inv3x3(Hpp_d)  # [P, 3, 3]

    # S = Hcc_blockdiag - W Hpp^-1 W^T   (dense [6K, 6K]; MXU einsums)
    WHinv = jnp.einsum("kpij,pjl->kpil", W, Hpp_inv)            # [K, P, 6, 3]
    S_off = jnp.einsum("kpil,qpml->kiqm", WHinv, W)             # [K, 6, K, 6]
    S = -S_off
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
    rhs = bc - jnp.einsum("kpil,pl->ki", WHinv, bp)             # [K, 6]

    S = S.reshape(K * 6, K * 6)
    rhs = rhs.reshape(K * 6)

    # gauge fixing: zero rows/cols of fixed cameras, identity diagonal
    fixed = jnp.repeat(cam_fixed, 6)
    keep = (~fixed).astype(S.dtype)
    S = S * keep[:, None] * keep[None, :] + jnp.diag(fixed.astype(S.dtype))
    rhs = rhs * keep

    if jacobi:
        d = jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))
        dinv = 1.0 / d
        S = S * dinv[:, None] * dinv[None, :]
        rhs = rhs * dinv

    # Cholesky with fallback jitter
    S = S + 1e-6 * jnp.eye(S.shape[0], dtype=S.dtype)
    L = jnp.linalg.cholesky(S)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    dc = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    if jacobi:
        dc = dc * dinv
    dc = dc.reshape(K, 6)

    # back-substitute points: dp = Hpp^-1 (bp - W^T dc)
    Wt_dc = jnp.einsum("kpil,ki->pl", W, dc)                    # [P, 3]
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dc)
    return dc, dp


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def bundle_adjust(problem: BAProblem, max_iters: int = 20,
                  huber_delta: float = 5.0, jacobi: bool = True,
                  lambda0: float = 1e-3) -> BAResult:
    """Full LM loop (global_BA parity, src/optimizer.cpp:131-175)."""
    cost0 = linearize(problem, huber_delta).cost

    def body(_, state):
        p, lam, best_cost, n_acc = state
        cost, Hcc, Hpp, W, bc, bp = _assemble(p, huber_delta)
        dc, dp = _solve_schur(Hcc, Hpp, W, bc, bp, lam, p.cam_fixed, jacobi)
        p_new = apply_update(p, dc, dp)
        new_cost = linearize(p_new, huber_delta).cost
        ok = (new_cost < best_cost) & jnp.isfinite(new_cost)
        p_next = jax.tree.map(lambda a, b: jnp.where(ok, b, a), p, p_new)
        lam_next = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                             jnp.minimum(lam * 2.0, 1e6))
        best = jnp.where(ok, new_cost, best_cost)
        return p_next, lam_next, best, n_acc + ok.astype(jnp.int32)

    init = (problem, jnp.asarray(lambda0, jnp.float32), cost0, jnp.asarray(0, jnp.int32))
    p_fin, lam_fin, cost_fin, n_acc = jax.lax.fori_loop(0, max_iters, body, init)
    return BAResult(problem=p_fin, initial_cost=cost0, final_cost=cost_fin,
                    n_accepted=n_acc, lambda_final=lam_fin)


@functools.partial(jax.jit, static_argnums=(1, 2))
def pose_only_adjust(problem: BAProblem, max_iters: int = 10,
                     huber_delta: float = 5.0) -> BAResult:
    """Motion-only BA: optimize camera poses with points frozen (the VO
    'pose_optimizer' stage the reference registers a timer for but never
    implemented, src/handler.cpp:22-26). Plain damped GN on [K, 6] blocks —
    no Schur needed."""
    cost0 = linearize(problem, huber_delta).cost
    K = problem.n_cams
    eye6 = jnp.eye(6, dtype=problem.cam_t.dtype)

    def body(_, state):
        p, lam, best_cost, n_acc = state
        res = linearize(p, huber_delta)
        AtA = jnp.einsum("oij,oik->ojk", res.Jc, res.Jc)
        Atr = jnp.einsum("oij,oi->oj", res.Jc, res.r)
        H = jax.ops.segment_sum(AtA, p.obs_cam, num_segments=K)
        b = -jax.ops.segment_sum(Atr, p.obs_cam, num_segments=K)
        H = H + eye6 * (lam * jnp.diagonal(H, axis1=-2, axis2=-1) + 1e-8)[..., None, :]
        dc = chol_solve_small(H, b)
        p_new = apply_update(p, dc, jnp.zeros_like(p.points))
        new_cost = linearize(p_new, huber_delta).cost
        ok = (new_cost < best_cost) & jnp.isfinite(new_cost)
        p_next = jax.tree.map(lambda a, b_: jnp.where(ok, b_, a), p, p_new)
        lam_next = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-9),
                             jnp.minimum(lam * 2.0, 1e6))
        best = jnp.where(ok, new_cost, best_cost)
        return p_next, lam_next, best, n_acc + ok.astype(jnp.int32)

    init = (problem, jnp.asarray(1e-3, jnp.float32), cost0, jnp.asarray(0, jnp.int32))
    p_fin, lam_fin, cost_fin, n_acc = jax.lax.fori_loop(0, max_iters, body, init)
    return BAResult(problem=p_fin, initial_cost=cost0, final_cost=cost_fin,
                    n_accepted=n_acc, lambda_final=lam_fin)
