"""SO3/SE3 unit tests: group axioms, exp/log round trips, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dr3_tpu.geometry.lie import SE3, SO3, hat, matrix_to_quat, quat_to_matrix


def random_so3(rng, batch=()):
    w = rng.normal(size=batch + (3,)).astype(np.float32)
    return SO3.exp(jnp.asarray(w))


def test_so3_identity():
    r = SO3.identity()
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(r.apply(v), v, atol=1e-6)
    np.testing.assert_allclose(r.matrix(), np.eye(3), atol=1e-6)


def clamp_angle(w, max_norm=3.0):
    """Scale rotation vectors so |theta| < pi (log is only unique there)."""
    n = np.linalg.norm(w, axis=-1, keepdims=True)
    return np.where(n > max_norm, w * (max_norm / n), w).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    w = clamp_angle(rng.normal(size=(64, 3)).astype(np.float32))
    back = np.asarray(SO3.exp(jnp.asarray(w)).log())
    np.testing.assert_allclose(back, w, atol=2e-5)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = SO3.exp(w).wxyz
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(np.asarray(SO3.exp(w).log()), np.asarray(w), atol=1e-7)


def test_so3_matrix_quat_roundtrip(rng):
    r = random_so3(rng, (32,))
    m = r.matrix()
    q2 = matrix_to_quat(m)
    # q and -q are the same rotation; matrix round-trip must match
    np.testing.assert_allclose(np.asarray(quat_to_matrix(q2)), np.asarray(m), atol=1e-5)


def test_so3_compose_matches_matrix(rng):
    a = random_so3(rng)
    b = random_so3(rng)
    np.testing.assert_allclose(
        np.asarray((a @ b).matrix()), np.asarray(a.matrix() @ b.matrix()), atol=1e-5
    )


def test_so3_inverse(rng):
    a = random_so3(rng, (8,))
    v = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(a.inverse().apply(a.apply(v))), np.asarray(v), atol=1e-5
    )


def test_se3_exp_log_roundtrip(rng):
    t = rng.normal(size=(64, 6)).astype(np.float32)
    t[:, 3:] = clamp_angle(t[:, 3:])
    back = np.asarray(SE3.exp(jnp.asarray(t)).log())
    np.testing.assert_allclose(back, t, atol=1e-4)


def test_se3_matrix_apply(rng):
    tau = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    T = SE3.exp(tau)
    v = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    vh = jnp.concatenate([v, jnp.ones((10, 1))], axis=-1)
    expected = (vh @ T.matrix().T)[:, :3]
    np.testing.assert_allclose(np.asarray(T.apply(v)), np.asarray(expected), atol=1e-5)


def test_se3_compose_inverse(rng):
    a = SE3.exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    b = SE3.exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    c = a @ b
    ident = (c @ c.inverse()).matrix()
    np.testing.assert_allclose(np.asarray(ident), np.eye(4), atol=1e-5)


def test_se3_center():
    # pose T_f_w with R=I, t=(1,2,3): center = -t
    T = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(T.center()), [-1, -2, -3], atol=1e-6)


def test_se3_retract_matches_exp_compose(rng):
    T = SE3.exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    d = jnp.asarray(0.01 * rng.normal(size=(6,)).astype(np.float32))
    expected = (SE3.exp(d) @ T).matrix()
    np.testing.assert_allclose(np.asarray(T.retract(d).matrix()), np.asarray(expected), atol=1e-6)


def test_hat_antisymmetric():
    v = jnp.asarray([1.0, 2.0, 3.0])
    H = hat(v)
    np.testing.assert_allclose(np.asarray(H), -np.asarray(H).T, atol=1e-7)
    np.testing.assert_allclose(np.asarray(H @ v), 0.0, atol=1e-7)


def test_jit_vmap_compatible(rng):
    t = rng.normal(size=(16, 6)).astype(np.float32)
    t[:, 3:] = clamp_angle(t[:, 3:])
    taus = jnp.asarray(t)

    @jax.jit
    def f(taus):
        T = SE3.exp(taus)
        return T.log()

    np.testing.assert_allclose(np.asarray(f(taus)), np.asarray(taus), atol=1e-4)


def test_pytree_registration():
    T = SE3.identity((4,))
    leaves = jax.tree.leaves(T)
    assert len(leaves) == 2
    T2 = jax.tree.map(lambda x: x * 1.0, T)
    assert isinstance(T2, SE3)


def test_synth_npse3_matches_se3(rng):
    """Pin the fixture generator's pure-numpy pose math (tests/synth.py
    NpSE3/_pose_rt) to the pipeline's SE3 — a convention change in
    geometry/lie.py must fail here, not silently desynchronize ground
    truth from the estimator (advisor round-2 finding)."""
    from tests.synth import NpSE3, _pose_rt

    taus = rng.normal(size=(32, 6)).astype(np.float32)
    taus[:, 3:] = clamp_angle(taus[:, 3:])
    taus[0, 3:] = 0.0                      # exactly zero rotation
    taus[1, 3:] = [1e-9, 0.0, 0.0]        # small-theta branch
    for tau in taus:
        T_np = NpSE3.exp(tau)
        T_jx = SE3.exp(jnp.asarray(tau))
        M = np.asarray(T_jx.matrix())
        np.testing.assert_allclose(T_np.R, M[:3, :3], atol=1e-5)
        np.testing.assert_allclose(T_np.t, M[:3, 3], atol=1e-5)
        np.testing.assert_allclose(T_np.center(), np.asarray(T_jx.center()),
                                   atol=1e-5)
        R, t = _pose_rt(T_jx)  # quaternion->matrix path used by the renderer
        np.testing.assert_allclose(R, M[:3, :3], atol=1e-5)
        np.testing.assert_allclose(t, M[:3, 3], atol=1e-6)
