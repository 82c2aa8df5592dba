"""Quaternion math vs closed-form / scipy oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from agility_tpu.core import quat as qm

scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation


def rand_quat(rng, n=32):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy(rng):
    a, b = rand_quat(rng), rand_quat(rng)
    got = np.asarray(qm.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (scipy_rot.from_quat(a) * scipy_rot.from_quat(b)).as_quat()
    # scipy canonicalizes sign sometimes; compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng)
    v = rng.normal(size=(32, 3))
    got = np.asarray(qm.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", scipy_rot.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(qm.quat_rotate_inverse(jnp.asarray(q), jnp.asarray(got)))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_quat_to_rotmat(rng):
    q = rand_quat(rng)
    got = np.asarray(qm.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(got, scipy_rot.from_quat(q).as_matrix(), atol=1e-5)


def test_euler_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(32, 3))
    q = qm.quat_from_euler_xyz(jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2]))
    r, p, y = qm.euler_from_quat(q)
    np.testing.assert_allclose(np.asarray(r), rpy[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(p), rpy[:, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), rpy[:, 2], atol=1e-5)


def test_heading_and_yaw_apply(rng):
    q = rand_quat(rng)
    h = np.asarray(qm.calc_heading(jnp.asarray(q)))
    xdir = scipy_rot.from_quat(q).as_matrix()[:, :, 0]
    np.testing.assert_allclose(h, np.arctan2(xdir[:, 1], xdir[:, 0]), atol=1e-5)
    # heading_quat_inv cancels heading: rotated x-axis has zero yaw
    qinv = qm.heading_quat_inv(jnp.asarray(q))
    qz = qm.quat_mul(qinv, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(qm.calc_heading(qz)), 0.0, atol=1e-5)


def test_integrate_constant_omega(rng):
    q0 = jnp.asarray(rand_quat(rng, 8))
    w = jnp.asarray(rng.normal(size=(8, 3)))
    dt = 0.01
    # 100 small steps == one big exact step
    q = q0
    for _ in range(100):
        q = qm.quat_integrate(q, w, dt)
    q_exact = qm.quat_integrate(q0, w, 1.0)
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q_exact), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    q0, q1 = jnp.asarray(rand_quat(rng, 8)), jnp.asarray(rand_quat(rng, 8))
    np.testing.assert_allclose(np.asarray(qm.slerp(q0, q1, jnp.zeros(8))), np.asarray(q0), atol=1e-5)
    s1 = np.abs(np.sum(np.asarray(qm.slerp(q0, q1, jnp.ones(8))) * np.asarray(q1), axis=-1))
    np.testing.assert_allclose(s1, 1.0, atol=1e-5)
    mid = np.asarray(qm.slerp(q0, q1, jnp.full(8, 0.5)))
    d0 = np.abs(np.sum(mid * np.asarray(q0), axis=-1))
    d1 = np.abs(np.sum(mid * np.asarray(q1), axis=-1))
    np.testing.assert_allclose(d0, d1, atol=1e-4)


def test_wrap_to_pi():
    a = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.3])
    got = np.asarray(qm.wrap_to_pi(a))
    np.testing.assert_allclose(got, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.3], atol=1e-5)
