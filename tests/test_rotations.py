"""Rotation primitives vs scipy.spatial.transform golden references."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import rotations as rot


def random_axang(rng, n, max_angle=np.pi - 0.05):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axes * angles


def test_skew(rng):
    v = rng.normal(size=(5, 3))
    S = np.asarray(rot.skew(jnp.asarray(v)))
    for i in range(5):
        w = rng.normal(size=3)
        np.testing.assert_allclose(S[i] @ w, np.cross(v[i], w), atol=1e-12)


def test_axang2rotm_matches_scipy(rng):
    aa = random_axang(rng, 64)
    R = np.asarray(rot.axang2rotm(jnp.asarray(aa)))
    R_ref = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_axang2rotm_zero():
    R = np.asarray(rot.axang2rotm(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)


def test_rotm2axang_roundtrip(rng):
    aa = random_axang(rng, 64)
    back = np.asarray(rot.rotm2axang(rot.axang2rotm(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-9)


def test_rotm2axang_near_pi(rng):
    aa = random_axang(rng, 16)
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * (np.pi - 1e-4)
    back = np.asarray(rot.rotm2axang(rot.axang2rotm(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-6)


def test_quat_roundtrip(rng):
    aa = random_axang(rng, 32)
    q = np.asarray(rot.axang2quat(jnp.asarray(aa)))
    q_ref = Rotation.from_rotvec(aa).as_quat()  # scipy: (x,y,z,w)
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    sign = np.sign(q_ref[:, :1]) * np.sign(q[:, :1])
    np.testing.assert_allclose(q, q_ref * sign, atol=1e-12)


def test_slerp_matches_scipy(rng):
    aa = random_axang(rng, 2)
    ts = np.linspace(0.0, 1.0, 7)
    sci = Slerp([0.0, 1.0], Rotation.from_rotvec(aa))
    for t in ts:
        got = np.asarray(rot.slerp(jnp.asarray(aa[0]), jnp.asarray(aa[1]), t))
        want = sci(t).as_rotvec()
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_slerp_endpoints(rng):
    aa = random_axang(rng, 2)
    np.testing.assert_allclose(
        np.asarray(rot.slerp(jnp.asarray(aa[0]), jnp.asarray(aa[1]), 0.0)), aa[0], atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(rot.slerp(jnp.asarray(aa[0]), jnp.asarray(aa[1]), 1.0)), aa[1], atol=1e-9
    )


def test_rodrigues_between(rng):
    for _ in range(10):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        R = np.asarray(rot.rodrigues_between(jnp.asarray(a), jnp.asarray(b)))
        got = R @ (a / np.linalg.norm(a))
        np.testing.assert_allclose(got, b / np.linalg.norm(b), atol=1e-9)


def test_gradients_finite(rng):
    import jax

    aa = jnp.asarray(random_axang(rng, 4))
    g = jax.jacobian(lambda x: rot.axang2rotm(x).sum())(aa[0])
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.jacobian(lambda x: rot.axang2rotm(x).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g0)))
