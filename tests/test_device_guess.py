"""Traced initial guess must match the host (static last_known) version."""

import numpy as np

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.imu import preintegration as pim
from dmsa_lidar_slam_tpu.trajectory import continuous as ct
from dmsa_lidar_slam_tpu.trajectory.device_guess import traced_initial_guess


def setup(rng, C=6):
    old_o = rng.normal(scale=0.1, size=(C, 3))
    old_t = rng.normal(scale=1.0, size=(C, 3))
    old_stamps = np.linspace(0.0, 0.4, C)
    new_stamps = np.linspace(0.0, 0.4, C)
    shift = 0.1
    old_horizon = 0.4 + 0.001
    K = C - 1
    pr_rot = np.stack([np.eye(3)] * K) + rng.normal(scale=0.01, size=(K, 3, 3))
    # orthogonalize-ish (just use rotations)
    from scipy.spatial.transform import Rotation

    pr_rot = Rotation.from_rotvec(rng.normal(scale=0.02, size=(K, 3))).as_matrix()
    pr_vel = rng.normal(scale=0.05, size=(K, 3))
    pr_pos = rng.normal(scale=0.01, size=(K, 3))
    dt_ctrl = np.diff(new_stamps)
    gravity = np.array([0.0, 0.0, -9.805])
    return old_o, old_t, old_stamps, shift, old_horizon, new_stamps, pr_rot, pr_vel, pr_pos, dt_ctrl, gravity


def host_guess(args, use_imu):
    old_o, old_t, old_stamps, shift, old_horizon, new_stamps, pr_rot, pr_vel, pr_pos, dt_ctrl, gravity = args
    C = len(new_stamps)
    last_known = 0
    for k in range(C):
        if new_stamps[k] + shift < old_horizon:
            last_known = k
    return ct.initial_guess(
        cp.GlobalPoses(jnp.asarray(old_o), jnp.asarray(old_t)),
        jnp.asarray(old_stamps),
        0.0,
        shift,
        jnp.asarray(new_stamps),
        (jnp.asarray(pr_rot), jnp.asarray(pr_vel), jnp.asarray(pr_pos)),
        jnp.asarray(dt_ctrl),
        jnp.asarray(gravity),
        use_imu,
        last_known,
        C,
    )


def device_guess(args, use_imu):
    old_o, old_t, old_stamps, shift, old_horizon, new_stamps, pr_rot, pr_vel, pr_pos, dt_ctrl, gravity = args
    return traced_initial_guess(
        jnp.asarray(old_o),
        jnp.asarray(old_t),
        jnp.asarray(old_stamps),
        jnp.asarray(shift),
        jnp.asarray(old_horizon),
        jnp.asarray(new_stamps),
        jnp.asarray(pr_rot),
        jnp.asarray(pr_vel),
        jnp.asarray(pr_pos),
        jnp.asarray(dt_ctrl),
        jnp.asarray(gravity),
        jnp.asarray(use_imu),
    )


def test_matches_host_no_imu(rng):
    args = setup(rng)
    h = host_guess(args, False)
    d = device_guess(args, False)
    np.testing.assert_allclose(np.asarray(d.orient), np.asarray(h.orient), atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.transl), np.asarray(h.transl), atol=1e-9)


def test_matches_host_imu(rng):
    args = setup(rng)
    h = host_guess(args, True)
    d = device_guess(args, True)
    np.testing.assert_allclose(np.asarray(d.orient), np.asarray(h.orient), atol=1e-8)
    np.testing.assert_allclose(np.asarray(d.transl), np.asarray(h.transl), atol=1e-8)
