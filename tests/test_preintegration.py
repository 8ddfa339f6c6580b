"""IMU preintegration vs a direct numpy transcription of the update law
(ImuPreintegration.h:53-94) and physical consistency checks."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.imu import preintegration as pi


def np_right_jacobian(rot_vec):
    norm = np.linalg.norm(rot_vec)
    K = np.array(
        [
            [0, -rot_vec[2], rot_vec[1]],
            [rot_vec[2], 0, -rot_vec[0]],
            [-rot_vec[1], rot_vec[0], 0],
        ]
    )
    if norm < 1e-5:
        return np.eye(3)
    return (
        np.eye(3)
        - ((1 - np.cos(norm)) / norm**2) * K
        + ((norm - np.sin(norm)) / norm**3) * K @ K
    )


def np_preintegrate(omega, acc, dt, cov_gyr, cov_acc):
    dR = np.eye(3)
    dv = np.zeros(3)
    dp = np.zeros(3)
    cov = np.zeros((9, 9))
    for w, a in zip(omega, acc):
        dt2 = dt * dt
        rot_incr = Rotation.from_rotvec(dt * w).as_matrix()
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        A = np.eye(9)
        A[0:3, 0:3] = rot_incr.T
        A[3:6, 0:3] = -dR @ K * dt
        A[6:9, 0:3] = -0.5 * dR @ K * dt2
        A[6:9, 3:6] = dt * np.eye(3)
        B = np.zeros((9, 6))
        B[0:3, 0:3] = np_right_jacobian(Rotation.from_matrix(dR).as_rotvec()) * dt
        B[3:6, 3:6] = dR * dt
        B[6:9, 3:6] = 0.5 * dR * dt2
        N = np.zeros((6, 6))
        N[0:3, 0:3] = cov_gyr
        N[3:6, 3:6] = cov_acc
        cov = A @ cov @ A.T + B @ N @ B.T
        dp = dp + dv * dt + 0.5 * dR @ a * dt2
        dv = dv + dR @ a * dt
        dR = dR @ rot_incr
    return dR, dv, dp, cov


def test_preintegration_matches_numpy(rng):
    T = 80
    dt = 0.001
    omega = rng.normal(scale=0.5, size=(T, 3))
    acc = rng.normal(scale=2.0, size=(T, 3)) + [0, 0, 9.8]
    cov_g = 0.01**2 * np.eye(3)
    cov_a = 0.3**2 * np.eye(3)
    st = pi.preintegrate(jnp.asarray(omega), jnp.asarray(acc), dt, jnp.asarray(cov_g), jnp.asarray(cov_a))
    dR, dv, dp, cov = np_preintegrate(omega, acc, dt, cov_g, cov_a)
    np.testing.assert_allclose(np.asarray(st.delta_rot), dR, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.delta_vel), dv, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.delta_pos), dp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.cov), cov, atol=1e-12)


def test_right_jacobian(rng):
    aa = rng.normal(size=3) * 0.7
    got = np.asarray(pi.right_jacobian(jnp.asarray(aa)))
    np.testing.assert_allclose(got, np_right_jacobian(aa), atol=1e-12)
    got0 = np.asarray(pi.right_jacobian(jnp.zeros(3)))
    np.testing.assert_allclose(got0, np.eye(3), atol=1e-9)


def test_preintegrate_intervals_batches(rng):
    K, L = 5, 40
    dt = 0.001
    omega = rng.normal(scale=0.3, size=(K, L, 3))
    acc = rng.normal(scale=1.0, size=(K, L, 3))
    cov_g = 1e-4 * np.eye(3)
    cov_a = 1e-2 * np.eye(3)
    st = pi.preintegrate_intervals(
        jnp.asarray(omega), jnp.asarray(acc), dt, jnp.asarray(cov_g), jnp.asarray(cov_a)
    )
    for k in range(K):
        dR, dv, dp, cov = np_preintegrate(omega[k], acc[k], dt, cov_g, cov_a)
        np.testing.assert_allclose(np.asarray(st.delta_rot[k]), dR, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st.delta_pos[k]), dp, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st.cov[k]), cov, atol=1e-12)


def test_dead_reckon_matches_euler(rng):
    """dead_reckon_controls over preint factors == the reference's Euler loop
    (ContinuousTrajectory.h:471-518) run at dense rate."""
    K, L = 3, 50
    dt = 0.001
    gravity = np.array([0.0, 0.0, -9.805])
    omega = rng.normal(scale=0.4, size=(K * L, 3))
    acc = rng.normal(scale=1.5, size=(K * L, 3)) + [0, 0, 9.8]
    st = pi.preintegrate_intervals(
        jnp.asarray(omega.reshape(K, L, 3)),
        jnp.asarray(acc.reshape(K, L, 3)),
        dt,
        jnp.zeros((3, 3)),
        jnp.zeros((3, 3)),
    )
    aa0 = rng.normal(size=3) * 0.2
    p0 = rng.normal(size=3)
    v0 = rng.normal(size=3)
    delta_t = np.full(K, L * dt)
    aa_seq, p_seq = pi.dead_reckon_controls(
        jnp.asarray(aa0), jnp.asarray(p0), jnp.asarray(v0), st, jnp.asarray(delta_t), jnp.asarray(gravity)
    )
    # dense Euler reference (same scheme as the C++ loop)
    R = Rotation.from_rotvec(aa0).as_matrix()
    p, v = p0.copy(), v0.copy()
    checkpoints = [(aa0, p0)]
    for t in range(K * L):
        p = p + v * dt + 0.5 * gravity * dt**2 + 0.5 * R @ acc[t] * dt**2
        v = v + gravity * dt + R @ acc[t] * dt
        R = R @ Rotation.from_rotvec(dt * omega[t]).as_matrix()
        if (t + 1) % L == 0:
            checkpoints.append((Rotation.from_matrix(R).as_rotvec(), p.copy()))
    for k, (aa_ref, p_ref) in enumerate(checkpoints):
        np.testing.assert_allclose(np.asarray(aa_seq[k]), aa_ref, atol=1e-8)
        # the closed form over preint factors is algebraically exact vs Euler
        np.testing.assert_allclose(np.asarray(p_seq[k]), p_ref, atol=1e-9)


def test_imu_buffer_add_batch_matches_per_sample():
    from dmsa_lidar_slam_tpu.imu.buffer import ImuBuffer

    rng = np.random.default_rng(4)
    n = 180
    acc = rng.standard_normal((n, 3))
    gyr = 0.01 * rng.standard_normal((n, 3)) + np.array([0.002, -0.001, 0.004])
    ts = 100.0 + np.arange(n) / 400.0

    b1 = ImuBuffer()
    for j in range(n):
        b1.add_measurement(acc[j], gyr[j], ts[j])
    b2 = ImuBuffer()
    # feed in uneven chunks, one of which straddles the 50-sample threshold
    for lo, hi in [(0, 30), (30, 75), (75, 180)]:
        b2.add_batch(acc[lo:hi], gyr[lo:hi], ts[lo:hi])

    np.testing.assert_array_equal(b1.gyr, b2.gyr)
    np.testing.assert_array_equal(b1.acc, b2.acc)
    np.testing.assert_array_equal(b1.stamps, b2.stamps)
    np.testing.assert_array_equal(b1.bias_gyr, b2.bias_gyr)
    assert b1.num_updates == b2.num_updates and b1.next_idx == b2.next_idx
