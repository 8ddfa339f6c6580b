"""Synthetic LiDAR-inertial sequence generator.

A dataset-free data source for tests, benchmarks, and demos: a room-like
scene sampled as spinning-LiDAR scans (ring ids from elevation, per-point
azimuth stamps, intra-sweep motion distortion) plus consistent IMU samples,
along an analytic constant-twist trajectory.
"""

from typing import Iterator, NamedTuple, Optional, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

GRAVITY = np.array([0.0, 0.0, -9.805])


def room_scene(scale: float = 1.0):
    """Plane list [(point, normal, extent_u, extent_v)]: a 20x14x4 room with
    two interior boxes, optionally scaled (small rooms make the adaptive
    preprocessing ladder pick fine grids at small test point budgets)."""
    planes = []

    def add_box(center, size):
        cx, cy, cz = center
        sx, sy, sz = size
        planes.extend(
            [
                ((cx - sx / 2, cy, cz), (-1, 0, 0), sy / 2, sz / 2),
                ((cx + sx / 2, cy, cz), (1, 0, 0), sy / 2, sz / 2),
                ((cx, cy - sy / 2, cz), (0, -1, 0), sx / 2, sz / 2),
                ((cx, cy + sy / 2, cz), (0, 1, 0), sx / 2, sz / 2),
                ((cx, cy, cz + sz / 2), (0, 0, 1), sx / 2, sy / 2),
            ]
        )

    planes.append(((0, 0, 0), (0, 0, 1), 10, 7))
    planes.append(((0, 0, 4), (0, 0, -1), 10, 7))
    planes.append(((-10, 0, 2), (1, 0, 0), 7, 2))
    planes.append(((10, 0, 2), (-1, 0, 0), 7, 2))
    planes.append(((0, -7, 2), (0, 1, 0), 10, 2))
    planes.append(((0, 7, 2), (0, -1, 0), 10, 2))
    add_box((4, 2, 0.75), (1.5, 1.5, 1.5))
    add_box((-3, -3, 1.0), (2.0, 1.0, 2.0))
    if scale != 1.0:
        planes = [
            (tuple(scale * np.asarray(p0)), nrm, scale * eu, scale * ev)
            for (p0, nrm, eu, ev) in planes
        ]
    return planes


def _plane_frame(normal):
    n = np.asarray(normal, dtype=float)
    n = n / np.linalg.norm(n)
    a = np.array([1.0, 0.0, 0.0]) if abs(n[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(n, a)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    return u, v


def sample_scene_points(rng, n_points, planes=None):
    planes = planes or room_scene()
    areas = np.array([4.0 * eu * ev for (_, _, eu, ev) in planes])
    counts = rng.multinomial(n_points, areas / areas.sum())
    pts = []
    for (p0, nrm, eu, ev), c in zip(planes, counts):
        u, v = _plane_frame(nrm)
        uu = rng.uniform(-eu, eu, size=c)
        vv = rng.uniform(-ev, ev, size=c)
        pts.append(np.asarray(p0)[None, :] + uu[:, None] * u[None, :] + vv[:, None] * v[None, :])
    pts = np.concatenate(pts, axis=0)
    return pts[rng.permutation(len(pts))]


class TruePose(NamedTuple):
    position: np.ndarray
    rotvec: np.ndarray


class SyntheticSequence:
    """Ramped-twist trajectory with scans + IMU.

    The platform stays AT REST for `t_still` data-seconds, then ramps
    linearly to (v_lin, yaw_rate) over `t_ramp` seconds — like real
    handheld/robot datasets, whose static start is what makes the
    reference's init stack viable (gyro bias and gravity direction are
    both estimated from the first IMU samples under a static-start
    assumption, ImuBuffer.h:59-63 / ContinuousTrajectory.h:263-299; IMU
    before the first scan is dropped, DmsaSlam.h:104-107, so the still
    phase must cover the first scans, not just precede them).
    pose(t): position integrates v(t) (world), orientation is yaw about z.
    IMU: body rates [0,0,yaw_rate(t)], accel = R^T * (a_world - g).
    """

    def __init__(
        self,
        rng: Optional[np.random.Generator] = None,
        v_lin=(1.2, 0.4, 0.0),
        yaw_rate: float = 0.4,
        p0=(-4.0, -1.0, 1.2),
        yaw0: float = 0.15,
        sweep: float = 0.1,
        t_start: float = 1000.0,
        t_ramp: float = 1.0,
        t_still: float = 0.0,
        noise_std: float = 0.0,
        room_scale: float = 1.0,
    ):
        self.rng = rng or np.random.default_rng(0)
        self.v_lin = np.asarray(v_lin, float) * room_scale
        self.yaw_rate = yaw_rate
        self.p0 = np.asarray(p0, float) * room_scale
        self.yaw0 = yaw0
        self.sweep = sweep
        self.t_start = t_start
        self.t_ramp = t_ramp
        self.t_still = t_still
        self.noise_std = noise_std
        self.planes = room_scene(room_scale)

    def _ramp_integral(self, rel):
        """Integral of the ramp profile min(max(t - t_still, 0)/t_ramp, 1)
        from 0 to rel (scalar or array)."""
        rel = np.asarray(rel, float) - self.t_still
        below = 0.5 * np.clip(rel, 0.0, None) ** 2 / self.t_ramp
        above = 0.5 * self.t_ramp + (rel - self.t_ramp)
        out = np.where(rel < self.t_ramp, below, above)
        return out if out.ndim else float(out)

    def _ramp(self, rel: float) -> float:
        return float(np.clip((rel - self.t_still) / self.t_ramp, 0.0, 1.0))

    def pose(self, t: float) -> TruePose:
        rel = t - self.t_start
        s = self._ramp_integral(rel)
        return TruePose(
            position=self.p0 + self.v_lin * s,
            rotvec=np.array([0.0, 0.0, self.yaw0 + self.yaw_rate * s]),
        )

    def world_accel(self, t: float) -> np.ndarray:
        rel = t - self.t_start - self.t_still
        if 0 <= rel < self.t_ramp:
            return self.v_lin / self.t_ramp
        return np.zeros(3)

    def scan(self, scan_idx: int, pts_per_scan: int, n_rings: int = 16):
        """One motion-distorted scan: (points [n,3] f32 lidar frame,
        stamps [n] f64, rings [n] i32)."""
        t0 = self.t_start + scan_idx * self.sweep
        world = sample_scene_points(self.rng, pts_per_scan, planes=self.planes)
        stamps = t0 + np.sort(self.rng.uniform(0, self.sweep, size=pts_per_scan))
        # per-point pose (intra-sweep motion), fully vectorized
        s = self._ramp_integral(stamps - self.t_start)
        positions = self.p0[None, :] + s[:, None] * self.v_lin[None, :]
        yaws = self.yaw0 + self.yaw_rate * s
        rotvecs = np.zeros((pts_per_scan, 3))
        rotvecs[:, 2] = yaws
        R = Rotation.from_rotvec(rotvecs).as_matrix()  # [n,3,3]
        local = np.einsum("nji,nj->ni", R, world - positions).astype(np.float32)
        if self.noise_std > 0:
            local += self.rng.normal(scale=self.noise_std, size=local.shape).astype(np.float32)
        rng_norm = np.linalg.norm(local, axis=1)
        elev = np.arcsin(np.clip(local[:, 2] / np.maximum(rng_norm, 1e-9), -1, 1))
        rings = np.clip(((elev + np.pi / 4) / (np.pi / 2) * n_rings).astype(np.int32), 0, n_rings - 1)
        return local, stamps, rings

    def imu_samples(self, t_from: float, t_to: float, rate: float = 400.0):
        """IMU (stamps, acc [n,3], gyr [n,3]) consistent with the motion."""
        ts = np.arange(t_from, t_to, 1.0 / rate)
        rel = ts - self.t_start
        s_int = self._ramp_integral(rel)
        yaws = self.yaw0 + self.yaw_rate * s_int
        rotvecs = np.zeros((len(ts), 3))
        rotvecs[:, 2] = yaws
        R = Rotation.from_rotvec(rotvecs).as_matrix()
        rel_m = rel - self.t_still
        ramp = np.clip(rel_m / self.t_ramp, 0.0, 1.0)
        in_ramp = (rel_m >= 0) & (rel_m < self.t_ramp)
        a_w = in_ramp[:, None] * (self.v_lin / self.t_ramp)[None, :]
        acc = np.einsum("nji,nj->ni", R, a_w - GRAVITY[None, :])
        gyr = np.zeros((len(ts), 3))
        gyr[:, 2] = self.yaw_rate * ramp
        return ts, acc, gyr


def bench_config(**overrides):
    """The canonical bench configuration (single source for bench.py and
    the tools/ diagnostics — VERDICT r2 flagged the copy-paste drift risk).

    Reference-like settings: 3000 pts/scan after downsampling, 5-scan
    window, 6 control poses, 10 window iterations; dist_new_keyframe=0.5
    gives ~1 keyframe / 4 scans so the submap + retirement paths carry
    real weight in the measurement."""
    from dmsa_lidar_slam_tpu.config import Config

    kw = dict(
        n_clouds=5,
        num_control_poses=6,
        max_num_points_per_scan=3000,
        min_dist_ds=2.0,
        min_dist=0.1,
        num_iter_sliding_window_optim=10,
        num_iter_keyframe_optim=10,
        min_num_points_gauss=10,
        min_num_points_gauss_key=10,
        closest_k_keyframes_as_static_points=3,
        last_n_keyframes_for_optim=50,
        dist_new_keyframe=0.5,
        use_imu=True,
        imu_factor_weight_submap=0.001,
        n_dense=501,
        static_points_cap=8192,
        scan_cap_factor=1.3,
        keyframe_points_cap=4096,
        raw_scan_cap=32768,
        # EXPLICIT submap span cap (default None = reference's full suffix):
        # bounds the submap problem to 16*4096 points for throughput; the
        # accuracy cost is quantified in tests/test_approximations.py
        submap_max_keyframes=16,
    )
    kw.update(overrides)
    return Config(**kw)


def bench_sequence(seed: int, **overrides) -> SyntheticSequence:
    """The canonical bench sequence: measurement noise 1 cm and a 0.6 s
    still phase at the start of the DATA (like real handheld rigs) so the
    static-start init assumption holds — IMU preceding the first scan is
    dropped (DmsaSlam.h:104-107), so stillness must cover the first scans."""
    kw = dict(rng=np.random.default_rng(seed), noise_std=0.01, t_still=0.6)
    kw.update(overrides)
    return SyntheticSequence(**kw)


def feed_scan(slam, seq: SyntheticSequence, i: int, t_imu_from: float, pts_per_scan: int = 20000):
    """Feed scan i (plus the IMU samples up to its end) into a pipeline.
    Returns the new IMU high-water mark."""
    t_end = seq.t_start + (i + 1) * seq.sweep
    ts, acc, gyr = seq.imu_samples(t_imu_from, t_end)
    for j in range(len(ts)):
        slam.process_imu(acc[j], gyr[j], ts[j])
    pts, stamps, rings = seq.scan(i, pts_per_scan)
    slam.process_scan(pts, stamps, rings)
    return t_end


def ate_rmse(est_stamps, est_pos, seq: SyntheticSequence, align: bool = True) -> float:
    """Absolute trajectory error RMSE of estimated positions vs the analytic
    truth, after rigid (SE3, no scale) Umeyama alignment — the estimator's
    frame is anchored at its unknown starting pose, like any SLAM output."""
    est = np.asarray([np.asarray(p, float) for p in est_pos])
    gt = np.asarray([seq.pose(float(s)).position for s in est_stamps])
    if len(est) == 0:
        return float("nan")
    if align and len(est) >= 3:
        mu_e = est.mean(axis=0)
        mu_g = gt.mean(axis=0)
        H = (est - mu_e).T @ (gt - mu_g)
        U, _, Vt = np.linalg.svd(H)
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ D @ U.T
        est = (est - mu_e) @ R.T + mu_g
    elif align:
        est = est - est[0] + gt[0]
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
