"""Synthetic LiDAR scene generation shared by tests and bench.py.

A room-like scene (floor + walls + some boxes) sampled as spinning-LiDAR
scans with ring ids from elevation, per-point azimuth-derived stamps, and
optional motion over the sweep (for deskew tests).
"""

import numpy as np
from scipy.spatial.transform import Rotation


def room_scene():
    """Plane list [(point, normal, extent_u, extent_v)] of a 20x14x4 room
    with two interior boxes."""
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

    # room shell (normals point inward)
    planes.append(((0, 0, 0), (0, 0, 1), 10, 7))  # floor
    planes.append(((0, 0, 4), (0, 0, -1), 10, 7))  # ceiling
    planes.append(((-10, 0, 2), (1, 0, 0), 7, 2))
    planes.append(((10, 0, 2), (-1, 0, 0), 7, 2))
    planes.append(((0, -7, 2), (0, 1, 0), 10, 2))
    planes.append(((0, 7, 2), (0, -1, 0), 10, 2))
    add_box((4, 2, 0.75), (1.5, 1.5, 1.5))
    add_box((-3, -3, 1.0), (2.0, 1.0, 2.0))
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
    """Uniform world-frame samples over the scene's surfaces [N, 3]."""
    planes = planes or room_scene()
    areas = np.array([4.0 * eu * ev for (_, _, eu, ev) in planes])
    probs = areas / areas.sum()
    counts = rng.multinomial(n_points, probs)
    pts = []
    for (p0, nrm, eu, ev), c in zip(planes, counts):
        u, v = _plane_frame(nrm)
        uu = rng.uniform(-eu, eu, size=c)
        vv = rng.uniform(-ev, ev, size=c)
        pts.append(np.asarray(p0)[None, :] + uu[:, None] * u[None, :] + vv[:, None] * v[None, :])
    pts = np.concatenate(pts, axis=0)
    return pts[rng.permutation(len(pts))]


def scan_from_pose(rng, world_pts, pos, rotvec, n_rings=16, t0=0.0, sweep=0.1):
    """Turn world points into a sensor-frame scan at pose (pos, rotvec).

    Returns (local_pts [N,3] f32, rings [N] i32, stamps [N] f64) with ring =
    elevation bucket and stamp = t0 + azimuth-proportional offset like a
    spinning LiDAR.
    """
    R = Rotation.from_rotvec(rotvec).as_matrix()
    local = (world_pts - pos) @ R  # R^T (p - t)
    rng_norm = np.linalg.norm(local, axis=1)
    elev = np.arcsin(np.clip(local[:, 2] / np.maximum(rng_norm, 1e-9), -1, 1))
    rings = np.clip(
        ((elev + np.pi / 4) / (np.pi / 2) * n_rings).astype(np.int32), 0, n_rings - 1
    )
    azim = np.arctan2(local[:, 1], local[:, 0])  # [-pi, pi]
    stamps = t0 + (azim + np.pi) / (2 * np.pi) * sweep
    return local.astype(np.float32), rings, stamps


def trajectory_poses(n, speed=1.0, yaw_rate=0.15, dt=0.1):
    """Simple smooth trajectory: arc through the room."""
    poses = []
    pos = np.array([-6.0, -2.0, 1.2])
    yaw = 0.2
    for _ in range(n):
        rotvec = np.array([0.0, 0.0, yaw])
        poses.append((pos.copy(), rotvec))
        heading = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        pos = pos + speed * dt * heading
        yaw += yaw_rate * dt
    return poses
