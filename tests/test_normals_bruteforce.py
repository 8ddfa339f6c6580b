"""Radius-moment normal estimation (ops.nn_bruteforce.radius_neighbor_moments,
the TPU path of map.normals.estimate_normals) vs the exact-kNN hash-grid
oracle and the true plane normals."""

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import nn_bruteforce as nb


def _plane_cloud(rng, n=1024):
    """Three orthogonal noisy planes with known normals."""
    per = n // 3
    pts, nrms = [], []
    for axis in range(3):
        u = rng.uniform(-2, 2, size=(per, 2))
        p = np.zeros((per, 3))
        cols = [c for c in range(3) if c != axis]
        p[:, cols] = u
        p[:, axis] = rng.normal(scale=0.004, size=per)
        nr = np.zeros(3)
        nr[axis] = 1.0
        pts.append(p)
        nrms.append(np.broadcast_to(nr, (per, 3)))
    pad = n - 3 * per
    pts.append(np.zeros((pad, 3)))
    nrms.append(np.broadcast_to([0.0, 0.0, 1.0], (pad, 3)))
    mask = np.ones(n, bool)
    mask[3 * per:] = False
    return (
        np.concatenate(pts).astype(np.float32),
        np.concatenate(nrms),
        mask,
    )


def test_radius_moments_recover_plane_normals(rng):
    pts, true_n, mask = _plane_cloud(rng)
    cnt, mean, cov = nb.radius_neighbor_moments(
        jnp.asarray(pts), jnp.asarray(mask), 0.35
    )
    cnt, cov = np.asarray(cnt), np.asarray(cov)
    assert cnt[mask].min() >= 2  # self + neighbors

    from dmsa_lidar_slam_tpu.ops.eig3 import smallest_eigvec_sym3

    normal = np.asarray(smallest_eigvec_sym3(jnp.asarray(cov)))
    dots = np.abs(np.sum(normal[mask] * true_n[mask], axis=1))
    # interior points recover the plane normal; points near the plane
    # INTERSECTION lines legitimately see two planes in the ball — accept
    # that tail
    assert np.quantile(dots, 0.25) > 0.97, np.quantile(dots, 0.25)
    assert np.median(dots) > 0.999


def test_estimate_normals_paths_agree(rng):
    """TPU radius path vs CPU exact-kNN path of estimate_normals: same
    direction (up to sign handled by the viewpoint flip) on a single
    noisy plane, where the neighbor-set difference (ball vs kSearch(6))
    cannot change the underlying surface."""
    from dmsa_lidar_slam_tpu.map import normals as nrm

    n = 512
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = rng.uniform(-2, 2, size=(n, 2))
    pts[:, 2] = 1.0 + rng.normal(scale=0.004, size=n)
    mask = np.ones(n, bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    n_knn = np.asarray(nrm.estimate_normals(pts_j, mask_j, 0.15))

    # force the radius-moment path (interpret mode off-TPU)
    cnt, _, cov = nb.radius_neighbor_moments(pts_j, mask_j, 0.3)
    from dmsa_lidar_slam_tpu.ops.eig3 import smallest_eigvec_sym3

    n_rad = np.asarray(smallest_eigvec_sym3(cov))
    dots = np.abs(np.sum(n_knn[mask] * n_rad[mask], axis=1))
    assert np.median(dots) > 0.999
    assert np.quantile(dots, 0.1) > 0.99, np.quantile(dots, 0.1)


def test_moments_count_matches_bruteforce(rng):
    pts = rng.uniform(-1, 1, size=(256, 3)).astype(np.float32)
    mask = rng.uniform(size=256) > 0.2
    radius = 0.4
    cnt, mean, cov = nb.radius_neighbor_moments(
        jnp.asarray(pts), jnp.asarray(mask), radius
    )
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    inc = (d2 <= radius * radius) & mask[None, :]
    np.testing.assert_array_equal(np.asarray(cnt)[mask], inc.sum(1)[mask])
    mexp = (inc[:, :, None] * pts[None, :, :]).sum(1) / np.maximum(inc.sum(1), 1)[:, None]
    np.testing.assert_allclose(np.asarray(mean)[mask], mexp[mask], atol=1e-4)
