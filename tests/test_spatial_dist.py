"""Spatially-owned distributed keyframe adjustment (parallel.spatial) vs
the single-chip tabular optimizer: same problem, 8-device mesh, must agree.

The spatial design's only approximation is bucket overflow in the
all_to_all shuffle — asserted ZERO here at default capacity — so the cell
statistics are EXACT (every cell's members land on one owner device and go
through the same build machinery as the single-chip path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.map import keyframes as kfm
from dmsa_lidar_slam_tpu.parallel import keyframe_dist, spatial
from tests.synthetic import sample_scene_points


def _make_problem(rng, s=4, ppk=512, with_normals=False):
    from scipy.spatial.transform import Rotation

    if with_normals:
        from dmsa_lidar_slam_tpu.io.synthetic import sample_scene_points as _ssp

        pts, world_nrm = _ssp(rng, ppk, return_normals=True)
        pts = pts.astype(np.float32)
    else:
        pts = sample_scene_points(rng, ppk).astype(np.float32)
        world_nrm = None
    rings = rng.integers(0, 8, size=ppk).astype(np.int32)
    local = np.stack([pts for _ in range(s)])
    normals = np.zeros((s, ppk, 3), np.float32)
    true_o = 0.05 * rng.standard_normal((s, 3))
    true_t = np.cumsum(0.4 * rng.standard_normal((s, 3)), axis=0)
    for k in range(s):
        R = Rotation.from_rotvec(true_o[k]).as_matrix()
        local[k] = (pts - true_t[k]) @ R
        if world_nrm is not None:
            normals[k] = (world_nrm @ R).astype(np.float32)

    pdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    shapes = kfm.MapShapes(n_keyframes=s, n_pts_per_kf=ppk)
    data = kfm.KeyframeMapData(
        local_pts=jnp.asarray(local, jnp.float32),
        local_normals=jnp.asarray(normals),
        pt_mask=jnp.ones((s, ppk), bool),
        pt_ring=jnp.asarray(np.stack([rings] * s)),
        grid_size=jnp.full((s,), 0.25, jnp.float32),
        kf_mask=jnp.ones((s,), bool),
        anchor_orient=jnp.asarray(true_o[0], pdt),
        anchor_transl=jnp.asarray(true_t[0], pdt),
        stamps=jnp.arange(s, dtype=jnp.float64),
        grav_meas=jnp.zeros((s, 3), pdt),
        grav_plausible=jnp.zeros((s,), bool),
        odom_rel_transl=jnp.zeros((s, 3), pdt),
        odom_rel_orient=jnp.zeros((s, 3), pdt),
        gravity=jnp.asarray([0.0, 0.0, -9.805], pdt),
        cov_grav_inv=jnp.eye(3, dtype=pdt),
        odom_transl_cov_inv=jnp.eye(3, dtype=pdt),
        odom_orient_cov_inv=jnp.eye(3, dtype=pdt),
        balancing_grav=jnp.asarray(0.0, pdt),
        balancing_odom=jnp.asarray(0.0, pdt),
    )
    gp = cp.GlobalPoses(orient=jnp.asarray(true_o, pdt), transl=jnp.asarray(true_t, pdt))
    params_true = cp.params_from_chain(cp.global2relative(gp))
    params0 = params_true + 0.03 * jnp.asarray(rng.standard_normal(params_true.shape), pdt)
    return shapes, data, params0, params_true


def test_spatial_matches_single_chip():
    from jax.sharding import Mesh

    rng = np.random.default_rng(9)
    shapes, data, params0, params_true = _make_problem(rng)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    sopt = spatial.make_spatial_dist_optimize(
        mesh, shapes, num_iter=8, min_points=4, step_length=0.2
    )
    fp, fm, frs, aux = keyframe_dist.flatten_problem(data)
    grids = jnp.asarray([0.5, 1.25])
    params_d, err_d, n_cells, overflow = sopt(params0, fp, fm, frs, aux, grids)

    assert int(overflow) == 0, f"bucket overflow {int(overflow)}"
    assert int(n_cells) > 20

    settings = opt.OptimSettings(
        num_iter=8, min_num_points_per_set=4, min_num_gaussians=5, step_length_optim=0.2
    )
    fwd = kfm.make_forward(shapes, False, False, False)
    tabular = kfm.make_tabular(shapes, False, False)
    r_single = opt.optimize(fwd, params0, data, settings, 0.25, tabular_fn=tabular)

    d0 = float(jnp.linalg.norm(params0 - params_true))
    dd = float(jnp.linalg.norm(params_d - params_true))
    ds = float(jnp.linalg.norm(r_single.params - params_true))
    # both converge; distributed tracks the single-chip solution TIGHTLY
    # (exact cells + unified stop/line-search settings; VERDICT r4 #4
    # flagged the old 0.35*d0 bound as loose enough to hide divergence)
    assert dd < 0.7 * d0, f"dist {dd} vs init {d0}"
    parity = _position_parity_m(shapes, data, params_d, r_single.params)
    assert parity < 0.02, f"dist-vs-single keyframe position parity {parity:.4f} m"


def _position_parity_m(shapes, data, params_a, params_b):
    """Max keyframe world-position difference between two parameter
    vectors, in meters."""
    def positions(params):
        _, gp = kfm.global_chain(jnp.asarray(params), data, shapes)
        return np.asarray(gp.transl)

    return float(np.max(np.linalg.norm(positions(params_a) - positions(params_b), axis=1)))


def test_spatial_split_parity_tight():
    """The PRODUCTION configuration — use_split=True with non-trivial
    normals (both pipelines enable the split channel, pipeline/fused.py /
    pipeline/slam.py) — against the single-chip tabular path with the SAME
    split, bounded at 0.02 m keyframe position parity (VERDICT r4 #4: the
    flagship dryrun achieves ~0.002 m; a 0.35*d0-class bound would hide
    real divergence).  Reference semantics: Gaussians.h:27-85 splitting."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(11)
    shapes, data, params0, params_true = _make_problem(rng, with_normals=True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    sopt = spatial.make_spatial_dist_optimize(
        mesh, shapes, num_iter=8, min_points=4, step_length=0.2, use_split=True
    )
    fp, fm, frs, aux = keyframe_dist.flatten_problem(data)
    grids = jnp.asarray([0.5, 1.25])
    params_d, _, n_cells, overflow = sopt(
        params0, fp, fm, frs, aux, grids,
        flat_normals=jnp.asarray(data.local_normals.reshape(-1, 3)),
    )
    assert int(overflow) == 0
    assert int(n_cells) > 20

    settings = opt.OptimSettings(
        num_iter=8, min_num_points_per_set=4, min_num_gaussians=5, step_length_optim=0.2
    )
    fwd = kfm.make_forward(shapes, False, False, True)  # use_split
    tabular = kfm.make_tabular(shapes, False, False)
    r_single = opt.optimize(fwd, params0, data, settings, 0.25, tabular_fn=tabular)

    d0 = float(jnp.linalg.norm(params0 - params_true))
    dd = float(jnp.linalg.norm(params_d - params_true))
    assert dd < 0.7 * d0, f"dist {dd} vs init {d0}"
    parity = _position_parity_m(shapes, data, params_d, r_single.params)
    assert parity < 0.02, f"split-enabled spatial parity {parity:.4f} m"


def test_shuffle_roundtrip_exact():
    """Every unmasked point arrives at exactly one owner, none duplicated
    (sum of received coordinates == sum of sent coordinates)."""
    from jax.sharding import Mesh
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(3)
    n = 2048
    pts = jnp.asarray(rng.uniform(-5, 5, size=(n, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) > 0.1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    cap = 128

    def body(p, m):
        owner = spatial.owner_of_voxels(p, m, 0.7, 8)
        recv, rmask, ov = spatial.shuffle_to_owners(p, owner, 8, cap, "data")
        s = jnp.sum(jnp.where(rmask[:, None], recv, 0.0))
        return jax.lax.psum(s, "data"), jax.lax.psum(ov, "data"), jax.lax.psum(
            jnp.sum(rmask), "data"
        )

    fn = jax.jit(
        shard_map(body, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P(), P()))
    )
    total, ov, n_recv = fn(pts, mask)
    assert int(ov) == 0
    assert int(n_recv) == int(jnp.sum(mask))
    expect = float(jnp.sum(jnp.where(mask[:, None], pts, 0.0)))
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
