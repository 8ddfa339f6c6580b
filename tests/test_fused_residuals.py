"""Fused Pallas residual kernels vs the existing XLA residual path.

Validates (on CPU: the Pallas kernels run in interpret mode automatically):
  - cand_errors_ref == sum(cell_residuals^2) per candidate (math identity)
  - Pallas cand_errors == cand_errors_ref (kernel correctness, including
    runs that span tile boundaries via the carry)
  - gn_system_ref == autodiff J^T J / J^T e / e^T e (math identity)
  - Pallas gn_system == gn_system_ref
  - optimize(tabular_fn) converges like optimize(structured_fn) on a
    keyframe submap problem
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import rotations as rot
from dmsa_lidar_slam_tpu.ops import fused_residuals as fr
from dmsa_lidar_slam_tpu.ops import gaussians


def _problem(seed=0, n=1024, dtab=34, grid=1.0, giant_cell=False):
    """Random indexed-affine problem: local points + table + cells built on
    the transformed world points (the optimizer's exact usage)."""
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    if giant_cell:
        # most points into one voxel -> a run spanning multiple 512 tiles
        xs[: n // 2] = 0.5 + 0.2 * rng.standard_normal((n // 2, 3)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.1
    rings = rng.integers(0, 8, size=n).astype(np.int32)
    tidx = rng.integers(0, dtab - 1, size=n).astype(np.int32)
    tidx[n // 8 :: 7] = dtab - 1  # some "static" rows on the identity

    def rand_tab(key_rng, scale):
        aa = scale * key_rng.standard_normal((dtab - 1, 3))
        q = np.asarray(rot.axang2quat(jnp.asarray(aa)))
        t = 0.5 * key_rng.standard_normal((dtab - 1, 3))
        tab = np.concatenate([q, t, np.zeros((dtab - 1, 1))], axis=1).astype(np.float32)
        ident = np.zeros((1, 8), np.float32)
        ident[0, 0] = 1.0
        return np.concatenate([tab, ident], axis=0)

    tab0 = rand_tab(rng, 0.1)
    world = np.asarray(
        rot.quat_rotate(jnp.asarray(tab0[tidx, 0:4]), jnp.asarray(xs))
        + jnp.asarray(tab0[tidx, 4:7])
    )
    aux = np.concatenate([xs, tidx[:, None].astype(np.float32)], axis=1)
    cells, aux_s = gaussians.build_cells(
        jnp.asarray(world), jnp.asarray(mask), jnp.asarray(rings), grid, 4, aux=jnp.asarray(aux)
    )
    packed = fr.pack_rows(cells, aux_s[:, :3], aux_s[:, 3])
    return rng, xs, mask, rings, tidx, tab0, cells, packed, rand_tab


@pytest.mark.parametrize("giant_cell", [False, True])
def test_cand_errors_matches_cell_residuals(giant_cell):
    rng, xs, mask, rings, tidx, tab0, cells, packed, rand_tab = _problem(
        seed=1, giant_cell=giant_cell
    )
    tabs = np.stack([tab0] + [rand_tab(rng, 0.1) for _ in range(4)])

    ref = fr.cand_errors_ref(jnp.asarray(tabs), packed)
    # math identity: sum of squared cell residuals from the existing path
    for k in range(len(tabs)):
        world_k = rot.quat_rotate(
            jnp.asarray(tabs[k][tidx, 0:4]), jnp.asarray(xs)
        ) + jnp.asarray(tabs[k][tidx, 4:7])
        res = gaussians.cell_residuals(world_k, jnp.asarray(mask), cells)
        expect = float(jnp.sum(res.astype(jnp.float64) ** 2))
        np.testing.assert_allclose(float(ref[k]), expect, rtol=2e-4)

    # Pallas kernel (interpret mode on CPU) == reference
    out = fr.cand_errors(jnp.asarray(tabs), packed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4)


@pytest.mark.parametrize("giant_cell", [False, True])
def test_gn_system_matches_autodiff(giant_cell):
    rng, xs, mask, rings, tidx, tab0, cells, packed, rand_tab = _problem(
        seed=2, giant_cell=giant_cell
    )
    p_dim = 6
    dtabs = (0.1 * rng.standard_normal((p_dim, tab0.shape[0], 8))).astype(np.float32)
    dtabs[:, -1, :] = 0.0  # identity row is parameter-free

    hext_ref = fr.gn_system_ref(jnp.asarray(tab0), jnp.asarray(dtabs), packed)
    hext_nomean = fr.gn_system_ref(
        jnp.asarray(tab0), jnp.asarray(dtabs), packed, include_mean_term=False
    )

    # autodiff oracle: residual vector as a function of theta (tab-linear)
    def res_vec(theta):
        tab = jnp.asarray(tab0) + jnp.tensordot(theta, jnp.asarray(dtabs), axes=1)
        world = rot.quat_rotate(tab[:, 0:4][jnp.asarray(tidx)], jnp.asarray(xs)) + tab[
            :, 4:7
        ][jnp.asarray(tidx)]
        return gaussians.cell_residuals(world.astype(jnp.float32), jnp.asarray(mask), cells)

    theta0 = jnp.zeros(p_dim, jnp.float32)
    e0 = res_vec(theta0)
    j = jax.jacfwd(res_vec)(theta0)  # [M, P]
    jext = jnp.concatenate([j, e0[:, None]], axis=1).astype(jnp.float64)
    hext_ad = jext.T @ jext
    np.testing.assert_allclose(
        np.asarray(hext_ref), np.asarray(hext_ad), rtol=2e-3, atol=2e-4
    )

    # Pallas kernel (interpret mode) == reference WITHOUT the mean term
    # (the kernel omits it: at the linearization point s_bar is only the
    # f32 error of the stored cell mean).  The kernel's Jacobian-gather and
    # run-sum contractions run in bf16 (r5: the f32 gather was ~50% of the
    # kernel at P=282), so H/g agree to bf16 element rounding: ~1% of the
    # matrix scale.  The GN direction this feeds tolerates that — step
    # acceptance uses cand_errors, which stays f32.
    hext = fr.gn_system(jnp.asarray(tab0), jnp.asarray(dtabs), packed)
    scale = float(np.max(np.abs(np.asarray(hext_nomean))))
    np.testing.assert_allclose(
        np.asarray(hext), np.asarray(hext_nomean), rtol=0.03, atol=0.01 * scale
    )


def test_gn_mean_term_negligible_with_kernel_build():
    """The dropped (wL s_bar)^T B correction is bounded by the stored-mean
    rounding.  With build_packed's run-local-origin means (the production
    pairing on TPU) the with/without difference on H stays ~1e-4 relative;
    the global-cumsum test build in test_gn_system_matches_autodiff shows
    why the EXACT reference keeps the term."""
    rng, xs, mask, rings, tidx, tab0, cells, _, rand_tab = _problem(seed=3)
    world = rot.quat_rotate(jnp.asarray(tab0[tidx, 0:4]), jnp.asarray(xs)) + jnp.asarray(
        tab0[tidx, 4:7]
    )
    pk, _, _ = fr.build_packed(
        world.astype(jnp.float32), jnp.asarray(mask), jnp.asarray(rings),
        jnp.asarray(xs), jnp.asarray(tidx), 1.0, 4,
    )
    p_dim = 6
    dtabs = (0.1 * rng.standard_normal((p_dim, tab0.shape[0], 8))).astype(np.float32)
    dtabs[:, -1, :] = 0.0
    h_with = fr.gn_system_ref(jnp.asarray(tab0), jnp.asarray(dtabs), pk)
    h_without = fr.gn_system_ref(
        jnp.asarray(tab0), jnp.asarray(dtabs), pk, include_mean_term=False
    )
    scale = float(jnp.max(jnp.abs(h_with)))
    np.testing.assert_allclose(
        np.asarray(h_with), np.asarray(h_without), atol=2e-3 * scale
    )


def test_optimize_tabular_matches_structured_keyframe():
    """End-to-end: the tabular (fused-kernel) optimizer path converges to
    the same submap solution as the structured path."""
    from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
    from dmsa_lidar_slam_tpu.map import keyframes as kfm
    from tests.synthetic import sample_scene_points

    rng = np.random.default_rng(5)
    shapes = kfm.MapShapes(n_keyframes=4, n_pts_per_kf=512)
    pts = sample_scene_points(rng, 512).astype(np.float32)
    rings = rng.integers(0, 8, size=512).astype(np.int32)

    local = np.stack([pts for _ in range(4)])
    normals = np.zeros_like(local)
    normals[..., 2] = 1.0
    true_o = 0.05 * rng.standard_normal((4, 3))
    true_t = np.array([[0, 0, 0], [0.5, 0, 0], [1.0, 0.1, 0], [1.5, 0.1, 0.05]])
    # express each keyframe's cloud in its own frame so the true poses
    # reassemble one consistent world cloud
    from scipy.spatial.transform import Rotation

    for k in range(4):
        R = Rotation.from_rotvec(true_o[k]).as_matrix()
        local[k] = (pts - true_t[k]) @ R

    pdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    data = kfm.KeyframeMapData(
        local_pts=jnp.asarray(local, jnp.float32),
        local_normals=jnp.asarray(normals, jnp.float32),
        pt_mask=jnp.ones((4, 512), bool),
        pt_ring=jnp.asarray(np.stack([rings] * 4)),
        grid_size=jnp.full((4,), 0.25, jnp.float32),
        kf_mask=jnp.ones((4,), bool),
        anchor_orient=jnp.asarray(true_o[0], pdt),
        anchor_transl=jnp.asarray(true_t[0], pdt),
        stamps=jnp.arange(4, dtype=jnp.float64),
        grav_meas=jnp.zeros((4, 3), pdt),
        grav_plausible=jnp.zeros((4,), bool),
        odom_rel_transl=jnp.zeros((4, 3), pdt),
        odom_rel_orient=jnp.zeros((4, 3), pdt),
        gravity=jnp.asarray([0.0, 0.0, -9.805], pdt),
        cov_grav_inv=jnp.eye(3, dtype=pdt),
        odom_transl_cov_inv=jnp.eye(3, dtype=pdt),
        odom_orient_cov_inv=jnp.eye(3, dtype=pdt),
        balancing_grav=jnp.asarray(0.0, pdt),
        balancing_odom=jnp.asarray(0.0, pdt),
    )

    # perturbed initial params (relative chain from the true global poses)
    from dmsa_lidar_slam_tpu.core import poses as cp

    gp = cp.GlobalPoses(orient=jnp.asarray(true_o, pdt), transl=jnp.asarray(true_t, pdt))
    chain = cp.global2relative(gp)
    params_true = cp.params_from_chain(chain)
    params0 = params_true + 0.03 * jnp.asarray(rng.standard_normal(params_true.shape), pdt)

    settings = opt.OptimSettings(num_iter=8, min_num_points_per_set=4, min_num_gaussians=5)
    fwd = kfm.make_forward(shapes, False, False, False)
    structured = kfm.make_structured(shapes, False, False, False)
    tabular = kfm.make_tabular(shapes, False, False)

    r_struct = opt.optimize(fwd, params0, data, settings, 0.25, structured_fn=structured)
    r_tab = opt.optimize(fwd, params0, data, settings, 0.25, tabular_fn=tabular)

    # both should move toward the truth; final params comparable
    d0 = float(jnp.linalg.norm(params0 - params_true))
    ds = float(jnp.linalg.norm(r_struct.params - params_true))
    dt = float(jnp.linalg.norm(r_tab.params - params_true))
    assert ds < 0.7 * d0
    assert dt < 0.7 * d0
    assert abs(dt - ds) < 0.35 * d0


@pytest.mark.parametrize("giant_cell,with_obs", [(False, False), (True, True)])
def test_build_packed_matches_ref(giant_cell, with_obs):
    """The build kernel (interpret mode on CPU) reproduces build_cells +
    pack_rows: same packed layout, same acceptance, same normalization.
    f32 summation order differs, so stats tolerances are loose where the
    eigenvalue floor amplifies covariance rounding."""
    rng = np.random.default_rng(7)
    n = 1024
    xs = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    if giant_cell:
        xs[: n // 2] = 0.5 + 0.2 * rng.standard_normal((n // 2, 3)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.1
    rings = rng.integers(0, 8, size=n).astype(np.int32)
    tidx = rng.integers(0, 33, size=n).astype(np.int32)
    obs = rng.uniform(0.5, 2.0, size=n).astype(np.float32) if with_obs else None
    split = rng.integers(0, 4, size=n).astype(np.int32) if with_obs else None
    world = jnp.asarray(xs + 0.1)  # any world positions; binning input

    args = (world, jnp.asarray(mask), jnp.asarray(rings), jnp.asarray(xs),
            jnp.asarray(tidx), 1.0, 4)
    kw = dict(obs_weight=None if obs is None else jnp.asarray(obs),
              split_ids=None if split is None else jnp.asarray(split))
    pk, nv, nr = fr.build_packed(*args, **kw)
    pk_ref, nv_ref, nr_ref = fr.build_packed_ref(*args, **kw)

    assert int(nv) == int(nv_ref)
    assert int(nr) == int(nr_ref)
    pk = np.asarray(pk)
    pk_ref = np.asarray(pk_ref)
    # exact rows: xs, w, tidx, newc
    np.testing.assert_array_equal(pk[12:15], pk_ref[12:15])
    np.testing.assert_allclose(pk[0:3], pk_ref[0:3], atol=1e-6)
    # invn_end: same end rows, same counts
    np.testing.assert_allclose(pk[15], pk_ref[15], atol=1e-6)
    # mu0 (only meaningful where lamw6 != 0, i.e. valid cells)
    sel = np.abs(pk_ref[6:12]).sum(axis=0) > 0
    np.testing.assert_allclose(pk[3:6, sel], pk_ref[3:6, sel], atol=1e-4)
    # lamw6: floored-inverse amplifies f32 covariance rounding near the
    # floor; compare with a scale-aware tolerance
    scale = np.abs(pk_ref[6:12, sel]).max()
    np.testing.assert_allclose(pk[6:12, sel], pk_ref[6:12, sel], atol=0.02 * scale)
    # and the residuals they induce agree tightly in aggregate
    tabs = jnp.asarray(np.stack([np.concatenate([
        np.tile(np.array([[1, 0, 0, 0, 0.1, 0, 0, 0]], np.float32), (33, 1)),
        np.array([[1, 0, 0, 0, 0, 0, 0, 0]], np.float32)])]))
    e_k = fr.cand_errors_ref(tabs, jnp.asarray(pk))
    e_r = fr.cand_errors_ref(tabs, jnp.asarray(pk_ref))
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_r), rtol=0.02)


@pytest.mark.parametrize("giant_cell", [False, True])
def test_build_packed_tab_path_matches_ref(giant_cell):
    """The compact build path (tab given: 6-operand sort, world points
    recomputed in-kernel from the pose table, tidx/ring/mask packed into
    one enc lane) reproduces build_cells + pack_rows when the caller's
    world points come from the same table math."""
    rng, xs, mask, rings, tidx, tab0, cells, packed_old, rand_tab = _problem(
        seed=5, giant_cell=giant_cell
    )
    from dmsa_lidar_slam_tpu.core import rotations as rot

    world = (
        rot.quat_rotate(jnp.asarray(tab0[tidx, 0:4]), jnp.asarray(xs))
        + jnp.asarray(tab0[tidx, 4:7])
    ).astype(jnp.float32)
    args = (world, jnp.asarray(mask), jnp.asarray(rings), jnp.asarray(xs),
            jnp.asarray(tidx), 1.0, 4)
    pk, nv, nr = fr.build_packed(*args, tab=jnp.asarray(tab0))
    pk_ref, nv_ref, nr_ref = fr.build_packed_ref(*args)

    assert int(nv) == int(nv_ref)
    assert int(nr) == int(nr_ref)
    pk = np.asarray(pk)
    pk_ref = np.asarray(pk_ref)
    np.testing.assert_array_equal(pk[12:15], pk_ref[12:15])  # w, tidx, newc
    np.testing.assert_allclose(pk[0:3], pk_ref[0:3], atol=1e-6)  # xs
    np.testing.assert_allclose(pk[15], pk_ref[15], atol=1e-6)  # invn_end
    sel = np.abs(pk_ref[6:12]).sum(axis=0) > 0
    np.testing.assert_allclose(pk[3:6, sel], pk_ref[3:6, sel], atol=2e-4)
    scale = np.abs(pk_ref[6:12, sel]).max()
    np.testing.assert_allclose(pk[6:12, sel], pk_ref[6:12, sel], atol=0.02 * scale)
    # end-to-end: residuals from both builds agree
    tabs = np.stack([tab0])
    e_k = fr.cand_errors_ref(jnp.asarray(tabs), jnp.asarray(pk))
    e_r = fr.cand_errors_ref(jnp.asarray(tabs), jnp.asarray(pk_ref))
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_r), rtol=0.02)


def _tab_problem_small():
    """Tiny keyframe tabular problem for stop-criteria probes."""
    from dmsa_lidar_slam_tpu.map import keyframes as kfm
    from tests.synthetic import sample_scene_points

    rng = np.random.default_rng(21)
    s, ppk = 3, 256
    pts = sample_scene_points(rng, ppk).astype(np.float32)
    pdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    shapes = kfm.MapShapes(n_keyframes=s, n_pts_per_kf=ppk)
    data = kfm.KeyframeMapData(
        local_pts=jnp.asarray(np.stack([pts] * s)),
        local_normals=jnp.zeros((s, ppk, 3), jnp.float32),
        pt_mask=jnp.ones((s, ppk), bool),
        pt_ring=jnp.asarray(rng.integers(0, 8, size=(s, ppk)).astype(np.int32)),
        grid_size=jnp.full((s,), 0.25, jnp.float32),
        kf_mask=jnp.ones((s,), bool),
        anchor_orient=jnp.zeros(3, pdt),
        anchor_transl=jnp.zeros(3, pdt),
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
    params0 = jnp.full((6 * (s - 1),), 0.01, pdt)
    return shapes, data, params0


def test_tabular_stop_criteria_probes():
    """The kernel-path optimizer honors the reference's abort semantics
    (DmsaOptimizer.h:89-143): too-few gaussians and NaN inputs leave the
    params unchanged with the matching stop reason (verify-skill probes,
    now on the tabular path)."""
    from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
    from dmsa_lidar_slam_tpu.map import keyframes as kfm

    shapes, data, params0 = _tab_problem_small()
    fwd = kfm.make_forward(shapes, False, False, False)
    tabular = kfm.make_tabular(shapes, False, False)

    # all points masked -> no cells -> STOP_TOO_FEW_GAUSSIANS, params kept
    data_masked = data._replace(pt_mask=jnp.zeros_like(data.pt_mask))
    settings = opt.OptimSettings(num_iter=4, min_num_points_per_set=4, min_num_gaussians=5)
    r = opt.optimize(fwd, params0, data_masked, settings, 0.25, tabular_fn=tabular)
    assert int(r.stop_reason) == opt.STOP_TOO_FEW_GAUSSIANS
    np.testing.assert_array_equal(np.asarray(r.params), np.asarray(params0))

    # single ring id everywhere -> ring-diversity rejection -> same stop
    data_ring = data._replace(pt_ring=jnp.zeros_like(data.pt_ring))
    r = opt.optimize(fwd, params0, data_ring, settings, 0.25, tabular_fn=tabular)
    assert int(r.stop_reason) == opt.STOP_TOO_FEW_GAUSSIANS
    np.testing.assert_array_equal(np.asarray(r.params), np.asarray(params0))

    # NaN coordinates in VALID slots must not move the params
    bad = data.local_pts.at[0, :8].set(jnp.nan)
    data_nan = data._replace(local_pts=bad)
    r = opt.optimize(fwd, params0, data_nan, settings, 0.25, tabular_fn=tabular)
    assert int(r.stop_reason) in (opt.STOP_NAN, opt.STOP_NO_IMPROVEMENT, opt.STOP_TOO_FEW_GAUSSIANS)
    np.testing.assert_array_equal(np.asarray(r.params), np.asarray(params0))

    # num_iter=0 is a no-op
    r = opt.optimize(
        fwd, params0, data, opt.OptimSettings(num_iter=0, min_num_points_per_set=4), 0.25,
        tabular_fn=tabular,
    )
    assert int(r.num_iters) == 0
    np.testing.assert_array_equal(np.asarray(r.params), np.asarray(params0))
