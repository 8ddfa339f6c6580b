"""Structured Gauss-Newton Jacobian == autodiff Jacobian (both problems).

The structured path (dmsa.optimizer `structured_fn`) replaces the P-tangent
autodiff Jacobian with a closed-form per-point cotangent
(ops.gaussians.cell_residuals_and_grad) contracted against the problem's
pose-table Jacobians.  These tests pin exact parity on REAL problem data:
same residual vector, same Jacobian (to f32-rounding tolerance), same
optimization result.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp
from dmsa_lidar_slam_tpu.dmsa import optimizer as opt
from dmsa_lidar_slam_tpu.map import keyframes as kfm
from dmsa_lidar_slam_tpu.ops import gaussians, voxel
from dmsa_lidar_slam_tpu.trajectory import continuous as ct
from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype

from tests.test_keyframe_dist import build_map
from tests.test_window import true_params_for_window
from tests.test_window_parity import _bench_like_window


def autodiff_e_and_j(forward_fn, params, data, cells_list):
    """The optimizer's autodiff reference path, verbatim semantics."""

    def residuals(p):
        out = forward_fn(p, data)
        parts = [gaussians.cell_residuals(out.points, out.mask, c) for c in cells_list]
        parts.append(out.extra)
        return jnp.concatenate(parts)

    return opt.value_and_jacfwd(residuals, params, 128)


def structured_e_and_j(structured_fn, params, data, cells_list):
    """The optimizer's structured path, verbatim semantics."""
    out, contract, j_extra = structured_fn(params, data)
    e_parts, j_parts = [], []
    for c in cells_list:
        res, g_sorted = gaussians.cell_residuals_and_grad(out.points, out.mask, c)
        g_orig = jnp.zeros_like(out.points).at[c.order].set(g_sorted)
        jp = contract(g_orig)
        jc = voxel.run_sums(jp[c.order], c.start, c.end)
        e_parts.append(res)
        j_parts.append(jnp.where(c.valid[:, None], jc, 0.0))
    e0 = jnp.concatenate(e_parts + [out.extra])
    rdt = e0.dtype
    return e0, jnp.concatenate([j.astype(rdt) for j in j_parts + [j_extra]], axis=0)


def build_cells_for(out, min_grid, min_points=6):
    cells = []
    for factor in (2.0, 5.0):
        cells.append(
            gaussians.build_cells(
                out.points,
                out.mask,
                out.ring_ids,
                factor * min_grid,
                min_points,
                obs_weight=out.obs_weight,
                split_ids=out.split_ids,
            )
        )
    return cells


def _compare(e_a, J_a, e_s, J_s):
    e_a, J_a, e_s, J_s = map(np.asarray, (e_a, J_a, e_s, J_s))
    # point math is f32 in both paths; separately-compiled graphs fuse and
    # reassociate differently.  Most rows agree to f32-ulp scale; cells
    # whose moment difference <L,M2> - n<L,ss^T> nearly cancels amplify the
    # rounding (the sqrt halves the exponent), hence the few-permille slack.
    np.testing.assert_allclose(e_s, e_a, rtol=1e-2, atol=1e-4)
    close = np.isclose(e_s, e_a, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.99, f"only {close.mean():.3f} of rows at ulp-scale"
    # rows of near-zero residuals have ~1/r gradients; compare scaled by
    # the row magnitude (both paths compute the same 1/r to f32 rounding)
    scale = np.maximum(np.abs(J_a).max(axis=1, keepdims=True), 1e-4)
    Jn_s, Jn_a = J_s / scale, J_a / scale
    np.testing.assert_allclose(Jn_s, Jn_a, atol=1e-2)
    close = np.isclose(Jn_s, Jn_a, atol=1e-3)
    assert close.mean() > 0.999, f"only {close.mean():.4f} of entries tight"


def test_window_structured_jacobian_matches_autodiff(rng):
    data, shapes = _bench_like_window(rng)
    chain = true_params_for_window(data, shapes)
    data = data._replace(anchor_orient=chain.orient[0], anchor_transl=chain.transl[0])
    params = cp.params_from_chain(chain) + 0.004 * rng.standard_normal(6 * (shapes.n_ctrl - 1))
    params = jnp.asarray(params, dtype=pose_dtype())

    fwd = ct.make_forward(shapes, use_imu=True)
    structured = ct.make_structured(shapes, use_imu=True)
    out = fwd(params, data)
    cells = build_cells_for(out, 0.3)

    e_a, J_a = autodiff_e_and_j(fwd, params, data, cells)
    e_s, J_s = structured_e_and_j(structured, params, data, cells)
    _compare(e_a, J_a, e_s, J_s)
    # the Jacobian must be nontrivial for the comparison to mean anything
    assert float(jnp.abs(jnp.asarray(J_a)).max()) > 1e-3


def test_keyframe_structured_jacobian_matches_autodiff(rng):
    shapes, kf_map, _ = build_map(rng, n_kf=8, pts_per_kf=512)
    data, params_true = kf_map.to_problem_data(0, 1.0, 1000.0)
    params = jnp.asarray(
        params_true + 0.01 * rng.standard_normal(params_true.shape), dtype=pose_dtype()
    )

    fwd = kfm.make_forward(shapes, True, True, True)
    structured = kfm.make_structured(shapes, True, True, True)
    out = fwd(params, data)
    cells = build_cells_for(out, 0.2)

    e_a, J_a = autodiff_e_and_j(fwd, params, data, cells)
    e_s, J_s = structured_e_and_j(structured, params, data, cells)
    _compare(e_a, J_a, e_s, J_s)
    assert float(jnp.abs(jnp.asarray(J_a)).max()) > 1e-3


def test_optimize_with_structured_matches_plain(rng):
    """End to end: opt.optimize with structured_fn lands on the same params."""
    shapes, kf_map, _ = build_map(rng, n_kf=8, pts_per_kf=512)
    data, params_true = kf_map.to_problem_data(0, 1.0, 1000.0)
    noise = 0.01 * rng.standard_normal(params_true.shape)
    noise[: 3 * (shapes.n_keyframes - 1)] *= 0.3  # as test_keyframe_dist
    params0 = jnp.asarray(params_true + noise, dtype=pose_dtype())

    fwd = kfm.make_forward(shapes, True, True, True)
    structured = kfm.make_structured(shapes, True, True, True)
    settings = opt.OptimSettings(num_iter=14, step_length_optim=0.3, max_step=0.1)

    r_plain = opt.optimize(fwd, params0, data, settings, 0.2)
    r_struct = opt.optimize(fwd, params0, data, settings, 0.2, structured_fn=structured)
    # exact param equality is not stable: the line search argmin can flip on
    # 1-ulp error differences between the two separately-compiled paths and
    # the iterates then diverge benignly.  Assert equal convergence quality:
    # same final error (within noise) and same distance to the true params.
    np.testing.assert_allclose(
        float(r_struct.final_error), float(r_plain.final_error), rtol=0.02
    )
    e_plain = np.linalg.norm(np.asarray(r_plain.params) - params_true)
    e_struct = np.linalg.norm(np.asarray(r_struct.params) - params_true)
    # the plain path makes real progress (slow landscape, 14 damped iters)
    assert float(r_plain.final_error) < 0.9 * float(r_plain.initial_error)
    assert e_plain < np.linalg.norm(noise)
    assert e_struct < max(1.15 * e_plain, e_plain + 0.002), (e_plain, e_struct)
