"""Closed-form 3x3 spectral functions vs numpy eigh golden."""

import numpy as np

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.ops import eig3
from dmsa_lidar_slam_tpu.ops.gaussians import COV_EIG_FLOOR


def random_spd(rng, n, cond_spread=True):
    A = rng.normal(size=(n, 3, 3))
    S = A @ A.transpose(0, 2, 1)
    if cond_spread:
        # mix of well-conditioned, planar (tiny lambda_min), and isotropic
        S[: n // 3] += 1e-6 * np.eye(3)  # nearly singular direction kept
        S[n // 3 : 2 * n // 3] = np.eye(3)[None] * rng.uniform(0.5, 2, size=(n // 3, 1, 1))
    return S


def np_floored_inverse(S, floor):
    # the HARD eigenvalue floor of the reference (Gaussians.h:181-201);
    # eig3 matched a smooth barrier until r5 (see eig3._floor_fns)
    w, v = np.linalg.eigh(S)
    h = np.maximum(w, floor)
    return np.einsum("nij,nj,nkj->nik", v, 1.0 / h, v)


def test_eigvals_match_numpy(rng):
    S = random_spd(rng, 120)
    got = np.sort(np.asarray(eig3.sym_eigvals3(jnp.asarray(S))), axis=-1)
    want = np.sort(np.linalg.eigvalsh(S), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_floored_inverse_matches_eigh(rng):
    S = random_spd(rng, 120)
    got = np.asarray(eig3.floored_inverse_sym3(jnp.asarray(S), COV_EIG_FLOOR))
    want = np_floored_inverse(S, COV_EIG_FLOOR)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 / COV_EIG_FLOOR * 1e-3)


def test_floored_inverse_planar_cell(rng):
    # covariance of a nearly-planar point set: the floor dominates the
    # normal direction
    pts = rng.normal(size=(60, 3))
    pts[:, 2] *= 1e-5
    S = np.cov(pts.T, ddof=1)[None]
    got = np.asarray(eig3.floored_inverse_sym3(jnp.asarray(S), COV_EIG_FLOOR))[0]
    want = np_floored_inverse(S, COV_EIG_FLOOR)[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)
    # normal-direction information is exactly 1/floor
    assert abs(got[2, 2] - 1.0 / COV_EIG_FLOOR) / (1.0 / COV_EIG_FLOOR) < 1e-3


def test_isotropic_cell():
    S = jnp.asarray(np.eye(3)[None] * 0.04)
    got = np.asarray(eig3.floored_inverse_sym3(S, COV_EIG_FLOOR))[0]
    np.testing.assert_allclose(got, np.eye(3) / 0.04, rtol=1e-5)


def test_f32_accuracy(rng):
    S = random_spd(rng, 64).astype(np.float32)
    got = np.asarray(eig3.floored_inverse_sym3(jnp.asarray(S), COV_EIG_FLOOR))
    want = np_floored_inverse(S.astype(np.float64), COV_EIG_FLOOR)
    # f32 with values up to 1/floor = 1e4: accept relative error 1%
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert np.quantile(rel, 0.99) < 0.02, np.quantile(rel, 0.99)


def test_smallest_eigvec_matches_eigh():
    from dmsa_lidar_slam_tpu.ops.eig3 import smallest_eigvec_sym3

    rng = np.random.default_rng(11)
    m = rng.standard_normal((256, 3, 3))
    a = jnp.asarray(m @ m.transpose(0, 2, 1) + 0.01 * np.eye(3))
    v = np.asarray(smallest_eigvec_sym3(a))
    _, evecs = np.linalg.eigh(np.asarray(a))
    ref = evecs[:, :, 0]
    # eigenvectors match up to sign
    dots = np.abs(np.sum(v * ref, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
