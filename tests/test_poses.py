"""Pose chain relative<->global conversion vs a direct numpy compose."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import poses as cp


def numpy_relative2global(rel_o, rel_t):
    """Direct transcription of the compose semantics
    (ConsecutivePoses.h:26-43) in numpy."""
    n = rel_o.shape[0]
    R = np.eye(3)
    T = np.zeros(3)
    go, gt = [], []
    for k in range(n):
        T = T + R @ rel_t[k]
        gt.append(T)
        R = R @ Rotation.from_rotvec(rel_o[k]).as_matrix()
        go.append(Rotation.from_matrix(R).as_rotvec())
    return np.array(go), np.array(gt)


def random_chain(rng, n):
    o = rng.normal(size=(n, 3)) * 0.4
    t = rng.normal(size=(n, 3))
    return o, t


def test_relative2global_matches_numpy(rng):
    o, t = random_chain(rng, 8)
    gp = cp.relative2global(cp.PoseChain(jnp.asarray(o), jnp.asarray(t)))
    go_ref, gt_ref = numpy_relative2global(o, t)
    np.testing.assert_allclose(np.asarray(gp.transl), gt_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gp.orient), go_ref, atol=1e-8)


def test_roundtrip(rng):
    o, t = random_chain(rng, 10)
    chain = cp.PoseChain(jnp.asarray(o), jnp.asarray(t))
    back = cp.global2relative(cp.relative2global(chain))
    np.testing.assert_allclose(np.asarray(back.orient), o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.transl), t, atol=1e-9)


def test_params_pack_unpack(rng):
    o, t = random_chain(rng, 6)
    chain = cp.PoseChain(jnp.asarray(o), jnp.asarray(t))
    params = cp.params_from_chain(chain)
    assert params.shape == (6 * 5,)
    back = cp.chain_from_params(params, chain)
    np.testing.assert_allclose(np.asarray(back.orient), o, atol=0)
    np.testing.assert_allclose(np.asarray(back.transl), t, atol=0)


def test_params_layout_matches_reference(rng):
    """Poses.h:64-70 packs column-major over the 3xN blocks: all
    orientations (poses 1..N-1) first, then translations."""
    o, t = random_chain(rng, 4)
    params = np.asarray(cp.params_from_chain(cp.PoseChain(jnp.asarray(o), jnp.asarray(t))))
    want = np.concatenate([o[1:].ravel(), t[1:].ravel()])
    np.testing.assert_allclose(params, want, atol=0)


def test_transform_points(rng):
    o = rng.normal(size=3) * 0.5
    t = rng.normal(size=3)
    pts = rng.normal(size=(100, 3))
    got = np.asarray(cp.transform_points(jnp.asarray(o), jnp.asarray(t), jnp.asarray(pts)))
    want = pts @ Rotation.from_rotvec(o).as_matrix().T + t
    np.testing.assert_allclose(got, want, atol=1e-10)
