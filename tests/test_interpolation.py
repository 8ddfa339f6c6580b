"""Barycentric rational (Floater-Hormann d=2) interpolation golden tests.

The numpy reference below transcribes the textbook FH weight formula used
by boost::math::barycentric_rational (the reference's interpolator,
ContinuousTrajectory.h:214).
"""

import numpy as np

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import interpolation as ip


def np_fh_weights(x, d):
    n = len(x)
    w = np.zeros(n)
    for k in range(n):
        s = 0.0
        for i in range(max(k - d, 0), min(k, n - 1 - d) + 1):
            prod = 1.0
            for j in range(i, i + d + 1):
                if j == k:
                    continue
                prod *= abs(x[k] - x[j])
            s += 1.0 / prod
        w[k] = ((-1) ** (k - d)) * s
    return w


def np_bary_eval(t, x, y, w):
    num = 0.0
    den = 0.0
    for k in range(len(x)):
        if abs(t - x[k]) < 1e-14:
            return y[k]
        c = w[k] / (t - x[k])
        num += c * y[k]
        den += c
    return num / den


def test_weights_match_numpy():
    x = np.linspace(0.0, 0.5, 6)
    w = np.asarray(ip.floater_hormann_weights(jnp.asarray(x), d=2))
    np.testing.assert_allclose(w, np_fh_weights(x, 2), rtol=1e-12)


def test_interp_matches_numpy(rng):
    x = np.sort(rng.uniform(0, 1, size=6))
    y = rng.normal(size=6)
    w = np_fh_weights(x, 2)
    te = np.linspace(x[0], x[-1], 33)
    got = np.asarray(ip.barycentric_interp(jnp.asarray(te), jnp.asarray(x), jnp.asarray(y), d=2))
    want = np.array([np_bary_eval(t, x, y, w) for t in te])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_interp_hits_knots(rng):
    x = np.linspace(0.0, 0.5, 6)
    y = rng.normal(size=(6, 3))
    got = np.asarray(ip.barycentric_interp(jnp.asarray(x), jnp.asarray(x), jnp.asarray(y), d=2))
    np.testing.assert_allclose(got, y, atol=1e-12)


def test_interp_reproduces_polynomials():
    # FH with d=2 reproduces polynomials of degree <= 2 exactly
    x = np.linspace(0.0, 1.0, 7)
    te = np.linspace(0.0, 1.0, 41)
    for coeffs in ([1.0, 0.0, 0.0], [0.3, -1.2, 0.0], [0.5, 2.0, -3.0]):
        p = np.polynomial.polynomial.Polynomial(coeffs)
        got = np.asarray(ip.barycentric_interp(jnp.asarray(te), jnp.asarray(x), jnp.asarray(p(x)), d=2))
        np.testing.assert_allclose(got, p(te), atol=1e-10)


def test_derivative_matches_finite_difference(rng):
    x = np.linspace(0.0, 1.0, 6)
    y = rng.normal(size=6)
    te = np.array([0.137, 0.511, 0.93])
    got = np.asarray(ip.barycentric_derivative(jnp.asarray(te), jnp.asarray(x), jnp.asarray(y), d=2))
    eps = 1e-7
    w = np_fh_weights(x, 2)
    fd = np.array(
        [(np_bary_eval(t + eps, x, y, w) - np_bary_eval(t - eps, x, y, w)) / (2 * eps) for t in te]
    )
    np.testing.assert_allclose(got, fd, rtol=1e-5, atol=1e-6)


def test_derivative_at_knots(rng):
    x = np.linspace(0.0, 1.0, 6)
    y = rng.normal(size=6)
    w = np_fh_weights(x, 2)
    got = np.asarray(ip.barycentric_derivative(jnp.asarray(x[2:4]), jnp.asarray(x), jnp.asarray(y), d=2))
    eps = 1e-6
    fd = np.array(
        [(np_bary_eval(t + eps, x, y, w) - np_bary_eval(t - eps, x, y, w)) / (2 * eps) for t in x[2:4]]
    )
    np.testing.assert_allclose(got, fd, rtol=1e-4, atol=1e-5)


def test_interp_rotations_brackets(rng):
    from scipy.spatial.transform import Rotation, Slerp

    stamps = np.linspace(0.0, 0.5, 6)
    aa = rng.normal(size=(6, 3)) * 0.3
    te = np.linspace(0.0, 0.5, 21)
    got = np.asarray(ip.interp_rotations(jnp.asarray(te), jnp.asarray(stamps), jnp.asarray(aa)))
    sci = Slerp(stamps, Rotation.from_rotvec(aa))
    np.testing.assert_allclose(got, sci(te).as_rotvec(), atol=1e-8)
