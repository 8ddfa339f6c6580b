"""Barycentric-rational and slerp interpolation of pose trajectories.

The reference interpolates control-pose translations onto the dense time
grid with Boost.Math's barycentric_rational of approximation order 2
(Floater-Hormann d=2; reference: ContinuousTrajectory.h:189-226) and
orientations with slerp between the two bracketing control poses
(ContinuousTrajectory.h:570-591).

Here both are expressed as dense [n_eval, n_knots] weight matrices so the
whole dense table is produced by two small matmuls + one batched slerp —
no per-sample loops.
"""

import numpy as np

import jax.numpy as jnp

from dmsa_lidar_slam_tpu.core import rotations as rot


def floater_hormann_weights_np(t_knots: np.ndarray, d: int = 2) -> np.ndarray:
    """Host (numpy, f64) twin of floater_hormann_weights, for precomputing
    compile-time constant interpolation operators (see uniform_grid_consts)."""
    n = len(t_knots)
    if n <= d:
        d = n - 1
    w = np.zeros(n)
    for k in range(n):
        s = 0.0
        for i in range(max(k - d, 0), min(k, n - 1 - d) + 1):
            prod = 1.0
            for j in range(i, i + d + 1):
                if j == k:
                    continue
                prod *= abs(t_knots[k] - t_knots[j])
            s += 1.0 / prod
        w[k] = s if (k - d) % 2 == 0 else -s
    return w


def barycentric_matrix_np(t_eval, t_knots, weights) -> np.ndarray:
    """Host twin of barycentric_matrix (same exact-hit handling)."""
    diff = t_eval[:, None] - t_knots[None, :]
    exact = np.abs(diff) < 1e-12
    any_exact = exact.any(axis=1, keepdims=True)
    safe_diff = np.where(exact, 1.0, diff)
    terms = weights[None, :] / safe_diff
    A_smooth = terms / terms.sum(axis=1, keepdims=True)
    A_exact = exact.astype(np.float64)
    A_exact = A_exact / np.maximum(A_exact.sum(axis=1, keepdims=True), 1.0)
    return np.where(any_exact, A_exact, A_smooth)


def uniform_grid_consts(n_eval: int, n_knots: int, interval_len: int, d: int = 2):
    """Constant interpolation operators for knots sitting exactly on a
    uniform evaluation grid (knot k at sample k * interval_len).

    The barycentric matrix A and the slerp bracket (left, right, u) are
    invariant to the grid step dt (A's normalization cancels the dt
    scaling of weights and differences), so for the sliding window — whose
    control stamps always come from ctrl_stamps_from_dt — the whole dense
    interpolation operator is a compile-time constant: translations become
    ONE [E, K] matmul and orientations one constant-index gather + slerp.

    Returns (A [E, K] f64, left [E] i32, right [E] i32, u [E] f64) numpy.
    """
    t_eval = np.arange(n_eval, dtype=np.float64)
    t_knots = np.arange(n_knots, dtype=np.float64) * float(interval_len)
    w = floater_hormann_weights_np(t_knots, d)
    A = barycentric_matrix_np(t_eval, t_knots, w)
    # slerp bracket, exactly as interp_rotations computes it
    right = np.searchsorted(t_knots[:-1], t_eval, side="left").astype(np.int64)
    right = np.clip(right, 0, n_knots - 1)
    left = np.maximum(right - 1, 0)
    denom = t_knots[right] - t_knots[left]
    u = np.where(right > 0, (t_eval - t_knots[left]) / np.where(denom == 0, 1.0, denom), 1.0)
    return A, left.astype(np.int32), right.astype(np.int32), u


def floater_hormann_weights(t_knots: jnp.ndarray, d: int = 2) -> jnp.ndarray:
    """Floater-Hormann barycentric weights for knots t_knots, blend order d.

    w_k = (-1)^(k-d) * sum_{i in J_k} prod_{j=i..i+d, j != k} 1 / |t_k - t_j|
    with J_k = { i : max(0, k-d) <= i <= min(k, n-1-d) }.

    Matches boost::math::barycentric_rational's weight construction so the
    interpolant agrees with the reference to rounding.  Knot count is
    static (it's the number of control poses), so the Python loops below
    unroll at trace time into a few gathers.
    """
    n = t_knots.shape[0]
    if n <= d:
        d = n - 1
    w = jnp.zeros(n, dtype=t_knots.dtype)
    for k in range(n):
        s = jnp.zeros((), dtype=t_knots.dtype)
        i_min = max(k - d, 0)
        i_max = min(k, n - 1 - d)
        for i in range(i_min, i_max + 1):
            prod = jnp.ones((), dtype=t_knots.dtype)
            for j in range(i, i + d + 1):
                if j == k:
                    continue
                prod = prod * jnp.abs(t_knots[k] - t_knots[j])
            s = s + 1.0 / prod
        sign = 1.0 if (k - d) % 2 == 0 else -1.0
        w = w.at[k].set(sign * s)
    return w


def barycentric_matrix(t_eval: jnp.ndarray, t_knots: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Dense interpolation matrix A [n_eval, n_knots]: y_eval = A @ y_knots.

    A[e, k] = (w_k / (t_e - t_k)) / sum_j (w_j / (t_e - t_j)), with exact-hit
    handling: if t_e == t_k the row is the unit vector e_k.
    """
    diff = t_eval[:, None] - t_knots[None, :]  # [E, K]
    exact = jnp.abs(diff) < 1e-12
    any_exact = jnp.any(exact, axis=1, keepdims=True)
    safe_diff = jnp.where(exact, 1.0, diff)
    terms = weights[None, :] / safe_diff
    A_smooth = terms / jnp.sum(terms, axis=1, keepdims=True)
    A_exact = exact.astype(t_eval.dtype)
    A_exact = A_exact / jnp.maximum(jnp.sum(A_exact, axis=1, keepdims=True), 1.0)
    return jnp.where(any_exact, A_exact, A_smooth)


def barycentric_interp(t_eval, t_knots, y_knots, d: int = 2):
    """Interpolate y_knots [K, ...] at t_eval [E] -> [E, ...]."""
    w = floater_hormann_weights(t_knots, d)
    A = barycentric_matrix(t_eval, t_knots, w)
    return jnp.tensordot(A, y_knots, axes=([1], [0]))


def barycentric_derivative(t_eval, t_knots, y_knots, d: int = 2):
    """Derivative of the barycentric rational interpolant at t_eval [E].

    Standard formula (Schneider-Werner): for t not a knot,
      r'(t) = sum_k c_k(t) * (r(t) - y_k) / (t - t_k),  c = normalized terms.
    At a knot t_i: r'(t_i) = -sum_{k != i} (w_k / w_i) * (y_i - y_k)/(t_i - t_k).
    Used for the window initial guess's terminal velocity
    (ContinuousTrajectory.h:419, s.prime).
    """
    w = floater_hormann_weights(t_knots, d)
    diff = t_eval[:, None] - t_knots[None, :]
    exact = jnp.abs(diff) < 1e-12
    any_exact = jnp.any(exact, axis=1)

    safe_diff = jnp.where(exact, 1.0, diff)
    terms = w[None, :] / safe_diff
    c = terms / jnp.sum(terms, axis=1, keepdims=True)  # [E, K]
    r = c @ y_knots  # [E, ...]
    dr_smooth = jnp.einsum("ek,ek...->e...", c / safe_diff, r[:, None] - y_knots[None, :])

    # knot-exact rows
    idx = jnp.argmax(exact, axis=1)  # knot index i per row (valid where any_exact)
    w_i = w[idx]
    y_i = y_knots[idx]
    t_i = t_knots[idx]
    dknot = t_i[:, None] - t_knots[None, :]
    mask = jnp.abs(dknot) < 1e-12
    safe_dknot = jnp.where(mask, 1.0, dknot)
    coeff = jnp.where(mask, 0.0, (w[None, :] / w_i[:, None]) / safe_dknot)
    dr_exact = -jnp.einsum("ek,ek...->e...", coeff, y_i[:, None] - y_knots[None, :])

    return jnp.where(any_exact[:, None] if r.ndim > 1 else any_exact, dr_exact, dr_smooth)


def interp_rotations(t_eval, t_knots, orient_knots):
    """Slerp orientations [K, 3] onto t_eval [E] -> [E, 3].

    Matches getInterpRotation (ContinuousTrajectory.h:570-591): bracket via
    lower_bound over knots[:-1], t_rel = (t - t_l)/(t_r - t_l) unclamped
    (extrapolates by slerp beyond the ends, as the reference does).
    """
    # lower_bound over stamps[:-1] (the reference excludes the last knot)
    right = jnp.searchsorted(t_knots[:-1], t_eval, side="left")
    right = jnp.clip(right, 0, t_knots.shape[0] - 1)
    left = jnp.maximum(right - 1, 0)
    denom = t_knots[right] - t_knots[left]
    t_rel = jnp.where(right > 0, (t_eval - t_knots[left]) / jnp.where(denom == 0, 1.0, denom), 1.0)

    q = rot.axang2quat(orient_knots)  # [K, 4]
    q_interp = rot.quat_slerp(q[left], q[right], t_rel)
    return rot.quat2axang(q_interp)
