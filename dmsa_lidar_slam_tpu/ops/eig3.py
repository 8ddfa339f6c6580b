"""Closed-form symmetric 3x3 spectral functions — no iterative eigensolver.

The DMSA information matrix is V diag(1/max(lambda, floor)) V^T of the cell
covariance (Gaussians.h:181-201).  jnp.linalg.eigh lowers to an iterative
solver (slow for large batches of 3x3 on TPU); instead:

  - eigenvalues by the trigonometric closed form (Smith's method),
  - the matrix function WITHOUT eigenvectors via spectral polynomial
    calculus: for symmetric A with eigenvalues l1 >= l2 >= l3 and any g,
        g(A) = dd1 * I + dd12 * (A - l1 I) + dd123 * (A - l1 I)(A - l2 I)
    with Newton divided differences dd of g — exact for distinct
    eigenvalues and continuous in the degenerate limit (divided
    differences fall back to derivatives).

Everything is branch-free element-wise VPU math that vmaps trivially.
"""

import jax.numpy as jnp

_EPS = 1e-12


def sym_eigvals3(A):
    """Eigenvalues of symmetric [..., 3, 3], descending [..., 3]."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = detB / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    # p ~ 0 (isotropic): all eigenvalues = q
    iso = p2 < _EPS
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)
    l3 = jnp.where(iso, q, l3)
    return jnp.stack([l1, l2, l3], axis=-1)


def _divided_diff(g, dg, a, b):
    """(g(a) - g(b)) / (a - b), falling back to dg at the midpoint when the
    nodes (nearly) coincide."""
    diff = a - b
    small = jnp.abs(diff) < 1e-6
    safe = jnp.where(small, 1.0, diff)
    return jnp.where(small, dg(0.5 * (a + b)), (g(a) - g(b)) / safe)


def matrix_function_sym3(A, g, dg, d2g):
    """g(A) for symmetric [..., 3, 3] via the Newton-form spectral polynomial.

    dg / d2g supply first/second derivatives for the confluent (repeated
    eigenvalue) limits.
    """
    lam = sym_eigvals3(A)
    l1, l2, l3 = lam[..., 0], lam[..., 1], lam[..., 2]
    dd1 = g(l1)
    dd12 = _divided_diff(g, dg, l1, l2)
    dd23 = _divided_diff(g, dg, l2, l3)
    # second divided difference; confluent fallback to d2g/2
    diff13 = l1 - l3
    small13 = jnp.abs(diff13) < 1e-6
    safe13 = jnp.where(small13, 1.0, diff13)
    dd123 = jnp.where(
        small13, 0.5 * d2g((l1 + l3) * 0.5), (dd12 - dd23) / safe13
    )
    eye = jnp.eye(3, dtype=A.dtype)
    A1 = A - l1[..., None, None] * eye
    A2 = A - l2[..., None, None] * eye
    out = (
        dd1[..., None, None] * eye
        + dd12[..., None, None] * A1
        + dd123[..., None, None] * (A1 @ A2)
    )
    # exact symmetrization (the polynomial is symmetric analytically)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def floored_inverse_sym3(A, floor):
    """Eigenvalue-floored inverse V diag(1/max(lambda, floor)) V^T without
    computing V (the information matrix, Gaussians.h:181-201).

    The hard floor makes g non-differentiable, which is poison for the
    Newton-form spectral polynomial when eigenvalues cluster around the
    kink (the confluent fallbacks would be discontinuous).  We use the C^oo
    barrier h(x) = x + floor * exp(-x / floor):
        h(0) = floor           -> g(0) = 1/floor (exact floor behavior)
        h(x) ~ x for x >> floor -> g ~ 1/x       (exact inverse behavior)
    so g deviates from the reference's hard floor only in the transition
    band around lambda ~ floor (where the reference itself is kinked).
    """
    m = floor

    def _e(x):
        # clipped exponent: keeps h finite for (numerical-noise) negative
        # eigenvalues so no NaN can leak out of masked junk cells
        return jnp.exp(jnp.clip(-x / m, -60.0, 30.0))

    def h(x):
        return x + m * _e(x)

    def hp(x):
        return 1.0 - _e(x)

    def hpp(x):
        return _e(x) / m

    def g(x):
        return 1.0 / h(x)

    def dg(x):
        return -hp(x) / jnp.maximum(h(x) ** 2, _EPS)

    def d2g(x):
        hx = jnp.maximum(h(x), _EPS)
        return (2.0 * hp(x) ** 2 / hx - hpp(x)) / (hx * hx)

    return matrix_function_sym3(A, g, dg, d2g)
