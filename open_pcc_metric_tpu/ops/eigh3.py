"""Closed-form batched symmetric 3x3 eigendecomposition (smallest eigenvector).

Replaces Open3D's per-point ``FastEigen3x3`` used inside normal estimation
(the reference's open3d ``estimate_normals``, cloud_pair.py:61-64) with a fully
vectorised jnp implementation: the trigonometric eigenvalue formula plus a
Cayley-Hamilton eigenvector extraction — no data-dependent control flow, so it
fuses into the surrounding jit and runs on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def smallest_eigenvector_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue for a batch of symmetric 3x3.

    Args:
      A: (..., 3, 3) symmetric matrices.
    Returns:
      (..., 3) unit vectors. Degenerate (near-isotropic or near-zero) inputs
      return (0, 0, 1), mirroring Open3D's FastEigen3x3 fallback.
    """
    dtype = A.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    # Scale for numerical range; guard the all-zero matrix.
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    ok_scale = scale > 0
    A = jnp.where(ok_scale, A / jnp.where(ok_scale, scale, 1.0), A)

    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > eps, p, 1.0)

    B00 = (a00 - q) / safe_p
    B11 = (a11 - q) / safe_p
    B22 = (a22 - q) / safe_p
    B01 = a01 / safe_p
    B02 = a02 / safe_p
    B12 = a12 / safe_p
    detB = (
        B00 * (B11 * B22 - B12 * B12)
        - B01 * (B01 * B22 - B12 * B02)
        + B02 * (B01 * B12 - B11 * B02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Cayley-Hamilton: columns of (A - lam_max I)(A - lam_mid I) span the
    # lam_min eigenspace. Using (A - lam_max I)(A - (3q - lam_max - lam_min) I):
    lam_mid = 3.0 * q - lam_max - lam_min

    I = jnp.eye(3, dtype=dtype)
    M1 = A - lam_max[..., None, None] * I
    M2 = A - lam_mid[..., None, None] * I
    C = jnp.einsum("...ij,...jk->...ik", M1, M2)

    norms = jnp.sum(C * C, axis=-2)  # (..., 3) column squared norms
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(C, col[..., None, None], axis=-1)[..., 0]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)

    good = (
        (p[..., None] > 16 * eps)
        & (vnorm > jnp.sqrt(eps))
        & ok_scale[..., 0]
    )
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype), v.shape
    )
    v = jnp.where(good, v / jnp.where(vnorm > 0, vnorm, 1.0), fallback)
    return v
