"""Closed-form batched symmetric 3x3 eigendecomposition (smallest eigenvector).

Replaces Open3D's per-point ``FastEigen3x3`` used inside normal estimation
(the reference's open3d ``estimate_normals``, cloud_pair.py:61-64) with a fully
vectorised jnp implementation: the trigonometric eigenvalue formula plus a
Cayley-Hamilton eigenvector extraction — no data-dependent control flow, so it
fuses into the surrounding jit and runs on the VPU.

The core works on the six SYMMETRIC COMPONENTS as separate (...,)-shaped
arrays rather than (..., 3, 3) tensors: batched 3x3 einsums and
``take_along_axis`` on a trailing length-3 axis lay out pathologically on
TPU (measured 51 ms/800k cloud for ~40 flops/point); the component form is
pure elementwise VPU work.
"""
from __future__ import annotations

import jax.numpy as jnp


def smallest_eigenvector_components(a00, a11, a22, a01, a02, a12):
    """Smallest-eigenvalue unit eigenvector from symmetric components.

    Args:
      a00..a12: (...,) arrays, the six unique entries of symmetric matrices.
    Returns:
      (..., 3) unit vectors. Degenerate (near-isotropic or near-zero) inputs
      return (0, 0, 1), mirroring Open3D's FastEigen3x3 fallback.
    """
    dtype = a00.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    # Scale for numerical range; guard the all-zero matrix.
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
                    jnp.maximum(jnp.abs(a22), jnp.abs(a01))),
        jnp.maximum(jnp.abs(a02), jnp.abs(a12)),
    )
    ok_scale = scale > 0
    inv = jnp.where(ok_scale, 1.0 / jnp.where(ok_scale, scale, 1.0), 1.0)
    a00, a11, a22 = a00 * inv, a11 * inv, a22 * inv
    a01, a02, a12 = a01 * inv, a02 * inv, a12 * inv

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
    lam_mid = 3.0 * q - lam_max - lam_min

    # Cayley-Hamilton: columns of C = (A - lam_max I)(A - lam_mid I) span
    # the lam_min eigenspace. Written out per component (M1/M2 share A's
    # off-diagonals; only the diagonals shift).
    m100, m111, m122 = a00 - lam_max, a11 - lam_max, a22 - lam_max
    m200, m211, m222 = a00 - lam_mid, a11 - lam_mid, a22 - lam_mid
    C00 = m100 * m200 + a01 * a01 + a02 * a02
    C10 = a01 * m200 + m111 * a01 + a12 * a02
    C20 = a02 * m200 + a12 * a01 + m122 * a02
    C01 = m100 * a01 + a01 * m211 + a02 * a12
    C11 = a01 * a01 + m111 * m211 + a12 * a12
    C21 = a02 * a01 + a12 * m211 + m122 * a12
    C02 = m100 * a02 + a01 * a12 + a02 * m222
    C12 = a01 * a02 + m111 * a12 + a12 * m222
    C22 = a02 * a02 + a12 * a12 + m122 * m222

    # Pick the largest column (argmax semantics: first max wins).
    n0 = C00 * C00 + C10 * C10 + C20 * C20
    n1 = C01 * C01 + C11 * C11 + C21 * C21
    n2 = C02 * C02 + C12 * C12 + C22 * C22
    use1 = n1 > n0
    use2 = n2 > jnp.maximum(n0, n1)
    vx = jnp.where(use2, C02, jnp.where(use1, C01, C00))
    vy = jnp.where(use2, C12, jnp.where(use1, C11, C10))
    vz = jnp.where(use2, C22, jnp.where(use1, C21, C20))
    vnorm = jnp.sqrt(vx * vx + vy * vy + vz * vz)

    good = (p > 16 * eps) & (vnorm > jnp.sqrt(eps)) & ok_scale
    safe_n = jnp.where(vnorm > 0, vnorm, 1.0)
    vx = jnp.where(good, vx / safe_n, 0.0)
    vy = jnp.where(good, vy / safe_n, 0.0)
    vz = jnp.where(good, vz / safe_n, 1.0)
    return jnp.stack([vx, vy, vz], axis=-1)


def smallest_eigenvector_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue for a batch of symmetric 3x3.

    Args:
      A: (..., 3, 3) symmetric matrices.
    Returns:
      (..., 3) unit vectors (see smallest_eigenvector_components).
    """
    return smallest_eigenvector_components(
        A[..., 0, 0], A[..., 1, 1], A[..., 2, 2],
        A[..., 0, 1], A[..., 0, 2], A[..., 1, 2],
    )
