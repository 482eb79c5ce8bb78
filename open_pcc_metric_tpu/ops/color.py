"""Colour-space transforms and peaks, matching the reference bit-for-bit.

Reference semantics reproduced exactly:
  * rgb->ycc uses the BT.709 full-range matrix (reference: metric.py:270-275),
  * rgb->yuv uses the reference's integer-ish matrix (metric.py:276-281),
  * identity when source == target (metric.py:266-267),
  * colour peak: rgb -> 255.0 although colours live in [0,1] — the reference's
    acknowledged inconsistency, SURVEY Q5 (metric.py:293-299).

The reference applies the matrix row-by-row via ``np.apply_along_axis``
(metric.py:286-290); here it is a single (N,3)x(3,3) matmul.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_RGB_TO_YCC = np.array(
    [
        [0.2126, 0.7152, 0.0722],
        [-0.1146, -0.3854, 0.5],
        [0.5, -0.4542, -0.0458],
    ]
)

_RGB_TO_YUV = np.array(
    [
        [0.25, 0.5, 0.25],
        [1.0, 0.0, -1.0],
        [-0.5, 1.0, -0.5],
    ]
)

COLOR_SCHEMES = ("rgb", "ycc", "yuv")


def color_matrix(source_scheme: str, target_scheme: str) -> np.ndarray:
    if source_scheme == target_scheme:
        return np.eye(3)
    if (source_scheme, target_scheme) == ("rgb", "ycc"):
        return _RGB_TO_YCC
    if (source_scheme, target_scheme) == ("rgb", "yuv"):
        return _RGB_TO_YUV
    raise ValueError(
        f"unsupported colour transform {source_scheme!r} -> {target_scheme!r}"
    )


def transform_colors(
    colors: jnp.ndarray, source_scheme: str, target_scheme: str
) -> jnp.ndarray:
    """(N, 3) colour transform; matmul against the reference matrices."""
    if source_scheme == target_scheme:
        return colors
    m = jnp.asarray(color_matrix(source_scheme, target_scheme), colors.dtype)
    return colors @ m.T


def get_color_peak(color_scheme: str) -> float:
    peaks = {"rgb": 255.0, "ycc": 1.0, "yuv": 1.0}
    return peaks[color_scheme]
