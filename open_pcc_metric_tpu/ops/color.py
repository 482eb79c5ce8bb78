"""Colour-space transforms and peaks, matching the reference bit-for-bit.

Reference semantics reproduced exactly:
  * rgb->ycc uses the BT.709 full-range matrix (reference: metric.py:270-275),
  * rgb->yuv uses the reference's integer-ish matrix (metric.py:276-281),
  * identity when source == target (metric.py:266-267),
  * colour peak: rgb -> 255.0 although colours live in [0,1] — the reference's
    acknowledged inconsistency, SURVEY Q5 (metric.py:293-299).

The reference applies the matrix row-by-row via ``np.apply_along_axis``
(metric.py:286-290); here the 3x3 matrix is unrolled into elementwise
multiply-adds. NOT a matmul on purpose: XLA:TPU lowers f32 matmuls onto
the MXU at default precision, which multiplies in bfloat16 — measured
~2.6e-3 relative error on transformed colours at 800k, i.e. a 0.33 dB
colour-Hausdorff-PSNR error vs the f64 oracle (caught by bench.py's
max_abs_psnr_delta gate). The unrolled form runs on the VPU in full f32
(and is faster anyway for a 3-wide contraction).
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
    """(N, 3) colour transform against the reference matrices (exact f32).

    Unrolled mul-adds, NOT ``colors @ m.T`` — see module docstring (MXU
    bf16 default precision corrupts colour PSNRs on TPU).
    """
    if source_scheme == target_scheme:
        return colors
    m = color_matrix(source_scheme, target_scheme)
    cols = []
    for r in range(3):
        acc = None
        for c in range(3):
            coef = jnp.asarray(m[r, c], colors.dtype)
            term = colors[..., c] * coef
            acc = term if acc is None else acc + term
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def get_color_peak(color_scheme: str) -> float:
    peaks = {"rgb": 255.0, "ycc": 1.0, "yuv": 1.0}
    return peaks[color_scheme]
