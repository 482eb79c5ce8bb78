"""High-level evaluation entry points (the programmatic API).

Mirrors the reference's de-facto library path (SURVEY §3.4):
``CloudPair -> MetricCalculator -> transform_options -> calculate``.
"""
from __future__ import annotations

import typing

import jax.numpy as jnp

from .calculator import CalculateResult, MetricCalculator
from .cloud import Cloud
from .cloud_pair import CloudPair
from .io import read_point_cloud
from .options import CalculateOptions, transform_options

_DTYPES = {"float32": jnp.float32, "float64": jnp.float64}


def load_cloud(
    path: str, dtype: str = "float32", pad_to: typing.Optional[int] = None
) -> Cloud:
    raw = read_point_cloud(path)
    return Cloud.from_numpy(
        raw.points,
        colors=raw.colors,
        normals=raw.normals,
        dtype=_DTYPES[dtype],
        pad_to=pad_to,
    )


def evaluate_pair(
    origin: Cloud,
    reconst: Cloud,
    options: typing.Optional[CalculateOptions] = None,
    backend: str = "auto",
    engine: str = "auto",
) -> CalculateResult:
    """Evaluate the option-selected metric table for one pair.

    engine:
      * "fused" — one jit-compiled device program + host epilogue
        (ops/fused.py); covers every metric reachable from CalculateOptions.
      * "dag"   — the reference-shaped lazy metric DAG (CloudPair +
        MetricCalculator); use for custom/partial metric lists.
      * "auto"  — fused (the results are identical; equality is tested).
    """
    options = options or CalculateOptions()
    if engine == "auto":
        engine = "fused"
    if engine == "fused":
        return _evaluate_pair_fused(origin, reconst, options, backend)
    pair = CloudPair(origin, reconst, backend=backend)
    calculator = MetricCalculator(pair)
    return calculator.calculate(transform_options(options))


def _evaluate_pair_fused(
    origin: Cloud,
    reconst: Cloud,
    options: CalculateOptions,
    backend: str,
) -> CalculateResult:
    """Fill the reference-ordered metric table from one fused evaluation."""
    import numpy as np

    from . import metric as M
    from .ops.fused import fused_evaluate

    stats = fused_evaluate(
        origin,
        reconst,
        color_scheme=options.color,
        point_to_plane=options.point_to_plane,
        d2_mode=options.d2_mode,
        backend=backend,
        peak=options.peak,
    )

    def value_for(m) -> typing.Any:
        child = m.metrics[0] if isinstance(m, M.SymmetricMetric) else m
        name = child.__class__.__name__
        if name in ("MinSqrtDistance", "MaxSqrtDistance"):
            side = ""
        elif isinstance(m, M.SymmetricMetric):
            side = "sym"
        else:
            side = "left" if child.is_left else "right"
        p2p = getattr(child, "point_to_plane", False)
        keys = {
            "MinSqrtDistance": "min_sqrt",
            "MaxSqrtDistance": "max_sqrt",
            "GeoMSE": ("d2_mse_" if p2p else "geo_mse_") + side,
            "GeoPSNR": ("d2_psnr_" if p2p else "geo_psnr_") + side,
            "GeoHausdorffDistance": (
                ("d2_hausdorff_" if p2p else "geo_hausdorff_") + side
            ),
            "GeoHausdorffDistancePSNR": (
                ("d2_hausdorff_psnr_" if p2p else "geo_hausdorff_psnr_")
                + side
            ),
            "ColorMSE": "color_mse_" + side,
            "ColorPSNR": "color_psnr_" + side,
            "ColorHausdorffDistance": "color_hausdorff_" + side,
            "ColorHausdorffDistancePSNR": "color_hausdorff_psnr_" + side,
        }
        if name in ("MinSqrtDistance", "MaxSqrtDistance"):
            return np.float64(stats[keys[name]])
        val = stats[keys[name]]
        arr = np.asarray(val, dtype=np.float64)
        return np.float64(arr) if arr.ndim == 0 else arr

    metrics = transform_options(options)
    for m in metrics:
        m.value = value_for(m)
        if isinstance(m, M.SymmetricMetric):
            for child in m.metrics:
                child.value = value_for(child)
    return CalculateResult(metrics)


def evaluate_files(
    ocloud: str,
    pcloud: str,
    options: typing.Optional[CalculateOptions] = None,
    dtype: str = "float32",
    backend: str = "auto",
) -> CalculateResult:
    origin = load_cloud(ocloud, dtype=dtype)
    reconst = load_cloud(pcloud, dtype=dtype)
    return evaluate_pair(origin, reconst, options, backend=backend)
