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
) -> CalculateResult:
    options = options or CalculateOptions()
    pair = CloudPair(origin, reconst, backend=backend)
    calculator = MetricCalculator(pair)
    return calculator.calculate(transform_options(options))


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
