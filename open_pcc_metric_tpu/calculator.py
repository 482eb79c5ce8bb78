"""Memoised metric-DAG evaluation + result container.

Parity with reference open_pcc_metric/calculator.py:15-108, with one
deliberate fix: the memo cache is an INSTANCE attribute, not a class attribute
(the reference's class-level ``_calculated_metrics`` leaks results across
cloud pairs in one process — SURVEY Q1).

The recursion itself is cheap bookkeeping: all heavy work happens inside the
CloudPair's cached jitted kernels, and the ``_key()`` memo collapses the
left/right/dependency diamond exactly like the reference (SURVEY §3.3).
"""
from __future__ import annotations

import typing

import pandas as pd

from .cloud_pair import CloudPair
from .metric import (
    AbstractMetric,
    PrimaryMetric,
    SecondaryMetric,
    SymmetricMetric,
)


class CalculateResult:
    _metrics: typing.List[AbstractMetric]

    def __init__(self, metrics: typing.List[AbstractMetric]):
        self._metrics = metrics

    def as_dict(self) -> typing.Dict[typing.Tuple, typing.Any]:
        return {metric._key(): metric.value for metric in self._metrics}

    def as_df(self) -> pd.DataFrame:
        """Same columns/labels as the reference table (calculator.py:27-52)."""
        metric_dict: typing.Dict[str, list] = {
            "label": [],
            "is_left": [],
            "point-to-plane": [],
            "value": [],
        }
        for metric in self._metrics:
            label = metric.__class__.__name__
            if isinstance(metric, SymmetricMetric):
                child_label = metric.metrics[0].__class__.__name__
                label = child_label + "(symmetric)"
            metric_dict["label"].append(label)
            metric_dict["is_left"].append(
                metric.is_left if hasattr(metric, "is_left") else ""
            )
            metric_dict["point-to-plane"].append(
                metric.point_to_plane if hasattr(metric, "point_to_plane") else ""
            )
            metric_dict["value"].append(str(metric.value))
        return pd.DataFrame(metric_dict)

    def __str__(self) -> str:
        return str(self.as_df())


class MetricCalculator:
    _cloud_pair: CloudPair
    _calculated_metrics: typing.Dict[typing.Tuple, AbstractMetric]

    def __init__(self, cloud_pair: CloudPair):
        self._cloud_pair = cloud_pair
        self._calculated_metrics = {}

    def _metric_recursive_calculate(
        self, metric: AbstractMetric
    ) -> AbstractMetric:
        key = metric._key()
        if key in self._calculated_metrics:
            return self._calculated_metrics[key]

        if isinstance(metric, PrimaryMetric):
            metric.calculate(self._cloud_pair)
            self._calculated_metrics[key] = metric
            return metric

        if not isinstance(metric, SecondaryMetric):
            raise RuntimeError(
                f"cannot evaluate {metric.__class__.__name__}: every metric "
                "must derive from PrimaryMetric or SecondaryMetric"
            )

        calculated_deps = {
            name: self._metric_recursive_calculate(dep)
            for name, dep in metric._get_dependencies().items()
        }
        metric.calculate(**calculated_deps)
        self._calculated_metrics[key] = metric
        return metric

    def calculate(
        self, metrics_list: typing.List[AbstractMetric]
    ) -> CalculateResult:
        return CalculateResult(
            [self._metric_recursive_calculate(m) for m in metrics_list]
        )
