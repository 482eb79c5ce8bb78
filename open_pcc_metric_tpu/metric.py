"""Metric class hierarchy — class-for-class parity with the reference.

Every class name, key layout (``_key()``), dependency edge and formula matches
reference open_pcc_metric/metric.py:14-485; the math runs as jnp ops over the
CloudPair's cached device arrays instead of numpy loops:

  * per-point L2 norms: one vectorised op (reference loops via
    ``np.apply_along_axis``, metric.py:139-143);
  * D2 projection: one batched dot product (reference: Python ``for`` loop,
    metric.py:148-152), with BOTH normal conventions (SURVEY Q3) — see
    ``point_to_plane`` below;
  * colour transform: a single matmul (reference: row-wise apply_along_axis,
    metric.py:286-290).

Scalar/statistic values are materialised as numpy float64 the moment they are
reduced (only scalars/3-vectors ever leave the device), so result formatting
and ``SymmetricMetric``'s norm-based min/max (SURVEY Q7) are bit-compatible
with the reference's host-side numpy math.

``point_to_plane`` accepts the reference's ``True``/``False`` plus the string
``"pc_error"`` to select the NN-normal D2 convention; plain ``True`` keeps the
reference's positional-normal quirk (SURVEY Q3).
"""
from __future__ import annotations

import abc
import typing

import jax.numpy as jnp
import numpy as np

from .cloud_pair import CloudPair
from .ops.color import get_color_peak, transform_colors
from .utils import get_logger

logger = get_logger(__name__)


def _host(value) -> typing.Any:
    """Device scalar/array -> numpy float64 (host)."""
    arr = np.asarray(value, dtype=np.float64)
    if arr.ndim == 0:
        return np.float64(arr)
    return arr


def _stable_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Two-stage (pairwise-ish) sum: keeps float32 accumulation error ~sqrt(N)
    smaller than a naive running sum, enough for the 1e-4 PSNR parity bar."""
    n = x.shape[0]
    chunk = 1024
    if n <= chunk:
        return jnp.sum(x, axis=0)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    x = x.reshape(-1, chunk, *x.shape[1:])
    return jnp.sum(jnp.sum(x, axis=1), axis=0)


class AbstractMetric(abc.ABC):
    """Base: identity key for memoisation + abstract calculate.

    (reference: metric.py:14-29)
    """

    value: typing.Any

    def _key(self) -> typing.Tuple:
        return (self.__class__.__name__,)

    @abc.abstractmethod
    def calculate(self, *args, **kwargs) -> None:
        raise NotImplementedError("calculate is not implemented")

    def __str__(self) -> str:
        return f"{self._key()}: {self.value}"


class PrimaryMetric(AbstractMetric):
    """Reads the CloudPair directly (reference: metric.py:32-38)."""

    @abc.abstractmethod
    def calculate(self, cloud_pair: CloudPair) -> None:
        raise NotImplementedError


class SecondaryMetric(AbstractMetric):
    """Computed from other metrics (reference: metric.py:41-50)."""

    def _get_dependencies(self) -> typing.Dict[str, "AbstractMetric"]:
        return {}

    @abc.abstractmethod
    def calculate(self, **kwargs) -> None:
        raise NotImplementedError


class DirectionalMetric(AbstractMetric):
    is_left: bool

    def __init__(self, is_left: bool):
        self.is_left = is_left

    def _key(self) -> typing.Tuple:
        return super()._key() + (self.is_left,)


class PointToPlaneable(DirectionalMetric):
    """``point_to_plane``: False | True (reference D2) | "pc_error" (NN-normal D2)."""

    point_to_plane: typing.Union[bool, str]

    def __init__(self, is_left: bool, point_to_plane: typing.Union[bool, str]):
        super().__init__(is_left)
        self.point_to_plane = point_to_plane

    def _key(self) -> typing.Tuple:
        return super()._key() + (self.point_to_plane,)


# ------------------------------------------------------------------- primary


class PrimaryErrorVector(PrimaryMetric, DirectionalMetric):
    """Per-point error vectors point - NN(point) (reference: metric.py:74-80)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        if self.is_left:
            self.value = cloud_pair.get_left_error_vector()
        else:
            self.value = cloud_pair.get_right_error_vector()


class NeighbourDistances(PrimaryMetric, DirectionalMetric):
    """Per-point SQUARED NN distances (reference: metric.py:83-89, Q6)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        if self.is_left:
            self.value = cloud_pair.get_left_neighbour_distances()
        else:
            self.value = cloud_pair.get_right_neighbour_distances()


class CloudNormals(PrimaryMetric, DirectionalMetric):
    """Full normals of cloud 0 / cloud 1 (reference: metric.py:92-98)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        self.value = cloud_pair.get_cloud_normals(0 if self.is_left else 1)


class NeighbourNormals(PrimaryMetric, DirectionalMetric):
    """Normals of each point's actual NN in the other cloud (pc_error D2 mode;
    no reference analogue — the reference only has the positional quirk, Q3)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        self.value = cloud_pair.get_neighbour_normals(0 if self.is_left else 1)


class CloudExtent(PrimaryMetric):
    """Minimal-OBB extent of the ORIGIN cloud (reference: metric.py:101-103)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        self.value = _host(cloud_pair.get_extent())


class CloudColors(PrimaryMetric, DirectionalMetric):
    def calculate(self, cloud_pair: CloudPair) -> None:
        if self.is_left:
            self.value = cloud_pair.get_left_colors()
        else:
            self.value = cloud_pair.get_right_colors()


class NeighbourColors(PrimaryMetric, DirectionalMetric):
    def calculate(self, cloud_pair: CloudPair) -> None:
        if self.is_left:
            self.value = cloud_pair.get_left_neighbour_colors()
        else:
            self.value = cloud_pair.get_right_neighbour_colors()


class BoundarySqrtDistances(PrimaryMetric):
    """(min, max) of intra-origin NN distances (reference: metric.py:182-188)."""

    def calculate(self, cloud_pair: CloudPair) -> None:
        inner = cloud_pair.get_boundary_sqrt_distances()
        self.value = (_host(jnp.min(inner)), _host(jnp.max(inner)))


# ----------------------------------------------------------------- secondary


class ErrorVector(SecondaryMetric, PointToPlaneable):
    """p2point: per-point L2 norm of the error vector; p2plane: projection of
    the error vector onto normals (reference: metric.py:124-153).
    """

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        deps: typing.Dict[str, AbstractMetric] = {
            "primary_error_vector": PrimaryErrorVector(is_left=self.is_left)
        }
        if self.point_to_plane == "pc_error":
            deps["cloud_normals"] = NeighbourNormals(is_left=self.is_left)
        elif self.point_to_plane:
            # Reference quirk Q3: the OPPOSITE cloud's normals, positionally.
            deps["cloud_normals"] = CloudNormals(is_left=not self.is_left)
        return deps

    def calculate(
        self,
        primary_error_vector: PrimaryErrorVector,
        cloud_normals: typing.Optional[AbstractMetric] = None,
    ) -> None:
        err = primary_error_vector.value
        if not self.point_to_plane:
            self.value = jnp.linalg.norm(err, axis=1)
            return
        normals = cloud_normals.value
        if self.point_to_plane == "pc_error":
            pass  # already aligned per-point with err
        else:
            if normals.shape[0] < err.shape[0]:
                raise IndexError(
                    "reference D2 mode requires n_iter <= n_other "
                    f"(got {err.shape[0]} > {normals.shape[0]}); "
                    "use point_to_plane='pc_error'"
                )
            normals = normals[: err.shape[0]]
        self.value = jnp.sum(err * normals, axis=1)


class EuclideanDistance(SecondaryMetric, PointToPlaneable):
    """p2point: squared NN distances passthrough; p2plane: squared projection
    (reference: metric.py:156-179 — always per-point SQUARED errors).
    """

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        if not self.point_to_plane:
            return {
                "neighbour_distances": NeighbourDistances(is_left=self.is_left)
            }
        return {
            "error_vector": ErrorVector(
                is_left=self.is_left, point_to_plane=self.point_to_plane
            )
        }

    def calculate(
        self,
        neighbour_distances: typing.Optional[NeighbourDistances] = None,
        error_vector: typing.Optional[ErrorVector] = None,
    ) -> None:
        if not self.point_to_plane:
            self.value = neighbour_distances.value
            return
        self.value = jnp.square(error_vector.value)


class MinSqrtDistance(SecondaryMetric):
    """Smallest intra-origin NN distance; first report row (ref metric.py:191-199)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {"boundary": BoundarySqrtDistances()}

    def calculate(self, boundary: BoundarySqrtDistances) -> None:
        lo, _hi = boundary.value
        self.value = lo


class MaxSqrtDistance(SecondaryMetric):
    """Largest intra-origin NN distance; second report row (ref metric.py:202-210)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {"boundary": BoundarySqrtDistances()}

    def calculate(self, boundary: BoundarySqrtDistances) -> None:
        _lo, hi = boundary.value
        self.value = hi


class GeoMSE(SecondaryMetric, PointToPlaneable):
    """sum(sq_errors)/N — the D1/D2 MSE (reference: metric.py:213-228)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "euclidean_distance": EuclideanDistance(
                is_left=self.is_left, point_to_plane=self.point_to_plane
            )
        }

    def calculate(self, euclidean_distance: EuclideanDistance) -> None:
        n = euclidean_distance.value.shape[0]
        sse = _stable_sum(euclidean_distance.value)
        self.value = _host(sse) / n


class GeoPSNR(SecondaryMetric, PointToPlaneable):
    """10*log10(peak^2 / MSE), peak = max(origin minimal-OBB extent) —
    NOT pc_error's --resolution (reference: metric.py:231-247, Q4).

    Optional ``peak`` switches to pc_error's convention: a user-supplied
    signal peak (pc_error's --resolution), bypassing the OBB entirely.
    """

    def __init__(
        self,
        is_left: bool,
        point_to_plane: typing.Union[bool, str],
        peak: typing.Optional[float] = None,
    ):
        super().__init__(is_left, point_to_plane)
        self.peak = peak

    def _key(self) -> typing.Tuple:
        # Reference key layout unchanged when peak is absent (parity C6);
        # a user peak must split the memo slot from the OBB-peak variant.
        k = super()._key()
        return k if self.peak is None else k + (self.peak,)

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        deps: typing.Dict[str, AbstractMetric] = {
            "geo_mse": GeoMSE(
                is_left=self.is_left, point_to_plane=self.point_to_plane
            ),
        }
        if self.peak is None:
            deps["cloud_extent"] = CloudExtent()
        return deps

    def calculate(
        self,
        geo_mse: GeoMSE,
        cloud_extent: typing.Optional[CloudExtent] = None,
    ) -> None:
        peak = self.peak if self.peak is not None \
            else np.max(cloud_extent.value)
        with np.errstate(divide="ignore"):
            self.value = np.float64(10 * np.log10(peak**2 / geo_mse.value))


class ColorMetric(DirectionalMetric):
    color_scheme: str

    def __init__(self, is_left: bool, color_scheme: str):
        super().__init__(is_left)
        self.color_scheme = color_scheme

    def _key(self) -> typing.Tuple:
        return super()._key() + (self.color_scheme,)


class ColorMSE(SecondaryMetric, ColorMetric):
    """Per-channel mean squared colour error after the scheme transform
    (reference: metric.py:302-333)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "origin_cloud_colors": CloudColors(is_left=self.is_left),
            "neighbour_cloud_colors": NeighbourColors(is_left=self.is_left),
        }

    def calculate(
        self,
        origin_cloud_colors: CloudColors,
        neighbour_cloud_colors: NeighbourColors,
    ) -> None:
        orig = transform_colors(origin_cloud_colors.value, "rgb", self.color_scheme)
        neigh = transform_colors(
            neighbour_cloud_colors.value, "rgb", self.color_scheme
        )
        diff = orig - neigh
        n = diff.shape[0]
        self.value = _host(_stable_sum(diff**2)) / n


class ColorPSNR(SecondaryMetric, ColorMetric):
    """10*log10(peak^2 / ColorMSE) per channel; rgb peak is 255.0 even though
    colours live in [0,1] (reference: metric.py:336-350, Q5)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "color_mse": ColorMSE(
                is_left=self.is_left, color_scheme=self.color_scheme
            ),
        }

    def calculate(self, color_mse: ColorMSE) -> None:
        peak = get_color_peak(self.color_scheme)
        with np.errstate(divide="ignore"):
            self.value = 10 * np.log10(peak**2 / color_mse.value)


class GeoHausdorffDistance(SecondaryMetric, PointToPlaneable):
    """max of per-point squared errors (reference: metric.py:353-366)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "euclidean_distance": EuclideanDistance(
                is_left=self.is_left, point_to_plane=self.point_to_plane
            )
        }

    def calculate(self, euclidean_distance: EuclideanDistance) -> None:
        self.value = _host(jnp.max(euclidean_distance.value, axis=0))


class GeoHausdorffDistancePSNR(SecondaryMetric, PointToPlaneable):
    """10*log10(MaxSqrtDistance^2 / hausdorff) — peak from intra-origin NN
    distances, not the OBB extent (reference: metric.py:369-386, Q4).

    Optional ``peak`` switches to pc_error's user-supplied signal peak.
    """

    def __init__(
        self,
        is_left: bool,
        point_to_plane: typing.Union[bool, str],
        peak: typing.Optional[float] = None,
    ):
        super().__init__(is_left, point_to_plane)
        self.peak = peak

    def _key(self) -> typing.Tuple:
        # Reference key layout unchanged when peak is absent (parity C6);
        # a user peak must split the memo slot from the OBB-peak variant.
        k = super()._key()
        return k if self.peak is None else k + (self.peak,)

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        deps: typing.Dict[str, AbstractMetric] = {
            "hausdorff_distance": GeoHausdorffDistance(
                is_left=self.is_left, point_to_plane=self.point_to_plane
            ),
        }
        if self.peak is None:
            deps["max_sqrt"] = MaxSqrtDistance()
        return deps

    def calculate(
        self,
        hausdorff_distance: GeoHausdorffDistance,
        max_sqrt: typing.Optional[MaxSqrtDistance] = None,
    ) -> None:
        peak = self.peak if self.peak is not None else max_sqrt.value
        with np.errstate(divide="ignore"):
            self.value = np.float64(
                10 * np.log10(peak**2 / hausdorff_distance.value)
            )


class ColorHausdorffDistance(SecondaryMetric, ColorMetric):
    """Per-channel max squared colour error; rgb diffs pre-scaled x255 — the
    reference's own '???' quirk reproduced as-is (reference: metric.py:389-426,
    Q5)."""

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "origin_cloud_colors": CloudColors(is_left=self.is_left),
            "neighbour_cloud_colors": NeighbourColors(is_left=self.is_left),
        }

    def calculate(
        self,
        origin_cloud_colors: CloudColors,
        neighbour_cloud_colors: NeighbourColors,
    ) -> None:
        orig = transform_colors(origin_cloud_colors.value, "rgb", self.color_scheme)
        neigh = transform_colors(
            neighbour_cloud_colors.value, "rgb", self.color_scheme
        )
        diff = orig - neigh
        if self.color_scheme == "rgb":
            diff = 255.0 * diff
        self.value = _host(jnp.max(diff**2, axis=0))


class ColorHausdorffDistancePSNR(SecondaryMetric, ColorMetric):
    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {
            "hausdorff_distance": ColorHausdorffDistance(
                is_left=self.is_left, color_scheme=self.color_scheme
            ),
        }

    def calculate(self, hausdorff_distance: ColorHausdorffDistance) -> None:
        peak = get_color_peak(self.color_scheme)
        with np.errstate(divide="ignore"):
            self.value = 10 * np.log10(peak**2 / hausdorff_distance.value)


class SymmetricMetric(SecondaryMetric):
    """Worse-of-both-directions selection by whole-value L2 norm
    (reference: metric.py:446-485, Q7): ``is_proportional=True`` -> min
    (PSNRs), ``False`` -> max (MSE / Hausdorff)."""

    is_proportional: bool
    metrics: typing.List[DirectionalMetric]

    def _get_dependencies(self) -> typing.Dict[str, AbstractMetric]:
        return {"lmetric": self.metrics[0], "rmetric": self.metrics[1]}

    def __init__(
        self,
        metrics: typing.Sequence[DirectionalMetric],
        is_proportional: bool,
    ):
        if len(metrics) != 2:
            raise ValueError(
                "a symmetric metric wraps exactly two directional metrics, "
                f"got {len(metrics)}"
            )
        if metrics[0].__class__ is not metrics[1].__class__:
            raise ValueError(
                "both directions must use the same metric class; got "
                f"{metrics[0].__class__.__name__} and "
                f"{metrics[1].__class__.__name__}"
            )
        self.metrics = list(metrics)
        self.is_proportional = is_proportional

    def _key(self) -> typing.Tuple:
        return super()._key() + self.metrics[0]._key() + self.metrics[1]._key()

    def calculate(self, lmetric: AbstractMetric, rmetric: AbstractMetric) -> None:
        values = [np.asarray(m.value, dtype=np.float64) for m in (lmetric, rmetric)]
        values = [np.float64(v) if v.ndim == 0 else v for v in values]
        if self.is_proportional:
            self.value = min(values, key=np.linalg.norm)
        else:
            self.value = max(values, key=np.linalg.norm)
