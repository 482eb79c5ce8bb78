"""CloudPair: the geometry state shared by all metrics for one (origin, reconst) pair.

Role parity with the reference's ``CloudPair`` (reference:
open_pcc_metric/cloud_pair.py:45-124) with a TPU-first execution model:

  * the reference eagerly estimates normals, builds two KD-trees and runs one
    Python->FLANN query per point at construction (cloud_pair.py:54-80);
    here every derived quantity is a lazily-computed, cached result of a
    jit-compiled batched kernel over padded static-shape arrays — nothing is
    computed unless some requested metric actually needs it;
  * bidirectional 1-NN -> tiled brute-force kernel (ops/nn.py, Pallas on TPU);
  * normal estimation -> 30-NN covariance PCA (ops/normals.py);
  * intra-cloud NN distances -> same NN kernel in self-exclusion mode
    (reference: compute_nearest_neighbor_distance, cloud_pair.py:108-109);
  * minimal-OBB extent -> host-side hull-face search (ops/obb.py,
    reference: cloud_pair.py:111-112).

Accessors return *valid-length* device arrays (padding sliced off), so metric
formulas need no masking and match the reference's numpy semantics 1:1.

Squared-vs-plain distance conventions follow the reference exactly (SURVEY
Q6): neighbour distances are SQUARED, boundary (intra-cloud) distances are
plain Euclidean.
"""
from __future__ import annotations

import typing

import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .ops import nn as nn_ops
from .ops import normals as normal_ops

# How the D2 (point-to-plane) projection picks its normals:
#   "reference": the OPPOSITE cloud's normals indexed POSITIONALLY by the
#       iterating point's index — reproducing the reference's quirk exactly
#       (reference: metric.py:130 + 146-153, SURVEY Q3). Requires
#       n_iter <= n_other, like the reference (it would IndexError otherwise).
#   "pc_error": the normal of the actual nearest neighbour in the other cloud
#       (MPEG pc_error convention).
D2_MODES = ("reference", "pc_error")


class CloudPair:
    def __init__(
        self,
        origin_cloud: Cloud,
        reconst_cloud: Cloud,
        backend: str = "auto",
        knn_normals: int = normal_ops.DEFAULT_KNN,
    ):
        self.clouds: typing.Tuple[Cloud, Cloud] = (origin_cloud, reconst_cloud)
        self._backend = backend
        self._knn_normals = knn_normals
        self._nn_cache: dict = {}
        self._normals_cache: dict = {}
        self._grid_cache: dict = {}
        self._boundary_cache = None
        self._extent_cache = None

    def _use_pruned(self, a: Cloud, b: Cloud) -> bool:
        if self._backend == "pruned":
            return True
        return self._backend == "auto" and max(
            a.padded_size, b.padded_size
        ) >= nn_ops.PRUNE_THRESHOLD

    def _grid(self, index: int):
        """Morton chunk grid of clouds[index] (cached on the Cloud itself)."""
        return self.clouds[index].get_grid()

    # ------------------------------------------------------------ core state

    @property
    def origin_cloud(self) -> Cloud:
        return self.clouds[0]

    @property
    def reconst_cloud(self) -> Cloud:
        return self.clouds[1]

    def _nn(self, direction: int) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
        """1-NN of clouds[direction] into the other cloud.

        Returns padded ``(idx, dist_sq)``; cached after first use.
        """
        if direction not in self._nn_cache:
            a = self.clouds[direction]
            b = self.clouds[1 - direction]
            if self._use_pruned(a, b):
                self._nn_cache[direction] = nn_ops.nearest_neighbors(
                    a.points, b.points, backend="pruned",
                    n_a=a.n, n_b=b.n,
                    grids=(self._grid(direction), self._grid(1 - direction)),
                )
            else:
                self._nn_cache[direction] = nn_ops.nearest_neighbors(
                    a.points, b.points, backend=self._backend,
                    n_a=a.n, n_b=b.n,
                )
        return self._nn_cache[direction]

    def _normals(self, index: int) -> jnp.ndarray:
        """Padded normals of clouds[index]; estimated if the file had none."""
        if index not in self._normals_cache:
            c = self.clouds[index]
            if c.has_normals():
                self._normals_cache[index] = c.normals
            elif self._knn_normals == normal_ops.DEFAULT_KNN:
                # Cloud-level cache: estimated normals depend only on the
                # cloud and are reused across pairs (QP sweeps).
                self._normals_cache[index] = c.get_normals()
            else:
                self._normals_cache[index] = normal_ops.estimate_normals_cloud(
                    c, k=self._knn_normals
                )
        return self._normals_cache[index]

    # ----------------------------------------------------- reference surface
    # (method-for-method parity with reference cloud_pair.py:82-124)

    def get_left_error_vector(self) -> jnp.ndarray:
        return self._error_vector(0)

    def get_right_error_vector(self) -> jnp.ndarray:
        return self._error_vector(1)

    def _error_vector(self, direction: int) -> jnp.ndarray:
        a = self.clouds[direction]
        b = self.clouds[1 - direction]
        idx, _ = self._nn(direction)
        neigh = jnp.take(b.points, idx, axis=0)
        return (a.points - neigh)[: a.n]

    def get_left_neighbour_distances(self) -> jnp.ndarray:
        idx, d = self._nn(0)
        return d[: self.clouds[0].n]

    def get_right_neighbour_distances(self) -> jnp.ndarray:
        idx, d = self._nn(1)
        return d[: self.clouds[1].n]

    def get_boundary_sqrt_distances(self) -> jnp.ndarray:
        """Intra-origin plain (non-squared) NN distances (SURVEY Q6).

        Raises ValueError for a single-point origin cloud: a self-excluded
        nearest neighbour does not exist there. (The reference crashes
        inside Open3D on that input, cloud_pair.py:108-109; an explicit
        error is this framework's documented contract.)
        """
        if self._boundary_cache is None:
            c = self.clouds[0]
            if int(c.n) < 2:
                raise ValueError(
                    "intra-cloud NN distances need at least 2 points; the "
                    f"origin cloud has {int(c.n)}"
                )
            if self._use_pruned(c, c):
                _, d = nn_ops.nearest_neighbors(
                    c.points, c.points, exclude_self=True, backend="pruned",
                    n_a=c.n, n_b=c.n, grids=(self._grid(0), self._grid(0)),
                )
            else:
                _, d = nn_ops.nearest_neighbors(
                    c.points, c.points, exclude_self=True,
                    backend=self._backend, n_a=c.n, n_b=c.n,
                )
            self._boundary_cache = jnp.sqrt(d[: c.n])
        return self._boundary_cache

    def get_extent(self) -> np.ndarray:
        """Minimal-OBB extent of the ORIGIN cloud only (SURVEY Q4)."""
        return self.clouds[0].get_obb_extent()

    def get_left_colors(self) -> jnp.ndarray:
        return self._colors(0)

    def get_right_colors(self) -> jnp.ndarray:
        return self._colors(1)

    def _colors(self, index: int) -> jnp.ndarray:
        c = self.clouds[index]
        if c.colors is None:
            raise ValueError(f"cloud {index} has no colors")
        return c.colors[: c.n]

    def get_left_neighbour_colors(self) -> jnp.ndarray:
        return self._neighbour_colors(0)

    def get_right_neighbour_colors(self) -> jnp.ndarray:
        return self._neighbour_colors(1)

    def _neighbour_colors(self, direction: int) -> jnp.ndarray:
        a = self.clouds[direction]
        b = self.clouds[1 - direction]
        if b.colors is None:
            raise ValueError(f"cloud {1 - direction} has no colors")
        idx, _ = self._nn(direction)
        return jnp.take(b.colors, idx, axis=0)[: a.n]

    # ----------------------------------------------------------- D2 plumbing

    def get_cloud_normals(self, index: int) -> jnp.ndarray:
        """Valid-length normals of clouds[index] (reference: metric.py:92-98)."""
        return self._normals(index)[: self.clouds[index].n]

    def get_neighbour_normals(self, direction: int) -> jnp.ndarray:
        """Normals of each point's actual NN in the other cloud (pc_error D2)."""
        a = self.clouds[direction]
        idx, _ = self._nn(direction)
        return jnp.take(self._normals(1 - direction), idx, axis=0)[: a.n]


def get_neighbour_cloud(
    iter_cloud: Cloud,
    search_cloud: Cloud,
    n: int = 0,
) -> typing.Tuple[Cloud, np.ndarray]:
    """n-th nearest neighbour cloud, generalising the reference helper.

    Parity surface for the reference's ``get_neighbour_cloud(iter_cloud,
    search_cloud, kdtree, n)`` (reference cloud_pair.py:10-42): for every
    point of ``iter_cloud``, take its (n+1)-th nearest neighbour in
    ``search_cloud`` (FLANN's search_knn_vector_3d(point, n+1)[-1]) and
    return ``(neighbour Cloud with colors when available, squared
    distances)``. The reference tool only ever calls it with n=0 — that
    case routes through the 1-NN engines (bit-identical to the metric
    pipeline, lowest-original-index ties); n>0 uses the exact k-NN engines
    with k=n+1. Distances match FLANN exactly; under exact distance ties
    the selected neighbour may differ (FLANN's tie order is unspecified).
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    a, b = iter_cloud, search_cloud
    if n == 0:
        idx, d = nn_ops.nearest_neighbors(
            a.points, b.points, n_a=a.n, n_b=b.n)
        idx, d = idx[: a.n], d[: a.n]
    else:
        k = n + 1
        if max(a.padded_size, b.padded_size) >= nn_ops.PRUNE_THRESHOLD:
            from .ops.knn_pruned import knn_pruned

            idx_k, d_k = knn_pruned(a.points, b.points, a.n, b.n, k=k)
        else:
            from .ops.knn import knn

            idx_k, d_k = knn(a.points, b.points, k=k)
        idx, d = idx_k[: a.n, n], d_k[: a.n, n]
    idx_np = np.asarray(idx)
    pts = np.asarray(b.points, dtype=np.float64)[idx_np]
    colors = None
    if b.colors is not None:
        colors = np.asarray(b.colors)[idx_np]
    neigh = Cloud.from_numpy(pts, colors=colors, dtype=a.points.dtype)
    return neigh, np.asarray(d, dtype=np.float64)
