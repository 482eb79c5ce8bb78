"""PCA normal estimation (k-NN covariance + closed-form 3x3 eigh).

Replaces the reference's ``PointCloud.estimate_normals()`` with Open3D default
parameters (reference: open_pcc_metric/cloud_pair.py:61-64; Open3D default is
``KDTreeSearchParamKNN(knn=30)``): for every point, the covariance of its 30
nearest neighbours (the point itself included, population normalisation) and
the eigenvector of the smallest eigenvalue. Normals are UNORIENTED (sign
arbitrary) exactly like the reference — D2 squares the projection so the sign
cancels (reference: metric.py:179).
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from .knn import knn
from .eigh3 import (
    smallest_eigenvector_components, smallest_eigenvector_sym3,
)
from ..utils.cache import ladder_lookup, ladder_store, next_rung

DEFAULT_KNN = 30


@functools.partial(jax.jit, static_argnames=("k",))
def normals_from_neighbors(
    points: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    k: int,
    n_valid: typing.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Covariance PCA normal from given neighbour index lists (P, k).

    Neighbour slots pointing at padded rows (idx >= n_valid — possible when
    the cloud has fewer than k points, where FLANN would just return fewer
    neighbours) are excluded from the covariance.
    """
    neigh = jnp.take(points, neighbor_idx, axis=0)  # (P, k, 3)
    if n_valid is not None:
        w = (neighbor_idx < n_valid)[:, :, None].astype(points.dtype)
        cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(neigh * w, axis=1, keepdims=True) / cnt
        centered = (neigh - mean) * w
        cov = cov3(centered) / cnt[..., 0][..., None]
    else:
        mean = jnp.mean(neigh, axis=1, keepdims=True)
        centered = neigh - mean
        # Population covariance (divide by k), matching Open3D's cumulants.
        cov = cov3(centered) / k
    return smallest_eigenvector_sym3(cov)


def cov3(centered: jnp.ndarray) -> jnp.ndarray:
    """(P, k, 3) centred neighbourhoods -> (P, 3, 3) covariance sums.

    Elementwise VPU products, NOT ``einsum("pki,pkj->pij")``: XLA:TPU lowers
    that contraction onto the MXU, whose default f32 precision multiplies in
    bfloat16 — enough covariance noise to visibly tilt PCA normals (same
    failure mode as the colour-transform matmul, see ops/color.py).
    """
    c0, c1, c2 = centered[..., 0], centered[..., 1], centered[..., 2]
    s00 = jnp.sum(c0 * c0, axis=-1)
    s11 = jnp.sum(c1 * c1, axis=-1)
    s22 = jnp.sum(c2 * c2, axis=-1)
    s01 = jnp.sum(c0 * c1, axis=-1)
    s02 = jnp.sum(c0 * c2, axis=-1)
    s12 = jnp.sum(c1 * c2, axis=-1)
    row0 = jnp.stack([s00, s01, s02], axis=-1)
    row1 = jnp.stack([s01, s11, s12], axis=-1)
    row2 = jnp.stack([s02, s12, s22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


@jax.jit
def normals_from_moments(mom: jnp.ndarray) -> jnp.ndarray:
    """PCA normal from per-query k-NN moment sums (P, MOM_CH).

    ``mom`` rows are [cnt, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz] of the
    QUERY-RELATIVE neighbour offsets (refine_pallas.moments_pallas_t /
    knn_pruned_sorted(with_moments=True)). Covariance via central moments:
    cov = S2/cnt - m1 m1^T — no cancellation because the offsets are
    query-centred (|offset| ~ neighbourhood radius, not |coordinate|).
    Matches normals_from_neighbors up to summation order.
    """
    cnt = jnp.maximum(mom[:, 0], 1.0)[:, None]
    m1 = mom[:, 1:4] / cnt  # mean offset
    s2 = mom[:, 4:10] / cnt  # [xx, yy, zz, xy, xz, yz]
    return smallest_eigenvector_components(
        s2[:, 0] - m1[:, 0] * m1[:, 0],
        s2[:, 1] - m1[:, 1] * m1[:, 1],
        s2[:, 2] - m1[:, 2] * m1[:, 2],
        s2[:, 3] - m1[:, 0] * m1[:, 1],
        s2[:, 4] - m1[:, 0] * m1[:, 2],
        s2[:, 5] - m1[:, 1] * m1[:, 2],
    )


# Above this many padded rows, brute-force k-NN is prohibitive and the
# Morton-grid pruned path takes over (matches ops/nn.PRUNE_THRESHOLD).
_PRUNE_THRESHOLD = 65536


def estimate_normals(
    points: jnp.ndarray,
    k: int = DEFAULT_KNN,
    neighbor_idx: typing.Optional[jnp.ndarray] = None,
    n_valid: typing.Optional[typing.Union[int, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Estimate unit normals for a padded (P, 3) point array.

    The k-NN search runs over the same cloud with the query point included in
    its own neighbourhood (FLANN/Open3D semantics: ``search_knn_vector_3d``
    returns the query itself at distance 0). Large clouds route through the
    bound-pruned k-NN (ops/knn_pruned.py).

    Padded rows (PAD_SENTINEL coords) produce the degenerate fallback normal;
    callers mask rows >= n downstream.
    """
    if neighbor_idx is None:
        if points.shape[0] >= _PRUNE_THRESHOLD:
            from .knn_pruned import knn_pruned

            n = n_valid if n_valid is not None else points.shape[0]
            neighbor_idx, _ = knn_pruned(points, points, n, n, k=k)
        else:
            neighbor_idx, _ = knn(points, points, k=k, exclude_self=False)
    nv = jnp.asarray(n_valid) if n_valid is not None else None
    return normals_from_neighbors(points, neighbor_idx, k, n_valid=nv)


# Working escalation rung per (padded size, k): sweeps of same-shaped
# clouds skip the rungs that already failed their certificates. Periodic
# base-rung retry via utils.cache.ladder_lookup keeps it non-monotone.
_LADDER_MEMO: dict = {}


def _knn_base_rung():
    """Starting (cap, fallback_tiles) for the estimation k-NN ladder."""
    import os

    return (int(os.environ.get("PCC_KNN_CAP", "64")),
            int(os.environ.get("PCC_KNN_FT", "256")))


def estimation_core(g, n, k, cap, ft, flags=None):
    """Traceable estimation body over a prebuilt grid (one certificate rung).

    Normals come straight from the in-kernel moment sums (no (P, k, 3)
    neighbour gather — measured 247 ms/800k cloud — and no (P, k)
    index-table unsort; only the (P, 3) normals are unsorted). The k-NN is
    self-inclusive, so slot 1 IS the nearest OTHER point: the intra-cloud
    boundary stats (reference compute_nearest_neighbor_distance,
    cloud_pair.py:108-109) fall out for free.

    Returns ``(nrm_orig, nrm_sorted, mn, mx, overflow)``. Composable under
    an outer jit (the cold-pair fold in ops/fused.py) — callers own the
    escalation loop on ``overflow``.
    """
    from .knn_pruned import knn_pruned_sorted

    dk, ik, overflow, mom = knn_pruned_sorted(
        g, g, n, k, cap=cap, fallback_tiles=ft, with_moments=True,
        flags=flags)
    p = g.perm.shape[0]
    valid = jnp.arange(p) < n
    d1 = jnp.sqrt(jnp.maximum(dk[:, min(k - 1, 1)], 0.0))
    mn = jnp.min(jnp.where(valid, d1, jnp.inf))
    mx = jnp.max(jnp.where(valid, d1, -jnp.inf))
    nrm_sorted = normals_from_moments(mom)
    inv = jnp.zeros(p, jnp.int32).at[g.perm].set(
        jnp.arange(p, dtype=jnp.int32))
    return jnp.take(nrm_sorted, inv, axis=0), nrm_sorted, mn, mx, overflow


_estimation_jit = jax.jit(estimation_core,
                          static_argnames=("k", "cap", "ft", "flags"))


def estimate_normals_cloud(cloud, k: int = DEFAULT_KNN) -> jnp.ndarray:
    """Estimate normals reusing the Cloud's cached Morton grid.

    ``estimate_normals`` on raw points rebuilds the chunk grid with an
    on-device sort per call; clouds already carry a host-built grid, so the
    fused path (ops/fused.fused_evaluate) goes through here. Same escalation
    ladder and results as knn_pruned + normals_from_neighbors; the k-NN,
    moment epilogue and boundary stats run as ONE jit program per rung.
    """
    from .grid import CHUNK

    p = cloud.padded_size
    # Small clouds: brute k-NN beats grids. Clouds with fewer than k valid
    # points also route here: the moments path's membership threshold
    # would count sentinel rows into the k-set, whereas the brute path
    # masks them via n_valid (FLANN "fewer neighbours" semantics).
    if p < _PRUNE_THRESHOLD or int(cloud.n) < k:
        return estimate_normals(cloud.points, k=k, n_valid=cloud.n)
    g = cloud.get_grid()
    ncb = g.n_chunks
    nta = p // CHUNK
    memo_key = (p, k)
    cap, ft = ladder_lookup(_LADDER_MEMO, memo_key, _knn_base_rung())
    from .knn_pruned import knn_flags_from_env

    flags = knn_flags_from_env()
    while True:
        nrm, nrm_sorted, mn, mx, overflow = _estimation_jit(
            g, jnp.asarray(cloud.n), k, cap, ft, flags)
        # Exact iff certified or stage 1 refined every chunk.
        if not bool(overflow) or cap >= ncb:
            ladder_store(_LADDER_MEMO, memo_key, (cap, ft))
            break
        cap, ft = next_rung(cap, ft, ncb, nta)
    # Shared work (VERDICT r2 item 2): boundary stats come free from the
    # estimation pass; the sorted normals feed the pruned pair_stats
    # payload without another per-cloud gather. Cache both per Cloud.
    if k >= 2 and int(cloud.n) >= 2 \
            and getattr(cloud, "_boundary_stats", None) is None:
        cloud._boundary_stats = (mn, mx)
    # The sorted-normals cache is consumed by paths that assume default-k
    # normals (pair_stats payloads); custom-k estimations must not poison
    # it with a mismatched variant.
    if k == DEFAULT_KNN and getattr(cloud, "_sorted_normals", None) is None:
        cloud._sorted_normals = nrm_sorted
    return nrm
