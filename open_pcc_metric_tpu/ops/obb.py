"""Approximate minimal-volume oriented bounding box (host-side).

Replaces ``PointCloud.get_minimal_oriented_bounding_box()`` (reference:
open_pcc_metric/cloud_pair.py:111-112), whose ``.extent`` feeds the geometric
PSNR peak (``peak = max(extent)``, reference metric.py:246 — SURVEY Q4).

Algorithm parity with Open3D 0.18's ``OrientedBoundingBox::CreateFromPointsMinimal``:
  1. compute the convex hull of the points (qhull),
  2. for every hull triangle (a, b, c), build the frame
         u = b - a;  v = c - a;  w = u x v;  v = w x u;  normalise u, v, w,
  3. rotate the hull vertices into that frame, take the axis-aligned box,
  4. keep the frame with the smallest box volume; ``extent`` is that box's
     per-axis side lengths.

This exploits the classic fact that some face of the minimal box is flush with
a hull face (the same approximation Open3D makes). O(T*V) with T hull
triangles and V hull vertices — cheap on the host even for 1M-point clouds,
so it intentionally stays off the TPU (SURVEY §2.2: "do not burn kernel
effort here").
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull


def minimal_obb_extent(points: np.ndarray) -> np.ndarray:
    """Extent (3 side lengths, unsorted frame order) of the approx-minimal OBB."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if points.shape[0] < 4:
        # Degenerate clouds: fall back to the axis-aligned extent.
        return points.max(axis=0) - points.min(axis=0)
    try:
        hull = ConvexHull(points)
    except Exception:
        # Coplanar/collinear input: joggle via qhull option QJ.
        hull = ConvexHull(points, qhull_options="QJ")

    verts = points[hull.vertices]  # (V, 3)
    tris = points[hull.simplices]  # (T, 3, 3)

    a = tris[:, 0]
    u = tris[:, 1] - a
    v0 = tris[:, 2] - a
    w = np.cross(u, v0)
    v = np.cross(w, u)

    def unit(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        good = n[:, 0] > 1e-300
        return np.where(good[:, None], x / np.where(good[:, None], n, 1.0), 0.0), good

    u, gu = unit(u)
    v, gv = unit(v)
    w, gw = unit(w)
    good = gu & gv & gw
    frames = np.stack([u, v, w], axis=1)  # (T, 3, 3): rows are the new axes

    best_vol = np.inf
    best_extent = points.max(axis=0) - points.min(axis=0)
    # Chunk over triangles to bound the (T, V, 3) projection buffer.
    chunk = max(1, int(4e7 // max(1, verts.shape[0] * 3)))
    for s in range(0, frames.shape[0], chunk):
        f = frames[s : s + chunk]
        g = good[s : s + chunk]
        proj = np.einsum("taj,vj->tva", f, verts)  # (t, V, 3)
        ext = proj.max(axis=1) - proj.min(axis=1)  # (t, 3)
        vol = np.where(g, ext.prod(axis=1), np.inf)
        i = int(np.argmin(vol))
        if vol[i] < best_vol:
            best_vol = float(vol[i])
            best_extent = ext[i]
    return best_extent
