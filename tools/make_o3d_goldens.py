"""Generate Open3D golden fixtures for normal-estimation / minimal-OBB parity.

Run this in an environment where ``open3d==0.18.0`` IS installable (it is not
here — zero egress, see docs/open3d_install_attempt.log) and commit the
resulting ``tests/goldens/o3d_goldens.json``; ``tests/test_ops.py`` picks the
file up automatically and compares:

  * ``estimate_normals`` (KDTreeSearchParamKNN(knn=30), unoriented) —
    compared sign-invariantly, matching the reference call at
    /root/reference/open_pcc_metric/cloud_pair.py:61-64;
  * ``get_minimal_oriented_bounding_box().extent`` — compared as a sorted
    triple, matching /root/reference/open_pcc_metric/cloud_pair.py:111-112.

The clouds are regenerated from seeds on the test side, so only the Open3D
OUTPUTS are stored. Keep golden_cloud() bit-identical in both places.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

GOLDEN_SEEDS = (0, 1, 2, 3, 4)
GOLDEN_N = 4096


def golden_cloud(seed: int, n: int = GOLDEN_N) -> np.ndarray:
    """Deterministic voxelised blob; MUST match tests/test_ops.py exactly."""
    rng = np.random.default_rng(1000 + seed)
    v = rng.normal(size=(n * 4, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 60.0 * (1.0 + 0.3 * np.sin(2.5 * v[:, 0]) * np.cos(1.5 * v[:, 2]))
    pts = np.unique(np.round(v * r[:, None] + 128.0), axis=0)
    return pts[:n].astype(np.float64)


def main() -> int:
    try:
        import open3d as o3d  # noqa
    except ImportError:
        print("open3d is not installed; run in an environment with "
              "open3d==0.18.0 (see docs/open3d_install_attempt.log for why "
              "that is impossible here).", file=sys.stderr)
        return 1

    out = {"open3d_version": o3d.__version__, "n": GOLDEN_N, "clouds": []}
    for seed in GOLDEN_SEEDS:
        pts = golden_cloud(seed)
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(pts)
        pc.estimate_normals(
            search_param=o3d.geometry.KDTreeSearchParamKNN(knn=30))
        extent = np.asarray(
            pc.get_minimal_oriented_bounding_box().extent, dtype=np.float64)
        out["clouds"].append({
            "seed": seed,
            "normals": np.asarray(pc.normals).tolist(),
            "obb_extent_sorted": sorted(extent.tolist()),
        })

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "o3d_goldens.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f)
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
