"""Freeze float64 oracle outputs for fixed seeds into tests/goldens/.

VERDICT r2 item 7: golden values committed in-repo give regression coverage
without recomputing the oracle — a change that drifts the engine AND the
in-repo oracle together still trips these. Regenerate (only after verifying
the change is intended) with:

    python tools/make_goldens.py

The configurations mirror the oracle-parity tests (tests/test_metrics.py)
but pin everything (seeds, dtypes, normals) so the values are exact
reproductions of the float64 oracle.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _clouds_for(config):
    import jax.numpy as jnp

    from open_pcc_metric_tpu.cloud import (
        synthetic_sphere_pair, synthetic_voxel_pair, Cloud,
    )

    if config["kind"] == "voxel":
        return synthetic_voxel_pair(
            config["n"], seed=config["seed"], dtype=jnp.float64)
    if config["kind"] == "sphere_pinned_normals":
        rng = np.random.default_rng(config["seed"])
        v = rng.normal(size=(config["n"], 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts0 = v * 100.0
        pts1 = pts0 + rng.normal(scale=0.3, size=pts0.shape)
        n1 = pts1 / np.linalg.norm(pts1, axis=1, keepdims=True)
        c0 = rng.uniform(0, 1, pts0.shape)
        c1 = np.clip(c0 + rng.normal(scale=0.05, size=c0.shape), 0, 1)
        a = Cloud.from_numpy(pts0, colors=c0, normals=v, dtype=jnp.float64)
        b = Cloud.from_numpy(pts1, colors=c1, normals=n1, dtype=jnp.float64)
        return a, b
    raise ValueError(config["kind"])


CONFIGS = [
    {"name": "voxel_d1_hausdorff", "kind": "voxel", "n": 4000, "seed": 3,
     "hausdorff": True, "color": None, "point_to_plane": False,
     "d2_mode": "reference", "peak": None},
    {"name": "voxel_color_ycc", "kind": "voxel", "n": 4000, "seed": 3,
     "hausdorff": False, "color": "ycc", "point_to_plane": False,
     "d2_mode": "reference", "peak": None},
    {"name": "voxel_user_peak", "kind": "voxel", "n": 4000, "seed": 3,
     "hausdorff": True, "color": None, "point_to_plane": False,
     "d2_mode": "reference", "peak": 1023.0},
    {"name": "sphere_d2_reference", "kind": "sphere_pinned_normals",
     "n": 2500, "seed": 5, "hausdorff": True, "color": "rgb",
     "point_to_plane": True, "d2_mode": "reference", "peak": None},
    {"name": "sphere_d2_pc_error", "kind": "sphere_pinned_normals",
     "n": 2500, "seed": 5, "hausdorff": True, "color": "yuv",
     "point_to_plane": True, "d2_mode": "pc_error", "peak": None},
]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import oracle

    out = {}
    for cfg in CONFIGS:
        a, b = _clouds_for(cfg)
        pts0 = np.asarray(a.points[: a.n], dtype=np.float64)
        pts1 = np.asarray(b.points[: b.n], dtype=np.float64)
        kw = dict(
            color_scheme=cfg["color"],
            point_to_plane=cfg["point_to_plane"],
            hausdorff=cfg["hausdorff"],
            d2_mode=cfg["d2_mode"],
            peak=cfg["peak"],
        )
        if cfg["color"] is not None:
            kw["colors0"] = np.asarray(a.colors[: a.n], dtype=np.float64)
            kw["colors1"] = np.asarray(b.colors[: b.n], dtype=np.float64)
        if cfg["point_to_plane"]:
            kw["normals0"] = np.asarray(a.normals[: a.n], dtype=np.float64)
            kw["normals1"] = np.asarray(b.normals[: b.n], dtype=np.float64)
        ref = oracle.full_metrics(pts0, pts1, **kw)
        out[cfg["name"]] = {
            "config": cfg,
            "metrics": {
                k: (v.tolist() if hasattr(v, "tolist") else float(v))
                for k, v in ref.items()
            },
        }
    dest = os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens", "oracle.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest}: {len(out)} configs")


if __name__ == "__main__":
    main()
