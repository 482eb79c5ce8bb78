"""Sweep the counted k-NN schedule's probe width (PCC_KNN_P1) on TPU.

The probe pays a k=30 merge per (tile, slot) that almost always fires
(buffer filling); the extension's merges fire rarely. Smaller p1 = fewer
guaranteed-fire merges but looser probe ub -> more extension slots.

Run: python tools/profile_knn_p1.py [n_points]
"""
from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_pcc_metric_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def timeit(label, fn, n=3):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} {np.median(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, _ = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    _sync(jnp.sum(a.points))
    g = a.get_grid()
    _sync(g.points)
    n = jnp.asarray(a.n)

    # PCC_KNN_P1 is resolved at call time into a static KnnFlags arg since
    # round 5 (each setting is its own trace); clear_cache just bounds the
    # live-executable footprint across the sweep.
    from open_pcc_metric_tpu.ops import knn_pruned as kp

    for p1 in (4, 8, 16):
        os.environ["PCC_KNN_P1"] = str(p1)
        kp.knn_pruned_sorted.clear_cache()
        timeit(f"knn_pruned_sorted k=30 cap=64 p1={p1}",
               lambda: kp.knn_pruned_sorted(
                   g, g, n, 30, cap=64, fallback_tiles=256))
    # calibration: re-run the default last to detect window drift
    os.environ["PCC_KNN_P1"] = "8"
    kp.knn_pruned_sorted.clear_cache()
    timeit("recheck p1=8 (window drift calibration)",
           lambda: kp.knn_pruned_sorted(
               g, g, n, 30, cap=64, fallback_tiles=256))


if __name__ == "__main__":
    main()
