"""Split the normal-estimation cost: pruned 30-NN vs covariance+eigh.

Run: python tools/profile_estimation.py [n_points]
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
from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted  # noqa: E402
from open_pcc_metric_tpu.ops.normals import (  # noqa: E402
    normals_from_neighbors,
)


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
    a = Cloud.from_numpy(origin[0], colors=origin[1], dtype=jnp.float32)
    _sync(jnp.sum(a.points))  # absorb first-op penalty
    g = a.get_grid()
    _sync(g.points)
    n = jnp.asarray(a.n)
    k = 30
    print(f"n={a.n} pad={a.padded_size} "
          f"sched={os.environ.get('PCC_KNN_SCHED', 'counted')}", flush=True)

    for cap, ft in ((64, 256), (32, 256)):
        out = timeit(f"knn_pruned_sorted k=30 cap={cap} ft={ft}",
                     lambda cap=cap, ft=ft: knn_pruned_sorted(
                         g, g, n, k, cap=cap, fallback_tiles=ft))
        print(f"    overflow={bool(np.asarray(out[2]))}", flush=True)

    out = timeit("knn_pruned_sorted + in-kernel moments cap=64",
                 lambda: knn_pruned_sorted(
                     g, g, n, k, cap=64, fallback_tiles=256,
                     with_moments=True))
    from open_pcc_metric_tpu.ops.normals import (
        estimate_normals_cloud, normals_from_moments,
    )

    timeit("  normals_from_moments epilogue",
           lambda: normals_from_moments(out[3]))
    timeit("estimate_normals_cloud end-to-end",
           lambda: estimate_normals_cloud(a))

    dk, ik, _ = knn_pruned_sorted(g, g, n, k, cap=64, fallback_tiles=256)
    _sync((dk, ik))

    p = a.padded_size
    inv = jnp.zeros(p, jnp.int32).at[g.perm].set(
        jnp.arange(p, dtype=jnp.int32))

    @jax.jit
    def unsort(ik):
        return jnp.take(ik, inv, axis=0)

    idx = timeit("unsort (P,30) gather", lambda: unsort(ik))
    timeit("normals_from_neighbors (gather+cov+eigh3)",
           lambda: normals_from_neighbors(a.points, idx, k,
                                          n_valid=jnp.asarray(a.n)))

    # --- sub-split of normals_from_neighbors
    from open_pcc_metric_tpu.ops.eigh3 import smallest_eigenvector_sym3

    @jax.jit
    def gather_only(pts, idx):
        return jnp.take(pts, idx, axis=0)

    neigh = timeit("  gather (P,30,3) rows", lambda: gather_only(
        a.points, idx))

    @jax.jit
    def cov_only(neigh):
        mean = jnp.mean(neigh, axis=1, keepdims=True)
        c = neigh - mean
        return jnp.einsum("pki,pkj->pij", c, c) / k

    cov = timeit("  mean+centered+einsum cov", lambda: cov_only(neigh))
    timeit("  eigh3 smallest eigenvector", lambda: jax.jit(
        smallest_eigenvector_sym3)(cov))


if __name__ == "__main__":
    main()
