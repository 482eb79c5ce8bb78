"""Wall-time breakdown of the estimation-inclusive (normal-less) cold path.

Times every piece the PCC_BENCH_NORMALS scenario pays per pair: cloud
construction/upload, grid builds, 30-NN normal estimation per cloud (the
knn schedule under test via PCC_KNN_SCHED), pair_stats, OBB. Each stage is
>=100 ms so direct wall timing is meaningful (first a throwaway warm-up run
absorbs the process's positional first-op penalty and compiles).
Run: python tools/profile_normals_path.py [n_points]
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
from open_pcc_metric_tpu.ops.fused import fused_evaluate  # noqa: E402
from open_pcc_metric_tpu.ops import normals as nops  # noqa: E402


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    kwargs = dict(color_scheme="ycc", point_to_plane=True,
                  d2_mode="pc_error")

    def make():
        a = Cloud.from_numpy(origin[0], colors=origin[1], dtype=jnp.float32)
        b = Cloud.from_numpy(reconst[0], colors=reconst[1],
                             dtype=jnp.float32)
        return a, b

    # Warm-up: compiles + the positional first-op penalty.
    a, b = make()
    t0 = time.perf_counter()
    fused_evaluate(a, b, **kwargs)
    print(f"warm-up (compiles): {time.perf_counter()-t0:.1f} s", flush=True)

    for it in range(2):
        a, b = make()
        print(f"--- cold pair, iteration {it} "
              f"(PCC_KNN_SCHED={os.environ.get('PCC_KNN_SCHED', 'counted')})",
              flush=True)
        t0 = time.perf_counter()
        ga, gb = a.get_grid(), b.get_grid()
        _sync((ga.points, gb.points))
        print(f"{'grids (host sort + upload)':45s} "
              f"{time.perf_counter()-t0:8.3f} s", flush=True)
        t0 = time.perf_counter()
        na = a.get_normals()
        _sync(na)
        print(f"{'estimate_normals a (800k)':45s} "
              f"{time.perf_counter()-t0:8.3f} s", flush=True)
        t0 = time.perf_counter()
        nb = b.get_normals()
        _sync(nb)
        print(f"{'estimate_normals b (476k)':45s} "
              f"{time.perf_counter()-t0:8.3f} s", flush=True)
        t0 = time.perf_counter()
        ext = a.get_obb_extent()
        print(f"{'OBB extent (host)':45s} "
              f"{time.perf_counter()-t0:8.3f} s", flush=True)
        t0 = time.perf_counter()
        r = fused_evaluate(a, b, **kwargs)
        print(f"{'fused_evaluate (rest: pair_stats+boundary)':45s} "
              f"{time.perf_counter()-t0:8.3f} s", flush=True)


if __name__ == "__main__":
    main()
