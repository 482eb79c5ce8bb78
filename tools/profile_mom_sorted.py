"""A/B the need-sorted sliced moments sweep (PCC_KNN_MOM_SORTED) and the
probe width p1 on hardware — the two knobs round 4 flipped/considered
without committing numbers (VERDICT r4 items 1-2).

Stage level: rectangular count-gated moments_pallas_t vs _mom_sorted_slices
at the REAL final certificate counts of the 800k bench cloud.
End-to-end level: knn_pruned_sorted(with_moments=True) under explicit
KnnFlags (mom_sorted on/off, p1 4/8) — flags are call-time statics since
round 5, so each setting is its own trace.

Run: python tools/profile_mom_sorted.py [n_points]
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
from open_pcc_metric_tpu.ops.grid import CHUNK  # noqa: E402
from open_pcc_metric_tpu.ops.knn_pruned import (  # noqa: E402
    KnnFlags, _mom_sorted_slices, knn_pruned_sorted,
)
from open_pcc_metric_tpu.ops.nn_pruned import _tile_lower_bounds  # noqa: E402
from open_pcc_metric_tpu.ops.refine_pallas import (  # noqa: E402
    moments_pallas_t,
)


def _sync(x):
    # Consume a SPARSE slice of every output: reading only [0] lets a
    # pallas_call short-circuit (measured ~39 ms kernel read in ~5 ms).
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:: 4096])


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:58s} {np.median(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, _ = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    _sync(jnp.sum(a.points))
    g = a.get_grid()
    _sync(g.points)
    n = jnp.asarray(a.n)
    nta = g.points.shape[0] // CHUNK
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)
    cap, k = 64, 30

    valid_t, lb = jax.jit(
        _tile_lower_bounds, static_argnums=(3,))(g, g, n, nta)
    _, cand = jax.lax.top_k(-lb, cap)
    cand = cand.astype(jnp.int32)
    qt8 = jnp.pad(g.points, ((0, 0), (0, 5))).T
    b8r = jnp.pad(g.points, ((0, 0), (0, 5)))
    borig = g.perm[None, :]

    # Final certificate counts (what the moments sweep is gated by).
    dk, ik, _ = knn_pruned_sorted(g, g, n, k, cap=cap, fallback_tiles=256)
    kth_d = dk[:, k - 1].reshape(nta, CHUNK)
    kth_i = ik[:, k - 1].reshape(nta, CHUNK)
    ubf = jnp.max(jnp.where(valid_t, kth_d, -jnp.inf), axis=1)
    ubf_eff = ubf * (1 + 8 * eps) + 8 * eps
    countsf = jnp.sum(lb <= ubf_eff[:, None], axis=1).astype(jnp.int32)
    nc1 = jnp.minimum(countsf, cap)
    _sync((cand, qt8, b8r, kth_d, kth_i, nc1))
    print(f"nc1 (moment slots): mean={np.asarray(nc1).mean():.1f} "
          f"p50={np.percentile(np.asarray(nc1), 50):.0f} "
          f"p99={np.percentile(np.asarray(nc1), 99):.0f}", flush=True)

    rect = timeit(
        "moments rectangular (count-gated, cap=64)",
        lambda: moments_pallas_t(qt8, b8r, borig, cand, nc1, kth_d, kth_i))

    sort_jit = jax.jit(lambda: _mom_sorted_slices(
        qt8, b8r, borig, cand, nc1, kth_d, kth_i, False))
    srt = timeit("moments need-sorted sliced (slice=512)", sort_jit)
    same = bool(jnp.array_equal(rect, srt))
    print(f"    sorted == rectangular: {same}", flush=True)

    # End-to-end k-NN+moments under explicit flags (call-time statics).
    for p1 in (8, 4):
        for ms in (True, False):
            fl = KnnFlags(p1=p1, mom_sorted=ms)
            timeit(
                f"knn+moments p1={p1} mom_sorted={int(ms)}",
                lambda fl=fl: knn_pruned_sorted(
                    g, g, n, k, cap=cap, fallback_tiles=256,
                    with_moments=True, flags=fl))

    timeit("recheck rectangular (window drift calibration)",
           lambda: moments_pallas_t(qt8, b8r, borig, cand, nc1, kth_d,
                                    kth_i))


if __name__ == "__main__":
    main()
