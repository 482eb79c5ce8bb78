"""Per-stage wall-time breakdown of the fused 800k-pair suite on the TPU.

Times each stage of the pruned-NN pipeline separately so optimisation work
targets the real bottleneck. Run: python tools/profile_stages.py [n_points].

Note: under axon, jax.block_until_ready may not actually block; every timer
syncs by pulling one element to the host (np.asarray) instead.
"""
from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds, CHUNK  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted  # noqa: E402
from open_pcc_metric_tpu.ops.refine_pallas import (  # noqa: E402
    refine_nn_pallas_t,
    select_candidates_pallas,
)
from open_pcc_metric_tpu.ops.fused import fused_evaluate  # noqa: E402


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:55s} {med*1e3:9.2f} ms")
    return med, out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)
    print(f"n_a={a.n} pad={a.padded_size}  n_b={b.n} pad={b.padded_size}  "
          f"backend={jax.default_backend()}")

    t0 = time.perf_counter()
    ga, gb = a.get_grid(), b.get_grid()
    _sync((ga.points, gb.points))
    print(f"{'grid build (both, host sort + upload)':55s} "
          f"{(time.perf_counter()-t0)*1e3:9.2f} ms")

    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    n_a = jnp.asarray(a.n)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    @jax.jit
    def lb_fn(ga_pts, gb_lo, gb_hi, n_valid):
        a_tiles = ga_pts.reshape(nta, CHUNK, 3)
        valid_t = (jnp.arange(nta * CHUNK) < n_valid).reshape(nta, CHUNK)
        a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
        a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
        return bbox_lower_bounds(a_lo, a_hi, gb_lo, gb_hi)

    _, lb = timeit("lb matrix (tile bboxes + bbox dists)",
                   lambda: lb_fn(ga.points, gb.bbox_lo, gb.bbox_hi, n_a))

    topk = jax.jit(lambda m: jax.lax.top_k(-m, 32)[1].astype(jnp.int32))
    _, cand = timeit("candidate select: lax.top_k(-lb, 32)",
                     lambda: topk(lb))
    timeit("candidate select: pallas selector (cap=32)",
           lambda: select_candidates_pallas(lb, 32))

    qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
    bt8 = jnp.pad(gb.points, ((0, 0), (0, 5))).T
    borig = gb.perm[None, :]
    qt8, bt8, borig = jax.device_put((qt8, bt8, borig))
    timeit("refine stage-1 pallas_t (cap=32), one direction",
           lambda: refine_nn_pallas_t(qt8, bt8.T, borig, cand))

    timeit("nn_pruned_sorted full (ft=0: no stage 2)",
           lambda: nn_pruned_sorted(ga, gb, n_a, cap=32, fallback_tiles=0))
    _, full = timeit("nn_pruned_sorted full (ft=256 stage 2)",
                     lambda: nn_pruned_sorted(ga, gb, n_a, cap=32,
                                              fallback_tiles=256))
    print(f"{'  (stage-1 certificate overflow?)':55s} "
          f"{str(np.asarray(full[2])):>9s}")

    idx = full[1]
    payload = jnp.concatenate([b.points, b.colors, b.normals], axis=1)

    @jax.jit
    def gather(payload, idx):
        return jnp.take(payload, idx, axis=0, mode="clip")

    timeit("payload row-gather (Pa x 9 floats)", lambda: gather(payload, idx))

    kwargs = dict(color_scheme="ycc", point_to_plane=True, d2_mode="pc_error")
    timeit("fused_evaluate (full suite, cached grids/boundary)",
           lambda: fused_evaluate(a, b, **kwargs), n=5)


if __name__ == "__main__":
    main()
