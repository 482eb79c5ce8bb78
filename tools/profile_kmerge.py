"""Quantify the k=30 in-kernel merge cost of the pruned k-NN refinement.

The k-NN kernel's full merge is ~k rounds of (min, mask) over a
(k+CHUNK)-wide buffer — ~20x a distance evaluation. This tool times the
probe/extension passes at k=30 vs k=2 (merge cost scales with k, DMA and
distance work do not) and prints the certificate-count distribution, to
bound what a cheaper merge could save.

Run: python tools/profile_kmerge.py [n_points]
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
from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import (  # noqa: E402
    _tile_lower_bounds, )
from open_pcc_metric_tpu.ops.refine_pallas import (  # noqa: E402
    moments_pallas_t, refine_knn_pallas_t,
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

    valid_t, lb = jax.jit(
        _tile_lower_bounds, static_argnums=(3,))(g, g, n, nta)
    cap, p1, k = 64, 8, 30
    _, cand = jax.lax.top_k(-lb, cap)
    cand = cand.astype(jnp.int32)
    qt8 = jnp.pad(g.points, ((0, 0), (0, 5))).T
    b8r = jnp.pad(g.points, ((0, 0), (0, 5)))
    borig = g.perm[None, :]
    _sync((cand, qt8, b8r))

    # Probe pass at several k: merge cost scales with k.
    for kk in (30, 8, 2):
        d1, i1 = timeit(
            f"probe p1=8 k={kk}",
            lambda kk=kk: refine_knn_pallas_t(
                qt8, b8r, borig, cand[:, :p1], kk))

    d1, i1 = refine_knn_pallas_t(qt8, b8r, borig, cand[:, :p1], k)
    kth1 = d1.reshape(nta, CHUNK, k)[:, :, k - 1]
    ub1 = jnp.max(jnp.where(valid_t, kth1, -jnp.inf), axis=1)
    ub1_eff = ub1 * (1 + 8 * eps) + 8 * eps
    counts1 = jnp.sum(lb <= ub1_eff[:, None], axis=1)
    ncand2 = jnp.clip(counts1 - p1, 0, cap - p1).astype(jnp.int32)
    nc = np.asarray(ncand2)
    # Compacted-schedule sizing: the kernel visits 8 consecutive tiles per
    # grid step, so a slot-compacted step table enumerates each GROUP up to
    # its max tile need. Morton-adjacent tiles have correlated needs, so
    # sum(group_max) should sit well below n_groups*(cap-p1).
    gmax = nc[: nc.shape[0] // 8 * 8].reshape(-1, 8).max(axis=1)
    full = gmax.shape[0] * (cap - p1)
    print(f"group-max ext need: mean={gmax.mean():.1f} "
          f"p50={np.percentile(gmax, 50):.0f} "
          f"p90={np.percentile(gmax, 90):.0f} max={gmax.max()} "
          f"sum={gmax.sum()} (full grid {full}, "
          f"ratio {gmax.sum()/full:.2f})", flush=True)
    print(f"ncand2 (ext slots): mean={nc.mean():.1f} "
          f"p50={np.percentile(nc, 50):.0f} p90={np.percentile(nc, 90):.0f} "
          f"p99={np.percentile(nc, 99):.0f} max={nc.max()} "
          f"frac_zero={(nc == 0).mean():.2f}", flush=True)

    exts = {}
    for cs in (1, 2, 4):
        exts[cs] = timeit(
            f"extension (real ncand2, k=30, seeded, cs={cs})",
            lambda cs=cs: refine_knn_pallas_t(
                qt8, b8r, borig, cand[:, p1:], k, ncand=ncand2,
                init=(d1, i1), cs=cs))
    for cs in (1, 2, 4):
        timeit(f"extension (zero gate: clamped grid only, cs={cs})",
               lambda cs=cs: refine_knn_pallas_t(
                   qt8, b8r, borig, cand[:, p1:], k,
                   ncand=jnp.zeros((nta,), jnp.int32), init=(d1, i1),
                   cs=cs))
    # Combined-region merge equality across cs (idempotent duplicate merge)
    for cs in (2, 4):
        same_d = bool(jnp.array_equal(exts[1][0], exts[cs][0]))
        same_i = bool(jnp.array_equal(exts[1][1], exts[cs][1]))
        print(f"    cs={cs} vs cs=1: dists equal={same_d} "
              f"ids equal={same_i}", flush=True)

    # Moments sweep at the final counts (stage-2-free approximation).
    dk, ik, _ = knn_pruned_sorted(g, g, n, k, cap=cap, fallback_tiles=256)
    kth_d = dk[:, k - 1].reshape(nta, CHUNK)
    kth_i = ik[:, k - 1].reshape(nta, CHUNK)
    ubf = jnp.max(jnp.where(valid_t, kth_d, -jnp.inf), axis=1)
    ubf_eff = ubf * (1 + 8 * eps) + 8 * eps
    countsf = jnp.sum(lb <= ubf_eff[:, None], axis=1).astype(jnp.int32)
    nc1 = jnp.minimum(countsf, cap)
    print(f"countsf: mean={np.asarray(countsf).mean():.1f} "
          f"p99={np.percentile(np.asarray(countsf), 99):.0f}", flush=True)
    timeit("moments sweep (count-gated)",
           lambda: moments_pallas_t(qt8, b8r, borig, cand, nc1, kth_d,
                                    kth_i))

    timeit("recheck probe k=30 (window drift calibration)",
           lambda: refine_knn_pallas_t(qt8, b8r, borig, cand[:, :p1], 30))


if __name__ == "__main__":
    main()
