"""Histogram the counted-schedule PROBE counts for the 30-NN estimation
passes and the 1-NN pair passes at bench scale.

Sizes the round-4 two-level extension (VERDICT r4 item 1b): the in-place
extension executes E1 slots everywhere; tiles whose probe count exceeds
p1+E1 go through a compacted tier. We need p(counts1 > p1+E1) per E1 to
pick E1 and the tier budget.

Run: python tools/knn_count_hist.py [n_points]
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_pcc_metric_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds  # noqa: E402
from open_pcc_metric_tpu.ops.refine_pallas import (  # noqa: E402
    refine_knn_pallas_t, refine_nn_pallas_t,
)


def hist(tag, counts, p1):
    counts = np.asarray(counts)
    qs = np.percentile(counts, [50, 75, 90, 95, 99])
    line = " ".join(f"p{p}={v:.0f}" for p, v in zip((50, 75, 90, 95, 99), qs))
    print(f"{tag}: n_tiles={counts.size} mean={counts.mean():.1f} {line} "
          f"max={counts.max()}")
    for thr in (p1, p1 + 2, p1 + 4, p1 + 8, p1 + 16, 32, 48):
        frac = float((counts > thr).mean())
        print(f"    p(count > {thr:3d}) = {frac:6.3f}  "
              f"(tiles: {int((counts > thr).sum())})")


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], dtype=jnp.float32)
    eps = np.finfo(np.float32).eps
    k = 30
    p1 = 8

    def probe_counts_knn(c, cap):
        g = c.get_grid()
        nta = g.points.shape[0] // CHUNK
        valid_t = (jnp.arange(nta * CHUNK) < c.n).reshape(nta, CHUNK)
        big = jnp.asarray(jnp.finfo(jnp.float32).max)
        tiles = g.points.reshape(nta, CHUNK, 3)
        a_lo = jnp.min(jnp.where(valid_t[:, :, None], tiles, big), axis=1)
        a_hi = jnp.max(jnp.where(valid_t[:, :, None], tiles, -big), axis=1)
        lb = bbox_lower_bounds(a_lo, a_hi, g.bbox_lo, g.bbox_hi)
        cand = jax.lax.top_k(-lb, cap)[1].astype(jnp.int32)
        qt8 = jnp.pad(g.points, ((0, 0), (0, 5))).T
        b8r = jnp.pad(g.points, ((0, 0), (0, 5)))
        d1, _ = refine_knn_pallas_t(qt8, b8r, g.perm[None, :],
                                    cand[:, :p1], k)
        kth1 = d1.reshape(nta, CHUNK, k)[:, :, k - 1]
        ub1 = jnp.max(jnp.where(valid_t, kth1, -jnp.inf), axis=1)
        ub1_eff = ub1 * (1 + 8 * eps) + 8 * eps
        return jnp.sum(lb <= ub1_eff[:, None], axis=1)

    def probe_counts_1nn(qc, sc, exclude_self):
        ga, gb = qc.get_grid(), sc.get_grid()
        nta = ga.points.shape[0] // CHUNK
        valid_t = (jnp.arange(nta * CHUNK) < qc.n).reshape(nta, CHUNK)
        big = jnp.asarray(jnp.finfo(jnp.float32).max)
        tiles = ga.points.reshape(nta, CHUNK, 3)
        a_lo = jnp.min(jnp.where(valid_t[:, :, None], tiles, big), axis=1)
        a_hi = jnp.max(jnp.where(valid_t[:, :, None], tiles, -big), axis=1)
        lb = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)
        cand = jax.lax.top_k(-lb, p1)[1].astype(jnp.int32)
        qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
        bt8 = jnp.pad(gb.points, ((0, 0), (0, 5)))
        d1, _ = refine_nn_pallas_t(qt8, bt8, gb.perm[None, :], cand,
                                   exclude_self=exclude_self)
        d1 = d1.reshape(nta, CHUNK)
        ub = jnp.max(jnp.where(valid_t, d1, -jnp.inf), axis=1)
        ub_eff = ub * (1 + 8 * eps) + 8 * eps
        return jnp.sum(lb <= ub_eff[:, None], axis=1)

    hist("30-NN self a (est)", probe_counts_knn(a, 64), p1)
    hist("30-NN self b (est)", probe_counts_knn(b, 64), p1)
    hist("1-NN a->b", probe_counts_1nn(a, b, False), p1)
    hist("1-NN b->a", probe_counts_1nn(b, a, False), p1)
    hist("1-NN self a", probe_counts_1nn(a, a, True), p1)


if __name__ == "__main__":
    main()
