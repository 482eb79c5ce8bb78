"""Measure the certificate qualifying-count distribution per stage-1 cap.

For each cap in {4, 8, 16, 32}: refine, compute per-tile ub, then the
qualifying count (#chunks with lb <= ub_eff). The distribution tells us the
cheapest (cap, stage-2 bucket) policy that keeps exactness.
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

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds, CHUNK  # noqa: E402
from open_pcc_metric_tpu.ops.refine_pallas import refine_nn_pallas_t  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)

    for qc, sc, na in ((a, b, a.n), (b, a, b.n), (a, a, a.n)):
        ga, gb = qc.get_grid(), sc.get_grid()
        self_mode = qc is sc
        nta = ga.points.shape[0] // CHUNK
        ncb = gb.n_chunks
        n_a = jnp.asarray(na)
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

        a_tiles = ga.points.reshape(nta, CHUNK, 3)
        valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)
        a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
        a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
        lb = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)

        qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
        bt8 = qt8 if self_mode else jnp.pad(gb.points, ((0, 0), (0, 5))).T
        borig = gb.perm[None, :]
        eps = np.finfo(np.float32).eps

        tag = "self a->a" if self_mode else (
            "a->b" if qc is a else "b->a")
        print(f"--- direction {tag}: nta={nta} ncb={ncb}")
        for cap in (4, 8, 16, 32):
            cand = jax.lax.top_k(-lb, cap)[1].astype(jnp.int32)
            d, _ = refine_nn_pallas_t(qt8, bt8.T, borig, cand,
                                      exclude_self=self_mode)
            d = d.reshape(nta, CHUNK)
            ub = jnp.max(jnp.where(valid_t, d, -jnp.inf), axis=1)
            ub_eff = ub * (1 + 8 * eps) + 8 * eps
            counts = np.asarray(
                jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)
            )
            q = np.percentile(counts, [50, 90, 99, 99.9])
            over = int((counts > cap).sum())
            print(
                f"cap={cap:3d}: count p50={q[0]:6.1f} p90={q[1]:6.1f} "
                f"p99={q[2]:7.1f} p99.9={q[3]:8.1f} max={counts.max():6d} "
                f"over-cap tiles={over:5d} "
                f"work(sum min(count,cap))={np.minimum(counts, cap).sum():8d}"
            )


if __name__ == "__main__":
    main()
