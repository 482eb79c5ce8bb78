"""A/B the fused bbox select/count kernels vs the materialised lb + top_k
prologue on hardware, at bench shapes.

Run: python tools/profile_select.py [n_points]
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
from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds  # noqa: E402
from open_pcc_metric_tpu.ops.select_pallas import (  # noqa: E402
    count_bbox_pallas, mask_lb, select_bbox_pallas,
)


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[::4096])


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {np.median(ts)*1e3:9.2f} ms", flush=True)
    return out


def tile_bboxes(g, n):
    nta = g.points.shape[0] // CHUNK
    big = jnp.asarray(jnp.finfo(jnp.float32).max)
    tiles = g.points.reshape(nta, CHUNK, 3)
    valid = (jnp.arange(nta * CHUNK) < n).reshape(nta, CHUNK)
    a_lo = jnp.min(jnp.where(valid[:, :, None], tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid[:, :, None], tiles, -big), axis=1)
    return a_lo, a_hi


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], dtype=jnp.float32)
    _sync(jnp.sum(a.points))
    ga, gb = a.get_grid(), b.get_grid()
    _sync((ga.points, gb.points))

    for qc, qg, sg, tag in ((a, ga, gb, "a->b"), (a, ga, ga, "self")):
        a_lo, a_hi = jax.jit(tile_bboxes)(qg, jnp.asarray(qc.n))
        b_lo, b_hi = sg.bbox_lo, sg.bbox_hi
        _sync((a_lo, a_hi))
        nta, ncb = a_lo.shape[0], b_lo.shape[0]
        print(f"--- {tag}: nta={nta} ncb={ncb}", flush=True)

        for cap in (32, 64):
            lbf = jax.jit(bbox_lower_bounds)
            lb = timeit(f"  XLA lb matrix", lambda: lbf(
                a_lo, a_hi, b_lo, b_hi))
            topk = jax.jit(
                lambda m: jax.lax.top_k(-m, cap)[1].astype(jnp.int32))
            timeit(f"  XLA top_k cap={cap}", lambda: topk(lb))

            out = timeit(f"  fused select cap={cap}",
                         lambda: select_bbox_pallas(
                             a_lo, a_hi, b_lo, b_hi, cap))
            # equality vs masked-XLA reference
            ncbp = ((ncb + 127) // 128) * 128
            lbm = mask_lb(lb, ncbp)
            ref = topk(lbm)
            same = bool(jnp.array_equal(out[0], ref))
            print(f"    cand == top_k(masked lb): {same}", flush=True)

            thr = jnp.quantile(lbm, 0.01, axis=1).astype(jnp.float32)
            cntf = timeit("  fused count", lambda: count_bbox_pallas(
                a_lo, a_hi, b_lo, b_hi, thr))
            xc = jax.jit(
                lambda m, t: jnp.sum(m <= t[:, None], axis=1)
                .astype(jnp.int32))
            cx = timeit("  XLA count over lb", lambda: xc(lbm, thr))
            print(f"    counts equal: "
                  f"{bool(jnp.array_equal(cntf, cx))}", flush=True)


if __name__ == "__main__":
    main()
