"""Slope-method A/B of the pruned-NN prologue at scale: materialised
lb + lax.top_k vs the fused bbox select/count kernels.

Standalone timing is useless here: every dispatch costs ~30 ms wall, and
all prologue candidates measure 26-60 ms standalone (tools/
profile_select.py — the dispatch floor, not the op). This harness uses
t(R2)-t(R1) over in-jit repeats with a denormal perturbation of a_lo.

Run: python tools/profile_select_slope.py [n_points]
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
    count_bbox_pallas, select_bbox_pallas,
)

R1, R2 = 2, 8


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def slope(label, make_run):
    runs = {r: make_run(r) for r in (R1, R2)}
    meds = {}
    for r, fn in runs.items():
        out = fn()
        _sync(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn()
            _sync(out)
            ts.append(time.perf_counter() - t0)
        meds[r] = float(np.median(ts))
    per = (meds[R2] - meds[R1]) / (R2 - R1) * 1e3
    print(f"{label:52s} {per:8.3f} ms/iter  "
          f"(t{R1}={meds[R1]*1e3:.1f} t{R2}={meds[R2]*1e3:.1f})", flush=True)


def repeat(fn, *args, r=10):
    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + (jnp.asarray(i, jnp.float32) * 1e-38).astype(
                args[0].dtype)
            out = fn(a0, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            # sparse consume so pallas outputs cannot short-circuit
            return acc + jnp.sum(
                leaf.ravel()[::512].astype(jnp.float32))

        return jax.lax.fori_loop(0, r, body, jnp.float32(0), unroll=False)

    return lambda: run(*args)


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

    tiny = jnp.zeros((8, 128), jnp.float32)
    slope("noop floor", lambda r: repeat(lambda x: x + 1.0, tiny, r=r))

    for qg, sg, tag in ((ga, gb, "a->b"), (ga, ga, "self")):
        a_lo, a_hi = jax.jit(tile_bboxes)(qg, jnp.asarray(a.n))
        b_lo, b_hi = sg.bbox_lo, sg.bbox_hi
        _sync((a_lo, a_hi))
        print(f"--- {tag}: nta={a_lo.shape[0]} ncb={b_lo.shape[0]}",
              flush=True)

        slope("  lb matrix", lambda r: repeat(
            lambda al: bbox_lower_bounds(al, a_hi, b_lo, b_hi), a_lo, r=r))
        lb = jax.jit(bbox_lower_bounds)(a_lo, a_hi, b_lo, b_hi)
        _sync(lb)
        for cap in (32, 64):
            slope(f"  top_k(-lb, {cap})", lambda r: repeat(
                lambda m: jax.lax.top_k(-m, cap)[1], lb, r=r))
            slope(f"  lb + top_k {cap} (chained)", lambda r: repeat(
                lambda al: jax.lax.top_k(
                    -bbox_lower_bounds(al, a_hi, b_lo, b_hi), cap)[1],
                a_lo, r=r))
            slope(f"  fused select cap={cap}", lambda r: repeat(
                lambda al: select_bbox_pallas(al, a_hi, b_lo, b_hi, cap),
                a_lo, r=r))
        thr = jnp.full((a_lo.shape[0],), 1.0, jnp.float32)
        slope("  XLA count over lb", lambda r: repeat(
            lambda m: jnp.sum(m <= thr[:, None], axis=1), lb, r=r))
        slope("  fused count (incl lb recompute)", lambda r: repeat(
            lambda al: count_bbox_pallas(al, a_hi, b_lo, b_hi, thr),
            a_lo, r=r))


if __name__ == "__main__":
    main()
