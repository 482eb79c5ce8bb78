"""Slope-method device-side costs: t(R2)-t(R1) over (R2-R1) repeats in-jit.

Uses a denormal (1e-38) iteration-dependent perturbation that XLA cannot
fold away, and two repeat counts so dispatch overhead and any hoisted
loop-invariant work cancel exactly.
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
from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds, ChunkGrid  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted  # noqa: E402

R1, R2 = 3, 13


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
    print(f"{label:55s} {per:8.3f} ms/iter  "
          f"(t{R1}={meds[R1]*1e3:.1f} t{R2}={meds[R2]*1e3:.1f})")


def repeat(fn, *args, r=10):
    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + (jnp.asarray(i, jnp.float32) * 1e-38).astype(
                args[0].dtype)
            out = fn(a0, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0), unroll=False)

    return lambda: run(*args)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    pa = ga.points.shape[0]
    print(f"nta={nta} ncb={ncb} slope {R1}->{R2}")

    tiny = jnp.zeros((8, 128), jnp.float32)
    slope("noop floor", lambda r: repeat(lambda x: x + 1.0, tiny, r=r))

    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    valid_t = (jnp.arange(nta * CHUNK) < a.n).reshape(nta, CHUNK)
    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
    _sync((a_lo, a_hi))

    slope("lb (nta,ncb)", lambda r: repeat(
        lambda al: bbox_lower_bounds(al, a_hi, gb.bbox_lo, gb.bbox_hi),
        a_lo, r=r))
    lb_mat = jax.jit(bbox_lower_bounds)(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)
    _sync(lb_mat)

    slope("top_k(-lb, 32)", lambda r: repeat(
        lambda m: jax.lax.top_k(-m, 32)[1], lb_mat, r=r))

    payload = jnp.concatenate([b.points, b.colors, b.normals], axis=1)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, gb.points.shape[0], pa),
        jnp.int32)
    _sync((payload, idx))
    slope("payload row-gather (pa x 9)", lambda r: repeat(
        lambda p: jnp.take(p, idx, axis=0, mode="clip"), payload, r=r))

    # The big one: whole pruned-NN pass (refine_impl resolved for TPU).
    def nn_once(pts):
        g2 = ChunkGrid(pts, ga.perm, ga.codes, ga.bbox_lo, ga.bbox_hi,
                       ga.chunk_codes)
        d, i, _ = nn_pruned_sorted(g2, gb, jnp.asarray(a.n))
        return d

    slope("nn_pruned_sorted a->b (legacy pallas)", lambda r: repeat(
        nn_once, ga.points, r=r))

    def nn_adaptive(pts):
        from open_pcc_metric_tpu.ops.nn_pruned import (
            nn_pruned_adaptive_sorted,
        )

        g2 = ChunkGrid(pts, ga.perm, ga.codes, ga.bbox_lo, ga.bbox_hi,
                       ga.chunk_codes)
        d, i, _ = nn_pruned_adaptive_sorted(g2, gb, jnp.asarray(a.n))
        return d

    slope("nn_pruned_adaptive a->b", lambda r: repeat(
        nn_adaptive, ga.points, r=r))


if __name__ == "__main__":
    main()
