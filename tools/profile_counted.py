"""Slope-timing decomposition of the counted two-pass NN schedule.

Answers, on the real TPU at bench shapes: how much of stage 1 is
  (a) the ungated p1-wide probe pass,
  (b) the extension pass's EXECUTED slots,
  (c) the extension pass's CLAMPED (gated-off) slots — pure grid overhead,
  (d) the (now count-gated) stage-2 tiers.
Run: python tools/profile_counted.py [n_points]
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
from open_pcc_metric_tpu.ops.grid import CHUNK, ChunkGrid  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import (  # noqa: E402
    _tile_lower_bounds, _ub_counts, nn_pruned_sorted,
)
from open_pcc_metric_tpu.ops.refine_pallas import (  # noqa: E402
    refine_nn_pallas_t,
)

R1, R2 = 3, 13


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


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
    print(f"{label:58s} {per:8.3f} ms/iter  "
          f"(t{R1}={meds[R1]*1e3:.1f} t{R2}={meds[R2]*1e3:.1f})",
          flush=True)
    return per


def repeat(fn, *args, r=10):
    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + (jnp.asarray(i, jnp.float32) * 1e-38).astype(
                args[0].dtype)
            out = fn(a0, *args[1:])
            # consume a sparse slice so nothing short-circuits
            leaf = jax.tree_util.tree_leaves(out)[0].ravel()
            return acc + jnp.sum(leaf[::4096].astype(jnp.float32))

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
    print(f"nta={nta} ncb={ncb} slope {R1}->{R2}", flush=True)

    valid_t, lb = jax.jit(_tile_lower_bounds, static_argnums=(3,))(
        ga, gb, jnp.asarray(a.n), nta)
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)
    cap, p1 = 32, 8
    _, cand = jax.lax.top_k(-lb, cap)
    cand = cand.astype(jnp.int32)
    qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
    b8r = jnp.pad(gb.points, ((0, 0), (0, 5)))
    borig = gb.perm[None, :]

    d1, i1 = refine_nn_pallas_t(qt8, b8r, borig, cand[:, :p1])
    d1r = d1.reshape(nta, CHUNK)
    i1r = i1.reshape(nta, CHUNK)
    counts1 = _ub_counts(d1r, valid_t, lb, eps)
    ncand2 = jnp.clip(counts1 - p1, 0, cap - p1).astype(jnp.int32)
    nc = np.asarray(ncand2)
    print(f"ncand2: mean={nc.mean():.1f} p50={np.percentile(nc, 50):.0f} "
          f"p90={np.percentile(nc, 90):.0f} p99={np.percentile(nc, 99):.0f} "
          f"max={nc.max()} frac_zero={(nc == 0).mean():.2f}", flush=True)
    _sync((d1, i1, ncand2))

    slope("probe pass (p1=8, ungated)", lambda r: repeat(
        lambda q: refine_nn_pallas_t(q, b8r, borig, cand[:, :p1]),
        qt8, r=r))

    def ext(q, nc2):
        return refine_nn_pallas_t(q, b8r, borig, cand[:, p1:], ncand=nc2,
                                  init=(d1r, i1r))

    slope("extension (real ncand2)", lambda r: repeat(
        lambda q: ext(q, ncand2), qt8, r=r))
    slope("extension (all-zero gate: pure clamped grid)", lambda r: repeat(
        lambda q: ext(q, jnp.zeros((nta,), jnp.int32)), qt8, r=r))
    slope("extension (full 24: no gating win)", lambda r: repeat(
        lambda q: ext(q, jnp.full((nta,), cap - p1, jnp.int32)), qt8, r=r))
    slope("fixed cap=32 single pass (old stage 1)", lambda r: repeat(
        lambda q: refine_nn_pallas_t(q, b8r, borig, cand), qt8, r=r))

    def full(pts, ft):
        g2 = ChunkGrid(pts, ga.perm, ga.codes, ga.bbox_lo, ga.bbox_hi,
                       ga.chunk_codes)
        d, i, _ = nn_pruned_sorted(g2, gb, jnp.asarray(a.n),
                                   fallback_tiles=ft)
        return d

    slope("nn_pruned_sorted a->b ft=0", lambda r: repeat(
        lambda p: full(p, 0), ga.points, r=r))
    slope("nn_pruned_sorted a->b ft=256 (gated tiers)", lambda r: repeat(
        lambda p: full(p, 256), ga.points, r=r))

    def full_ba(pts, ft):
        g2 = ChunkGrid(pts, gb.perm, gb.codes, gb.bbox_lo, gb.bbox_hi,
                       gb.chunk_codes)
        d, i, _ = nn_pruned_sorted(g2, ga, jnp.asarray(b.n),
                                   fallback_tiles=ft)
        return d

    slope("nn_pruned_sorted b->a ft=256 (gated tiers)", lambda r: repeat(
        lambda p: full_ba(p, 256), gb.points, r=r))


if __name__ == "__main__":
    main()
