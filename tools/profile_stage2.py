"""Slope-timing of stage-1-only vs stage-1+2 nn_pruned_sorted, both dirs.

Separates the fixed-cap pallas stage 1 from the always-on ft x cap2 XLA
stage 2 to see where the ~150 ms of NN time in pair_stats actually goes.
Consumes BOTH outputs (d and idx) so no extraction is dead-code-eliminated.
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
from open_pcc_metric_tpu.ops.grid import ChunkGrid  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted  # noqa: E402

R1, R2 = 2, 7


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def slope(label, make_run):
    meds = {}
    for r in (R1, R2):
        fn = make_run(r)
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
    print(f"{label:58s} {per:8.2f} ms/iter")


def repeat(fn, *args, r=5):
    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + (jnp.asarray(i, jnp.float32) * 1e-38).astype(
                args[0].dtype)
            d, idx, ov = fn(a0, *args[1:])
            return (acc + d.ravel()[0] + idx.ravel()[0].astype(jnp.float32)
                    + ov.astype(jnp.float32))

        return jax.lax.fori_loop(0, r, body, jnp.float32(0), unroll=False)

    return lambda: run(*args)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()

    def run(gq, gs, n, cap, ft, label):
        def nn(pts):
            g2 = ChunkGrid(pts, gq.perm, gq.codes, gq.bbox_lo, gq.bbox_hi,
                           gq.chunk_codes)
            return nn_pruned_sorted(g2, gs, jnp.asarray(n), cap=cap,
                                    fallback_tiles=ft)

        slope(label, lambda r: repeat(nn, gq.points, r=r))

    for tag, gq, gs, n in (("a->b", ga, gb, a.n), ("b->a", gb, ga, b.n)):
        run(gq, gs, n, 32, 0, f"{tag} stage1 only (cap=32, ft=0)")
        run(gq, gs, n, 32, 64, f"{tag} cap=32 ft=64")
        run(gq, gs, n, 32, 256, f"{tag} cap=32 ft=256 (fused default)")
        run(gq, gs, n, 16, 256, f"{tag} cap=16 ft=256")


if __name__ == "__main__":
    main()
