"""Per-stage wall-time breakdown of nn_pruned_adaptive_sorted on the TPU.

Times lb build, top_k candidate selection, P1 probe, count, P2 prefix,
P3 tail separately. Run: python tools/profile_adaptive_stages.py [n_points].
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
from open_pcc_metric_tpu.ops.grid import CHUNK  # noqa: E402
from open_pcc_metric_tpu.ops import nn_pruned as npr  # noqa: E402
from open_pcc_metric_tpu.ops.refine_adaptive import (  # noqa: E402
    adaptive_refine, pack_candidates, pack_queries,
)


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "shape"):
            np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} {float(np.median(ts))*1e3:9.2f} ms")
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    cap, p1, ft3 = 64, 8, 64
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    n_a = jnp.asarray(a.n)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    print(f"nta={nta} ncb={ncb} cap={cap}")
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)

    lbfn = jax.jit(lambda: npr._tile_lower_bounds(ga, gb, n_a, nta))
    valid_t, lb = timeit("lb matrix", lbfn)

    qhat = jax.jit(pack_queries)(ga.points)
    bhat = jax.jit(pack_candidates)(gb.points, gb.perm)
    _sync((qhat, bhat))

    topk = jax.jit(lambda m, k: jax.lax.top_k(-m, k)[1].astype(jnp.int32),
                   static_argnums=1)
    timeit("top_k(-lb, 32)", lambda: topk(lb, 32))
    cand = timeit(f"top_k(-lb, {cap})", lambda: topk(lb, cap))

    nta_pad = ((nta + 7) // 8) * 8
    pad = nta_pad - nta

    def padrows(x, value=0):
        if pad == 0:
            return x
        w = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=value)

    tids = padrows(jnp.arange(nta, dtype=jnp.int32))
    cand_p = jax.jit(padrows)(cand)
    _sync((tids, cand_p))

    ncand1 = padrows(jnp.full((nta,), p1, jnp.int32))
    p1fn = jax.jit(lambda: adaptive_refine(qhat, bhat, cand_p[:, :p1],
                                           ncand1, tids))
    d1, i1 = timeit(f"P1 probe (p1={p1})", p1fn)

    cfn = jax.jit(lambda d: npr._ub_counts(d[:nta], valid_t, lb, eps))
    count1 = timeit("ub+counts", lambda: cfn(d1))

    ncand2 = jax.jit(lambda c: padrows(
        jnp.clip(jnp.minimum(c, cap) - p1, 0, cap - p1)))(count1)
    _sync(ncand2)
    print(f"  mean P2 slots: {float(jnp.mean(ncand2)):.2f}")
    p2fn = jax.jit(lambda: adaptive_refine(qhat, bhat, cand_p[:, p1:cap],
                                           ncand2, tids, init=(d1, i1)))
    d2, i2 = timeit(f"P2 prefix (slots up to {cap - p1})", p2fn)

    count2 = cfn(d2)
    is_tail = count2 > cap
    print(f"  tail tiles: {int(jnp.sum(is_tail))}")
    ft = min(ft3, nta)
    ft_pad = ((ft + 7) // 8) * 8

    @jax.jit
    def p3fn():
        _, otiles = jax.lax.top_k(jnp.where(is_tail, count2, 0), ft)
        otiles = otiles.astype(jnp.int32)
        ncand3 = jnp.where(is_tail[otiles], count2[otiles], 0)
        order = jnp.argsort(lb[otiles], axis=1).astype(jnp.int32)

        def padft(x, value=0):
            if ft_pad == ft:
                return x
            w = ((0, ft_pad - ft),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, w, constant_values=value)

        return adaptive_refine(qhat, bhat, padft(order), padft(ncand3),
                               padft(otiles))

    timeit("P3 tail (top_k + argsort + refine)", p3fn)

    full = jax.jit(lambda: npr.nn_pruned_adaptive_sorted(
        ga, gb, n_a, cap=cap, ft3=ft3, p1=p1))
    timeit("nn_pruned_adaptive_sorted (whole, one jit)", full)
    legacy = jax.jit(lambda: npr.nn_pruned_sorted(
        ga, gb, n_a, cap=32, fallback_tiles=256, refine_impl="pallas"))
    timeit("legacy nn_pruned_sorted pallas cap32", legacy)


if __name__ == "__main__":
    main()
