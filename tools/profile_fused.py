"""What does one bench call actually execute? Overflow flags + escalation.

Times pair_stats at the fused_evaluate ladder's first rung (cap=32) and, if
the overflow flag is set, the second rung (cap=128) — i.e. exactly what each
steady-state bench iteration pays — plus per-direction overflow attribution.
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
from open_pcc_metric_tpu.ops import fused  # noqa: E402
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted  # noqa: E402


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:58s} {float(np.median(ts))*1e3:9.2f} ms")
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    kwargs = dict(
        a_col=a.colors, b_col=b.colors, a_nrm=a.normals, b_nrm=b.normals,
        ga=ga, gb=gb,
        a_col_sorted=fused._sorted_colors(a),
        b_col_sorted=fused._sorted_colors(b),
        a_nrm_sorted=fused._sorted_normals(a, a.normals),
        b_nrm_sorted=fused._sorted_normals(b, b.normals),
        color_scheme="ycc", point_to_plane=True, d2_mode="pc_error",
        with_boundary=False, backend="pruned",
    )

    for tag, gq, gs, n, ex in (("a->b", ga, gb, a.n, False),
                               ("b->a", gb, ga, b.n, False)):
        for cap, ft in ((32, 256), (64, 256), (48, 384), (128, 1024)):
            d, i, ov = jax.jit(
                lambda c=cap, f=ft: nn_pruned_sorted(
                    gq, gs, jnp.asarray(n), exclude_self=ex, cap=c,
                    fallback_tiles=f))()
            print(f"  {tag} cap={cap} ft={ft}: overflow={bool(ov)}")

    for cap, fb in ((32, 256), (128, 1024)):
        st = timeit(
            f"pair_stats cap={cap} fb={fb}",
            lambda c=cap, f=fb: fused.pair_stats(
                a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
                prune_cap=c, prune_fallback=f, mxu_ok=False, **kwargs))
        print(f"    nn_overflow={bool(st['nn_overflow'])}")

    timeit("fused_evaluate (ladder, steady state)",
           lambda: fused.fused_evaluate(
               a, b, color_scheme="ycc", point_to_plane=True,
               d2_mode="pc_error"))


if __name__ == "__main__":
    main()
