"""TPU check + timing of the adaptive refinement vs the legacy pipeline."""
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
from open_pcc_metric_tpu.ops.nn_pruned import (  # noqa: E402
    nn_pruned_adaptive_sorted,
    nn_pruned_sorted,
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
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)
    print(f"mxu gate: a={a.mxu_exact()} b={b.mxu_exact()}")
    ga, gb = a.get_grid(), b.get_grid()
    n_a, n_b = jnp.asarray(a.n), jnp.asarray(b.n)

    for tag, gq, gs, nv, excl in (("a->b", ga, gb, n_a, False),
                                  ("b->a", gb, ga, n_b, False),
                                  ("self", ga, ga, n_a, True)):
        ref = timeit(f"{tag} legacy pallas cap32+ft256",
                     lambda: nn_pruned_sorted(gq, gs, nv, exclude_self=excl,
                                              refine_impl="pallas"))
        ada = timeit(f"{tag} adaptive (fused-loop MXU)",
                     lambda: nn_pruned_adaptive_sorted(gq, gs, nv,
                                                       exclude_self=excl))
        nv_i = int(nv)
        rd, ri = np.asarray(ref[0])[:nv_i], np.asarray(ref[1])[:nv_i]
        od, oi = np.asarray(ada[0])[:nv_i], np.asarray(ada[1])[:nv_i]
        print(f"   legacy overflow={bool(ref[2])} adaptive overflow="
              f"{bool(ada[2])}  d equal={np.array_equal(rd, od)} "
              f"i equal={np.array_equal(ri, oi)}")


if __name__ == "__main__":
    main()
