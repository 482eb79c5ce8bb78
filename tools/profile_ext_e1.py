"""A/B the two-level k-NN extension (PCC_KNN_EXT_E1) on hardware.

Measures knn_pruned_sorted (k=30, cap=64, with_moments=True — the
estimation core) at several E1 settings. Flags resolve at CALL time
(KnnFlags static arg), so flipping the env between calls retraces.

Run: python tools/profile_ext_e1.py [n_points]
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
from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted  # noqa: E402


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def timeit(label, fn, n=5):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:48s} {np.median(ts)*1e3:9.1f} ms "
          f"(min {np.min(ts)*1e3:.1f})", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, _ = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], dtype=jnp.float32)
    _sync(jnp.sum(a.points))  # absorb first-op penalty
    g = a.get_grid()
    _sync(g.points)
    n = jnp.asarray(a.n)
    k = 30
    nta = a.padded_size // 256
    print(f"n={a.n} pad={a.padded_size} nta={nta}", flush=True)

    def run():
        return knn_pruned_sorted(g, g, n, k, cap=64, fallback_tiles=256,
                                 with_moments=True)

    base = None
    for e1 in (0, 8, 16, 24, 32):
        os.environ["PCC_KNN_EXT_E1"] = str(e1)
        out = timeit(f"estimation core E1={e1}", run)
        if e1 == 0:
            base = out
        else:
            d_ok = np.array_equal(np.asarray(out[0]), np.asarray(base[0]))
            i_ok = np.array_equal(np.asarray(out[1]), np.asarray(base[1]))
            m_ok = np.allclose(np.asarray(out[3]), np.asarray(base[3]),
                               rtol=0, atol=0)
            print(f"    equality vs E1=0: d={d_ok} i={i_ok} mom={m_ok}",
                  flush=True)

    # fte sensitivity at the best-looking E1 (set via argv[2] if desired)
    best = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    os.environ["PCC_KNN_EXT_E1"] = str(best)
    for fte in (256, 512, 1024):
        os.environ["PCC_KNN_EXT_FTE"] = str(fte)
        timeit(f"estimation core E1={best} fte={fte}", run)
    os.environ.pop("PCC_KNN_EXT_FTE", None)


if __name__ == "__main__":
    main()
