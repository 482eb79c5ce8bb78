"""Grid-build strategy shootout on the tunnelled TPU.

The host build (build_grid_host) uploads ~17 MB per 800k cloud through the
axon tunnel (~4 MB/s measured) — 7-11 s per cold pair. Candidates:
  (a) full device build_grid (jit argsort + gathers; zero upload),
  (b) host codes+radix-argsort, upload ONLY perm, device gather + bbox,
  (c) the current host build (baseline).
Run: python tools/profile_gridbuild.py [n_points]
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
from open_pcc_metric_tpu.cloud import Cloud, PAD_SENTINEL  # noqa: E402
from open_pcc_metric_tpu.ops.grid import (  # noqa: E402
    CHUNK, _SENTINEL_CODE, _part1by2_np, build_grid, build_grid_host,
)
from open_pcc_metric_tpu import native  # noqa: E402


def _sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def timeit(label, fn, n=3):
    out = fn()
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} {np.median(ts)*1e3:9.1f} ms", flush=True)
    return out


@jax.jit
def _device_finish(points, perm):
    """Sorted points + bboxes from an uploaded perm (device gather)."""
    sp = jnp.take(points, perm, axis=0)
    tiles = sp.reshape(-1, CHUNK, 3)
    return sp, jnp.min(tiles, axis=1), jnp.max(tiles, axis=1)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, _ = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], dtype=jnp.float32)
    _sync(a.points)
    n, p = a.n, a.padded_size
    print(f"n={n} pad={p}", flush=True)

    # warm-up the first-op penalty with an unrelated op
    _sync(jnp.sum(a.points))

    timeit("(c) host build (codes+radix+gathers+upload)",
           lambda: build_grid_host(a.host_points, p))

    nv = jnp.asarray(n)
    timeit("(a) device build_grid (argsort on TPU)",
           lambda: build_grid(a.points, nv))

    def hybrid():
        pts = a.host_points
        lo = pts.min(axis=0)
        extent = np.maximum(pts.max(axis=0) - lo, 1e-9)
        q = np.clip(((pts - lo) * (1023.0 / extent)).astype(np.int64),
                    0, 1023)
        codes = (
            _part1by2_np(q[:, 0])
            | (_part1by2_np(q[:, 1]) << 1)
            | (_part1by2_np(q[:, 2]) << 2)
        ).astype(np.int64)
        perm = native.radix_argsort_u32(codes.astype(np.uint32))
        if perm is None:
            perm = np.argsort(codes, kind="stable")
        perm_full = np.concatenate([perm, np.arange(n, p)]).astype(np.int32)
        codes_full = np.concatenate(
            [codes[perm],
             np.full(p - n, _SENTINEL_CODE, np.int64)]).astype(np.int32)
        dperm = jnp.asarray(perm_full)
        sp, blo, bhi = _device_finish(a.points, dperm)
        return sp, dperm, jnp.asarray(codes_full), blo, bhi

    timeit("(b) hybrid: host sort, upload perm, device gather",
           lambda: hybrid())

    # breakdown of (b): host-only part vs upload+gather
    def host_only():
        pts = a.host_points
        lo = pts.min(axis=0)
        extent = np.maximum(pts.max(axis=0) - lo, 1e-9)
        q = np.clip(((pts - lo) * (1023.0 / extent)).astype(np.int64),
                    0, 1023)
        codes = (
            _part1by2_np(q[:, 0])
            | (_part1by2_np(q[:, 1]) << 1)
            | (_part1by2_np(q[:, 2]) << 2)
        ).astype(np.int64)
        perm = native.radix_argsort_u32(codes.astype(np.uint32))
        if perm is None:
            perm = np.argsort(codes, kind="stable")
        return codes, perm

    t0 = time.perf_counter()
    host_only()
    print(f"{'    (b) host codes+radix only':55s} "
          f"{(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)

    # raw upload bandwidth probe
    blob = np.zeros((p,), np.int32)
    timeit("    upload probe: one (P,) int32 (3.4 MB)",
           lambda: jnp.asarray(blob) + 0)


if __name__ == "__main__":
    main()
