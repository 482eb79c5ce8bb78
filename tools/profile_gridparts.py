"""Slope-time the DEVICE grid build's components at bench scale.

VERDICT r4 item 1a: the cold-pair fold pays ~0.28 s for two build_grid
calls; find where it goes (codes / argsort / gathers / bbox) and whether a
multi-operand lax.sort (payload carried through the sort, no post-gathers)
beats argsort+takes.

Run: python tools/profile_gridparts.py [n_points]
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

from open_pcc_metric_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import (  # noqa: E402
    CHUNK, build_grid, morton_codes,
)

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
          f"(t{R1}={meds[R1]*1e3:.1f} t{R2}={meds[R2]*1e3:.1f})", flush=True)


def repeat(fn, *args, r=10):
    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + (jnp.asarray(i, jnp.float32) * 1e-38).astype(
                args[0].dtype)
            out = fn(a0, *args[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.float32(0)
            for leaf in leaves:
                s = s + leaf.ravel()[::4096].astype(jnp.float32).sum()
            return acc + s

        return jax.lax.fori_loop(0, r, body, jnp.float32(0), unroll=False)

    return lambda: run(*args)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], dtype=jnp.float32)
    nv_a = jnp.asarray(a.n)
    nv_b = jnp.asarray(b.n)
    _sync((a.points, b.points))
    _sync(jnp.sum(a.points))  # burn the first-op penalty
    print(f"pa={a.padded_size} pb={b.padded_size}", flush=True)

    slope("full build_grid(a)", lambda r: repeat(
        lambda p: build_grid(p, nv_a), a.points, r=r))
    slope("full build_grid(b)", lambda r: repeat(
        lambda p: build_grid(p, nv_b), b.points, r=r))

    slope("morton codes only", lambda r: repeat(
        lambda p: morton_codes(p, nv_a), a.points, r=r))

    codes = jax.jit(morton_codes)(a.points, nv_a)
    _sync(codes)

    slope("argsort(codes) stable", lambda r: repeat(
        lambda c: jnp.argsort(c.astype(jnp.int32), stable=True),
        codes.astype(jnp.float32), r=r))

    perm = jnp.argsort(codes, stable=True).astype(jnp.int32)
    _sync(perm)

    slope("take(codes, perm)", lambda r: repeat(
        lambda c: jnp.take(c.astype(jnp.int32), perm),
        codes.astype(jnp.float32), r=r))
    slope("take(points, perm)", lambda r: repeat(
        lambda p: jnp.take(p, perm, axis=0), a.points, r=r))
    slope("bbox min/max over tiles", lambda r: repeat(
        lambda p: (jnp.min(p.reshape(-1, CHUNK, 3), axis=1),
                   jnp.max(p.reshape(-1, CHUNK, 3), axis=1)),
        a.points, r=r))

    # Variant: ONE multi-operand sort carrying all payload.
    def fused_sort(p):
        c = morton_codes(p, nv_a)
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        sc, sperm, sx, sy, sz = jax.lax.sort(
            (c, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=2)
        sp = jnp.stack([sx, sy, sz], axis=1)
        tiles = sp.reshape(-1, CHUNK, 3)
        return sc, sperm, sp, jnp.min(tiles, 1), jnp.max(tiles, 1)

    slope("fused lax.sort(5 operands, 2 keys)", lambda r: repeat(
        fused_sort, a.points, r=r))

    # Variant: sort (code, iota) pair only, then gathers (what argsort
    # already does under the hood — sanity check the decomposition).
    def sort_pair(p):
        c = morton_codes(p, nv_a)
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        sc, sperm = jax.lax.sort((c, iota), num_keys=1)
        return sc, sperm

    slope("lax.sort((code, iota))", lambda r: repeat(
        sort_pair, a.points, r=r))

    # Variant: single fused key uint32: (code << 2 | low bits)? Codes are
    # 30-bit so a single-key sort is NOT stable; stability only affects
    # which duplicate-code point goes first — pruning efficiency, not
    # correctness. Measure the unstable single-key argsort.
    def sort_single(p):
        c = morton_codes(p, nv_a)
        iota = jnp.arange(p.shape[0], dtype=jnp.int32)
        _, sperm = jax.lax.sort((c, iota), num_keys=1)
        return sperm

    slope("single-key sort value=iota", lambda r: repeat(
        sort_single, a.points, r=r))


if __name__ == "__main__":
    main()
