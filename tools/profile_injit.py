"""True device-side costs of the fused pipeline's XLA stages.

Each stage is repeated R times INSIDE one jit (iteration-dependent zero
perturbation defeats CSE/hoisting), so the per-call axon dispatch overhead
(~25-30 ms) divides out: stage cost = (t(R) - t(0-ish)) / R.
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
from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds  # noqa: E402

R = int(os.environ.get("PCC_REPEATS", "10"))


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
    med = float(np.median(ts)) * 1e3
    print(f"{label:55s} {med:9.2f} ms total, {med/R:8.3f} ms/iter")
    return out


def repeat(fn, *args):
    """Run fn R times inside one jit; perturb by i*0.0 to defeat CSE."""

    @jax.jit
    def run(*args):
        def body(i, acc):
            a0 = args[0] + jnp.asarray(i, args[0].dtype) * 0
            out = fn(a0, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

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
    print(f"nta={nta} ncb={ncb} R={R}")

    # Dispatch floor.
    tiny = jnp.zeros((8, 128), jnp.float32)
    timeit("dispatch floor (trivial jit)", repeat(lambda x: x + 1.0, tiny))

    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    valid_t = (jnp.arange(nta * CHUNK) < a.n).reshape(nta, CHUNK)
    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
    _sync((a_lo, a_hi))

    # lb matrix, current row-major formulation.
    timeit("lb (nta,ncb) current formulation",
           repeat(lambda al: bbox_lower_bounds(al, a_hi, gb.bbox_lo,
                                               gb.bbox_hi), a_lo))

    # lb from pre-transposed bbox arrays.
    aT = jnp.concatenate([a_lo.T, a_hi.T], axis=0)  # (6, nta)
    bT = jnp.concatenate([gb.bbox_lo.T, gb.bbox_hi.T], axis=0)  # (6, ncb)
    _sync((aT, bT))

    def lb_t(aT, bT):
        out = None
        for k in range(3):
            gap = jnp.maximum(
                0.0,
                jnp.maximum(aT[k][:, None] - bT[3 + k][None, :],
                            bT[k][None, :] - aT[3 + k][:, None]),
            )
            sq = gap * gap
            out = sq if out is None else out + sq
        return out

    lb = timeit("lb transposed formulation", repeat(lb_t, aT, bT))
    lb_mat = jax.jit(lb_t)(aT, bT)
    _sync(lb_mat)

    # top_k candidate selection on the lb matrix.
    timeit("top_k(-lb, 32)",
           repeat(lambda m: jax.lax.top_k(-m, 32)[1], lb_mat))
    timeit("argmin(lb) only (k=1)",
           repeat(lambda m: jnp.argmin(m, axis=1), lb_mat))

    # Certificate count: ub compare + row sum.
    ub = jnp.ones((nta,), jnp.float32)
    timeit("cert counts (lb<=ub rowsum)",
           repeat(lambda m: jnp.sum((m <= ub[:, None]).astype(jnp.int32),
                                    axis=1), lb_mat))

    # Payload row-gather: (pa rows) x 9 f32 from original-order arrays.
    payload = jnp.concatenate([b.points, b.colors, b.normals], axis=1)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, gb.points.shape[0], pa),
        jnp.int32)
    _sync((payload, idx))
    timeit("payload row-gather (pa x 9)",
           repeat(lambda p: jnp.take(p, idx, axis=0, mode="clip"), payload))
    pay3 = jnp.asarray(b.points)
    timeit("payload row-gather (pa x 3)",
           repeat(lambda p: jnp.take(p, idx, axis=0, mode="clip"), pay3))

    # Masked reduction epilogue (one direction's worth).
    d0 = jnp.abs(jnp.sin(jnp.arange(pa, dtype=jnp.float32)))
    mask = jnp.arange(pa) < a.n

    def epilogue(d0):
        s = jnp.sum(jnp.where(mask, d0, 0))
        m = jnp.max(jnp.where(mask, d0, -jnp.inf))
        return s + m

    timeit("masked sum+max epilogue (pa,)", repeat(epilogue, d0))

    # Colour transform + sse (one direction).
    col = jnp.asarray(b.colors)

    def colwork(c):
        t = c @ jnp.asarray(np.random.default_rng(1).normal(size=(3, 3)),
                            jnp.float32)
        diff = t - c
        return jnp.sum(jnp.where(mask[: c.shape[0], None], diff * diff, 0))

    timeit("colour transform + sse", repeat(colwork, col))


if __name__ == "__main__":
    main()
