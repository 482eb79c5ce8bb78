"""Exact k-nearest-neighbour search (brute force, tiled, running top-k merge).

Replaces the reference's FLANN ``search_knn_vector_3d(point, knn)`` queries used
for normal estimation (reference: open3d ``estimate_normals`` default = 30-NN,
called at open_pcc_metric/cloud_pair.py:61-64).

The merge keeps a running sorted-ascending (dist, idx) buffer of size k per
query and folds each tile of candidates in with ``lax.top_k``. Ties break to
the earliest-processed (lowest) global index because the running buffer
occupies the leading slots of the concatenated candidate row.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from .nn import _pick_chunk


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "chunk_a", "chunk_b")
)
def knn(
    a_points: jnp.ndarray,
    b_points: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
    chunk_a: int = 256,
    chunk_b: int = 1024,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """For each row of ``a``, the ``k`` nearest rows of ``b``.

    Returns ``(idx int32 (Na, k), dist_sq (Na, k))``, sorted ascending by
    distance. ``k`` must be <= Nb (after self-exclusion).
    """
    na, _ = a_points.shape
    nb, _ = b_points.shape
    ca = _pick_chunk(na, chunk_a)
    cb = _pick_chunk(nb, chunk_b)
    dtype = a_points.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    b_tiles = b_points.reshape(nb // cb, cb, 3)
    b_bases = jnp.arange(nb // cb, dtype=jnp.int32) * cb

    def per_a_chunk(carry, inputs):
        a_chunk, a_base = inputs

        def per_b_tile(state, binputs):
            run_d, run_i = state  # (ca, k) each
            b_tile, b_base = binputs
            diff = a_chunk[:, None, :] - b_tile[None, :, :]
            d = jnp.sum(diff * diff, axis=-1)  # (ca, cb)
            cols = b_base + jnp.arange(cb, dtype=jnp.int32)[None, :]
            if exclude_self:
                rows = a_base + jnp.arange(ca, dtype=jnp.int32)[:, None]
                d = jnp.where(rows == cols, big, d)
            cand_d = jnp.concatenate([run_d, d], axis=1)
            cand_i = jnp.concatenate(
                [run_i, jnp.broadcast_to(cols, d.shape)], axis=1
            )
            top_negd, pos = jax.lax.top_k(-cand_d, k)
            new_i = jnp.take_along_axis(cand_i, pos, axis=1)
            return (-top_negd, new_i), None

        # Operand-derived fresh carries: see ops/nn.py (vma-checker note).
        zrow = jnp.zeros_like(a_chunk[:, :1])  # (ca, 1)
        zk = jnp.broadcast_to(zrow, (zrow.shape[0], k))
        init = (zk + big, zk.astype(jnp.int32))
        (run_d, run_i), _ = jax.lax.scan(per_b_tile, init, (b_tiles, b_bases))
        return carry, (run_d, run_i)

    a_tiles = a_points.reshape(na // ca, ca, 3)
    a_bases = jnp.arange(na // ca, dtype=jnp.int32) * ca
    _, (dists, idxs) = jax.lax.scan(per_a_chunk, None, (a_tiles, a_bases))
    return idxs.reshape(na, k), dists.reshape(na, k)
