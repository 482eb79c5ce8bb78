"""Pallas TPU kernel: tiled brute-force nearest-neighbour argmin.

The TPU replacement for the reference's per-point FLANN KD-tree queries
(reference: open_pcc_metric/cloud_pair.py:22-32 — one Python->C++ crossing per
point). One kernel sweep computes, for every query point, the index of its
nearest neighbour in the search cloud:

  * queries stream as (TM, 8) tiles (3 coords zero-padded to 8 for the MXU),
  * the search cloud streams as pre-transposed (8, TN) tiles,
  * the MXU computes the cross term a.b of the expanded squared distance
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b; the query-norm term is constant
    per row so the kernel minimises the proxy ||b||^2 - 2 a.b,
  * a running (min, argmin) accumulates across search tiles in the output
    block (revisited: the output index map ignores the inner grid axis),
  * ties break to the LOWEST global index (within a tile via an explicit
    iota/where/min argmin — Mosaic has no native argmin reduce — and across
    tiles via strict '<'), matching ops/nn.py's jnp path and the oracle.

Exact distances are NOT produced here: the caller recomputes them in
difference form at the selected indices (ops/nn.py: recompute_dist_sq), which
restores full float32 precision after the matmul-trick argmin.

The matmul runs with Precision.HIGHEST (true f32 on the MXU): with default
bf16 passes, coordinate error ~0.5 ulp(1024) would corrupt the argmin for
real-world voxel grids.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256  # query rows per tile
_NEG_INIT = jnp.inf


def _kernel(a_ref, bt_ref, nbsq_ref, bestd_ref, besti_ref, *, tn, exclude_self):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bestd_ref[:] = jnp.full_like(bestd_ref, _NEG_INIT)
        besti_ref[:] = jnp.zeros_like(besti_ref)

    a = a_ref[:]  # (TM, 8)
    bt = bt_ref[:]  # (8, TN)
    dots = jax.lax.dot_general(
        a,
        bt,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TM, TN)
    d = nbsq_ref[:] - 2.0 * dots  # proxy distance: ||b||^2 - 2 a.b

    cols = jax.lax.broadcasted_iota(jnp.int32, (TM, tn), 1)
    if exclude_self:
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TM, tn), 0) + i * TM
        d = jnp.where(rows == (cols + j * tn), jnp.inf, d)

    tile_min = jnp.min(d, axis=1, keepdims=True)  # (TM, 1)
    # Lowest-index argmin without an argmin reduce:
    at_min = d == tile_min
    cand = jnp.where(at_min, cols, tn)
    tile_arg = jnp.min(cand, axis=1, keepdims=True) + j * tn  # (TM, 1)

    better = tile_min < bestd_ref[:]
    besti_ref[:] = jnp.where(better, tile_arg, besti_ref[:])
    bestd_ref[:] = jnp.where(better, tile_min, bestd_ref[:])


@functools.partial(jax.jit, static_argnames=("exclude_self", "interpret"))
def nn_argmin(
    a_points: jnp.ndarray,
    b_points: jnp.ndarray,
    exclude_self: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Index of the nearest row of ``b`` for every row of ``a``.

    Shapes must be padded to multiples of 256 rows (cloud.pad_bucket
    guarantees this); padded search rows carry PAD_SENTINEL coords and can
    never win the argmin for a valid query.
    """
    na = a_points.shape[0]
    nb = b_points.shape[0]
    if na % TM:
        raise ValueError(f"query rows ({na}) must be a multiple of {TM}")
    tn = 512 if nb % 512 == 0 else 256
    if nb % tn:
        raise ValueError(f"search rows ({nb}) must be a multiple of 256")

    f32 = jnp.float32
    a8 = jnp.pad(a_points.astype(f32), ((0, 0), (0, 5)))  # (na, 8)
    b8 = jnp.pad(b_points.astype(f32), ((0, 0), (0, 5)))
    bt = b8.T  # (8, nb)
    nbsq = jnp.sum(b8 * b8, axis=1)[None, :]  # (1, nb)

    grid = (na // TM, nb // tn)
    kernel = functools.partial(_kernel, tn=tn, exclude_self=exclude_self)
    bestd, besti = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na, 1), f32),
            jax.ShapeDtypeStruct((na, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * na * nb * 8,
            bytes_accessed=(na + nb) * 8 * 4 + na * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a8, bt, nbsq)
    return besti[:, 0]
