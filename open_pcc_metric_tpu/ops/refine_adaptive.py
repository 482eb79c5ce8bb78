"""Certificate-driven adaptive NN refinement kernel (the round-2 fast path).

One Pallas kernel powers a three-pass pipeline (ops/nn_pruned.py:
``nn_pruned_adaptive_sorted``) that replaces the fixed-cap stage-1 + XLA
stage-2 design:

  P1  refine each query tile against its top-``p1`` lowest-lower-bound
      chunks — a cheap probe whose result is a SOUND upper bound ``ub1`` on
      every query's true NN distance (any refined distance upper-bounds the
      true minimum);
  P2  per-tile qualifying count ``count1 = #{chunks: lb <= ub1}``; refine
      slots [p1, min(count1, cap)) of the same lb-ascending candidate
      prefix, seeded from P1's running best. Tiles with count1 <= cap are
      PROVABLY exact: the qualifying set is a prefix of the refined prefix.
  P3  the few tiles whose post-P2 count still exceeds ``cap`` (wide
      octant-straddling Morton bboxes) are re-refined from scratch against
      the FULL lb-ascending chunk order, executing only their first
      ``count2`` slots — unconditionally exact, no stage-2 cap to overflow.

Two hardware lessons shape the kernel (measured on the 800k bench pair):

  * A grid dimension over candidate slots costs ~3-9 us of pipeline
    bookkeeping PER STEP once slots can be skipped — more than the compute
    it schedules. The slot loop therefore lives INSIDE the kernel as a
    manually double-buffered DMA loop (one grid step per 8 query tiles);
    slots beyond a tile's ``ncand`` are fully predicated out (no DMA, no
    compute).
  * Mosaic DMA slices must be lane-aligned (128), so candidate chunks are
    fetched in coordinate-major (8, CHUNK) form and the distance matrix
    comes from ONE MXU contraction over the coordinate sublanes:

        bhat = [x, y, z, 1, |b|^2, bitcast(orig idx), 0, 0]   (8, Pb)
        qhat = [-2x, -2y, -2z, |q|^2, 1, 0, 0, 0]             (8, Pa)
        d    = dot_general(qhat_tile, bhat_chunk, contract sublanes)
             = |q|^2 + |b|^2 - 2<q,b>                         (q, c)

    at ``Precision.HIGHEST``. For integer coordinates with
    max|coord| <= MXU_EXACT_MAX_COORD every product and partial sum is an
    integer below 2^24, so ``d`` is BIT-EXACT equal to the difference form
    — that is the voxel-grid workload pc_error exists for. The tie-break
    index rides in the same DMA (bitcast f32 row; the paired zero row
    keeps it out of the contraction — 0 * denormal == 0, and int32 row
    indices can never form an inf/nan bit pattern). General float clouds
    do NOT qualify (expanded-norm error scales with |q||b|) and take the
    legacy fixed-cap kernel instead (ops/refine_pallas.py).

This cuts refinement work from ~237k chunk-pairs per direction (fixed cap
32 + 256x512 XLA stage 2) to ~45k, and moves the remaining distance math
from the VPU onto the otherwise-idle MXU.

Replaces: the per-point FLANN queries of the reference
(/root/reference/open_pcc_metric/cloud_pair.py:10-42).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import CHUNK

INT_MAX = jnp.iinfo(jnp.int32).max

# Exactness bound for the MXU path: every partial sum of
# |q|^2 + |b|^2 - 2<q,b> must be an exact f32 integer, i.e. 6*C^2 < 2^24
# (C=1672 is the exact boundary; 1600 leaves margin).
MXU_EXACT_MAX_COORD = 1600.0

_TT = 8  # query tiles per grid step
_GROUP = 512  # tiles per pallas_call (bounds the SMEM prefetch tables)


def _adaptive_kernel(cand_ref, ncand_ref, tids_ref, *refs,
                     n_slots, exclude_self, has_init):
    qs = refs[:_TT]
    b_hbm = refs[_TT]
    k = _TT + 1
    if has_init:
        initd_ref, initi_ref = refs[k], refs[k + 1]
        k += 2
    bestd_ref, besti_ref = refs[k], refs[k + 1]
    bbuf, bsem = refs[k + 2], refs[k + 3]
    i = pl.program_id(0)

    if has_init:
        bestd_ref[:] = initd_ref[:]
        besti_ref[:] = initi_ref[:]
    else:
        bestd_ref[:] = jnp.full_like(bestd_ref, jnp.inf)
        besti_ref[:] = jnp.full_like(besti_ref, INT_MAX)

    def dma(buf_slot, t, j):
        cj = cand_ref[i * _TT + t, j]
        return pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(cj * CHUNK, CHUNK)],
            bbuf.at[buf_slot, t],
            bsem.at[buf_slot, t],
        )

    for t in range(_TT):
        @pl.when(ncand_ref[i * _TT + t] > 0)
        def _warm(t=t):
            dma(0, t, 0).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)
        # Prefetch next slot's chunks while this slot computes.
        for t in range(_TT):
            row = i * _TT + t

            @pl.when(j + 1 < ncand_ref[row])
            def _prefetch(t=t, row=row, nxt=nxt, j=j):
                dma(nxt, t, j + 1).start()

        for t in range(_TT):
            row = i * _TT + t

            @pl.when(j < ncand_ref[row])
            def _work(t=t, row=row, slot=slot, j=j):
                dma(slot, t, j).wait()
                q = qs[t][:]  # (8, CHUNK) augmented queries
                b = bbuf[slot, t]  # (8, CHUNK) augmented candidates
                # (query, candidate) distance matrix in one MXU contraction
                # over the 8 coordinate sublanes (see module docstring).
                d = jax.lax.dot_general(
                    q, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                if exclude_self:
                    cj = cand_ref[row, j]
                    qrow = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, CHUNK), 0) + tids_ref[row] * CHUNK
                    ccol = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, CHUNK), 1) + cj * CHUNK
                    d = jnp.where(qrow == ccol, jnp.inf, d)

                dmin = jnp.min(d, axis=1, keepdims=True)  # (CHUNK, 1)
                prev_d = bestd_ref[pl.ds(t * CHUNK, CHUNK), :]
                # Candidates arrive lower-bound-ascending, so most later
                # chunks improve no query at all: gate the (3x more
                # expensive) tie-break extraction + running-best update on
                # any strict improvement OR distance tie (a tie may still
                # lower the winning original index).
                relevant = jnp.any(dmin <= prev_d)

                @pl.when(relevant)
                def _update(t=t, d=d, dmin=dmin, prev_d=prev_d, b=b):
                    at_min = d == dmin
                    bor_lane = jax.lax.bitcast_convert_type(
                        b[5:6, :], jnp.int32
                    )  # (1, CHUNK) original row indices (caller-packed)
                    bor = jnp.broadcast_to(bor_lane, d.shape)
                    ii = jnp.min(jnp.where(at_min, bor, INT_MAX), axis=1,
                                 keepdims=True)
                    prev_i = besti_ref[pl.ds(t * CHUNK, CHUNK), :]
                    better = (dmin < prev_d) | (
                        (dmin == prev_d) & (ii < prev_i))
                    bestd_ref[pl.ds(t * CHUNK, CHUNK), :] = jnp.where(
                        better, dmin, prev_d)
                    besti_ref[pl.ds(t * CHUNK, CHUNK), :] = jnp.where(
                        better, ii, prev_i)

        return carry

    jax.lax.fori_loop(0, n_slots, body, 0)


def _refine_group(qhat, bhat, cand, ncand, tids, init,
                  exclude_self, interpret):
    rows, n_slots = cand.shape
    has_init = init is not None

    def q_spec(t):
        return pl.BlockSpec(
            (8, CHUNK),
            lambda i, cand, ncand, tids, t=t: (0, tids[i * _TT + t]),
        )

    io_spec = pl.BlockSpec(
        (_TT * CHUNK, 1), lambda i, cand, ncand, tids: (i, 0)
    )

    in_specs = (
        [q_spec(t) for t in range(_TT)]
        + [pl.BlockSpec(memory_space=pl.ANY)]  # bhat stays in HBM
    )
    operands = [qhat] * _TT + [bhat]
    if has_init:
        in_specs += [io_spec, io_spec]
        operands += [init[0].reshape(-1, 1), init[1].reshape(-1, 1)]

    kernel = functools.partial(
        _adaptive_kernel,
        n_slots=n_slots, exclude_self=exclude_self, has_init=has_init,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cand, ncand, tids
        grid=(rows // _TT,),
        in_specs=in_specs,
        out_specs=[io_spec, io_spec],
        scratch_shapes=[
            pltpu.VMEM((2, _TT, 8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _TT)),
        ],
    )
    bestd, besti = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows * CHUNK, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows * CHUNK, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cand, ncand, tids, *operands)
    return bestd.reshape(rows, CHUNK), besti.reshape(rows, CHUNK)


def pack_queries(points: jnp.ndarray) -> jnp.ndarray:
    """(8, Pa) augmented query layout: [-2x, -2y, -2z, |q|^2, 1, 0, 0, 0]."""
    p = points.shape[0]
    qsq = jnp.sum(points * points, axis=1)
    zero = jnp.zeros((p,), points.dtype)
    return jnp.stack([
        -2.0 * points[:, 0], -2.0 * points[:, 1], -2.0 * points[:, 2],
        qsq, jnp.ones((p,), points.dtype), zero, zero, zero,
    ])


def pack_candidates(points: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """(8, Pb) augmented candidates: [x, y, z, 1, |b|^2, bitcast(idx), 0, 0]."""
    p = points.shape[0]
    bsq = jnp.sum(points * points, axis=1)
    bor_f = jax.lax.bitcast_convert_type(perm.astype(jnp.int32), jnp.float32)
    zero = jnp.zeros((p,), points.dtype)
    return jnp.stack([
        points[:, 0], points[:, 1], points[:, 2],
        jnp.ones((p,), points.dtype), bsq, bor_f, zero, zero,
    ])


def adaptive_refine(
    qhat: jnp.ndarray,  # (8, Pa) augmented queries (pack_queries)
    bhat: jnp.ndarray,  # (8, Pb) augmented candidates (pack_candidates)
    cand: jnp.ndarray,  # (rows, n_slots) int32 lb-ascending candidate chunks
    ncand: jnp.ndarray,  # (rows,) int32 slots to execute per tile (rest skip)
    tids: jnp.ndarray,  # (rows,) int32 tile id of each row (indexes qhat)
    init=None,  # optional ((rows, CHUNK) f32, (rows, CHUNK) i32) running best
    exclude_self: bool = False,
    interpret: bool = False,
):
    """Refine each row's tile against its first ``ncand`` candidate chunks.

    Returns ``(bestd (rows, CHUNK) f32, besti (rows, CHUNK) i32)`` — the
    running (min squared distance, lowest-original-index argmin), seeded
    from ``init`` when given. Rows are processed _TT at a time; the caller
    pads ``rows`` to a multiple of _TT (pad rows: ncand=0, tids=0).

    EXACTNESS CONTRACT: callers must gate on integer clouds
    (cloud.Cloud.mxu_exact); see the module docstring.
    """
    rows, n_slots = cand.shape
    if rows % _TT:
        raise ValueError(f"rows ({rows}) must be a multiple of {_TT}")
    d_parts, i_parts = [], []
    group = (_GROUP // _TT) * _TT
    for g0 in range(0, rows, group):
        gt = min(group, rows - g0)
        ini = None
        if init is not None:
            ini = (jax.lax.slice_in_dim(init[0], g0, g0 + gt, axis=0),
                   jax.lax.slice_in_dim(init[1], g0, g0 + gt, axis=0))
        d_g, i_g = _refine_group(
            qhat, bhat,
            jax.lax.slice_in_dim(cand, g0, g0 + gt, axis=0),
            jax.lax.slice_in_dim(ncand, g0, g0 + gt, axis=0),
            jax.lax.slice_in_dim(tids, g0, g0 + gt, axis=0),
            ini, exclude_self, interpret,
        )
        d_parts.append(d_g)
        i_parts.append(i_g)
    if len(d_parts) == 1:
        return d_parts[0], i_parts[0]
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)
