"""Pallas TPU kernels for pruned-NN candidate refinement.

The pruned search (ops/nn_pruned.py, ops/knn_pruned.py) spends its time in
"refinement": for every 256-query Morton tile, compute distances to the
tile's `cap` candidate chunks and keep the best (1 or k). The XLA version
(lax.map + gathers) streams candidate buffers through HBM; these kernels use
the canonical scalar-prefetch pattern instead:

  * the (nta, cap) candidate-chunk table is a scalar-prefetch argument, so
    the candidate block's BlockSpec index_map reads it directly — Pallas
    double-buffers the chunk DMAs automatically;
  * distances use exact difference-form float32 on the VPU: the query column
    q[:, k] (sublane vector) minus the candidate row b[k, :] (lane vector)
    broadcasts to the (256, 256) tile naturally, no MXU precision caveats;
  * the running (min, lowest-original-index argmin) lives in the revisited
    output block; for k-NN the output block itself is the running sorted
    k-buffer, merged in-VMEM with k rounds of min+mask — no HBM round trips
    (the XLA path re-reads the candidate set k times).

Layouts: queries and candidates come in coordinate-major transposed form
(8, P) (3 coords zero-padded to 8 sublanes), built by the callers.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import CHUNK

INT_MAX = jnp.iinfo(jnp.int32).max


def _vma_union(*operands):
    """Union of the operands' varying mesh axes (empty outside shard_map)."""
    vma = frozenset()
    for op in operands:
        v = getattr(jax.typeof(op), "vma", None)
        if v:
            vma |= frozenset(v)
    return vma


def _sds(shape, dtype, *operands):
    """ShapeDtypeStruct whose ``vma`` is the union of the operands' varying
    mesh axes. Under a vma-checked ``jax.shard_map`` (parallel/sharded.py
    keeps the checker ON, zero opt-outs) pallas_call outputs must DECLARE
    how they vary across mesh axes; kernel outputs vary exactly over the
    axes any input varies over. Outside shard_map every vma set is empty
    and the declaration is inert."""
    return jax.ShapeDtypeStruct(shape, dtype, vma=_vma_union(*operands))


def _diff_form_dist(qt, bt):
    """(8, C) queries x (8, C) candidates -> (C, C) squared distances.

    Exact f32: d[r, c] = sum_k (qt[k, r] - bt[k, c])^2, accumulated per
    coordinate with sublane-vector minus lane-vector broadcasts.
    """
    d = None
    for k in range(3):
        qk = qt[k, :].reshape(CHUNK, 1)  # queries down sublanes
        bk = bt[k, :].reshape(1, CHUNK)  # candidates across lanes
        diff = qk - bk
        d = diff * diff if d is None else d + diff * diff
    return d


# Candidate chunks DMAed per grid step (amortises per-step overhead).
_CAND_PER_STEP = 8


def _nn_kernel(cand_ref, off_ref, qt_ref, *rest, exclude_self, g):
    bt_refs = rest[:g]
    borig_refs = rest[g : 2 * g]
    bestd_ref, besti_ref = rest[2 * g], rest[2 * g + 1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bestd_ref[:] = jnp.full_like(bestd_ref, jnp.inf)
        besti_ref[:] = jnp.full_like(besti_ref, INT_MAX)

    q = qt_ref[:]
    for s in range(g):
        d = _diff_form_dist(q, bt_refs[s][:])  # (CHUNK, CHUNK)
        if exclude_self:
            cj = cand_ref[i, j * g + s]
            rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) \
                + (off_ref[0] + i) * CHUNK
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) \
                + cj * CHUNK
            d = jnp.where(rows == cols, jnp.inf, d)

        dmin = jnp.min(d, axis=1, keepdims=True)  # (CHUNK, 1)
        # Candidates arrive lower-bound-ascending, so later chunks usually
        # improve no query at all; the (3x costlier) tie-break extraction +
        # running-best update is gated on any improvement OR distance tie
        # (a tie can still lower the winning original index). Bit-exact:
        # skipped only when strictly worse for every query.
        relevant = jnp.any(dmin <= bestd_ref[:])

        @pl.when(relevant)
        def _update(d=d, dmin=dmin, s=s):
            at_min = d == dmin
            bor = borig_refs[s][:]  # (1, CHUNK)
            ii = jnp.min(
                jnp.where(at_min, jnp.broadcast_to(bor, d.shape), INT_MAX),
                axis=1, keepdims=True,
            )
            better = (dmin < bestd_ref[:]) | (
                (dmin == bestd_ref[:]) & (ii < besti_ref[:])
            )
            bestd_ref[:] = jnp.where(better, dmin, bestd_ref[:])
            besti_ref[:] = jnp.where(better, ii, besti_ref[:])


# Tiles per pallas_call: bounds the scalar-prefetch table (group*cap int32)
# well under the ~1 MB SMEM budget.
TILE_GROUP = 512


def _nn_group(qt8_g, tbase, b8c, borig, cand_g, exclude_self, interpret):
    gt, cap = cand_g.shape
    g = _CAND_PER_STEP
    while cap % g:
        g //= 2

    def b_spec(s):
        # b8c is chunk-major (ncb*8, CHUNK): one candidate chunk = one
        # contiguous (8, CHUNK) block = a single 8 KB DMA.
        return pl.BlockSpec(
            (8, CHUNK), lambda i, j, cand, off, s=s: (cand[i, j * g + s], 0)
        )

    def bor_spec(s):
        return pl.BlockSpec(
            (1, CHUNK), lambda i, j, cand, off, s=s: (0, cand[i, j * g + s])
        )

    kernel = functools.partial(_nn_kernel, exclude_self=exclude_self, g=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # cand table + group tile offset
        grid=(gt, cap // g),
        in_specs=(
            [pl.BlockSpec((8, CHUNK), lambda i, j, cand, off: (0, i))]
            + [b_spec(s) for s in range(g)]
            + [bor_spec(s) for s in range(g)]
        ),
        out_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i, j, cand, off: (i, 0)),
            pl.BlockSpec((CHUNK, 1), lambda i, j, cand, off: (i, 0)),
        ],
    )
    bestd, besti = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt * CHUNK, 1), jnp.float32, qt8_g, b8c, borig),
            _sds((gt * CHUNK, 1), jnp.int32, qt8_g, b8c, borig),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, tbase, qt8_g, *([b8c] * g), *([borig] * g))
    return bestd[:, 0], besti[:, 0]


@functools.partial(
    jax.jit, static_argnames=("exclude_self", "interpret")
)
def refine_nn_pallas(
    qt8: jnp.ndarray,  # (8, Pa) coord-major sorted queries
    bt8: jnp.ndarray,  # (8, Pb) coord-major sorted search points
    borig: jnp.ndarray,  # (1, Pb) int32 original indices of sorted b rows
    cand: jnp.ndarray,  # (nta, cap) int32 candidate chunk ids per tile
    exclude_self: bool = False,
    interpret: bool = False,
):
    """Returns ``(dmin (Pa,), best_orig_idx (Pa,))`` over each tile's
    candidate chunks (exact f32 distances, lowest-orig-index ties)."""
    nta, cap = cand.shape
    pb = bt8.shape[1]
    # chunk-major candidate layout: (ncb*8, CHUNK), contiguous per chunk
    b8c = bt8.reshape(8, pb // CHUNK, CHUNK).transpose(1, 0, 2).reshape(-1, CHUNK)
    d_parts, i_parts = [], []
    for g0 in range(0, nta, TILE_GROUP):
        gt = min(TILE_GROUP, nta - g0)
        d_g, i_g = _nn_group(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1),
            jnp.array([g0], jnp.int32),
            b8c,
            borig,
            jax.lax.slice_in_dim(cand, g0, g0 + gt, axis=0),
            exclude_self,
            interpret,
        )
        d_parts.append(d_g)
        i_parts.append(i_g)
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)


def _knn_kernel(cand_ref, off_ref, qt_ref, bt_ref, borig_ref, dk_ref, ik_ref,
                *, k, exclude_self):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[:] = jnp.full_like(dk_ref, jnp.inf)
        ik_ref[:] = jnp.full_like(ik_ref, INT_MAX)

    d = _diff_form_dist(qt_ref[:], bt_ref[:])  # (CHUNK, CHUNK)
    if exclude_self:
        cj = cand_ref[i, j]
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) \
            + (off_ref[0] + i) * CHUNK
        cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) \
            + cj * CHUNK
        d = jnp.where(rows == cols, jnp.inf, d)

    # Merge only when this chunk could improve some query's k-th best:
    # candidate chunks arrive in ascending lower-bound order, so after the
    # first few chunks fill the buffers, most later chunks skip the (15x
    # more expensive) merge entirely. Ties: a chunk whose min EQUALS the
    # k-th distance can still lower the k-th ORIGINAL INDEX (the lex
    # tie-break; a strict-only gate made the k-set visitation-order
    # dependent under exact ties), but only when the lowest original id at
    # that distance beats the incumbent — the extra compare keeps integer
    # lattices (ties everywhere) from firing the merge on every chunk.
    mind = jnp.min(d, axis=1)
    kth = dk_ref[:, k - 1]
    bor_row = jnp.broadcast_to(borig_ref[:], d.shape)
    ii_at_min = jnp.min(
        jnp.where(d == mind[:, None], bor_row, INT_MAX), axis=1)
    improves = jnp.any(
        (mind < kth) | ((mind == kth) & (ii_at_min < ik_ref[:, k - 1])))

    @pl.when(improves)
    def _merge():
        bor = jnp.broadcast_to(borig_ref[:], d.shape)
        # In-VMEM merge: concat the running k-buffer with this chunk's
        # distances and re-extract the k best (min + mask-by-original-index;
        # borig is unique per row since candidate chunks are distinct).
        cand_d = jnp.concatenate([dk_ref[:], d], axis=1)  # (CHUNK, k+CHUNK)
        cand_i = jnp.concatenate([ik_ref[:], bor], axis=1)

        # Unrolled: Mosaic cannot lower lax.scan with array carries
        # in-kernel, and k is a small static constant.
        ds_cols = []
        is_cols = []
        dcur = cand_d
        for _ in range(k):
            m = jnp.min(dcur, axis=1, keepdims=True)
            at_min = dcur == m
            ii = jnp.min(jnp.where(at_min, cand_i, INT_MAX), axis=1,
                         keepdims=True)
            dcur = jnp.where(at_min & (cand_i == ii), jnp.inf, dcur)
            ds_cols.append(m)
            is_cols.append(ii)
        dk_ref[:] = jnp.concatenate(ds_cols, axis=1)  # (CHUNK, k)
        ik_ref[:] = jnp.concatenate(is_cols, axis=1)


def _knn_group(qt8_g, tbase, bt8, borig, cand_g, k, exclude_self, interpret):
    gt, cap = cand_g.shape

    kernel = functools.partial(_knn_kernel, k=k, exclude_self=exclude_self)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gt, cap),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda i, j, cand, off: (0, i)),
            pl.BlockSpec((8, CHUNK), lambda i, j, cand, off: (0, cand[i, j])),
            pl.BlockSpec((1, CHUNK), lambda i, j, cand, off: (0, cand[i, j])),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, k), lambda i, j, cand, off: (i, 0)),
            pl.BlockSpec((CHUNK, k), lambda i, j, cand, off: (i, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt * CHUNK, k), jnp.float32, qt8_g, bt8, borig),
            _sds((gt * CHUNK, k), jnp.int32, qt8_g, bt8, borig),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, tbase, qt8_g, bt8, borig)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "interpret")
)
def refine_knn_pallas(
    qt8: jnp.ndarray,
    bt8: jnp.ndarray,
    borig: jnp.ndarray,
    cand: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
    interpret: bool = False,
):
    """Returns ``(dk (Pa, k), idx (Pa, k))`` ascending by distance."""
    nta, cap = cand.shape
    d_parts, i_parts = [], []
    for g0 in range(0, nta, TILE_GROUP):
        gt = min(TILE_GROUP, nta - g0)
        dk, ik = _knn_group(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1),
            jnp.array([g0], jnp.int32),
            bt8,
            borig,
            jax.lax.slice_in_dim(cand, g0, g0 + gt, axis=0),
            k,
            exclude_self,
            interpret,
        )
        d_parts.append(dk)
        i_parts.append(ik)
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)


# ---------------------------------------------------------------------------
# Fused-loop variant: one grid step per TILE with a manual double-buffered
# DMA loop over the candidate chunks. Amortises the per-grid-step overhead
# that dominates the (tile, chunk) grid at ~100k steps.
# ---------------------------------------------------------------------------


def _nn_kernel_fused(cand_ref, off_ref, q_ref, bhbm_ref, borig_hbm_ref,
                     bestd_ref, besti_ref, bbuf, ibuf, bsem, isem,
                     *, cap, exclude_self):
    i = pl.program_id(0)
    q = q_ref[:]  # (8, CHUNK)

    def b_dma(slot, j):
        cj = cand_ref[i, j]
        return pltpu.make_async_copy(
            bhbm_ref.at[:, pl.ds(cj * CHUNK, CHUNK)], bbuf.at[slot],
            bsem.at[slot],
        )

    def i_dma(slot, j):
        cj = cand_ref[i, j]
        return pltpu.make_async_copy(
            borig_hbm_ref.at[:, pl.ds(cj * CHUNK, CHUNK)], ibuf.at[slot],
            isem.at[slot],
        )

    b_dma(0, 0).start()
    i_dma(0, 0).start()

    def body(j, carry):
        bestd, besti = carry
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < cap)
        def _prefetch():
            b_dma(nxt, j + 1).start()
            i_dma(nxt, j + 1).start()

        b_dma(slot, j).wait()
        i_dma(slot, j).wait()
        bt = bbuf[slot]  # (8, CHUNK)
        d = _diff_form_dist(q, bt)
        if exclude_self:
            cj = cand_ref[i, j]
            rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) \
                + (off_ref[0] + i) * CHUNK
            cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) \
                + cj * CHUNK
            d = jnp.where(rows == cols, jnp.inf, d)
        dmin = jnp.min(d, axis=1, keepdims=True)
        at_min = d == dmin
        bor = ibuf[slot]  # (1, CHUNK)
        ii = jnp.min(
            jnp.where(at_min, jnp.broadcast_to(bor, d.shape), INT_MAX),
            axis=1, keepdims=True,
        )
        better = (dmin < bestd) | ((dmin == bestd) & (ii < besti))
        return (
            jnp.where(better, dmin, bestd),
            jnp.where(better, ii, besti),
        )

    init = (
        jnp.full((CHUNK, 1), jnp.inf, jnp.float32),
        jnp.full((CHUNK, 1), INT_MAX, jnp.int32),
    )
    bestd, besti = jax.lax.fori_loop(0, cap, body, init)
    bestd_ref[:] = bestd
    besti_ref[:] = besti


def _nn_group_fused(qt8_g, tbase, bt8, borig, cand_g, exclude_self,
                    interpret):
    gt, cap = cand_g.shape

    kernel = functools.partial(
        _nn_kernel_fused, cap=cap, exclude_self=exclude_self
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gt,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda i, cand, off: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # bt8 stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # borig stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i, cand, off: (i, 0)),
            pl.BlockSpec((CHUNK, 1), lambda i, cand, off: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bestd, besti = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt * CHUNK, 1), jnp.float32, qt8_g, bt8, borig),
            _sds((gt * CHUNK, 1), jnp.int32, qt8_g, bt8, borig),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cand_g, tbase, qt8_g, bt8, borig)
    return bestd[:, 0], besti[:, 0]


@functools.partial(
    jax.jit, static_argnames=("exclude_self", "interpret")
)
def refine_nn_pallas_fused(
    qt8: jnp.ndarray,
    bt8: jnp.ndarray,
    borig: jnp.ndarray,
    cand: jnp.ndarray,
    exclude_self: bool = False,
    interpret: bool = False,
):
    """Fused-candidate-loop variant of refine_nn_pallas (same results)."""
    nta, cap = cand.shape
    d_parts, i_parts = [], []
    for g0 in range(0, nta, TILE_GROUP):
        gt = min(TILE_GROUP, nta - g0)
        d_g, i_g = _nn_group_fused(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1),
            jnp.array([g0], jnp.int32),
            bt8,
            borig,
            jax.lax.slice_in_dim(cand, g0, g0 + gt, axis=0),
            exclude_self,
            interpret,
        )
        d_parts.append(d_g)
        i_parts.append(i_g)
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)


# ---------------------------------------------------------------------------
# Candidate selection kernel: per query tile, the `cap` smallest-lower-bound
# chunk indices. Replaces lax.top_k over the (nta, ncb) lb matrix — XLA's
# top_k lowers to a bitonic sort that costs more than the refinement itself.
# Selection runs in VMEM with cap rounds of (min, mask); ties pick the lowest
# chunk index. A tie at the cap boundary may pick a different (equal-lb)
# chunk than top_k, which is harmless: the exactness certificate counts ALL
# chunks with lb <= ub, so any tied-out qualifying chunk forces stage 2.
# ---------------------------------------------------------------------------

_SEL_ROWS = 8  # query tiles per grid step


def _select_kernel(lb_ref, cand_ref, *, cap, ncb):
    lb = lb_ref[:]  # (_SEL_ROWS, ncb_pad)
    cols = jax.lax.broadcasted_iota(jnp.int32, lb.shape, 1)
    for r in range(cap):
        m = jnp.min(lb, axis=1, keepdims=True)
        amin = jnp.min(jnp.where(lb == m, cols, INT_MAX), axis=1,
                       keepdims=True)
        lb = jnp.where(cols == amin, jnp.inf, lb)
        cand_ref[:, r : r + 1] = jnp.minimum(amin, ncb - 1)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def select_candidates_pallas(
    lb: jnp.ndarray,  # (nta, ncb) squared lower bounds
    cap: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nta, cap) int32 indices of each row's cap smallest lower bounds."""
    nta, ncb = lb.shape
    pad_rows = (-nta) % _SEL_ROWS
    pad_cols = (-ncb) % 128
    if pad_rows or pad_cols:
        lb = jnp.pad(lb, ((0, pad_rows), (0, pad_cols)),
                     constant_values=jnp.inf)
    rows = lb.shape[0]

    kernel = functools.partial(_select_kernel, cap=cap, ncb=ncb)
    cand = pl.pallas_call(
        kernel,
        grid=(rows // _SEL_ROWS,),
        in_specs=[
            pl.BlockSpec((_SEL_ROWS, lb.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_SEL_ROWS, cap), lambda i: (i, 0)),
        out_shape=_sds((rows, cap), jnp.int32, lb),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(lb)
    return cand[:nta]


# ---------------------------------------------------------------------------
# Transposed-layout variant: candidates run DOWN SUBLANES and queries ACROSS
# LANES, so the running-best updates are (1, 256) full-lane-width vectors
# instead of (256, 1) single-lane columns (which execute at ~1/128 lane
# efficiency and dominate the straight-layout kernel). Eight tiles per grid
# step share one query block; each tile gets its own candidate-chunk block.
# ---------------------------------------------------------------------------

_TILES_PER_STEP = 8


def _pack_ids_col7(b8r: jnp.ndarray, borig: jnp.ndarray) -> jnp.ndarray:
    """Bitcast the rows' ORIGINAL ids into lane 7 of the (Pb, 8) blocks.

    One candidate block then carries coords AND ids: half the block specs,
    half the per-slot index-map evaluations on the scalar core, half the
    DMA issues. Lane 7 is zero-padding in both the plain ([x,y,z,0*5]) and
    expanded ([x,y,z,sq,0*4]) packings; the kernels never read it as f32.
    XLA CSEs the pack across the refine calls of one compiled program.
    """
    ids = jax.lax.bitcast_convert_type(
        borig.reshape(-1).astype(jnp.int32), jnp.float32)
    return b8r.at[:, 7].set(ids)


def _ids_from_col7(b: jnp.ndarray) -> jnp.ndarray:
    """(CHUNK, 8) packed block -> (CHUNK, 1) int32 original ids."""
    return jax.lax.bitcast_convert_type(b[:, 7:8], jnp.int32)


def _clamp_cand(cand: jnp.ndarray, ncand: jnp.ndarray) -> jnp.ndarray:
    """Pre-clamp a count-gated candidate table: slots >= ncand[t] re-read
    the tile's last live slot (slot 0 for empty tiles). Unchanged block
    index => Pallas elides the copy, and the in-kernel index map stays a
    plain SMEM lookup instead of per-spec min/where arithmetic."""
    cap = cand.shape[1]
    slots = jnp.arange(cap, dtype=jnp.int32)[None, :]
    eff = jnp.minimum(slots, jnp.maximum(ncand - 1, 0)[:, None])
    return jnp.take_along_axis(cand, eff, axis=1)


def _nn_kernel_t(cand_ref, aux_ref, off_ref, qt_ref, *rest, exclude_self,
                 expanded, cs=1, has_init=False, has_ncand=False):
    # Candidate blocks carry their rows' ORIGINAL ids bitcast into lane 7
    # (see _pack_ids_col7): one block spec per slot instead of two — the
    # scalar core pays an index-map evaluation per (slot x spec) per grid
    # step, which dominates count-gated passes whose slots are mostly
    # clamped off.
    tt = _TILES_PER_STEP
    k0 = tt * cs
    b_refs = rest[:k0]
    if has_init:
        initd_ref, initi_ref = rest[k0], rest[k0 + 1]
        k0 += 2
    bestd_ref, besti_ref = rest[k0], rest[k0 + 1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if has_init:
            # Seeded refine: continue from a previous pass's running best
            # (sound — any refined distance upper-bounds the true NN).
            bestd_ref[:] = initd_ref[:]
            besti_ref[:] = initi_ref[:]
        else:
            bestd_ref[:] = jnp.full_like(bestd_ref, jnp.inf)
            besti_ref[:] = jnp.full_like(besti_ref, INT_MAX)

    # NOTE an in-kernel certificate gate (skip a chunk when its prefetched
    # lb exceeds the tile's current inflated ub) was measured HERE and
    # reverted: the kernel is VPU-bound at ~0.3 us per (256,256) chunk tile,
    # and the gate's (1,256) max + SMEM compare + predication cost ~as much
    # as the compute it skipped (bench 8.32 -> 7.95 Mpts/s). The surviving
    # low-overhead gate is ``has_ncand``: a PRECOMPUTED per-tile slot count
    # in the aux scalar-prefetch slot — one SMEM scalar compare per tile
    # slot, skipping the whole (256,256) compute for slots beyond the
    # tile's certificate-derived candidate need (the count-gated schedule
    # in ops/nn_pruned.nn_pruned_sorted).
    q = qt_ref[:]  # (8, tt*CHUNK)
    for t, c in [(t_, c_) for t_ in range(tt) for c_ in range(cs)]:
        def _tile_slot(t=t, c=c):
            b = b_refs[t * cs + c][:]  # (CHUNK, 8) candidates of tile t
            if expanded:
                # Expanded-norm form over augmented rows (caller packs
                # q=[-2x,-2y,-2z,qsq], b=[x,y,z,bsq]): 4 broadcast passes
                # (1 add + 3 fma) instead of difference-form's 6. Exact only
                # for integer clouds within the mxu_exact bound — every
                # partial sum is an exact f32 integer (see cloud.mxu_exact).
                d = b[:, 3].reshape(CHUNK, 1) \
                    + q[3, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
                for k in range(3):
                    bk = b[:, k].reshape(CHUNK, 1)
                    qk = q[k, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
                    d = bk * qk + d
            else:
                d = None
                for k in range(3):
                    bk = b[:, k].reshape(CHUNK, 1)  # candidates down sublanes
                    qk = q[k, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
                    diff = bk - qk
                    d = diff * diff if d is None else d + diff * diff
            # d: (cand, query)
            if exclude_self:
                cj = cand_ref[i * tt + t, j * cs + c]
                crow = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 0) + cj * CHUNK
                qcol = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 1) \
                    + (off_ref[0] + i * tt + t) * CHUNK
                d = jnp.where(crow == qcol, jnp.inf, d)
            dmin = jnp.min(d, axis=0, keepdims=True)  # (1, CHUNK) lane-major
            # NOTE: do NOT gate the tie-break extraction behind pl.when —
            # the (256,256) d tile then materialises across the region
            # boundary and the ~0.6 us/visit of scratch traffic costs
            # more than the 3 extraction passes it skips (measured probe
            # 10.1 -> 16.8 ms at 800k with the gate).
            at_min = d == dmin
            bor = _ids_from_col7(b)  # (CHUNK, 1) original ids
            ii = jnp.min(
                jnp.where(at_min, jnp.broadcast_to(bor, d.shape), INT_MAX),
                axis=0, keepdims=True,
            )
            prev_d = bestd_ref[t : t + 1, :]
            prev_i = besti_ref[t : t + 1, :]
            better = (dmin < prev_d) | ((dmin == prev_d) & (ii < prev_i))
            bestd_ref[t : t + 1, :] = jnp.where(better, dmin, prev_d)
            besti_ref[t : t + 1, :] = jnp.where(better, ii, prev_i)

        if has_ncand:
            pl.when(j * cs + c < aux_ref[i * tt + t])(_tile_slot)
        else:
            _tile_slot()


def _nn_group_t(qt8_g, tbase, b8p, cand_g, aux_g, exclude_self,
                interpret, expanded=False, cs=1, init_g=None,
                has_ncand=False):
    gt, cap = cand_g.shape
    tt = _TILES_PER_STEP
    while cap % cs:
        cs //= 2

    # Gated candidate tables arrive PRE-CLAMPED (_clamp_cand): slots past a
    # tile's live count re-address its last live block, so Pallas elides
    # both the copy (unchanged block index) and the index-map arithmetic —
    # one plain SMEM lookup per spec. Without the clamp the gate saves
    # almost nothing: each skipped slot stalls on its own (useless) fetch.
    def b_spec(t, c):
        return pl.BlockSpec(
            (CHUNK, 8),
            lambda i, j, cand, aux, off, t=t, c=c: (
                cand[i * tt + t, j * cs + c], 0)
        )

    io_spec = pl.BlockSpec((tt, CHUNK), lambda i, j, cand, aux, off: (i, 0))
    kernel = functools.partial(_nn_kernel_t, exclude_self=exclude_self,
                               expanded=expanded, cs=cs,
                               has_init=init_g is not None,
                               has_ncand=has_ncand)
    in_specs = (
        [pl.BlockSpec((8, tt * CHUNK),
                      lambda i, j, cand, aux, off: (0, i))]
        + [b_spec(t, c) for t in range(tt) for c in range(cs)]
    )
    operands = [qt8_g] + [b8p] * (tt * cs)
    if init_g is not None:
        in_specs += [io_spec, io_spec]
        operands += [init_g[0], init_g[1]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # cand table, aux (per-tile ncand gate, else a dummy), tile offset
        num_scalar_prefetch=3,
        grid=(gt // tt, cap // cs),
        in_specs=in_specs,
        out_specs=[io_spec, io_spec],
    )
    bestd, besti = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt, CHUNK), jnp.float32, *operands),
            _sds((gt, CHUNK), jnp.int32, *operands),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, aux_g, tbase, *operands)
    return bestd.reshape(gt * CHUNK), besti.reshape(gt * CHUNK)


@functools.partial(
    jax.jit, static_argnames=("exclude_self", "interpret", "expanded", "cs")
)
def refine_nn_pallas_t(
    qt8: jnp.ndarray,  # (8, Pa)
    b8r: jnp.ndarray,  # (Pb, 8) row-major sorted search points (zero-padded
    # cols) — the NATURAL padded layout, so callers pass jnp.pad(points)
    # with NO transpose (a (Pb,8)<->(8,Pb) relayout costs ~15 ms at 850k
    # and used to be paid TWICE per call, caller .T + callee .T back)
    borig: jnp.ndarray,  # (1, Pb)
    cand: jnp.ndarray,  # (nta, cap)
    ncand: typing.Optional[jnp.ndarray] = None,  # (nta,) int32 per-tile gate
    exclude_self: bool = False,
    interpret: bool = False,
    expanded: bool = False,
    cs: typing.Optional[int] = None,
    init: typing.Optional[typing.Tuple[jnp.ndarray, jnp.ndarray]] = None,
    # optional ((nta, CHUNK) f32, (nta, CHUNK) i32) running best to seed
    # from (a bucketed/tiered pass continues an earlier pass's results)
):
    """Transposed-layout refine; same results as refine_nn_pallas.

    ``ncand`` (per-tile executed-slot count) enables the low-overhead
    count gate: tile t only computes candidate slots < ncand[t] (one SMEM
    scalar compare per skipped slot; the DMA still streams). The cand table
    stays fully populated so skipped slots read a valid (ignored) block.
    With ``expanded=True`` the caller packs augmented rows
    (q=[-2x,-2y,-2z,qsq], b=[x,y,z,bsq]) and distances use the cheaper
    expanded-norm form — exact only under cloud.mxu_exact; the caller must
    then pad qt8 to a multiple of 8 tiles (no straight-layout fallback).
    """
    nta, cap = cand.shape
    if cs is None:
        import os

        cs = int(os.environ.get("PCC_NN_CS", "1"))
    has_ncand = ncand is not None
    if ncand is None:
        # aux slot unused: a (rows, 1) dummy keeps it out of the SMEM budget.
        aux = jnp.zeros((nta, 1), jnp.int32)
    else:
        aux = ncand.astype(jnp.int32).reshape(nta)
        cand = _clamp_cand(cand, aux)
    b8p = _pack_ids_col7(b8r, borig)
    tt = _TILES_PER_STEP
    # Scalar-prefetch tables live in ~1 MB SMEM: bound rows so
    # (cand + lbc) * cap fits even at escalated caps (cap=512 after a
    # ladder rung used to compile a 2 MB table and OOM SMEM).
    budget_rows = max(tt, (393216 // (8 * cap)) // tt * tt)
    group = min((TILE_GROUP // tt) * tt, budget_rows)
    d_parts, i_parts = [], []
    for g0 in range(0, nta, group):
        gt = min(group, nta - g0)
        if gt % tt:
            # pad the tail group by reusing the last tiles' candidates; the
            # extra rows are discarded after the call
            pad = tt - gt % tt
            cand_g = jnp.concatenate(
                [cand[g0 : g0 + gt],
                 jnp.broadcast_to(cand[g0 + gt - 1 : g0 + gt], (pad, cap))],
                axis=0,
            )
            if has_ncand:
                # pad tiles execute zero slots (their results are discarded)
                aux_g = jnp.concatenate(
                    [aux[g0 : g0 + gt], jnp.zeros((pad,), jnp.int32)])
            else:
                aux_g = jnp.concatenate(
                    [aux[g0 : g0 + gt],
                     jnp.broadcast_to(aux[g0 + gt - 1 : g0 + gt],
                                      (pad, aux.shape[1]))],
                    axis=0,
                )
            q_g = jax.lax.dynamic_slice_in_dim(
                qt8, g0 * CHUNK, (gt + pad) * CHUNK, axis=1,
            ) if (g0 + gt + pad) * CHUNK <= qt8.shape[1] else None
            if q_g is None:
                assert not expanded, (
                    "expanded packing requires qt8 padded to 8-tile groups")
                assert init is None, (
                    "seeded refine requires qt8 padded to 8-tile groups")
                assert not has_ncand, (
                    "count-gated refine requires qt8 padded to 8-tile groups")
                # tail runs through the straight-layout path instead
                d_g, i_g = _nn_group(
                    jax.lax.slice_in_dim(
                        qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1
                    ),
                    jnp.array([g0], jnp.int32),
                    b8r.T.reshape(8, -1, CHUNK).transpose(1, 0, 2).reshape(
                        -1, CHUNK
                    ),
                    borig,
                    cand[g0 : g0 + gt],
                    exclude_self,
                    interpret,
                )
                d_parts.append(d_g)
                i_parts.append(i_g)
                continue
            init_g = None
            if init is not None:
                pad_rows = (gt + pad) - gt
                init_g = (
                    jnp.concatenate(
                        [init[0][g0 : g0 + gt],
                         jnp.zeros((pad_rows, CHUNK), jnp.float32)
                         + jnp.inf]),
                    jnp.concatenate(
                        [init[1][g0 : g0 + gt],
                         jnp.full((pad_rows, CHUNK), INT_MAX, jnp.int32)]),
                )
            d_g, i_g = _nn_group_t(
                q_g, jnp.array([g0], jnp.int32), b8p, cand_g,
                aux_g, exclude_self, interpret, expanded, cs, init_g,
                has_ncand,
            )
            d_parts.append(d_g[: gt * CHUNK])
            i_parts.append(i_g[: gt * CHUNK])
        else:
            init_g = None
            if init is not None:
                init_g = (init[0][g0 : g0 + gt], init[1][g0 : g0 + gt])
            d_g, i_g = _nn_group_t(
                jax.lax.slice_in_dim(
                    qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1
                ),
                jnp.array([g0], jnp.int32), b8p,
                cand[g0 : g0 + gt], aux[g0 : g0 + gt], exclude_self,
                interpret, expanded, cs, init_g, has_ncand,
            )
            d_parts.append(d_g)
            i_parts.append(i_g)
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)


def _knn_kernel_t(cand_ref, aux_ref, off_ref, qt_ref, *rest, k, exclude_self,
                  cs=1, has_init=False, has_ncand=False):
    # Candidate blocks carry their rows' ORIGINAL ids bitcast into lane 7
    # (_pack_ids_col7): one block spec per slot instead of two.
    tt = _TILES_PER_STEP
    b_refs = rest[: tt * cs]
    k0 = tt * cs
    if has_init:
        initd_ref, initi_ref = rest[k0], rest[k0 + 1]
        k0 += 2
    dk_ref, ik_ref = rest[k0], rest[k0 + 1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if has_init:
            # Seeded k-merge: continue from a previous pass's k-buffer
            # (sound — it is the exact k-best over the already-refined
            # prefix of the same lb-ascending candidate order).
            dk_ref[:] = initd_ref[:]
            ik_ref[:] = initi_ref[:]
        else:
            dk_ref[:] = jnp.full_like(dk_ref, jnp.inf)
            ik_ref[:] = jnp.full_like(ik_ref, INT_MAX)

    q = qt_ref[:]  # (8, tt*CHUNK)
    for t in range(tt):
        def _dist(c, t=t):
            b = b_refs[t * cs + c][:]  # (CHUNK, 8)
            d = None
            for kk in range(3):
                bk = b[:, kk].reshape(CHUNK, 1)
                qk = q[kk, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
                diff = bk - qk
                d = diff * diff if d is None else d + diff * diff
            # d: (cand, query)
            if exclude_self:
                cj = cand_ref[i * tt + t, j * cs + c]
                crow = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 0) + cj * CHUNK
                qcol = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 1) \
                    + (off_ref[0] + i * tt + t) * CHUNK
                d = jnp.where(crow == qcol, jnp.inf, d)
            return b, d

        def _tile_step(t=t):
            # All cs slots of this tile merge as ONE region with ONE merge
            # body over the concatenated candidates. Round-3's cs=2
            # attempt duplicated the unrolled 30-round merge per slot and
            # register-spilled (3.3x slower); a single wider merge carries
            # one body. Slots past the tile's gate (aux) are pre-clamped
            # duplicates of its last live chunk (_clamp_cand) and the
            # extraction masks every copy of a (d, id) at once, so
            # re-merging them is an exact no-op.
            run_d = dk_ref[t * k : (t + 1) * k, :]  # (k, CHUNK)
            run_i = ik_ref[t * k : (t + 1) * k, :]
            # Tie-aware gate (see _knn_kernel): equality fires the merge
            # only when it can lower the k-th ORIGINAL index.
            improves = None
            for c in range(cs):
                b, d = _dist(c)
                bor0 = _ids_from_col7(b)  # (CHUNK, 1)
                mind = jnp.min(d, axis=0)
                ii_at_min = jnp.min(
                    jnp.where(d == mind[None, :],
                              jnp.broadcast_to(bor0, d.shape), INT_MAX),
                    axis=0)
                imp = jnp.any(
                    (mind < run_d[k - 1, :])
                    | ((mind == run_d[k - 1, :])
                       & (ii_at_min < run_i[k - 1, :]))
                )
                improves = imp if improves is None else improves | imp

            # NOTE a tiered small-merge (extract + insertion-sort when no
            # query has more than E qualifiers) was measured HERE and
            # reverted: merges concentrate in the PROBE, whose chunks are
            # buffer-filling (per-query qualifier counts >> E), so the
            # small tier never fired while its qualifier-count passes made
            # the probe ~7% slower (157 -> 168 ms at 800k). The extension
            # is clamp-overhead-bound, not merge-bound (172 ms, flat).
            @pl.when(improves)
            def _merge(t=t):
                # Recompute d INSIDE the predicated region: a value used
                # across a pl.when boundary is materialised to scratch
                # (~0.6 us/visit of traffic for the (256,256) tile, paid
                # by EVERY visit); recomputing costs ~0.3 us only on the
                # ~half of visits that actually merge. Identical rounding:
                # same inputs, same expression. The k-buffers re-read from
                # their refs for the same reason.
                parts_d = [dk_ref[t * k : (t + 1) * k, :]]
                parts_i = [ik_ref[t * k : (t + 1) * k, :]]
                for c in range(cs):
                    b2, d = _dist(c)
                    parts_d.append(d)
                    parts_i.append(
                        jnp.broadcast_to(_ids_from_col7(b2), d.shape))
                cand_d = jnp.concatenate(parts_d, axis=0)
                cand_i = jnp.concatenate(parts_i, axis=0)
                dcur = cand_d
                for r in range(k):
                    m = jnp.min(dcur, axis=0, keepdims=True)  # (1, CHUNK)
                    at_min = dcur == m
                    ii = jnp.min(jnp.where(at_min, cand_i, INT_MAX), axis=0,
                                 keepdims=True)
                    dcur = jnp.where(at_min & (cand_i == ii), jnp.inf, dcur)
                    dk_ref[t * k + r : t * k + r + 1, :] = m
                    ik_ref[t * k + r : t * k + r + 1, :] = ii

        if has_ncand:
            # Low-overhead count gate (see _nn_kernel_t): one SMEM scalar
            # compare skips the whole tile step beyond the tile's
            # certificate-derived candidate need. The region gate is at
            # cs granularity — a straddling region's trailing slots are
            # the idempotent pre-clamped duplicates described above.
            pl.when(j * cs < aux_ref[i * tt + t])(_tile_step)
        else:
            _tile_step()


def _knn_group_t(qt8_g, tbase, b8p, cand_g, aux_g, k, exclude_self,
                 interpret, init_g=None, has_ncand=False, cs=1):
    gt, cap = cand_g.shape
    tt = _TILES_PER_STEP
    while cap % cs:
        cs //= 2

    # Gated candidate tables arrive PRE-CLAMPED (_clamp_cand): plain SMEM
    # lookups in the index maps; unchanged block index => copy elided.
    def b_spec(t, c):
        return pl.BlockSpec(
            (CHUNK, 8),
            lambda i, j, cand, aux, off, t=t, c=c: (
                cand[i * tt + t, j * cs + c], 0)
        )

    io_spec = pl.BlockSpec((tt * k, CHUNK),
                           lambda i, j, cand, aux, off: (i, 0))
    kernel = functools.partial(_knn_kernel_t, k=k, exclude_self=exclude_self,
                               cs=cs,
                               has_init=init_g is not None,
                               has_ncand=has_ncand)
    in_specs = (
        [pl.BlockSpec((8, tt * CHUNK), lambda i, j, cand, aux, off: (0, i))]
        + [b_spec(t, c) for t in range(tt) for c in range(cs)]
    )
    operands = [qt8_g] + [b8p] * (tt * cs)
    if init_g is not None:
        in_specs += [io_spec, io_spec]
        operands += [init_g[0], init_g[1]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cand table, ncand gate (or dummy), offset
        grid=(gt // tt, cap // cs),
        in_specs=in_specs,
        out_specs=[io_spec, io_spec],
    )
    dk, ik = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt * k, CHUNK), jnp.float32, *operands),
            _sds((gt * k, CHUNK), jnp.int32, *operands),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, aux_g, tbase, *operands)
    # (gt*k, CHUNK) -> (gt, k, CHUNK) -> rows (gt*CHUNK, k)
    dk = dk.reshape(gt, k, CHUNK).transpose(0, 2, 1).reshape(gt * CHUNK, k)
    ik = ik.reshape(gt, k, CHUNK).transpose(0, 2, 1).reshape(gt * CHUNK, k)
    return dk, ik


def _rows_to_kbuf(x, k):
    """Row layout (P, k) -> the kernel's k-buffer layout (nta*k, CHUNK)."""
    p = x.shape[0]
    return x.reshape(p // CHUNK, CHUNK, k).transpose(0, 2, 1).reshape(-1, CHUNK)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "interpret", "cs")
)
def refine_knn_pallas_t(
    qt8: jnp.ndarray,
    b8r: jnp.ndarray,  # (Pb, 8) natural padded layout (see refine_nn_pallas_t)
    borig: jnp.ndarray,
    cand: jnp.ndarray,
    k: int,
    ncand: typing.Optional[jnp.ndarray] = None,  # (nta,) per-tile slot gate
    exclude_self: bool = False,
    interpret: bool = False,
    init: typing.Optional[typing.Tuple[jnp.ndarray, jnp.ndarray]] = None,
    # optional ((P, k) f32, (P, k) i32) ascending k-buffers to seed from
    cs: int = 1,
):
    """Transposed-layout k-NN refine; ascending (dk, idx) like the others.

    ``ncand``/``init`` mirror refine_nn_pallas_t: the per-tile SMEM count
    gate plus seeding from an earlier pass's exact k-buffer (both require
    qt8 padded to whole 8-tile groups). ``cs`` = candidate slots per grid
    step: count-gated passes whose slots are mostly clamped off pay a
    ~2.3 us fixed cost per grid STEP (measured: a fully-clamped 56-slot
    extension costs 53 ms at 800k doing zero compute), so gated callers
    batch cs=2 slots per step to halve it (cs=4 overruns the 16 MB scoped-VMEM budget at 800k); each slot keeps its own
    SMEM gate + clamped index map.
    """
    nta, cap = cand.shape
    has_ncand = ncand is not None
    if ncand is None:
        aux = jnp.zeros((nta, 1), jnp.int32)
    else:
        aux = ncand.astype(jnp.int32).reshape(nta)
        cand = _clamp_cand(cand, aux)
    init_kbuf = None
    if init is not None:
        init_kbuf = (_rows_to_kbuf(init[0], k), _rows_to_kbuf(init[1], k))
    b8p = _pack_ids_col7(b8r, borig)
    tt = _TILES_PER_STEP
    budget_rows = max(tt, (393216 // (4 * cap)) // tt * tt)
    group = min((TILE_GROUP // tt) * tt, budget_rows)
    d_parts, i_parts = [], []
    for g0 in range(0, nta, group):
        gt = min(group, nta - g0)
        gt_pad = ((gt + tt - 1) // tt) * tt
        if (g0 + gt_pad) * CHUNK <= qt8.shape[1] and gt_pad != gt:
            use = gt_pad
        elif gt % tt == 0:
            use = gt
        else:
            # tail not representable: fall back to the XLA-equivalent
            # straight-layout k-NN kernel for these tiles
            assert not has_ncand and init is None, (
                "gated/seeded k-NN refine requires qt8 padded to 8-tile "
                "groups")
            dk, ik = refine_knn_pallas(
                jax.lax.slice_in_dim(
                    qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1
                ),
                b8r.T, borig, cand[g0 : g0 + gt], k,
                exclude_self=exclude_self, interpret=interpret,
            )
            d_parts.append(dk)
            i_parts.append(ik)
            continue
        cand_g = cand[g0 : g0 + use]
        if cand_g.shape[0] != use:  # qt8 carries pad tiles beyond nta
            pad = use - cand_g.shape[0]
            cand_g = jnp.concatenate(
                [cand_g, jnp.broadcast_to(cand_g[-1:], (pad, cap))])
        if has_ncand:
            aux_g = aux[g0 : g0 + use]
            if aux_g.shape[0] != use:
                aux_g = jnp.concatenate(
                    [aux_g, jnp.zeros((use - aux_g.shape[0],), jnp.int32)])
        else:
            aux_g = aux[g0 : g0 + min(use, nta - g0)]
        init_g = None
        if init_kbuf is not None:
            r0, r1 = g0 * k, (g0 + use) * k
            if r1 <= init_kbuf[0].shape[0]:
                init_g = (init_kbuf[0][r0:r1], init_kbuf[1][r0:r1])
            else:
                pad = r1 - init_kbuf[0].shape[0]
                init_g = (
                    jnp.concatenate(
                        [init_kbuf[0][r0:],
                         jnp.full((pad, CHUNK), jnp.inf, jnp.float32)]),
                    jnp.concatenate(
                        [init_kbuf[1][r0:],
                         jnp.full((pad, CHUNK), INT_MAX, jnp.int32)]),
                )
        dk, ik = _knn_group_t(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + use) * CHUNK, axis=1),
            jnp.array([g0], jnp.int32), b8p, cand_g, aux_g, k,
            exclude_self, interpret, init_g, has_ncand, cs,
        )
        d_parts.append(dk[: gt * CHUNK])
        i_parts.append(ik[: gt * CHUNK])
    return jnp.concatenate(d_parts), jnp.concatenate(i_parts)


# ---------------------------------------------------------------------------
# Payload variant of the transposed kernel: besides (dist, orig idx), emit
# the winning neighbour's PAYLOAD row (points/colours/normals packed into 16
# floats) selected in-kernel with an exactly-one-hot MXU matmul — the
# XLA-side per-direction payload gathers (the 2nd-largest cost in the fused
# suite) disappear.
# ---------------------------------------------------------------------------

PAYLOAD_F = 16  # packed payload rows: [pts(3), col(3), nrm(3), pad...]


def _nn_kernel_tp(cand_ref, off_ref, qt_ref, *rest, exclude_self):
    tt = _TILES_PER_STEP
    b_refs = rest[:tt]
    borig_refs = rest[tt : 2 * tt]
    pay_refs = rest[2 * tt : 3 * tt]
    bestd_ref, besti_ref, bestp_ref = rest[3 * tt : 3 * tt + 3]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bestd_ref[:] = jnp.full_like(bestd_ref, jnp.inf)
        besti_ref[:] = jnp.full_like(besti_ref, INT_MAX)
        bestp_ref[:] = jnp.zeros_like(bestp_ref)

    q = qt_ref[:]  # (8, tt*CHUNK)
    for t in range(tt):
        b = b_refs[t][:]  # (CHUNK, 8)
        d = None
        for kk in range(3):
            bk = b[:, kk].reshape(CHUNK, 1)
            qk = q[kk, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
            diff = bk - qk
            d = diff * diff if d is None else d + diff * diff
        if exclude_self:
            cj = cand_ref[i * tt + t, j]
            crow = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) \
                + cj * CHUNK
            qcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) \
                + (off_ref[0] + i * tt + t) * CHUNK
            d = jnp.where(crow == qcol, jnp.inf, d)
        dmin = jnp.min(d, axis=0, keepdims=True)  # (1, CHUNK)
        at_min = d == dmin
        bor = jnp.broadcast_to(borig_refs[t][:], d.shape)
        ii = jnp.min(jnp.where(at_min, bor, INT_MAX), axis=0, keepdims=True)
        # Exactly-one-hot winner mask (borig unique per chunk).
        sel = (at_min & (bor == ii)).astype(jnp.float32)  # (cand, query)
        pay_q = jax.lax.dot_general(
            pay_refs[t][:], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (PAYLOAD_F, CHUNK)

        prev_d = bestd_ref[t : t + 1, :]
        prev_i = besti_ref[t : t + 1, :]
        better = (dmin < prev_d) | ((dmin == prev_d) & (ii < prev_i))
        bestd_ref[t : t + 1, :] = jnp.where(better, dmin, prev_d)
        besti_ref[t : t + 1, :] = jnp.where(better, ii, prev_i)
        prow = bestp_ref[t * PAYLOAD_F : (t + 1) * PAYLOAD_F, :]
        bestp_ref[t * PAYLOAD_F : (t + 1) * PAYLOAD_F, :] = jnp.where(
            better, pay_q, prow
        )


def _nn_group_tp(qt8_g, tbase, b8r, borig_col, payT, cand_g, exclude_self,
                 interpret):
    gt, cap = cand_g.shape
    tt = _TILES_PER_STEP

    def b_spec(t):
        return pl.BlockSpec(
            (CHUNK, 8), lambda i, j, cand, off, t=t: (cand[i * tt + t, j], 0)
        )

    def bor_spec(t):
        return pl.BlockSpec(
            (CHUNK, 1), lambda i, j, cand, off, t=t: (cand[i * tt + t, j], 0)
        )

    def pay_spec(t):
        return pl.BlockSpec(
            (PAYLOAD_F, CHUNK),
            lambda i, j, cand, off, t=t: (0, cand[i * tt + t, j]),
        )

    kernel = functools.partial(_nn_kernel_tp, exclude_self=exclude_self)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gt // tt, cap),
        in_specs=(
            [pl.BlockSpec((8, tt * CHUNK), lambda i, j, cand, off: (0, i))]
            + [b_spec(t) for t in range(tt)]
            + [bor_spec(t) for t in range(tt)]
            + [pay_spec(t) for t in range(tt)]
        ),
        out_specs=[
            pl.BlockSpec((tt, CHUNK), lambda i, j, cand, off: (i, 0)),
            pl.BlockSpec((tt, CHUNK), lambda i, j, cand, off: (i, 0)),
            pl.BlockSpec((tt * PAYLOAD_F, CHUNK),
                         lambda i, j, cand, off: (i, 0)),
        ],
    )
    bestd, besti, bestp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _sds((gt, CHUNK), jnp.float32, qt8_g, b8r, borig_col),
            _sds((gt, CHUNK), jnp.int32, qt8_g, b8r, borig_col),
            _sds((gt * PAYLOAD_F, CHUNK), jnp.float32, qt8_g, b8r,
                 borig_col),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, tbase, qt8_g, *([b8r] * tt), *([borig_col] * tt),
      *([payT] * tt))
    pay = bestp.reshape(gt, PAYLOAD_F, CHUNK).transpose(0, 2, 1).reshape(
        gt * CHUNK, PAYLOAD_F
    )
    return bestd.reshape(gt * CHUNK), besti.reshape(gt * CHUNK), pay


@functools.partial(
    jax.jit, static_argnames=("exclude_self", "interpret")
)
def refine_nn_pallas_payload(
    qt8: jnp.ndarray,  # (8, Pa)
    bt8: jnp.ndarray,  # (8, Pb)
    borig: jnp.ndarray,  # (1, Pb)
    payT: jnp.ndarray,  # (PAYLOAD_F, Pb) packed sorted-order payload
    cand: jnp.ndarray,  # (nta, cap)
    exclude_self: bool = False,
    interpret: bool = False,
):
    """Like refine_nn_pallas_t but also returns the winner's payload
    ``(d (Pa,), idx (Pa,), payload (Pa, PAYLOAD_F))``. Requires nta to be a
    multiple of _TILES_PER_STEP (cloud padding guarantees it)."""
    nta, cap = cand.shape
    if nta % _TILES_PER_STEP:
        raise ValueError(
            f"nta ({nta}) must be a multiple of {_TILES_PER_STEP}"
        )
    b8r = bt8.T
    borig_col = borig.reshape(-1, 1)
    tt = _TILES_PER_STEP
    group = (TILE_GROUP // tt) * tt
    d_parts, i_parts, p_parts = [], [], []
    for g0 in range(0, nta, group):
        gt = min(group, nta - g0)
        d_g, i_g, p_g = _nn_group_tp(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + gt) * CHUNK, axis=1),
            jnp.array([g0], jnp.int32), b8r, borig_col, payT,
            jax.lax.slice_in_dim(cand, g0, g0 + gt, axis=0),
            exclude_self, interpret,
        )
        d_parts.append(d_g)
        i_parts.append(i_g)
        p_parts.append(p_g)
    return (jnp.concatenate(d_parts), jnp.concatenate(i_parts),
            jnp.concatenate(p_parts))


# ---------------------------------------------------------------------------
# k-NN covariance-moment accumulation: the normal-estimation epilogue
# without the (P, k, 3) neighbour gather. A second count-gated pass over
# the SAME lb-ascending candidate schedule as the k-NN refine recomputes
# each (chunk, tile) distance block (cheap: the k-NN pass is merge-bound,
# not distance-bound), tests membership in the exact k-NN set by
# lexicographic (d, orig idx) <= (r_k, i_k) against the k-buffer's last
# slot, and accumulates per-query moment sums of the QUERY-RELATIVE
# neighbour offsets (centering on the query kills the catastrophic
# cancellation a raw sum-of-squares form would have):
#   [cnt, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz]
# The host epilogue turns these into the 3x3 covariance + eigh3 — the XLA
# row-gather (measured 247 ms/800k cloud, the single largest estimation
# cost) and the (P, 30, 3) einsum (47 ms) disappear.
# Replaces the gather half of open3d estimate_normals (reference:
# open_pcc_metric/cloud_pair.py:61-64).
# ---------------------------------------------------------------------------

MOM_CH = 10  # [cnt, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz]


def _moments_kernel_t(cand_ref, aux_ref, off_ref, qt_ref, *rest,
                      has_init=False, cs=1):
    # Candidate blocks carry original ids in lane 7 (_pack_ids_col7).
    tt = _TILES_PER_STEP
    b_refs = rest[: tt * cs]
    k0 = tt * cs
    rk_ref, ikth_ref = rest[k0], rest[k0 + 1]
    k0 += 2
    if has_init:
        initm_ref = rest[k0]
        k0 += 1
    mom_ref = rest[k0]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if has_init:
            mom_ref[:] = initm_ref[:]
        else:
            mom_ref[:] = jnp.zeros_like(mom_ref)

    q = qt_ref[:]  # (8, tt*CHUNK)
    for t, c in [(t_, c_) for t_ in range(tt) for c_ in range(cs)]:
        def _tile_slot(t=t, c=c):
            b = b_refs[t * cs + c][:]  # (CHUNK, 8) candidate chunk rows
            diffs = []
            d = None
            for kk in range(3):
                bk = b[:, kk].reshape(CHUNK, 1)
                qk = q[kk, t * CHUNK : (t + 1) * CHUNK].reshape(1, CHUNK)
                diff = bk - qk  # (cand, query) — identical rounding to the
                # k-NN kernel's distance, so membership tests see the SAME
                # d values the k-buffer was built from.
                diffs.append(diff)
                d = diff * diff if d is None else d + diff * diff
            rk = rk_ref[t : t + 1, :]     # (1, CHUNK) k-th distance
            ikt = ikth_ref[t : t + 1, :]  # (1, CHUNK) k-th original idx
            bor = _ids_from_col7(b)       # (CHUNK, 1) original ids
            member = (d < rk) | ((d == rk) & (bor <= ikt))
            m = member.astype(jnp.float32)
            dx, dy, dz = diffs
            mdx, mdy, mdz = m * dx, m * dy, m * dz
            rows = (
                m, mdx, mdy, mdz,
                mdx * dx, mdy * dy, mdz * dz,
                mdx * dy, mdx * dz, mdy * dz,
            )
            acc = jnp.concatenate(
                [jnp.sum(r, axis=0, keepdims=True) for r in rows], axis=0
            )  # (MOM_CH, CHUNK)
            base = t * MOM_CH
            mom_ref[base : base + MOM_CH, :] += acc

        # Always count-gated: ncand is the tile's certificate count, the
        # exact cover of its k-NN members' chunks.
        pl.when(j * cs + c < aux_ref[i * tt + t])(_tile_slot)


def _moments_group_t(qt8_g, tbase, b8p, cand_g, aux_g, rk_g,
                     ik_g, interpret, init_g=None, cs=1):
    gt, cap = cand_g.shape
    tt = _TILES_PER_STEP
    while cap % cs:
        cs //= 2

    # Candidate tables arrive PRE-CLAMPED (_clamp_cand).
    def b_spec(t, c):
        return pl.BlockSpec(
            (CHUNK, 8),
            lambda i, j, cand, aux, off, t=t, c=c: (
                cand[i * tt + t, j * cs + c], 0)
        )

    th_spec = pl.BlockSpec((tt, CHUNK), lambda i, j, cand, aux, off: (i, 0))
    mom_spec = pl.BlockSpec((tt * MOM_CH, CHUNK),
                            lambda i, j, cand, aux, off: (i, 0))
    kernel = functools.partial(_moments_kernel_t,
                               has_init=init_g is not None, cs=cs)
    in_specs = (
        [pl.BlockSpec((8, tt * CHUNK), lambda i, j, cand, aux, off: (0, i))]
        + [b_spec(t, c) for t in range(tt) for c in range(cs)]
        + [th_spec, th_spec]
    )
    operands = ([qt8_g] + [b8p] * (tt * cs)
                + [rk_g, ik_g])
    if init_g is not None:
        in_specs += [mom_spec]
        operands += [init_g]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cand table, ncand gate, tile offset
        grid=(gt // tt, cap // cs),
        in_specs=in_specs,
        out_specs=[mom_spec],
    )
    (mom,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[_sds((gt * MOM_CH, CHUNK), jnp.float32, *operands)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cand_g, aux_g, tbase, *operands)
    # (gt*MOM_CH, CHUNK) -> rows (gt*CHUNK, MOM_CH)
    return (mom.reshape(gt, MOM_CH, CHUNK).transpose(0, 2, 1)
            .reshape(gt * CHUNK, MOM_CH))


@functools.partial(jax.jit, static_argnames=("interpret", "cs"))
def moments_pallas_t(
    qt8: jnp.ndarray,   # (8, Pa) transposed queries, padded to 8-tile groups
    b8r: jnp.ndarray,   # (Pb, 8) natural padded candidate layout
    borig: jnp.ndarray,  # (1, Pb) original ids
    cand: jnp.ndarray,  # (nta, cap) lb-ascending candidate table
    ncand: jnp.ndarray,  # (nta,) per-tile certificate count (gate)
    rk: jnp.ndarray,    # (nta, CHUNK) k-th NN distance per query
    ik: jnp.ndarray,    # (nta, CHUNK) k-th NN original idx per query
    init: typing.Optional[jnp.ndarray] = None,  # (nta*CHUNK, MOM_CH) seed
    interpret: bool = False,
    cs: int = 2,
) -> jnp.ndarray:
    """k-NN moment sums per query row: (Pa, MOM_CH), query-relative.

    ``cs`` slots per grid step amortise the fixed per-step cost over the
    mostly-clamped tail of the count-gated candidate table (see
    refine_knn_pallas_t).
    """
    nta, cap = cand.shape
    aux = ncand.astype(jnp.int32).reshape(nta)
    cand = _clamp_cand(cand, aux)
    b8p = _pack_ids_col7(b8r, borig)
    init_kbuf = _rows_to_kbuf(init, MOM_CH) if init is not None else None
    tt = _TILES_PER_STEP
    budget_rows = max(tt, (393216 // (4 * cap)) // tt * tt)
    group = min((TILE_GROUP // tt) * tt, budget_rows)
    parts = []
    for g0 in range(0, nta, group):
        gt = min(group, nta - g0)
        gt_pad = ((gt + tt - 1) // tt) * tt
        assert (g0 + gt_pad) * CHUNK <= qt8.shape[1] or gt_pad == gt, (
            "moments_pallas_t requires qt8 padded to whole 8-tile groups")
        use = gt_pad if gt_pad != gt else gt

        def seg(x, fill):
            s = x[g0 : g0 + use]
            if s.shape[0] != use:
                pad = use - s.shape[0]
                s = jnp.concatenate(
                    [s, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
            return s

        cand_g = cand[g0 : g0 + use]
        if cand_g.shape[0] != use:
            cand_g = jnp.concatenate(
                [cand_g,
                 jnp.broadcast_to(cand_g[-1:],
                                  (use - cand_g.shape[0], cap))])
        aux_g = seg(aux, 0)  # pad tiles execute zero slots
        rk_g = seg(rk, 0.0)
        ik_g = seg(ik, 0)
        init_g = None
        if init_kbuf is not None:
            r0, r1 = g0 * MOM_CH, (g0 + use) * MOM_CH
            if r1 <= init_kbuf.shape[0]:
                init_g = init_kbuf[r0:r1]
            else:
                init_g = jnp.concatenate(
                    [init_kbuf[r0:],
                     jnp.zeros((r1 - init_kbuf.shape[0], CHUNK),
                               jnp.float32)])
        mom = _moments_group_t(
            jax.lax.slice_in_dim(qt8, g0 * CHUNK, (g0 + use) * CHUNK,
                                 axis=1),
            jnp.array([g0], jnp.int32), b8p, cand_g, aux_g,
            rk_g, ik_g, interpret, init_g, cs,
        )
        parts.append(mom[: gt * CHUNK])
    return jnp.concatenate(parts)
