"""Fused bbox lower-bound + candidate-select / count Pallas kernels.

The pruned-NN prologue used to materialise the full (nta, ncb) bbox
lower-bound matrix and feed it to ``lax.top_k`` (candidate select) and a
masked sum (certificate counts). Both are O(nta*ncb) — quadratic in cloud
size — and XLA materialises several (nta, ncb) broadcast temporaries for
the bound matrix itself. Measured at 2M points (tools/profile_stages.py):
lb 25.7 ms + top_k 28.5 ms of the 140.8 ms a->b NN pass, and the share
grows with N^2 while refinement work stays linear (tools/profile_counts.py:
per-tile qualifying work is flat across 800k->2M).

These kernels never materialise the bound matrix: each grid step loads a
block of query-tile bboxes, keeps the whole search cloud's chunk bboxes
VMEM-resident (6 coordinate rows, ~256 KB at 8192 chunks), computes the
lb row on the fly and immediately reduces it.

Packed-key selection. Selection must return the ``cap`` smallest-lb chunk
ids in ascending-lb order with lowest-index ties. One (min, argmin-by-
index) round per slot costs two cross-lane reductions; instead the lb is
bitcast to int32 (order-preserving for non-negative f32) and its low
``bits`` mantissa bits are replaced by the chunk index:

    key = (lb_bits & ~((1 << bits) - 1)) | chunk_col

so one int-min reduction per round yields value AND index, and the
masked column is exactly one lane (indices are unique). The key order is
(rounded-down lb, chunk index).

SOUNDNESS of the rounding: clearing low bits of a non-negative float
rounds it DOWN, so every certificate quantity derived from rounded
bounds over-counts: counts' = #(lb_masked <= thr) >= #(lb <= thr). The
certificate argument ("count <= cap => the refined lb-ascending prefix
provably contains every qualifying chunk") holds verbatim in the rounded
space as long as ALL of (selection order, probe counts, certificate
counts, stage-2 tier tables) use the SAME rounded bounds — callers in
ops/nn_pruned.py / ops/knn_pruned.py do exactly that via ``mask_lb``.
Rounding is relative (low-mantissa bits), so the inflation only affects
chunks within ~2^(bits-23) relative distance of the threshold; measured
certificate counts are unchanged at bench scales. True NN distances are
never rounded — only the prune bounds are.

Reference semantics being accelerated: the KDTreeFlann queries of
/root/reference/open_pcc_metric/cloud_pair.py:22 (the reference prunes
with a KD-tree per query point; we prune with tile-level certificates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .refine_pallas import _sds

INT_MAX = jnp.iinfo(jnp.int32).max

_SEL_ROWS = 16  # query tiles per grid step


def _key_bits(ncb_pad: int) -> int:
    """Static low-bit width: enough to hold any chunk column index."""
    return max(1, int(ncb_pad - 1).bit_length())


def mask_lb(lb: jnp.ndarray, ncb_pad: int) -> jnp.ndarray:
    """Round lb DOWN to the kernel's key resolution (XLA side).

    Stage-2 tier tables and recounts are computed on small gathered
    slices with plain XLA; masking them keeps every certificate quantity
    in the same rounded space as the fused kernels.
    """
    low = (1 << _key_bits(ncb_pad)) - 1
    bits = jax.lax.bitcast_convert_type(lb.astype(jnp.float32), jnp.int32)
    return jax.lax.bitcast_convert_type(bits & ~low, jnp.float32)


def count_slack(ncb_pad: int) -> float:
    """Relative threshold inflation that makes cross-kernel counts sound.

    The select and count kernels (and any XLA-side bound computation)
    may round the SAME bound differently by a few ulps — the expression
    is recompiled per context and f32 contraction/fusion differ
    (measured: 1-ulp disagreements even CPU-vs-CPU). A chunk that
    qualifies in the select kernel's rounded space (floor_b(lb_s) <= thr
    => lb_s <= thr * (1 + 2^(b-23))) therefore satisfies
    floor_b(lb_c) <= lb_c <= lb_s * (1 + few ulp) <= thr * (1 + 2^(b-21))
    in the count kernel's space. Inflating count thresholds by
    2^(bits-21) (4 rounding buckets) guarantees every count derived in a
    DIFFERENT compilation over-counts the select-space qualifying set —
    the direction every certificate needs. Perf cost: chunks within
    ~0.05% (bits=13) of the threshold count as qualifying.
    """
    return float(2.0 ** (_key_bits(ncb_pad) - 21))


def _lb_block(a, b):
    """(SR, 8) tile bboxes x (8, ncbp) chunk bboxes -> (SR, ncbp) lb.

    Same expression tree as ops/grid.bbox_lower_bounds (identical f32
    rounding): per-dim gap = max(max(a_lo - b_hi, b_lo - a_hi), 0),
    lb = sum of squared gaps in dim order.
    """
    lb = None
    for d in range(3):
        al = a[:, d : d + 1]
        ah = a[:, d + 3 : d + 4]
        bl = b[d : d + 1, :]
        bh = b[d + 3 : d + 4, :]
        g = jnp.maximum(0.0, jnp.maximum(al - bh, bl - ah))
        sq = g * g
        lb = sq if lb is None else lb + sq
    return lb


def _select_kernel(a_ref, b_ref, cand_ref, lbsel_ref, *, cap, ncb, bits):
    lb = _lb_block(a_ref[:], b_ref[:])
    cols = jax.lax.broadcasted_iota(jnp.int32, lb.shape, 1)
    low = (1 << bits) - 1
    kb = jax.lax.bitcast_convert_type(lb, jnp.int32)
    key = jnp.where(cols < ncb, (kb & ~low) | cols, INT_MAX)
    ms = []
    for _ in range(cap):
        m = jnp.min(key, axis=1, keepdims=True)  # (SR, 1)
        key = jnp.where(key == m, INT_MAX, key)
        ms.append(m)
    keys = jnp.concatenate(ms, axis=1)  # (SR, cap)
    cand_ref[:] = jnp.minimum(keys & low, ncb - 1)
    lbsel_ref[:] = jax.lax.bitcast_convert_type(keys & ~low, jnp.float32)


def _count_kernel(a_ref, b_ref, cnt_ref, *, ncb, bits):
    a = a_ref[:]
    lb = _lb_block(a, b_ref[:])
    cols = jax.lax.broadcasted_iota(jnp.int32, lb.shape, 1)
    low = (1 << bits) - 1
    kb = jax.lax.bitcast_convert_type(lb, jnp.int32)
    masked = jax.lax.bitcast_convert_type(kb & ~low, jnp.float32)
    thr = a[:, 6:7]  # per-tile threshold rides bbox column 6
    ok = (masked <= thr) & (cols < ncb)
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)
    cnt_ref[:] = jnp.broadcast_to(cnt, cnt_ref.shape)


def _pack_b(b_lo: jnp.ndarray, b_hi: jnp.ndarray) -> jnp.ndarray:
    """(ncb, 3) chunk bbox corners -> (8, ncb_pad) VMEM-resident block."""
    ncb = b_lo.shape[0]
    ncbp = ((ncb + 127) // 128) * 128
    b8 = jnp.zeros((8, ncbp), b_lo.dtype)
    b8 = jax.lax.dynamic_update_slice(b8, b_lo.T, (0, 0))
    b8 = jax.lax.dynamic_update_slice(b8, b_hi.T, (3, 0))
    return b8


def _pack_a(a_lo, a_hi, thr=None):
    """(nta, 3) tile bboxes (+ optional per-tile threshold) -> (nta_pad, 8)."""
    nta = a_lo.shape[0]
    pad = (-nta) % _SEL_ROWS
    a8 = jnp.zeros((nta + pad, 8), a_lo.dtype)
    a8 = jax.lax.dynamic_update_slice(a8, a_lo, (0, 0))
    a8 = jax.lax.dynamic_update_slice(a8, a_hi, (0, 3))
    if thr is not None:
        a8 = jax.lax.dynamic_update_slice(
            a8, thr.reshape(nta, 1).astype(a_lo.dtype), (0, 6))
    return a8


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def select_bbox_pallas(
    a_lo: jnp.ndarray,  # (nta, 3) query-tile bbox lower corners
    a_hi: jnp.ndarray,  # (nta, 3)
    b_lo: jnp.ndarray,  # (ncb, 3) search-chunk bbox lower corners
    b_hi: jnp.ndarray,  # (ncb, 3)
    cap: int,
    interpret: bool = False,
):
    """``(cand (nta, cap) int32, lb_sel (nta, cap) f32)`` without ever
    materialising the (nta, ncb) bound matrix.

    ``cand`` rows are the cap smallest-(rounded-lb) chunks in ascending
    (rounded lb, chunk index) order — the same order as
    ``lax.top_k(-mask_lb(lb, ncbp), cap)``; ``lb_sel`` carries the
    rounded-DOWN bound of each selected chunk (sound for every
    certificate count; see module docstring). Requires ``cap <= ncb``.
    """
    nta = a_lo.shape[0]
    ncb = b_lo.shape[0]
    a8 = _pack_a(a_lo, a_hi)
    b8 = _pack_b(b_lo, b_hi)
    rows = a8.shape[0]
    bits = _key_bits(b8.shape[1])

    kernel = functools.partial(
        _select_kernel, cap=cap, ncb=ncb, bits=bits)
    cand, lbsel = pl.pallas_call(
        kernel,
        grid=(rows // _SEL_ROWS,),
        in_specs=[
            pl.BlockSpec((_SEL_ROWS, 8), lambda i: (i, 0)),
            pl.BlockSpec(b8.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_SEL_ROWS, cap), lambda i: (i, 0)),
            pl.BlockSpec((_SEL_ROWS, cap), lambda i: (i, 0)),
        ],
        out_shape=[
            _sds((rows, cap), jnp.int32, a8, b8),
            _sds((rows, cap), jnp.float32, a8, b8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(a8, b8)
    return cand[:nta], lbsel[:nta]


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_bbox_pallas(
    a_lo: jnp.ndarray,
    a_hi: jnp.ndarray,
    b_lo: jnp.ndarray,
    b_hi: jnp.ndarray,
    thr: jnp.ndarray,  # (nta,) per-tile threshold (e.g. ub_eff)
    interpret: bool = False,
) -> jnp.ndarray:
    """(nta,) int32 ``#{chunks: rounded_lb(tile, chunk) <= thr'[tile]}``.

    ``thr' = thr * (1 + count_slack)``: the inflation makes the count a
    sound over-count of the qualifying set in ANY other compilation's
    rounded space (see count_slack), including the select kernel's
    candidate order. Replaces ``sum(lb <= thr[:, None], axis=1)`` over a
    materialised lb. Never under-counts the true-lb qualifying set.
    """
    nta = a_lo.shape[0]
    ncb = b_lo.shape[0]
    ncbp = ((ncb + 127) // 128) * 128
    thr = thr * (1.0 + count_slack(ncbp))
    a8 = _pack_a(a_lo, a_hi, thr=thr)
    b8 = _pack_b(b_lo, b_hi)
    rows = a8.shape[0]
    bits = _key_bits(b8.shape[1])

    kernel = functools.partial(_count_kernel, ncb=ncb, bits=bits)
    cnt = pl.pallas_call(
        kernel,
        grid=(rows // _SEL_ROWS,),
        in_specs=[
            pl.BlockSpec((_SEL_ROWS, 8), lambda i: (i, 0)),
            pl.BlockSpec(b8.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_SEL_ROWS, 8), lambda i: (i, 0)),
        out_shape=_sds((rows, 8), jnp.int32, a8, b8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(a8, b8)
    return cnt[:nta, 0]
