"""Bound-pruned exact nearest-neighbour search over Morton chunk grids.

The speed-of-light NN path (SURVEY §7): instead of the O(N*M) brute-force
sweep, each 256-query Morton tile refines only its ``cap`` lowest-lower-bound
search chunks, then proves itself exact with a sound certificate:

  * lb(tile, chunk) = bbox-to-bbox squared distance (ops/grid.py) lower-bounds
    every query-candidate pair;
  * after refining the cap smallest-lb chunks, the tile's achieved
    ub = max over its valid queries of the refined min distance;
  * qualifying count = #{chunks with lb <= ub}. If count <= cap the
    qualifying set is PROVABLY a subset of the refined set (any chunk outside
    the cap smallest lbs would be the (cap+1)-th qualifying one), so every
    refined distance is the true NN distance;
  * tiles failing the certificate (Morton chunks straddling octant
    boundaries have wide bboxes that overlap hundreds of chunk bboxes —
    <1-2% of tiles) are re-refined with an 8x larger candidate cap and
    re-certified, up to a ``fallback_tiles`` budget. Only if the budget or
    the stage-2 certificate fails does the call report ``overflow`` and the
    caller escalate — exactness is never silently lost.

For dense voxel surfaces (the pc_error workload) this turns ~4x10^11
candidate pairs into ~10^10. Distances use difference-form float arithmetic
on the VPU, so no matmul-trick precision caveats apply.

Tie-breaking is lowest ORIGINAL row index, exactly matching the brute-force
jnp/Pallas paths, so all NN backends are bit-interchangeable (the refinement
and fallback carry each candidate's original index through the argmin).
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from .grid import CHUNK, ChunkGrid, bbox_lower_bounds, build_grid
from ..utils.cache import next_rung

INT_MAX = jnp.iinfo(jnp.int32).max


def _pairwise_sq(q: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(.., m, 3) x (.., n, 3) -> (.., m, n); per-coordinate accumulation to
    avoid the (.., m, n, 3) temporary."""
    d = None
    for k in range(3):
        diff = q[..., :, None, k] - c[..., None, :, k]
        d = diff * diff if d is None else d + diff * diff
    return d


def _pick_batch(n: int, preferred: int = 32) -> int:
    for b in (preferred, 16, 8, 4, 2, 1):
        if n % b == 0:
            return b
    return 1


def _resolve_refine_impl(impl: str, dtype) -> str:
    if impl == "auto":
        import os

        impl = os.environ.get("PCC_REFINE_IMPL", "auto")
    if impl != "auto":
        return impl
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        # The fixed-cap transposed-layout kernel remains the default: the
        # certificate-driven adaptive path (refine_adaptive.py) does ~5x less
        # refinement WORK but its serial in-kernel slot loop costs more
        # per-chunk-pair OVERHEAD, and measured end-to-end on the 800k bench
        # it is 1.7x slower (3.3 vs 5.7 Mpts/s). It stays opt-in via
        # PCC_REFINE_IMPL=adaptive until a lower-overhead schedule wins.
        return "pallas"
    return "xla"


def _tile_lower_bounds(ga: ChunkGrid, gb: ChunkGrid, n_a, nta: int):
    """(valid_t, lb): query-tile validity mask + (nta, ncb) bbox lower bounds."""
    dtype = ga.points.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)
    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
    return valid_t, bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)


def _ub_counts(d, valid_t, lb, eps):
    """Certificate pieces: per-tile sound ub + qualifying chunk count."""
    ub = jnp.max(jnp.where(valid_t, d, -jnp.inf), axis=1)
    ub_eff = ub * (1 + 8 * eps) + 8 * eps
    counts = jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)
    return counts


@functools.partial(
    jax.jit,
    static_argnames=("exclude_self", "cap", "ft3", "p1", "interpret"),
)
def nn_pruned_adaptive_sorted(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: jnp.ndarray,
    exclude_self: bool = False,
    cap: int = 64,
    ft3: int = 64,
    p1: int = 8,
    interpret: bool = False,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Certificate-driven adaptive 1-NN (see ops/refine_adaptive.py).

    Same contract as nn_pruned_sorted: ``(dist_sq, idx_into_ORIGINAL_b,
    overflow)`` in Morton-sorted query order. Work per tile adapts to its
    actual qualifying-chunk count instead of a fixed cap; results are exact
    whenever ``overflow`` is False (the only overflow source is more than
    ``ft3`` tail tiles, which escalates in the callers).

    EXACTNESS GATE: callers must only dispatch here for integer clouds
    (cloud.Cloud.mxu_exact) — the kernel's MXU expanded-norm distances are
    bit-exact exactly then. nn_pruned_sorted enforces this via ``mxu_ok``.
    """
    from .refine_adaptive import (
        adaptive_refine, pack_candidates, pack_queries,
    )

    dtype = ga.points.dtype
    if dtype != jnp.float32:
        raise ValueError("adaptive refinement is float32-only")
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    cap = min(cap, ncb)
    p1 = min(p1, cap)

    valid_t, lb = _tile_lower_bounds(ga, gb, n_a, nta)

    qhat = pack_queries(ga.points)
    bhat = pack_candidates(gb.points, gb.perm)

    _, cand = jax.lax.top_k(-lb, cap)  # lb-ascending candidate prefix
    cand = cand.astype(jnp.int32)

    nta_pad = ((nta + 7) // 8) * 8
    pad = nta_pad - nta

    def padrows(x, value=0):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    tids = padrows(jnp.arange(nta, dtype=jnp.int32))
    cand_p = padrows(cand)

    # P1: probe the top-p1 chunks -> sound per-tile ub.
    ncand1 = padrows(jnp.full((nta,), p1, jnp.int32))
    d1, i1 = adaptive_refine(
        qhat, bhat, cand_p[:, :p1], ncand1, tids,
        exclude_self=exclude_self, interpret=interpret,
    )
    count1 = _ub_counts(d1[:nta], valid_t, lb, eps)

    # P2: extend each tile's refined prefix to min(count1, cap), skipping
    # slots beyond it. Tiles with count1 <= cap are exact by construction.
    if cap > p1:
        ncand2 = padrows(
            jnp.clip(jnp.minimum(count1, cap) - p1, 0, cap - p1)
        )
        d2, i2 = adaptive_refine(
            qhat, bhat, cand_p[:, p1:cap], ncand2, tids,
            init=(d1, i1),
            exclude_self=exclude_self, interpret=interpret,
        )
    else:
        d2, i2 = d1, i1
    d2v, i2v = d2[:nta], i2[:nta]
    count2 = _ub_counts(d2v, valid_t, lb, eps)

    # P3: tiles still over cap (wide octant-straddling bboxes) re-refine
    # against the FULL lb-ascending chunk order, executing count2 slots.
    # Unconditionally exact; only the ft3 tile budget can overflow.
    ft = min(ft3, nta)
    is_tail = count2 > cap
    overflow = jnp.sum(is_tail) > ft
    if ft > 0 and cap < ncb:
        ft_pad = ((ft + 7) // 8) * 8
        _, otiles = jax.lax.top_k(jnp.where(is_tail, count2, 0), ft)
        otiles = otiles.astype(jnp.int32)
        ncand3 = jnp.where(is_tail[otiles], count2[otiles], 0)
        order = jnp.argsort(lb[otiles], axis=1).astype(jnp.int32)

        def padft(x, value=0):
            if ft_pad == ft:
                return x
            widths = ((0, ft_pad - ft),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=value)

        d3, i3 = adaptive_refine(
            qhat, bhat, padft(order), padft(ncand3),
            padft(otiles),
            exclude_self=exclude_self, interpret=interpret,
        )
        take = (ncand3 > 0)[:, None]
        d2v = d2v.at[otiles].set(jnp.where(take, d3[:ft], d2v[otiles]))
        i2v = i2v.at[otiles].set(jnp.where(take, i3[:ft], i2v[otiles]))

    return d2v.reshape(nta * CHUNK), i2v.reshape(nta * CHUNK), overflow


@functools.partial(
    jax.jit,
    static_argnames=("exclude_self", "cap", "fallback_tiles", "refine_impl",
                     "mxu_ok"),
)
def nn_pruned_sorted(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: jnp.ndarray,
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
    refine_impl: str = "auto",
    mxu_ok: bool = False,
    qt8: typing.Optional[jnp.ndarray] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """1-NN in Morton-sorted order.

    ``n_a`` is the query cloud's valid count: sentinels sort to the tail (the
    sort is stable and they carry the max code), so sorted row s is valid iff
    s < n_a. Query-side tile bboxes and the certificate's ub are computed
    over VALID rows only.

    Returns ``(dist_sq, idx_into_ORIGINAL_b, overflow)``. Sentinel query rows
    return meaningless (finite) distances — callers mask by row < n_a.

    ``mxu_ok`` asserts the integer-exactness property of BOTH clouds
    (cloud.Cloud.mxu_exact) so the adaptive path may use MXU distances;
    results are bit-identical either way.
    """
    dtype = ga.points.dtype
    impl0 = _resolve_refine_impl(refine_impl, dtype)
    if impl0 in ("adaptive", "adaptive_interpret") and mxu_ok:
        # The caller escalation ladder maps onto the adaptive knobs: cap
        # bounds the P2 prefix, fallback_tiles the P3 tail-tile budget.
        # Non-gated (float) clouds fall through to the legacy kernels.
        return nn_pruned_adaptive_sorted(
            ga, gb, n_a, exclude_self=exclude_self,
            cap=max(64, cap), ft3=max(64, fallback_tiles // 4),
            interpret=(impl0 == "adaptive_interpret"),
        )
    if impl0 in ("adaptive", "adaptive_interpret"):
        # Non-gated clouds: legacy fixed-cap kernels.
        refine_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    cap = min(cap, ncb)

    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    b_chunks = gb.points.reshape(ncb, CHUNK, 3)
    valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)

    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)

    b_perm_chunks = gb.perm.reshape(ncb, CHUNK)

    impl = _resolve_refine_impl(refine_impl, dtype)
    if impl in ("pallas", "pallas_interpret"):
        import os as _os

        from .refine_pallas import refine_nn_pallas_t

        use_expanded = mxu_ok and _os.environ.get("PCC_NN_EXPANDED") == "1"
        if use_expanded:
            # Augmented rows for the 4-pass expanded-norm distance (see
            # _nn_kernel_t): q=[-2x,-2y,-2z,|q|^2], b=[x,y,z,|b|^2]. Only
            # exact under cloud.mxu_exact (integer coords; every partial
            # sum an exact f32 integer — nonnegative voxel grids in
            # practice). Opt-in: measured NEUTRAL for a->b and ~15% SLOWER
            # for b->a on the 800k bench (the kernel is not bound by the
            # two VPU passes this saves). Queries are padded to whole
            # 8-tile groups (no straight-kernel fallback).
            def aug(pts, neg2):
                sq = jnp.sum(pts * pts, axis=1, keepdims=True)
                head = (-2.0 * pts) if neg2 else pts
                return jnp.pad(
                    jnp.concatenate([head, sq], axis=1), ((0, 0), (0, 4))
                ).T

            q8 = aug(ga.points, True)
            b8r = aug(gb.points, False).T
            qpad = (-nta) % 8
            if qpad:
                q8 = jnp.pad(q8, ((0, 0), (0, qpad * CHUNK)))
        else:
            # qt8 (the only relayout left) is cacheable per cloud: callers
            # that evaluate many pairs against one cloud pass it in.
            q8 = qt8 if qt8 is not None else jnp.pad(
                ga.points, ((0, 0), (0, 5))).T
            # b side: the kernel reads (Pb, 8) rows — the NATURAL padded
            # layout, a cheap pad instead of a ~15 ms 850k-row transpose.
            b8r = jnp.pad(gb.points, ((0, 0), (0, 5)))
        borig_row = gb.perm[None, :]

        def refine(q_tiles, cand, tbases, ncand, batch):
            # Stage-1 only: the full contiguous tile range starting at 0.
            # (lbc is omitted — the in-kernel gate is retired and a full
            # (nta, cap) table would double the SMEM prefetch budget.)
            d, ii = refine_nn_pallas_t(
                q8,
                b8r,
                borig_row,
                cand,
                exclude_self=exclude_self,
                interpret=(impl == "pallas_interpret"),
                expanded=use_expanded,
            )
            return d.reshape(nta, CHUNK), ii.reshape(nta, CHUNK)

        pallas_mode = True
    else:
        pallas_mode = False
        use_expanded = False

    def refine_xla(q_tiles, cand, tbases, ncand, batch):
        """Min + lowest-orig-index argmin over each tile's candidate chunks."""

        def body(args):
            q, cidx, tbase = args
            bt = q.shape[0]
            cand_pts = b_chunks[cidx].reshape(bt, ncand * CHUNK, 3)
            d = _pairwise_sq(q, cand_pts)  # (bt, CHUNK, ncand*CHUNK)
            borig = b_perm_chunks[cidx].reshape(bt, 1, ncand * CHUNK)
            if exclude_self:
                gcol = (cidx[:, :, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32)
                        ).reshape(bt, 1, ncand * CHUNK)
                grow = (tbase[:, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32))[:, :, None]
                d = jnp.where(grow == gcol, jnp.inf, d)
            dmin = jnp.min(d, axis=2)  # (bt, CHUNK)
            at_min = d == dmin[:, :, None]
            gidx = jnp.min(
                jnp.where(at_min, jnp.broadcast_to(borig, d.shape), INT_MAX),
                axis=2,
            )
            return dmin, gidx

        nt = q_tiles.shape[0]
        dm, gi = jax.lax.map(
            body,
            (
                q_tiles.reshape(nt // batch, batch, CHUNK, 3),
                cand.reshape(nt // batch, batch, ncand),
                tbases.reshape(nt // batch, batch),
            ),
        )
        return dm.reshape(nt, CHUNK), gi.reshape(nt, CHUNK)

    if not pallas_mode:
        refine = refine_xla

    # Count-gated two-pass schedule (default on TPU): probe the p1
    # smallest-lb chunks of EVERY tile, derive each tile's certificate
    # count from the probe's ub, then extend each tile IN PLACE to
    # min(count, cap) slots via the kernel's per-tile SMEM gate — no
    # compaction gathers (what sank the bucketed schedule) and the skipped
    # slots cost one scalar compare. Exactness: each tile's final refined
    # set is a prefix of its lb-ascending candidate order wide enough for
    # its final qualifying count, or stage 2 below takes over — the same
    # certificate argument as the fixed schedule.
    # NOTE trace-time reads: these PCC_NN_* env knobs are frozen into the
    # cached executable when this function first traces for a given
    # shape/static signature — flipping them later in the same process
    # silently has no effect (set them before the first call, or use a
    # fresh process). The PCC_KNN_* knobs in knn_pruned.py were hoisted to
    # call-time KnnFlags statics for exactly this reason (ADVICE r4).
    import os as _os2

    counted = (
        pallas_mode
        and not use_expanded
        and cap > 8
        and _os2.environ.get("PCC_NN_SCHED", "counted") == "counted"
    )
    # Fused-prologue mode (PCC_NN_PROLOGUE=select): candidate selection and
    # certificate counts come from ops/select_pallas kernels that never
    # materialise the (nta, ncb) bound matrix — the matrix + lax.top_k grow
    # O(nta*ncb) while refinement work stays flat (tools/profile_counts.py),
    # so at 2M points the prologue dominates. Soundness: stage-1
    # certificates live entirely in the select kernel's rounded-bound space
    # (count_bbox_pallas over-counts it by construction; see
    # select_pallas.count_slack), and stage-2 tiers below are fully
    # self-contained in XLA true-lb space.
    sel_mode = (
        counted
        and _os2.environ.get("PCC_NN_PROLOGUE", "xla") == "select"
    )
    interp = pallas_mode and impl == "pallas_interpret"
    if sel_mode:
        from .select_pallas import count_bbox_pallas, select_bbox_pallas

        cand, _ = select_bbox_pallas(
            a_lo, a_hi, gb.bbox_lo, gb.bbox_hi, cap, interpret=interp)
        lb = None
    else:
        lb = bbox_lower_bounds(
            a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)  # (nta, ncb)
        _, cand = jax.lax.top_k(-lb, cap)  # lb-ascending candidate prefix
        cand = cand.astype(jnp.int32)
    tbases = jnp.arange(nta, dtype=jnp.int32)

    def cert_ub(d):
        ub = jnp.max(jnp.where(valid_t, d, -jnp.inf), axis=1)
        return ub * (1 + 8 * eps) + 8 * eps

    def cert_counts(ub_eff):
        if sel_mode:
            return count_bbox_pallas(
                a_lo, a_hi, gb.bbox_lo, gb.bbox_hi, ub_eff,
                interpret=interp).astype(jnp.int32)
        return jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)

    if counted:
        p1 = int(_os2.environ.get("PCC_NN_P1", "8"))
        p1 = max(1, min(p1, cap - 1))
        qpad = (-nta) % 8  # gated/seeded passes need whole 8-tile groups
        q8c = jnp.pad(q8, ((0, 0), (0, qpad * CHUNK))) if qpad else q8
        d1, i1 = refine_nn_pallas_t(
            q8c, b8r, borig_row, cand[:, :p1],
            exclude_self=exclude_self,
            interpret=(impl == "pallas_interpret"),
        )
        d1 = d1[: nta * CHUNK].reshape(nta, CHUNK)
        i1 = i1[: nta * CHUNK].reshape(nta, CHUNK)
        counts1 = cert_counts(cert_ub(d1))
        ncand2 = jnp.clip(counts1 - p1, 0, cap - p1).astype(jnp.int32)
        # cs=2 batches 2 gated slots per grid step: the extension executes
        # a mean of ~4 of its 24 slots (p50=1, 47% zero at 800k), and each
        # clamped slot still costs ~1 us of per-grid-step overhead — ~9 ms
        # of the 14.5 ms extension pass before batching. cs=4 overruns the
        # 16 MB scoped-VMEM budget (by 64 KB) at 800k shapes.
        ext_cs = int(_os2.environ.get("PCC_NN_EXT_CS", "2"))
        d2, i2 = refine_nn_pallas_t(
            q8c, b8r, borig_row, cand[:, p1:],
            ncand=ncand2,
            exclude_self=exclude_self,
            interpret=(impl == "pallas_interpret"),
            init=(d1, i1), cs=ext_cs,
        )
        dmin = d2[: nta * CHUNK].reshape(nta, CHUNK)
        gidx = i2[: nta * CHUNK].reshape(nta, CHUNK)
    else:
        dmin, gidx = refine(a_tiles, cand, tbases, cap, _pick_batch(nta))

    # ---- stage-1 exactness certificate
    ub_eff = cert_ub(dmin)  # (nta,)
    counts = cert_counts(ub_eff)
    n_over = jnp.sum(counts > cap)

    # ---- stage 2: re-refine the worst tiles (octant-straddling wide-bbox
    # tiles) in two count-matched tiers. One flat tier at cap2=8*cap for all
    # ft tiles paid ~54 ms/pass on the 800k bench — more than stage 1 —
    # although the count distribution (p99 ~ 2-4x cap) needs nothing like
    # 8*cap for most overflowing tiles. Tier A re-refines the top-ft by
    # count at 4*cap; tier B re-refines the top few (ft//8) at 16*cap.
    # Exactness: every over-cap tile lands in tier A when n_over <= ft
    # (same top-k ordering); a tile is final only under a passing
    # certificate at its refined width, tier-B tiles included, else
    # overflow is set and callers escalate. Re-solving an already-exact
    # tile reproduces its result exactly.
    ft = min(fallback_tiles, nta)
    cap2a = min(max(4 * cap, 128), ncb)
    # Tier-B width scales with the search cloud: at 2M points (ncb=8192)
    # a handful of wide-bbox tiles legitimately qualify >1300 chunks and a
    # flat 512 ceiling forced the WHOLE ladder to escalate to cap=128
    # (bench 13.8 -> 7.3 Mpts/s). The wider tier is count-gated + seeded,
    # so its extra slots are clamped index-map no-ops for certified tiles.
    cap2b = min(max(16 * cap, 512, ncb // 4), ncb)
    dmin = dmin.reshape(nta * CHUNK)
    gidx = gidx.reshape(nta * CHUNK).astype(jnp.int32)
    overflow = n_over > ft

    def scatter_rows(dst_d, dst_i, tiles, src_d, src_i, nt):
        rows = (tiles[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(nt * CHUNK)
        return (dst_d.at[rows].set(src_d.reshape(nt * CHUNK)),
                dst_i.at[rows].set(src_i.reshape(nt * CHUNK)))

    def recount(tiles, d_ref, tlb):
        tvalid = valid_t[tiles]
        ub_t = jnp.max(jnp.where(tvalid, d_ref, -jnp.inf), axis=1)
        ub_t_eff = ub_t * (1 + 8 * eps) + 8 * eps
        return jnp.sum(tlb <= ub_t_eff[:, None], axis=1)

    def refine_tier(otiles, ocand, nt, cap2, ncand=None, init=None):
        """Re-refine a compacted tile set. When the stage-1 path is pallas
        and exclude_self is False (the cross-NN case — the kernel then never
        consults global row ids), gather the failed tiles' query columns
        into a contiguous layout and re-run the PALLAS kernel (the same
        trick that took knn_pruned's stage 2 from 4.5 s to ~70 ms);
        otherwise the XLA refine. ``ncand``/``init`` plumb the per-tile SMEM
        count gate + seed through (pallas path only)."""
        if impl in ("pallas", "pallas_interpret") and not exclude_self:
            nt_pad = ((nt + 7) // 8) * 8
            if nt_pad != nt:
                otiles_p = jnp.concatenate(
                    [otiles, jnp.broadcast_to(otiles[-1:], (nt_pad - nt,))])
                ocand_p = jnp.concatenate(
                    [ocand,
                     jnp.broadcast_to(ocand[-1:],
                                      (nt_pad - nt, ocand.shape[1]))])
                if ncand is not None:
                    ncand = jnp.concatenate(
                        [ncand, jnp.zeros((nt_pad - nt,), jnp.int32)])
                if init is not None:
                    init = (
                        jnp.concatenate(
                            [init[0], jnp.full((nt_pad - nt, CHUNK),
                                               jnp.inf, jnp.float32)]),
                        jnp.concatenate(
                            [init[1], jnp.full((nt_pad - nt, CHUNK),
                                               INT_MAX, jnp.int32)]),
                    )
            else:
                otiles_p, ocand_p = otiles, ocand
            cols = (otiles_p[:, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(-1)
            q8_o = jnp.take(q8, cols, axis=1)
            fd, fi = refine_nn_pallas_t(
                q8_o, b8r, gb.perm[None, :], ocand_p,
                ncand=ncand, init=init,
                exclude_self=False,
                interpret=(impl == "pallas_interpret"),
                expanded=use_expanded,
                cs=2,  # tier calls are always count-gated
            )
            return (fd.reshape(nt_pad, CHUNK)[:nt],
                    fi.reshape(nt_pad, CHUNK)[:nt])
        return refine_xla(a_tiles[otiles], ocand, otiles, cap2,
                          _pick_batch(nt, 4))

    # The tiers run at static shapes whether or not any tile actually failed
    # its certificate (usually none do), so on the pallas path they are
    # count-gated exactly like stage 1: each compacted tile is SEEDED with
    # its current rows and executes only its extension slots beyond the
    # already-refined lb-prefix — zero for certified tiles, whose clamped
    # slots cost one SMEM compare each (measured ~18 ms/direction ungated
    # at ft=256). Soundness of the narrower tier width: the tier candidate
    # table is the same deterministic lb-ascending top_k, so its first
    # ``cap`` columns ARE the stage-1 candidates (prefix property), and a
    # tile refined to width w = min(count, cap2) certifies automatically
    # when count <= cap2 because its recount can only shrink.
    gate_tiers = (
        impl in ("pallas", "pallas_interpret") and not exclude_self
    )

    def tier_rows(tiles, nt):
        return (tiles[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32))

    if ft > 0 and cap2a > cap:
        _, otiles = jax.lax.top_k(counts, ft)
        otiles = otiles.astype(jnp.int32)
        if sel_mode:
            # Tiers are fully self-contained in XLA true-lb space: the
            # (ft, ncb) bound slice is recomputed for the compacted tiles
            # only, the tier refines the FULL lb-ascending prefix (the
            # stage-1-prefix-skipping trick needs the tier table to share
            # stage 1's candidate order, which does not survive the select
            # kernel's rounding), and the certificate recount uses the
            # same XLA bounds. Seeding from the stage-1 rows stays exact:
            # extra refined chunks only lower distances.
            olb = bbox_lower_bounds(
                a_lo[otiles], a_hi[otiles], gb.bbox_lo, gb.bbox_hi)
        else:
            olb = lb[otiles]
        _, ocand = jax.lax.top_k(-olb, cap2a)
        ocand = ocand.astype(jnp.int32)
        if gate_tiers:
            rows_a = tier_rows(otiles, ft)
            if sel_mode:
                # Gate on the XLA-space qualifying count at the current
                # (post-stage-1) threshold: the post-refine recount can
                # only shrink, so counts2a <= min(counts_x, cap2a) = the
                # refined width whenever counts2a <= cap2a.
                counts_x = jnp.sum(
                    olb <= ub_eff[otiles][:, None], axis=1
                ).astype(jnp.int32)
                ncand_a = jnp.where(
                    counts[otiles] > cap,
                    jnp.minimum(counts_x, cap2a), 0).astype(jnp.int32)
                fb_d, fb_i = refine_tier(
                    otiles, ocand, ft, cap2a,
                    ncand=ncand_a, init=(dmin[rows_a], gidx[rows_a]),
                )
            else:
                oc_a = counts[otiles]
                ncand_a = jnp.where(
                    oc_a > cap, jnp.minimum(oc_a, cap2a) - cap, 0
                ).astype(jnp.int32)
                fb_d, fb_i = refine_tier(
                    otiles, ocand[:, cap:], ft, cap2a - cap,
                    ncand=ncand_a, init=(dmin[rows_a], gidx[rows_a]),
                )
        else:
            fb_d, fb_i = refine_tier(otiles, ocand, ft, cap2a)
        counts2a = recount(otiles, fb_d, olb)
        dmin, gidx = scatter_rows(dmin, gidx, otiles, fb_d, fb_i, ft)

        ft2 = min(max(ft // 8, 16), ft)
        if cap2b > cap2a:
            # Tier B: the few tiles whose qualifying set exceeds tier A's
            # width (counts measured against tier-A results are sound:
            # ub only shrinks with more refinement).
            need_b = jnp.where(counts2a > cap2a, counts2a, 0)
            overflow = overflow | (jnp.sum(need_b > 0) > ft2)
            _, bsel = jax.lax.top_k(need_b, ft2)
            btiles = otiles[bsel]
            blb = olb[bsel]
            _, bcand = jax.lax.top_k(-blb, cap2b)
            bcand = bcand.astype(jnp.int32)
            if gate_tiers:
                rows_b = tier_rows(btiles, ft2)
                nb = need_b[bsel]
                if sel_mode:
                    # Full-prefix tier, same argument as tier A: nb is the
                    # XLA-space qualifying count at the post-tier-A
                    # threshold, and counts2b can only shrink from it.
                    ncand_b = jnp.where(
                        nb > 0, jnp.minimum(nb, cap2b), 0
                    ).astype(jnp.int32)
                    bb_d, bb_i = refine_tier(
                        btiles, bcand, ft2, cap2b,
                        ncand=ncand_b, init=(dmin[rows_b], gidx[rows_b]),
                    )
                else:
                    ncand_b = jnp.where(
                        nb > 0, jnp.minimum(nb, cap2b) - cap2a, 0
                    ).astype(jnp.int32)
                    bb_d, bb_i = refine_tier(
                        btiles, bcand[:, cap2a:], ft2, cap2b - cap2a,
                        ncand=ncand_b, init=(dmin[rows_b], gidx[rows_b]),
                    )
            else:
                bb_d, bb_i = refine_tier(btiles, bcand, ft2, cap2b)
            counts2b = recount(btiles, bb_d, blb)
            overflow = overflow | jnp.any(counts2b > cap2b)
            dmin, gidx = scatter_rows(dmin, gidx, btiles, bb_d, bb_i, ft2)
        else:
            overflow = overflow | jnp.any(counts2a > cap2a)

    return dmin, gidx, overflow


@functools.partial(
    jax.jit,
    static_argnames=("exclude_self", "cap", "fallback_tiles"),
)
def _nn_pruned_jit(
    a_points, b_points, n_a, n_b, exclude_self, cap, fallback_tiles=128
):
    ga = build_grid(a_points, n_a)
    gb = ga if exclude_self else build_grid(b_points, n_b)
    d_s, i_s, overflow = nn_pruned_sorted(
        ga, gb, n_a, exclude_self=exclude_self, cap=cap,
        fallback_tiles=fallback_tiles,
    )
    d, idx = unsort_nn_result(ga, gb, d_s, i_s)
    return idx, d, overflow


def unsort_nn_result(
    ga: ChunkGrid, gb: ChunkGrid, d_sorted: jnp.ndarray, i_sorted: jnp.ndarray
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Map sorted-query-order (dist, orig-b-idx) back to original row order."""
    p = d_sorted.shape[0]
    inv = jnp.zeros(p, jnp.int32).at[ga.perm].set(
        jnp.arange(p, dtype=jnp.int32)
    )
    d = jnp.take(d_sorted, inv)
    idx = jnp.take(i_sorted, inv)
    return d, idx


def nn_pruned_with_grids(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: typing.Union[int, jnp.ndarray],
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Pruned 1-NN over prebuilt grids, ORIGINAL order, with escalation.

    Building the grids once per cloud (CloudPair caches them) amortises the
    Morton sort across all NN passes of a metric evaluation.
    """
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    while True:
        d_s, i_s, overflow = nn_pruned_sorted(
            ga, gb, jnp.asarray(n_a), exclude_self=exclude_self, cap=cap,
            fallback_tiles=fallback_tiles,
        )
        # Exact iff the certificate passed, or stage 1 already refined every
        # chunk (cap >= ncb forces counts <= cap, so overflow is then
        # impossible — the second test is a belt-and-braces terminator).
        if not bool(overflow) or cap >= ncb:
            d, idx = unsort_nn_result(ga, gb, d_s, i_s)
            return idx, d
        cap, fallback_tiles = next_rung(cap, fallback_tiles, ncb, nta)


# Rungs go through utils.cache.ladder_lookup/ladder_store so one
# pathological pair cannot pin the expensive rung forever (periodic
# base-rung retry), matching normals.py / fused.py.
_ESCALATION_MEMO: dict = {}


def nn_pruned(
    a_points: jnp.ndarray,
    b_points: jnp.ndarray,
    n_a: typing.Union[int, jnp.ndarray],
    n_b: typing.Union[int, jnp.ndarray],
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact pruned 1-NN in ORIGINAL row order with automatic escalation.

    Returns ``(idx int32 (Pa,), dist_sq (Pa,))``. Exact whenever the
    certificate passes; otherwise both cap and budget escalate x4 until the
    stage-1 cap covers every search chunk (genuine brute force, where the
    certificate cannot fail). The working level is remembered per problem
    shape, so repeat calls skip the overflowing levels.
    """
    nta = a_points.shape[0] // CHUNK
    ncb = b_points.shape[0] // CHUNK
    key = (a_points.shape[0], b_points.shape[0], exclude_self)
    from ..utils.cache import ladder_lookup, ladder_store

    cap, fallback_tiles = ladder_lookup(
        _ESCALATION_MEMO, key, (cap, fallback_tiles))
    while True:
        idx, d, overflow = _nn_pruned_jit(
            a_points, b_points, jnp.asarray(n_a), jnp.asarray(n_b),
            exclude_self, cap, fallback_tiles=fallback_tiles,
        )
        if not bool(overflow) or cap >= ncb:
            ladder_store(_ESCALATION_MEMO, key,
                         (cap, fallback_tiles))
            return idx, d
        cap, fallback_tiles = next_rung(cap, fallback_tiles, ncb, nta)


@functools.partial(
    jax.jit, static_argnames=("exclude_self", "cap", "fallback_tiles")
)
def nn_pruned_sorted_payload(
    ga: ChunkGrid,
    gb: ChunkGrid,
    payT_sorted: jnp.ndarray,  # (PAYLOAD_F, Pb) packed sorted-order payload
    pay_orig: jnp.ndarray,  # (Pb, PAYLOAD_F) same payload, original order
    n_a: jnp.ndarray,
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
):
    """nn_pruned_sorted + the winning neighbour's payload, via the in-kernel
    one-hot selection (TPU float32 only; see refine_pallas.PAYLOAD_F).

    Returns ``(dist_sq, idx_orig, payload (Pa, PAYLOAD_F), overflow)``.
    """
    from .refine_pallas import refine_nn_pallas_payload

    dtype = ga.points.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    cap = min(cap, ncb)

    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    b_chunks = gb.points.reshape(ncb, CHUNK, 3)
    valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)

    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
    lb = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)

    _, cand = jax.lax.top_k(-lb, cap)
    cand = cand.astype(jnp.int32)

    qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
    bt8 = qt8 if gb is ga else jnp.pad(gb.points, ((0, 0), (0, 5))).T
    dmin, gidx, pay = refine_nn_pallas_payload(
        qt8, bt8, gb.perm[None, :], payT_sorted, cand,
        exclude_self=exclude_self,
    )
    dmin = dmin.reshape(nta, CHUNK)

    # certificate + stage-2 re-refine (XLA path; payload patched by gather —
    # only fallback_tiles*CHUNK rows)
    ub = jnp.max(jnp.where(valid_t, dmin, -jnp.inf), axis=1)
    ub_eff = ub * (1 + 8 * eps) + 8 * eps
    counts = jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)
    n_over = jnp.sum(counts > cap)

    ft = min(fallback_tiles, nta)
    cap2 = min(max(8 * cap, 512), ncb)
    dmin = dmin.reshape(nta * CHUNK)
    overflow = n_over > ft
    if ft > 0 and cap2 > cap:
        b_perm_chunks = gb.perm.reshape(ncb, CHUNK)
        _, otiles = jax.lax.top_k(counts, ft)
        otiles = otiles.astype(jnp.int32)
        oq = a_tiles[otiles]
        olb = lb[otiles]
        _, ocand = jax.lax.top_k(-olb, cap2)
        ocand = ocand.astype(jnp.int32)

        def refine2(args):
            q, cidx, tbase = args
            bt = q.shape[0]
            cand_pts = b_chunks[cidx].reshape(bt, cap2 * CHUNK, 3)
            d = _pairwise_sq(q, cand_pts)
            borig = b_perm_chunks[cidx].reshape(bt, 1, cap2 * CHUNK)
            if exclude_self:
                gcol = (cidx[:, :, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32)
                        ).reshape(bt, 1, cap2 * CHUNK)
                grow = (tbase[:, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32))[:, :, None]
                d = jnp.where(grow == gcol, jnp.inf, d)
            dm = jnp.min(d, axis=2)
            at_min = d == dm[:, :, None]
            gi = jnp.min(
                jnp.where(at_min, jnp.broadcast_to(borig, d.shape), INT_MAX),
                axis=2,
            )
            return dm, gi

        b2 = _pick_batch(ft, 4)
        fb_d, fb_i = jax.lax.map(
            refine2,
            (
                oq.reshape(ft // b2, b2, CHUNK, 3),
                ocand.reshape(ft // b2, b2, cap2),
                otiles.reshape(ft // b2, b2),
            ),
        )
        fb_d = fb_d.reshape(ft, CHUNK)
        fb_i = fb_i.reshape(ft, CHUNK)
        ovalid = valid_t[otiles]
        ub2 = jnp.max(jnp.where(ovalid, fb_d, -jnp.inf), axis=1)
        ub2_eff = ub2 * (1 + 8 * eps) + 8 * eps
        counts2 = jnp.sum(olb <= ub2_eff[:, None], axis=1)
        overflow = overflow | jnp.any(counts2 > cap2)
        orows = (otiles[:, None] * CHUNK
                 + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(ft * CHUNK)
        fb_pay = jnp.take(pay_orig, fb_i.reshape(ft * CHUNK), axis=0,
                          mode="clip")
        dmin = dmin.at[orows].set(fb_d.reshape(ft * CHUNK))
        gidx = gidx.at[orows].set(fb_i.reshape(ft * CHUNK))
        pay = pay.at[orows].set(fb_pay)

    return dmin, gidx, pay, overflow


@functools.partial(
    jax.jit,
    static_argnames=("p1", "b1_extra", "interpret", "mxu_ok"),
)
def nn_pruned_bucketed_sorted(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: jnp.ndarray,
    p1: int = 8,
    b1_extra: int = 40,
    interpret: bool = False,
    mxu_ok: bool = False,
    qt8: typing.Optional[jnp.ndarray] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Certificate-bucketed 1-NN: probe + seeded escalation (cross-NN only).

    Same contract as nn_pruned_sorted. The fixed-cap schedule refines 32
    chunks for every tile although the mean qualifying count is 11-19; this
    schedule probes ``p1`` chunks for ALL tiles, then re-refines only the
    tiles whose certificate demands more, SEEDED from the probe so the
    extra pass executes candidate slots [p1, p1+b1_extra) instead of
    starting over — total work tracks the qualifying-count distribution
    instead of the worst case. Tiles still over p1+b1_extra fall through
    to the same from-scratch count-matched tiers as the fixed schedule.

    Exactness: each tile's final refined set is a prefix of its
    lb-ascending candidate order; a tile is final only when its qualifying
    count (vs the post-refine ub) fits that prefix, else a wider tier or
    the overflow flag takes over — the identical certificate argument as
    nn_pruned_sorted. Self-NN is not supported here (the compacted pass
    drops global row identity); callers keep the fixed schedule for it.
    """
    from .refine_pallas import refine_nn_pallas_t

    dtype = ga.points.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    p1 = min(p1, ncb)
    w1 = min(p1 + b1_extra, ncb)

    valid_t, lb = _tile_lower_bounds(ga, gb, n_a, nta)
    _, cand = jax.lax.top_k(-lb, w1)
    cand = cand.astype(jnp.int32)

    q8 = qt8 if qt8 is not None else jnp.pad(
        ga.points, ((0, 0), (0, 5))).T
    qpad = (-nta) % 8
    if qpad:  # seeded compacted groups need whole 8-tile groups
        q8 = jnp.pad(q8, ((0, 0), (0, qpad * CHUNK)))
    b8r = jnp.pad(gb.points, ((0, 0), (0, 5)))
    borig_row = gb.perm[None, :]

    # P1: probe the p1 lowest-lb chunks of every tile.
    d1, i1 = refine_nn_pallas_t(
        q8, b8r, borig_row, cand[:, :p1], interpret=interpret)
    d1 = d1[: nta * CHUNK].reshape(nta, CHUNK)
    i1 = i1[: nta * CHUNK].reshape(nta, CHUNK)
    counts1 = _ub_counts(d1, valid_t, lb, eps)

    def compact_seeded(dcur, icur, tiles, tcand, nt):
        """Seeded refine of ``tiles`` against their ``tcand`` slots."""
        nt_pad = ((nt + 7) // 8) * 8
        if nt_pad != nt:
            tiles_p = jnp.concatenate(
                [tiles, jnp.broadcast_to(tiles[-1:], (nt_pad - nt,))])
            tcand_p = jnp.concatenate(
                [tcand, jnp.broadcast_to(tcand[-1:],
                                         (nt_pad - nt, tcand.shape[1]))])
        else:
            tiles_p, tcand_p = tiles, tcand
        cols = (tiles_p[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(-1)
        q8_o = jnp.take(q8, cols, axis=1)
        fd, fi = refine_nn_pallas_t(
            q8_o, b8r, borig_row, tcand_p,
            interpret=interpret,
            init=(dcur[tiles_p], icur[tiles_p]),
        )
        return (fd.reshape(nt_pad, CHUNK)[:nt],
                fi.reshape(nt_pad, CHUNK)[:nt])

    def scatter(dd, ii_, tiles, fd, fi, nt):
        rows = (tiles[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(nt * CHUNK)
        return (dd.reshape(nta * CHUNK).at[rows].set(
                    fd.reshape(nt * CHUNK)).reshape(nta, CHUNK),
                ii_.reshape(nta * CHUNK).at[rows].set(
                    fi.reshape(nt * CHUNK)).reshape(nta, CHUNK))

    # B1: tiles whose qualifying count exceeds the probe, seeded, slots
    # [p1, w1). Budget 5/8 of the tiles (overflow -> caller falls back to
    # the fixed schedule; count distributions with need-fractions beyond
    # that are where fixed-cap is the better schedule anyway).
    overflow = jnp.asarray(False)
    if w1 > p1:
        ftb = max(8, (5 * nta // 8 + 7) // 8 * 8)
        ftb = min(ftb, nta)
        need1 = counts1 > p1
        overflow = overflow | (jnp.sum(need1) > ftb)
        _, btiles = jax.lax.top_k(jnp.where(need1, counts1, 0), ftb)
        btiles = btiles.astype(jnp.int32)
        db, ib = compact_seeded(d1, i1, btiles, cand[btiles, p1:w1], ftb)
        d1, i1 = scatter(d1, i1, btiles, db, ib, ftb)
        counts1 = _ub_counts(d1, valid_t, lb, eps)

    # Tiers: from-scratch count-matched re-refines for the heavy tail,
    # exactly like nn_pruned_sorted's stage 2 (certificate per tier).
    dflat = d1.reshape(nta * CHUNK)
    iflat = i1.reshape(nta * CHUNK).astype(jnp.int32)
    cap2a = min(max(4 * w1, 192), ncb)
    cap2b = min(512, ncb)
    ft = min(256, nta)
    need_a = counts1 > w1
    overflow = overflow | (jnp.sum(need_a) > ft)
    if cap2a > w1 and ft > 0:
        _, otiles = jax.lax.top_k(jnp.where(need_a, counts1, 0), ft)
        otiles = otiles.astype(jnp.int32)
        _, ocand = jax.lax.top_k(-lb[otiles], cap2a)
        fd, fi = compact_seeded(d1, i1, otiles, ocand.astype(jnp.int32), ft)
        # Seeding tier A is exact: its candidate set (the top-cap2a lb
        # prefix) is a superset of every earlier refined slot, so the
        # final refined set is still one lb-ascending prefix.
        counts2a = _ub_counts(fd, valid_t[otiles], lb[otiles], eps)
        d1, i1 = scatter(d1, i1, otiles, fd, fi, ft)
        if cap2b > cap2a:
            ft2 = min(32, ft)
            need_b = jnp.where(counts2a > cap2a, counts2a, 0)
            overflow = overflow | (jnp.sum(need_b > 0) > ft2)
            _, bsel = jax.lax.top_k(need_b, ft2)
            b2tiles = otiles[bsel]
            _, bcand = jax.lax.top_k(-lb[b2tiles], cap2b)
            fd2, fi2 = compact_seeded(d1, i1, b2tiles,
                                      bcand.astype(jnp.int32), ft2)
            counts2b = _ub_counts(fd2, valid_t[b2tiles], lb[b2tiles], eps)
            overflow = overflow | jnp.any(counts2b > cap2b)
            d1, i1 = scatter(d1, i1, b2tiles, fd2, fi2, ft2)
        else:
            overflow = overflow | jnp.any(counts2a > cap2a)
        dflat = d1.reshape(nta * CHUNK)
        iflat = i1.reshape(nta * CHUNK).astype(jnp.int32)

    return dflat, iflat, overflow
