"""Bound-pruned exact k-NN over Morton chunk grids (normal estimation at scale).

Same structure as ops/nn_pruned.py with a k-best selection: each 256-query
tile refines its ``cap`` lowest-lower-bound chunks with ``lax.top_k``, then
certifies itself with ub = max over valid queries of the k-th refined
distance. Tiles failing the certificate are re-solved exactly by a running
top-k merge over ALL chunks (budgeted fallback + escalation, like 1-NN).

Replaces the reference's per-point 30-NN FLANN queries inside
``estimate_normals`` (reference: open_pcc_metric/cloud_pair.py:61-64) for
large clouds; returns ORIGINAL indices sorted ascending by distance.

Tie-breaking is lowest ORIGINAL index, exactly like the 1-NN paths: every
chunk that can TIE a query's k-th distance is both visited (its lb qualifies
under the certificate) and merged (the kernels' merge gate is non-strict),
so the selected k-set is the lexicographic (distance, original index) k-best
and all k-NN backends are bit-interchangeable — including on integer voxel
lattices where exact ties are common (regression: TestKnnMoments).
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp

from .grid import CHUNK, ChunkGrid, bbox_lower_bounds, build_grid
from .nn_pruned import _pairwise_sq, _pick_batch
from ..utils.cache import next_rung


def _resolve_refine_impl(impl: str, dtype) -> str:
    if impl != "auto":
        return impl
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return "pallas"
    return "xla"


class KnnFlags(typing.NamedTuple):
    """PCC_KNN_* schedule knobs, resolved OUTSIDE the jitted body.

    One hashable static argument: a changed knob is a new static signature
    and forces a retrace. (Env vars used to be read inside the jitted
    function, which froze their trace-time values into the cached
    executable — flag flips silently no-oped once a trace existed, and a
    round-4 equality test compared a cached trace to itself. ADVICE r4.)
    """

    sched: str = "counted"
    p1: int = 8
    ext_cs: int = 1
    ext_slice: int = 512
    ext_sorted: bool = False
    mom_sorted: bool = True
    ext_e1: int = 0
    ext_fte: int = 0
    prologue: str = "xla"


def knn_flags_from_env() -> KnnFlags:
    """Resolve the PCC_KNN_* tuning knobs from the environment NOW.

    Call-time resolution: public entry points (knn_pruned_sorted wrapper,
    knn_pruned, estimate_normals_cloud, the fused cold fold) call this per
    invocation, so env changes take effect on the next CALL. Code composing
    the traceable internals directly must pass a KnnFlags explicitly.
    """
    import os

    return KnnFlags(
        sched=os.environ.get("PCC_KNN_SCHED", "counted"),
        p1=int(os.environ.get("PCC_KNN_P1", "8")),
        ext_cs=int(os.environ.get("PCC_KNN_CS", "1")),
        ext_slice=max(
            8, int(os.environ.get("PCC_KNN_EXT_SLICE", "512")) // 8 * 8),
        ext_sorted=os.environ.get("PCC_KNN_EXT_SORTED", "0") == "1",
        mom_sorted=os.environ.get("PCC_KNN_MOM_SORTED", "1") == "1",
        ext_e1=int(os.environ.get("PCC_KNN_EXT_E1", "0")),
        ext_fte=int(os.environ.get("PCC_KNN_EXT_FTE", "0")),
        prologue=os.environ.get("PCC_KNN_PROLOGUE", "xla"),
    )


def _ext_sorted_slices(qt8, b8r, perm_row, cand_ext, ncand2, k, init,
                       interp, slice_tiles=512, widths=(4, 8, 16, 32)):
    """Need-sorted sliced k-NN extension: clamp overhead scales with the
    slice max, not the global cap.

    The rectangular count-gated extension visits ``cap - p1`` candidate
    slots for EVERY tile and pays ~0.5 us per clamped tile-visit even when
    the gate skips it (measured: 95 ms of a 171 ms extension at 800k,
    mean live need 14.3 of 56). Tiles with large needs are scattered, not
    Morton-clustered (group-of-8 max need: mean 37.9/56), so group-level
    compaction saves little. Instead: gather tiles in DESCENDING extension
    need, cut the sorted order into static ``slice_tiles`` slices, and run
    each slice through the unchanged gated kernel at the narrowest WIDTH
    from ``widths + (capext,)`` that covers the slice's max need
    (lax.switch) — sound by construction, bit-identical results (same
    per-tile candidate order, same seeds; tiles are independent).
    Sorted-descending slices are need-homogeneous, so executed slots track
    each tile's true need instead of the global worst case.

    MEASURED A WASH for the k=30 extension (r4, 800k, cap 64):
    189.7 ms vs 177.7 rectangular — the (P, k) init gather + output
    scatter-back (~400 MB of HBM traffic) eats the ~45 ms clamp saving.
    Kept behind PCC_KNN_EXT_SORTED=1 (default off) because it is exact and
    tested; the MOMENTS variant below has no k-wide init/output (~70 MB
    moved) and does win — see _mom_sorted_slices.
    """
    from .refine_pallas import refine_knn_pallas_t

    nta, capext = cand_ext.shape
    d1, i1 = init
    order = jnp.argsort(-ncand2).astype(jnp.int32)
    npad = (-nta) % slice_tiles
    order_p = (jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (npad,))]) if npad else order)
    nta_p = nta + npad
    # Padding duplicates the lowest-need tile with need forced to 0: its
    # output rows equal the seed and are dropped before the scatter-back.
    nc_s = jnp.where(jnp.arange(nta_p) < nta, ncand2[order_p], 0)
    cand_s = cand_ext[order_p]
    qt_s = jnp.take(
        qt8.reshape(8, nta, CHUNK), order_p, axis=1
    ).reshape(8, nta_p * CHUNK)
    d1_s = jnp.take(d1.reshape(nta, CHUNK, k), order_p, axis=0)
    i1_s = jnp.take(i1.reshape(nta, CHUNK, k), order_p, axis=0)

    ws = [w for w in widths if w < capext] + [capext]
    ws_arr = jnp.asarray(ws, jnp.int32)
    outs_d, outs_i = [], []
    for s0 in range(0, nta_p, slice_tiles):
        sl = slice(s0, s0 + slice_tiles)
        nc_sl = nc_s[sl]
        cand_sl = cand_s[sl]
        qs = jax.lax.slice_in_dim(
            qt_s, s0 * CHUNK, (s0 + slice_tiles) * CHUNK, axis=1)
        ds = d1_s[sl].reshape(slice_tiles * CHUNK, k)
        is_ = i1_s[sl].reshape(slice_tiles * CHUNK, k)

        def mk(w):
            def br(qs=qs, cand_sl=cand_sl, nc_sl=nc_sl, ds=ds, is_=is_, w=w):
                return refine_knn_pallas_t(
                    qs, b8r, perm_row, cand_sl[:, :w], k,
                    ncand=jnp.minimum(nc_sl, w),
                    init=(ds, is_), interpret=interp,
                )
            return br

        widx = jnp.searchsorted(ws_arr, jnp.max(nc_sl), side="left")
        fd, fi = jax.lax.switch(widx, [mk(w) for w in ws])
        outs_d.append(fd)
        outs_i.append(fi)

    fd_all = jnp.concatenate(outs_d).reshape(nta_p, CHUNK, k)[:nta]
    fi_all = jnp.concatenate(outs_i).reshape(nta_p, CHUNK, k)[:nta]
    dk = jnp.zeros((nta, CHUNK, k), fd_all.dtype).at[order].set(fd_all)
    ik = jnp.zeros((nta, CHUNK, k), fi_all.dtype).at[order].set(fi_all)
    return dk.reshape(nta * CHUNK, k), ik.reshape(nta * CHUNK, k)


def _mom_sorted_slices(qt8, b8r, perm_row, cand, nc1, rk, ik, interp,
                       slice_tiles=512, widths=(8, 16, 32)):
    """Need-sorted sliced moments sweep (see _ext_sorted_slices).

    The count-gated moments pass pays the same per-clamped-visit overhead
    as the k-NN extension over a full ``cap``-wide grid (measured 95 ms at
    800k for mean live need 20.6 of 64). Same compaction: tiles gathered
    in descending certificate count, static slices, per-slice width from
    the ladder via lax.switch. Sound for the accumulating kernel because
    the chosen width always covers the slice max — no member chunk is
    dropped and no chunk is visited twice.
    """
    from .refine_pallas import moments_pallas_t, MOM_CH

    nta, cap = cand.shape
    order = jnp.argsort(-nc1).astype(jnp.int32)
    npad = (-nta) % slice_tiles
    order_p = (jnp.concatenate(
        [order, jnp.broadcast_to(order[-1:], (npad,))]) if npad else order)
    nta_p = nta + npad
    nc_s = jnp.where(jnp.arange(nta_p) < nta, nc1[order_p], 0)
    cand_s = cand[order_p]
    qt_s = jnp.take(
        qt8.reshape(8, nta, CHUNK), order_p, axis=1
    ).reshape(8, nta_p * CHUNK)
    rk_s = jnp.take(rk, order_p, axis=0)
    ik_s = jnp.take(ik, order_p, axis=0)

    ws = [w for w in widths if w < cap] + [cap]
    ws_arr = jnp.asarray(ws, jnp.int32)
    outs = []
    for s0 in range(0, nta_p, slice_tiles):
        sl = slice(s0, s0 + slice_tiles)
        nc_sl = nc_s[sl]
        cand_sl = cand_s[sl]
        qs = jax.lax.slice_in_dim(
            qt_s, s0 * CHUNK, (s0 + slice_tiles) * CHUNK, axis=1)
        rk_sl = rk_s[sl]
        ik_sl = ik_s[sl]

        def mk(w):
            def br(qs=qs, cand_sl=cand_sl, nc_sl=nc_sl, rk_sl=rk_sl,
                   ik_sl=ik_sl, w=w):
                return moments_pallas_t(
                    qs, b8r, perm_row, cand_sl[:, :w],
                    jnp.minimum(nc_sl, w), rk_sl, ik_sl, interpret=interp,
                )
            return br

        widx = jnp.searchsorted(ws_arr, jnp.max(nc_sl), side="left")
        outs.append(jax.lax.switch(widx, [mk(w) for w in ws]))

    mom_all = jnp.concatenate(outs).reshape(nta_p, CHUNK, MOM_CH)[:nta]
    mom = jnp.zeros((nta, CHUNK, MOM_CH), mom_all.dtype).at[order].set(
        mom_all)
    return mom.reshape(nta * CHUNK, MOM_CH)


def _ext_two_level(qt8, b8r, perm_row, cand, p1, e1, ncand2, k, init,
                   interp, fte):
    """Two-level count-gated k-NN extension (VERDICT r4 item 1b).

    The rectangular gated extension carries a clamped-grid floor
    proportional to its full width ``cap - p1`` for EVERY tile (~0.5 us
    per clamped tile-visit; measured 95.2 ms of a 171.5 ms extension at
    800k for a mean live need of 14.3 of 56 slots). Split it:

      level 1 — in-place extension of ``e1`` slots for all tiles (floor
        scales with ``e1``, and e1 covers the need of most tiles);
      level 2 — the few tiles whose certificate need exceeds ``p1 + e1``
        are COMPACTED (queries + seed k-buffers gathered into a
        contiguous ``fte``-tile layout, like the stage-2 tiers) and
        extended through the remaining ``cap - p1 - e1`` candidate
        columns, then scattered back.

    Unlike _ext_sorted_slices (a measured wash: it relayouts every
    tile's (P, k) seed/output, ~400 MB of HBM traffic), only exceeding
    tiles move here. Exactness NEVER rests on the ``fte`` budget: if
    more than ``fte`` tiles exceed level 1, a lax.cond falls back to
    finishing the extension rectangularly for all tiles — bit-identical
    (same per-tile candidate order; the k-merge keeps the lexicographic
    (d, original id) k-best, which is visit-order independent).

    Compaction requires the kernel to never consult global query rows,
    so callers must keep exclude_self=False (the normals path).
    """
    from .refine_pallas import refine_knn_pallas_t

    nta, cap = cand.shape
    # ---- level 1: in-place e1-slot gated extension, all tiles
    d_e, i_e = refine_knn_pallas_t(
        qt8, b8r, perm_row, cand[:, p1:p1 + e1], k,
        ncand=jnp.minimum(ncand2, e1), init=init, interpret=interp,
    )
    need = jnp.maximum(ncand2 - e1, 0)
    n_exceed = jnp.sum(need > 0)

    def tier(_):
        _, sel = jax.lax.top_k(need, fte)
        sel = sel.astype(jnp.int32)
        rows = (sel[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(fte * CHUNK)
        qt8_o = jnp.take(qt8, rows, axis=1)
        nc_t = jnp.minimum(need[sel], cap - p1 - e1).astype(jnp.int32)
        fd, fi = refine_knn_pallas_t(
            qt8_o, b8r, perm_row, cand[sel, p1 + e1:], k,
            ncand=nc_t, init=(d_e[rows], i_e[rows]), interpret=interp,
        )
        return d_e.at[rows].set(fd), i_e.at[rows].set(fi)

    def rect_rest(_):
        return refine_knn_pallas_t(
            qt8, b8r, perm_row, cand[:, p1 + e1:], k,
            ncand=jnp.minimum(need, cap - p1 - e1).astype(jnp.int32),
            init=(d_e, i_e), interpret=interp,
        )

    return jax.lax.cond(n_exceed <= fte, tier, rect_rest, operand=None)


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "cap", "fallback_tiles",
                     "refine_impl", "with_moments", "flags"),
)
def _knn_sorted_impl(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
    refine_impl: str = "auto",
    with_moments: bool = False,
    flags: KnnFlags = KnnFlags(),
) -> typing.Tuple[jnp.ndarray, ...]:
    """k-NN in Morton-sorted query order; ORIGINAL neighbour indices.

    Returns ``(dist_sq (P, k), idx (P, k), overflow)``, ascending by distance.

    ``with_moments=True`` appends a fourth output: per-query covariance
    moment sums of the exact k-NN set, (P, MOM_CH) query-relative (see
    refine_pallas.moments_pallas_t) — the normal-estimation epilogue
    without any (P, k, 3) neighbour gather. On the pallas path these are
    accumulated in-kernel over the same count-gated candidate schedule;
    elsewhere a gather-based fallback produces the same sums (different
    summation order only).
    """
    dtype = ga.points.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nta = ga.points.shape[0] // CHUNK
    ncb = gb.n_chunks
    cap = min(cap, ncb)

    a_tiles = ga.points.reshape(nta, CHUNK, 3)
    b_chunks = gb.points.reshape(ncb, CHUNK, 3)
    b_perm_chunks = gb.perm.reshape(ncb, CHUNK)
    valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)

    a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)

    impl = _resolve_refine_impl(refine_impl, dtype)
    interp0 = impl == "pallas_interpret"
    # Fused-prologue mode (PCC_KNN_PROLOGUE=select, resolved at call time
    # into flags): candidate selection and certificate counts come from
    # ops/select_pallas kernels that never materialise the (nta, ncb)
    # bound matrix. Stage-1 certificates (counts1/counts/countsf) live
    # entirely in the select kernel's rounded-bound space; the stage-2
    # tiers and the moments recompute below are fully self-contained in
    # XLA true-lb space. See nn_pruned.nn_pruned_sorted for the identical
    # 1-NN wiring and select_pallas for the soundness argument.
    sel_mode = (
        impl in ("pallas", "pallas_interpret")
        and cap > 8 and nta % 8 == 0
        and flags.sched == "counted"
        and flags.prologue == "select"
    )
    if sel_mode:
        from .select_pallas import count_bbox_pallas, select_bbox_pallas

        cand, _ = select_bbox_pallas(
            a_lo, a_hi, gb.bbox_lo, gb.bbox_hi, cap, interpret=interp0)
        lb = None
    else:
        lb = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)
        _, cand = jax.lax.top_k(-lb, cap)
        cand = cand.astype(jnp.int32)
    tbases = jnp.arange(nta, dtype=jnp.int32)
    batch = _pick_batch(nta, 8)  # k-wide temporaries: smaller tile batches

    def cert_counts(ub_eff):
        if sel_mode:
            return count_bbox_pallas(
                a_lo, a_hi, gb.bbox_lo, gb.bbox_hi, ub_eff,
                interpret=interp0).astype(jnp.int32)
        return jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)

    int_max = jnp.iinfo(jnp.int32).max

    def _extract_k(d, borig):
        """k rounds of (min, mask-out) over the candidate axis.

        Pure VPU compare/select work — XLA's top_k lowers to a sort whose
        scratch faults the TPU worker at 100k-wide rows and runs ~100x
        slower than this at k=30. Returns ascending (d_k, idx_k)."""
        # borig is unique per row (candidate chunks are distinct), so the
        # selected candidate can be identified and masked by its original
        # index — no gathers anywhere in the loop.
        def step(dcur, _):
            m = jnp.min(dcur, axis=-1, keepdims=True)
            at_min = dcur == m
            ii = jnp.min(
                jnp.where(at_min, borig, int_max), axis=-1, keepdims=True
            )
            dnext = jnp.where(at_min & (borig == ii), jnp.inf, dcur)
            return dnext, (m[..., 0], ii[..., 0])

        _, (ds, idxs) = jax.lax.scan(step, d, None, length=k)
        # (k, bt, CHUNK) -> (bt, CHUNK, k)
        return jnp.moveaxis(ds, 0, -1), jnp.moveaxis(idxs, 0, -1)

    def make_refine(ncand):
        def refine_body(args):
            q, cidx, tbase = args  # (bt, CHUNK, 3), (bt, ncand), (bt,)
            bt = q.shape[0]
            cand_pts = b_chunks[cidx].reshape(bt, ncand * CHUNK, 3)
            d = _pairwise_sq(q, cand_pts)  # (bt, CHUNK, ncand*CHUNK)
            borig = jnp.broadcast_to(
                b_perm_chunks[cidx].reshape(bt, 1, ncand * CHUNK), d.shape
            )
            if exclude_self:
                gcol = (cidx[:, :, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32)
                        ).reshape(bt, 1, ncand * CHUNK)
                grow = (tbase[:, None] * CHUNK
                        + jnp.arange(CHUNK, dtype=jnp.int32))[:, :, None]
                d = jnp.where(grow == gcol, jnp.inf, d)
            return _extract_k(d, borig)

        return refine_body

    if impl in ("pallas", "pallas_interpret"):
        from .refine_pallas import refine_knn_pallas_t

        qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
        # b side in the natural (Pb, 8) layout: a cheap pad, not a ~15 ms
        # 850k-row transpose (see refine_pallas.refine_nn_pallas_t).
        b8r = jnp.pad(gb.points, ((0, 0), (0, 5)))
        interp = impl == "pallas_interpret"
        counted = cap > 8 and nta % 8 == 0 and flags.sched == "counted"
        if counted:
            # Count-gated two-pass schedule (see nn_pruned_sorted): probe
            # p1 chunks everywhere, then extend each tile IN PLACE to its
            # certificate count via the kernel's per-tile SMEM gate,
            # seeded from the probe's exact k-buffer.
            p1 = max(1, min(flags.p1, cap - 1))
            d1, i1 = refine_knn_pallas_t(
                qt8, b8r, gb.perm[None, :], cand[:, :p1], k,
                exclude_self=exclude_self, interpret=interp,
            )
            kth1 = d1.reshape(nta, CHUNK, k)[:, :, k - 1]
            ub1 = jnp.max(jnp.where(valid_t, kth1, -jnp.inf), axis=1)
            ub1_eff = ub1 * (1 + 8 * eps) + 8 * eps
            counts1 = cert_counts(ub1_eff)
            ncand2 = jnp.clip(counts1 - p1, 0, cap - p1).astype(jnp.int32)
            # cs MUST stay 1 for k-NN refine passes — measured TWICE:
            # round 3's per-slot merge bodies (3.3x slower, register
            # spill) AND round 4's single concatenated (k+cs*CHUNK)-row
            # merge region (cs=2: ext 190 -> 502 ms, fully-CLAMPED grid
            # 76 -> 431 ms — the wider merge body is carried by every
            # step even predicated off). Only merge-free kernels
            # (moments, 1-NN) win from slot batching; the k-NN extension
            # sheds clamp overhead via the compacted tier below instead.
            ext_cs = flags.ext_cs
            # Tile shuffling requires the kernel to never consult global
            # query rows: exclude_self=True does (diagonal masking).
            ext_slice = flags.ext_slice
            ext_sorted = (
                flags.ext_sorted
                and not exclude_self
                and nta >= ext_slice
                and ext_cs == 1
            )
            e1 = flags.ext_e1
            two_level = (
                0 < e1 < cap - p1
                and not exclude_self
                and not ext_sorted
                and nta % 8 == 0
                and ext_cs == 1
            )
            if ext_sorted:
                dk, ik = _ext_sorted_slices(
                    qt8, b8r, gb.perm[None, :], cand[:, p1:], ncand2, k,
                    (d1, i1), interp, slice_tiles=ext_slice,
                )
            elif two_level:
                fte = flags.ext_fte
                if fte <= 0:
                    fte = max(512, nta // 4)
                fte = min((fte + 7) // 8 * 8, nta)
                dk, ik = _ext_two_level(
                    qt8, b8r, gb.perm[None, :], cand, p1, e1, ncand2, k,
                    (d1, i1), interp, fte,
                )
            else:
                dk, ik = refine_knn_pallas_t(
                    qt8, b8r, gb.perm[None, :], cand[:, p1:], k,
                    ncand=ncand2,
                    exclude_self=exclude_self, interpret=interp,
                    init=(d1, i1), cs=ext_cs,
                )
        else:
            dk, ik = refine_knn_pallas_t(
                qt8, b8r, gb.perm[None, :], cand, k,
                exclude_self=exclude_self, interpret=interp,
            )
        dk = dk.reshape(nta, CHUNK, k)
        ik = ik.reshape(nta, CHUNK, k)
    else:
        dk, ik = jax.lax.map(
            make_refine(cap),
            (
                a_tiles.reshape(nta // batch, batch, CHUNK, 3),
                cand.reshape(nta // batch, batch, cap),
                tbases.reshape(nta // batch, batch),
            ),
        )
        dk = dk.reshape(nta, CHUNK, k)
        ik = ik.reshape(nta, CHUNK, k)

    # ---- certificate on the k-th distance
    kth = dk[:, :, k - 1]
    ub = jnp.max(jnp.where(valid_t, kth, -jnp.inf), axis=1)
    ub_eff = ub * (1 + 8 * eps) + 8 * eps
    counts = cert_counts(ub_eff)
    n_over = jnp.sum(counts > cap)

    # ---- stage 2: re-refine the worst tiles in two count-matched tiers
    # (mirror of nn_pruned.nn_pruned_sorted). The previous flat
    # ft x 8*cap XLA pass cost 4.5 s of the 5.2 s 800k normal-estimation
    # total (30-round extract over 131k-wide rows); the tiers re-run the
    # PALLAS k-merge kernel on a COMPACTED copy of the failed tiles
    # instead (their queries gathered into a contiguous (8, ft*CHUNK)
    # layout), which is valid whenever exclude_self is False — the
    # normals path — because the kernel then never consults global row
    # ids. exclude_self=True keeps the XLA refine.
    ft = min(fallback_tiles, nta)
    cap2a = min(max(2 * cap, 128), ncb)
    # ncb//4 floor: see nn_pruned_sorted — giant clouds have tail tiles
    # whose qualifying sets exceed any flat tier width.
    cap2b = min(max(8 * cap, 512, ncb // 4), ncb)
    p = nta * CHUNK
    dk = dk.reshape(p, k)
    ik = ik.reshape(p, k).astype(jnp.int32)
    overflow = n_over > ft

    def refine_tier(otiles, ocand, nt, cap2, ncand=None, init=None):
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
                    # init rides the kernel's (P, k) row layout
                    init = (
                        jnp.concatenate(
                            [init[0],
                             jnp.full(((nt_pad - nt) * CHUNK, k),
                                      jnp.inf, jnp.float32)]),
                        jnp.concatenate(
                            [init[1],
                             jnp.full(((nt_pad - nt) * CHUNK, k),
                                      int_max, jnp.int32)]),
                    )
            else:
                otiles_p, ocand_p = otiles, ocand
            cols = (otiles_p[:, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(-1)
            qt8_o = jnp.take(qt8, cols, axis=1)  # (8, nt_pad*CHUNK)
            fd, fi = refine_knn_pallas_t(
                qt8_o, b8r, gb.perm[None, :], ocand_p, k,
                ncand=ncand, init=init,
                exclude_self=False,
                interpret=(impl == "pallas_interpret"),
            )
            return (fd.reshape(nt_pad, CHUNK, k)[:nt],
                    fi.reshape(nt_pad, CHUNK, k)[:nt])
        b2 = 1  # cap2*CHUNK-wide rows: keep the distance buffer bounded
        fd, fi = jax.lax.map(
            make_refine(cap2),
            (
                a_tiles[otiles].reshape(nt // b2, b2, CHUNK, 3),
                ocand.reshape(nt // b2, b2, cap2),
                otiles.reshape(nt // b2, b2),
            ),
        )
        return fd.reshape(nt, CHUNK, k), fi.reshape(nt, CHUNK, k)

    def recount(otiles, fd, tlb):
        ovalid = valid_t[otiles]
        ub2 = jnp.max(
            jnp.where(ovalid, fd[:, :, k - 1], -jnp.inf), axis=1)
        ub2_eff = ub2 * (1 + 8 * eps) + 8 * eps
        return jnp.sum(tlb <= ub2_eff[:, None], axis=1)

    def scatter(dk, ik, otiles, fd, fi, nt):
        orows = (otiles[:, None] * CHUNK
                 + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(nt * CHUNK)
        return (dk.at[orows].set(fd.reshape(nt * CHUNK, k)),
                ik.at[orows].set(fi.reshape(nt * CHUNK, k)))

    # Same count-gating as nn_pruned_sorted's tiers: the static-shape tier
    # passes are seeded with each compacted tile's current k-buffer and
    # execute only the extension slots beyond the already-refined lb-prefix
    # (the tier candidate table's first ``cap`` columns equal stage 1's:
    # same rows, same deterministic top_k). Certified tiles execute zero
    # slots and pass their seed through.
    gate_tiers = (
        impl in ("pallas", "pallas_interpret") and not exclude_self
    )

    def tier_rows(tiles, nt):
        return (tiles[:, None] * CHUNK
                + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(nt * CHUNK)

    if ft > 0 and cap2a > cap:
        _, otiles = jax.lax.top_k(counts, ft)
        otiles = otiles.astype(jnp.int32)
        if sel_mode:
            # Tiers are self-contained in XLA true-lb space: recompute the
            # (ft, ncb) bound slice for the compacted tiles only and
            # refine the FULL lb-ascending prefix (stage 1's select-kernel
            # candidate order shares no usable prefix with the XLA table
            # once rounding differs). Seeding with the stage-1 k-buffers
            # stays exact: the merge only improves them.
            olb = bbox_lower_bounds(
                a_lo[otiles], a_hi[otiles], gb.bbox_lo, gb.bbox_hi)
        else:
            olb = lb[otiles]
        _, ocand = jax.lax.top_k(-olb, cap2a)
        ocand = ocand.astype(jnp.int32)
        if gate_tiers:
            rows_a = tier_rows(otiles, ft)
            if sel_mode:
                counts_x = jnp.sum(
                    olb <= ub_eff[otiles][:, None], axis=1
                ).astype(jnp.int32)
                ncand_a = jnp.where(
                    counts[otiles] > cap,
                    jnp.minimum(counts_x, cap2a), 0).astype(jnp.int32)
                fb_d, fb_i = refine_tier(
                    otiles, ocand, ft, cap2a,
                    ncand=ncand_a, init=(dk[rows_a], ik[rows_a]),
                )
            else:
                oc_a = counts[otiles]
                ncand_a = jnp.where(
                    oc_a > cap, jnp.minimum(oc_a, cap2a) - cap, 0
                ).astype(jnp.int32)
                fb_d, fb_i = refine_tier(
                    otiles, ocand[:, cap:], ft, cap2a - cap,
                    ncand=ncand_a, init=(dk[rows_a], ik[rows_a]),
                )
        else:
            fb_d, fb_i = refine_tier(otiles, ocand, ft, cap2a)
        counts2a = recount(otiles, fb_d, olb)
        dk, ik = scatter(dk, ik, otiles, fb_d, fb_i, ft)

        ft2 = min(max(ft // 8, 16), ft)
        if cap2b > cap2a:
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
                    ncand_b = jnp.where(
                        nb > 0, jnp.minimum(nb, cap2b), 0
                    ).astype(jnp.int32)
                    bb_d, bb_i = refine_tier(
                        btiles, bcand, ft2, cap2b,
                        ncand=ncand_b, init=(dk[rows_b], ik[rows_b]),
                    )
                else:
                    ncand_b = jnp.where(
                        nb > 0, jnp.minimum(nb, cap2b) - cap2a, 0
                    ).astype(jnp.int32)
                    bb_d, bb_i = refine_tier(
                        btiles, bcand[:, cap2a:], ft2, cap2b - cap2a,
                        ncand=ncand_b, init=(dk[rows_b], ik[rows_b]),
                    )
            else:
                bb_d, bb_i = refine_tier(btiles, bcand, ft2, cap2b)
            counts2b = recount(btiles, bb_d, blb)
            overflow = overflow | jnp.any(counts2b > cap2b)
            dk, ik = scatter(dk, ik, btiles, bb_d, bb_i, ft2)
        else:
            overflow = overflow | jnp.any(counts2a > cap2a)
    else:
        otiles = None

    if not with_moments:
        return dk, ik, overflow

    # ---- covariance moments of the exact k-NN set (normal estimation).
    # Membership threshold: lexicographic (d, orig idx) <= the k-buffer's
    # LAST slot — precisely the k-set the merge kept. Gate: the FINAL
    # certificate count covers every member's chunk (member d <= r_k <=
    # ub_eff, so its chunk's lb qualifies), and the lb-ascending candidate
    # prefix of that width contains all qualifying chunks.
    kth_d = dk[:, k - 1].reshape(nta, CHUNK)
    kth_i = ik[:, k - 1].reshape(nta, CHUNK)
    ubf = jnp.max(jnp.where(valid_t, kth_d, -jnp.inf), axis=1)
    ubf_eff = ubf * (1 + 8 * eps) + 8 * eps
    countsf = cert_counts(ubf_eff)

    if impl in ("pallas", "pallas_interpret") and not exclude_self:
        from .refine_pallas import moments_pallas_t

        interp = impl == "pallas_interpret"
        qpadm = (-nta) % 8
        qt8m = (jnp.pad(qt8, ((0, 0), (0, qpadm * CHUNK)))
                if qpadm else qt8)
        nc1 = jnp.minimum(countsf, cap)
        mom_slice = flags.ext_slice
        if flags.mom_sorted and qpadm == 0 and nta >= mom_slice:
            mom = _mom_sorted_slices(
                qt8m, b8r, gb.perm[None, :], cand, nc1, kth_d, kth_i,
                interp, slice_tiles=mom_slice,
            )[: p]
        else:
            mom = moments_pallas_t(
                qt8m, b8r, gb.perm[None, :], cand, nc1, kth_d, kth_i,
                interpret=interp,
            )[: p]

        def mom_tier(tiles, tcand, nt, lo):
            """Extend compacted tiles' moments past the stage-lo prefix."""
            nt_pad = ((nt + 7) // 8) * 8
            tiles_p = tiles
            tcand_p = tcand
            ncm = jnp.where(
                countsf[tiles] > lo,
                jnp.minimum(countsf[tiles], lo + tcand.shape[1]) - lo, 0,
            ).astype(jnp.int32)
            if nt_pad != nt:
                tiles_p = jnp.concatenate(
                    [tiles, jnp.broadcast_to(tiles[-1:], (nt_pad - nt,))])
                tcand_p = jnp.concatenate(
                    [tcand,
                     jnp.broadcast_to(tcand[-1:],
                                      (nt_pad - nt, tcand.shape[1]))])
                ncm = jnp.concatenate(
                    [ncm, jnp.zeros((nt_pad - nt,), jnp.int32)])
            rows = (tiles_p[:, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(-1)
            qt8_o = jnp.take(qt8, rows, axis=1)
            momt = moments_pallas_t(
                qt8_o, b8r, gb.perm[None, :], tcand_p, ncm,
                kth_d[tiles_p], kth_i[tiles_p],
                init=mom[rows], interpret=interp,
            )
            nt_rows = rows[: nt * CHUNK]
            return mom.at[nt_rows].set(momt[: nt * CHUNK])

        def mom_tier_scratch(tiles, tcand, nt, tlb):
            """sel_mode: recompute compacted tiles' moments FROM SCRATCH
            over the full XLA-space tier prefix. The stage-1 sweep used
            the select kernel's rounded candidate order, which shares no
            prefix with the XLA tier table, so extending would double-
            count revisited chunks; a zero-seeded full-prefix sweep of
            width min(countsf_x, tier width) is complete for every tile
            the tier certificate covers. Tiles whose rounded-space count
            already fits the stage-1 sweep keep it (gate to 0 slots)."""
            nt_pad = ((nt + 7) // 8) * 8
            ncm_x = jnp.sum(
                tlb <= ubf_eff[tiles][:, None], axis=1).astype(jnp.int32)
            take = countsf[tiles] > cap
            ncm = jnp.where(
                take, jnp.minimum(ncm_x, tcand.shape[1]), 0
            ).astype(jnp.int32)
            tiles_p, tcand_p, ncm_p = tiles, tcand, ncm
            if nt_pad != nt:
                tiles_p = jnp.concatenate(
                    [tiles, jnp.broadcast_to(tiles[-1:], (nt_pad - nt,))])
                tcand_p = jnp.concatenate(
                    [tcand,
                     jnp.broadcast_to(tcand[-1:],
                                      (nt_pad - nt, tcand.shape[1]))])
                ncm_p = jnp.concatenate(
                    [ncm, jnp.zeros((nt_pad - nt,), jnp.int32)])
            rows = (tiles_p[:, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32)).reshape(-1)
            qt8_o = jnp.take(qt8, rows, axis=1)
            momt = moments_pallas_t(
                qt8_o, b8r, gb.perm[None, :], tcand_p, ncm_p,
                kth_d[tiles_p], kth_i[tiles_p],
                interpret=interp,
            )
            nt_rows = rows[: nt * CHUNK]
            take_rows = jnp.repeat(take, CHUNK)[:, None]
            return mom.at[nt_rows].set(
                jnp.where(take_rows, momt[: nt * CHUNK], mom[nt_rows]))

        if otiles is not None:
            if sel_mode:
                mom = mom_tier_scratch(otiles, ocand, ft, olb)
                if cap2b > cap2a:
                    mom = mom_tier_scratch(btiles, bcand, ft2, blb)
            else:
                mom = mom_tier(otiles, ocand[:, cap:], ft, cap)
                if cap2b > cap2a:
                    mom = mom_tier(btiles, bcand[:, cap2a:], ft2, cap2a)
    else:
        # Gather-based fallback (CPU tests, exclude_self): same sums.
        pb = gb.points.shape[0]
        inv_b = jnp.zeros(pb, jnp.int32).at[gb.perm].set(
            jnp.arange(pb, dtype=jnp.int32))
        neigh = jnp.take(gb.points, jnp.take(inv_b, ik, mode="clip"),
                         axis=0)  # (P, k, 3)
        w = jnp.isfinite(dk).astype(dtype)[:, :, None]
        diffs = (neigh - ga.points[:, None, :]) * w
        cnt = jnp.sum(w[:, :, 0], axis=1, keepdims=True)
        s1 = jnp.sum(diffs, axis=1)
        sq = jnp.stack(
            [diffs[:, :, 0] * diffs[:, :, 0],
             diffs[:, :, 1] * diffs[:, :, 1],
             diffs[:, :, 2] * diffs[:, :, 2],
             diffs[:, :, 0] * diffs[:, :, 1],
             diffs[:, :, 0] * diffs[:, :, 2],
             diffs[:, :, 1] * diffs[:, :, 2]], axis=2)
        s2 = jnp.sum(sq, axis=1)
        # Keep the cloud dtype: f64 estimation must not silently lose
        # ~8 digits through an f32 moments epilogue (the pallas path is
        # f32-only by construction and never reaches here for f64).
        mom = jnp.concatenate([cnt, s1, s2], axis=1).astype(dtype)

    return dk, ik, overflow, mom


def knn_pruned_sorted(
    ga: ChunkGrid,
    gb: ChunkGrid,
    n_a: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
    cap: int = 32,
    fallback_tiles: int = 128,
    refine_impl: str = "auto",
    with_moments: bool = False,
    flags: typing.Optional[KnnFlags] = None,
) -> typing.Tuple[jnp.ndarray, ...]:
    """Public entry for ``_knn_sorted_impl`` (see its docstring).

    Thin non-jit wrapper: the PCC_KNN_* env knobs are resolved HERE, at
    call time, and passed into the jitted implementation as one static
    argument — changing a knob between calls retraces instead of silently
    reusing the old trace. Composing code that is itself traced (the fused
    cold fold, estimation_core) passes ``flags`` explicitly, resolved at
    ITS call boundary.
    """
    if flags is None:
        flags = knn_flags_from_env()
    return _knn_sorted_impl(
        ga, gb, n_a, k, exclude_self=exclude_self, cap=cap,
        fallback_tiles=fallback_tiles, refine_impl=refine_impl,
        with_moments=with_moments, flags=flags,
    )


# Profiling harnesses bust the trace cache between A/B runs.
knn_pruned_sorted.clear_cache = _knn_sorted_impl.clear_cache


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "cap", "fallback_tiles", "flags"),
)
def _knn_pruned_jit(a_points, b_points, n_a, n_b, k, exclude_self, cap,
                    fallback_tiles, flags):
    ga = build_grid(a_points, n_a)
    gb = ga if exclude_self or a_points is b_points else build_grid(
        b_points, n_b
    )
    dk, ik, overflow = _knn_sorted_impl(
        ga, gb, n_a, k, exclude_self=exclude_self, cap=cap,
        fallback_tiles=fallback_tiles, flags=flags,
    )
    p = a_points.shape[0]
    inv = jnp.zeros(p, jnp.int32).at[ga.perm].set(
        jnp.arange(p, dtype=jnp.int32)
    )
    return jnp.take(ik, inv, axis=0), jnp.take(dk, inv, axis=0), overflow


# Remembers the (cap, fallback_tiles) level that worked per problem shape so
# repeated calls skip the cheaper-but-overflowing levels entirely.
# Rungs go through utils.cache.ladder_lookup/ladder_store so one
# pathological pair cannot pin the expensive rung forever (periodic
# base-rung retry), matching normals.py / fused.py.
_ESCALATION_MEMO: dict = {}


def knn_pruned(
    a_points: jnp.ndarray,
    b_points: jnp.ndarray,
    n_a: typing.Union[int, jnp.ndarray],
    n_b: typing.Union[int, jnp.ndarray],
    k: int,
    exclude_self: bool = False,
    cap: int = 64,
    fallback_tiles: int = 256,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact pruned k-NN in ORIGINAL order with automatic escalation.

    Returns ``(idx int32 (Pa, k), dist_sq (Pa, k))`` ascending by distance.
    """
    nta = a_points.shape[0] // CHUNK
    ncb = b_points.shape[0] // CHUNK
    key = (a_points.shape[0], b_points.shape[0], k, exclude_self)
    from ..utils.cache import ladder_lookup, ladder_store

    cap, fallback_tiles = ladder_lookup(
        _ESCALATION_MEMO, key, (cap, fallback_tiles))
    flags = knn_flags_from_env()
    while True:
        idx, d, overflow = _knn_pruned_jit(
            a_points, b_points, jnp.asarray(n_a), jnp.asarray(n_b), k,
            exclude_self, cap, fallback_tiles, flags,
        )
        # Exact iff the certificate passed or stage 1 refined every chunk
        # (cap >= ncb: counts <= cap, so the certificate cannot fail).
        # A full fallback budget alone does NOT imply exactness — stage 2
        # still refines only cap2 < ncb chunks per tile.
        if not bool(overflow) or cap >= ncb:
            ladder_store(_ESCALATION_MEMO, key,
                         (cap, fallback_tiles))
            return idx, d
        cap, fallback_tiles = next_rung(cap, fallback_tiles, ncb, nta)
