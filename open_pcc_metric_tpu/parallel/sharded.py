"""Multi-chip sharded evaluation: DP over frames x ring-sharded NN over points.

The reference has no parallelism of any kind (SURVEY §5: single-threaded
Python loop over KD-tree queries). The TPU-native scaling story (SURVEY §5
"long-context" row) is:

  * ``frames`` mesh axis — pure data parallelism: one frame pair per device
    group, no communication (BASELINE.json configs 4-5);
  * ``points`` mesh axis — for clouds too big for one chip: the QUERY axis is
    sharded and the SEARCH cloud's shards rotate around the ring via
    ``lax.ppermute`` with a running (min, argmin) — the moral equivalent of
    ring attention for NN search. Per-shard argmin PAYLOADS (the winning
    neighbour's coordinates / colours / normals) ride along with the rotation,
    so colour and D2 gathers never need a global all-gather;
  * epilogue reductions cross shards with ``psum`` / ``pmax`` / ``pmin`` over
    ICI.

Everything is built on ``jax.shard_map`` over a ``Mesh(("frames", "points"))``
and runs identically on a virtual CPU mesh (tests) and a real TPU slice.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.nn import nn_chunked
from ..ops.knn import knn
from ..ops.normals import DEFAULT_KNN, cov3
from ..ops.eigh3 import smallest_eigenvector_sym3


def _zrow_like(x):
    """A zero row derived FROM the operand (not a fresh constant), so scan
    carries built from it inherit the operand's shard_map varying-axis
    attributes over every mesh axis and the vma checker can stay ON
    (VERDICT r1 item 7: this replaces a blanket ``check_vma=False``)."""
    return x[:, 0] * 0 if x.ndim > 1 else x * 0


def make_mesh(
    n_devices: typing.Optional[int] = None, dp: int = 1
) -> Mesh:
    """Mesh with axes ("frames", "points"): dp frame-groups x ring width."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if n % dp:
        raise ValueError(f"dp={dp} does not divide {n} devices")
    return Mesh(devices.reshape(dp, n // dp), axis_names=("frames", "points"))


# ------------------------------------------------------------------ ring 1-NN


def ring_nn(
    a_loc: jnp.ndarray,
    b_loc: jnp.ndarray,
    axis: str = "points",
    payloads: typing.Tuple[jnp.ndarray, ...] = (),
    exclude_self: bool = False,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, typing.Tuple[jnp.ndarray, ...]]:
    """Exact 1-NN of local queries against the FULL ring-sharded search cloud.

    Must run inside shard_map with mesh axis ``axis``. ``payloads`` are
    b-aligned arrays (e.g. colours, normals, the points themselves) whose
    rows rotate with ``b_loc``; the returned payloads are the rows belonging
    to each query's winning neighbour.

    Returns ``(dist_sq (Na_loc,), global_idx (Na_loc,), best_payloads)``.
    Ties break to the lowest GLOBAL index, matching the single-chip path.
    """
    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    rows_b = b_loc.shape[0]
    a_offset = me * a_loc.shape[0]
    perm = [(i, (i - 1) % nsh) for i in range(nsh)]

    dtype = a_loc.dtype
    zq = _zrow_like(a_loc)  # (Na_loc,) carry seed with the right vma
    best_d = zq + jnp.asarray(jnp.inf, dtype)
    best_i = zq.astype(jnp.int32)
    # Seed = query-derived zeros broadcast against payload-derived zeros, so
    # the carry inherits BOTH operands' varying-axis attributes and any
    # payload rank works (rows are overwritten before first read).
    best_pay = tuple(
        zq.reshape(zq.shape + (1,) * (p.ndim - 1)).astype(p.dtype)
        + jnp.zeros_like(p[0])
        for p in payloads)

    def step(carry, s):
        b_cur, pay_cur, best_d, best_i, best_pay = carry
        src = jax.lax.rem(me.astype(jnp.int32) + s, jnp.int32(nsh))
        b_base = src * jnp.int32(rows_b)
        idx, d = nn_chunked(
            a_loc,
            b_cur,
            exclude_self=exclude_self,
            a_offset=a_offset,
            b_offset=b_base,
        )
        gidx = idx + b_base
        better = (d < best_d) | ((d == best_d) & (gidx < best_i))
        best_d = jnp.where(better, d, best_d)
        best_i = jnp.where(better, gidx, best_i)
        new_pay = tuple(
            jnp.where(
                better.reshape(better.shape + (1,) * (p.ndim - 1)),
                jnp.take(pc, idx, axis=0),
                p,
            )
            for p, pc in zip(best_pay, pay_cur)
        )
        b_next = jax.lax.ppermute(b_cur, axis, perm)
        pay_next = tuple(jax.lax.ppermute(pc, axis, perm) for pc in pay_cur)
        return (b_next, pay_next, best_d, best_i, new_pay), None

    init = (b_loc, tuple(payloads), best_d, best_i, best_pay)
    (_, _, best_d, best_i, best_pay), _ = jax.lax.scan(
        step, init, jnp.arange(nsh, dtype=jnp.int32)
    )
    return best_d, best_i, best_pay


# ---------------------------------------------------------- pruned ring 1-NN


def _tile_bounds_local(a_loc, row0, n_valid):
    """Per-tile bboxes of the local Morton-sorted query rows, masked to the
    globally valid rows (sorted row s is valid iff row0 + s < n_valid)."""
    from ..ops.grid import CHUNK

    ntl = a_loc.shape[0] // CHUNK
    dtype = a_loc.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    valid = ((row0 + jnp.arange(a_loc.shape[0])) < n_valid).reshape(
        ntl, CHUNK)
    tiles = a_loc.reshape(ntl, CHUNK, 3)
    lo = jnp.min(jnp.where(valid[:, :, None], tiles, big), axis=1)
    hi = jnp.max(jnp.where(valid[:, :, None], tiles, -big), axis=1)
    return valid, lo, hi


def _refine_local(a_loc, cand, b_cur, b_perm_cur, payload_cur,
                  q_row0, b_row0, exclude_self, batch=8):
    """Refine each local query tile against its ``cand`` chunks of b_cur.

    Returns ``(dmin (Pl,), orig_idx (Pl,), pay (Pl, F))`` — per-query min
    squared distance, lowest ORIGINAL-global-index tie-break, and the winning
    neighbour's payload row. Everything is in local Morton-sorted order.
    """
    from ..ops.grid import CHUNK

    ntl, k = cand.shape
    ncl = b_cur.shape[0] // CHUNK
    b_chunks = b_cur.reshape(ncl, CHUNK, 3)
    perm_chunks = b_perm_cur.reshape(ncl, CHUNK)
    a_tiles = a_loc.reshape(ntl, CHUNK, 3)
    while ntl % batch:
        batch //= 2

    def body(args):
        q, cidx, tbase = args  # (bt, CHUNK, 3), (bt, k), (bt,)
        bt = q.shape[0]
        cpts = b_chunks[cidx].reshape(bt, k * CHUNK, 3)
        d = None
        for c in range(3):
            diff = q[:, :, None, c] - cpts[:, None, :, c]
            d = diff * diff if d is None else d + diff * diff
        orig = perm_chunks[cidx].reshape(bt, 1, k * CHUNK)
        if exclude_self:
            gcol = (b_row0 + cidx[:, :, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32)
                    ).reshape(bt, 1, k * CHUNK)
            grow = (q_row0 + tbase[:, None] * CHUNK
                    + jnp.arange(CHUNK, dtype=jnp.int32))[:, :, None]
            d = jnp.where(grow == gcol, jnp.inf, d)
        dmin = jnp.min(d, axis=2)  # (bt, CHUNK)
        at_min = d == dmin[:, :, None]
        big_i = jnp.iinfo(jnp.int32).max
        ii = jnp.min(
            jnp.where(at_min, jnp.broadcast_to(orig, d.shape), big_i), axis=2)
        # Local winning column (for the payload gather): among tied-min
        # columns, the one carrying the winning original id.
        hit = at_min & (jnp.broadcast_to(orig, d.shape) == ii[:, :, None])
        loccol = jnp.min(
            jnp.where(hit, jax.lax.broadcasted_iota(
                jnp.int32, d.shape, 2), big_i), axis=2)
        locrow = jnp.take_along_axis(
            cidx, loccol // CHUNK, axis=1) * CHUNK + loccol % CHUNK
        return dmin, ii, locrow

    dm, ii, lr = jax.lax.map(
        body,
        (a_tiles.reshape(ntl // batch, batch, CHUNK, 3),
         cand.reshape(ntl // batch, batch, k),
         jnp.arange(ntl, dtype=jnp.int32).reshape(ntl // batch, batch)),
    )
    lr = lr.reshape(ntl * CHUNK)
    pay = (jnp.take(payload_cur, lr, axis=0, mode="clip")
           if payload_cur is not None else None)
    return dm.reshape(ntl * CHUNK), ii.reshape(ntl * CHUNK), pay


def _refine_local_pallas(qt8c, ntl, b_cur, perm_cur, payload_cur, cand,
                         ncand, nsh, exclude_self, interpret):
    """Pallas tile refine inside the mesh — results match _refine_local.

    The kernel ties on ORIGINAL ids (``perm_cur`` rides candidate lane 7),
    matching every single-chip backend. The winner's LOCAL row for the
    payload gather is recovered through this step's inverse permutation
    (original id -> local row of the currently-held shard): the kernel
    only ever selects rows of ``b_cur``, so the inverse lookup is total.
    ``ncand`` gates per-tile executed slots (None = all live). ``cand``
    rows beyond ntl are padding for whole-8-tile-group kernel calls.
    """
    from ..ops.grid import CHUNK
    from ..ops.refine_pallas import refine_nn_pallas_t

    pl_rows = b_cur.shape[0]
    b8r = jnp.pad(b_cur, ((0, 0), (0, 5)))
    d, ii = refine_nn_pallas_t(
        qt8c, b8r, perm_cur[None, :], cand, ncand=ncand,
        exclude_self=exclude_self, interpret=interpret)
    d = d[: ntl * CHUNK]
    ii = ii[: ntl * CHUNK]
    if payload_cur is None:
        return d, ii, None
    inv = jnp.zeros(nsh * pl_rows, jnp.int32).at[perm_cur].set(
        jnp.arange(pl_rows, dtype=jnp.int32))
    pay = jnp.take(payload_cur, jnp.take(inv, ii, mode="clip"), axis=0)
    return d, ii, pay


def _pad_tile_table(cand, ncand, ntl_pad):
    """Pad a (ntl, w) candidate table + per-tile gate to ntl_pad rows.

    Padding tiles duplicate the last row with a zero gate (executed-slot
    count 0): their kernel outputs are +inf/int_max seeds, discarded by
    the caller's slice back to ntl rows.
    """
    ntl = cand.shape[0]
    if ncand is None:  # all-live: kernel gate becomes a no-op compare
        ncand = jnp.full((ntl,), cand.shape[1], jnp.int32)
    if ntl_pad == ntl:
        return cand, ncand.astype(jnp.int32)
    cand_p = jnp.concatenate(
        [cand, jnp.broadcast_to(cand[-1:], (ntl_pad - ntl, cand.shape[1]))])
    ncand_p = jnp.concatenate(
        [ncand.astype(jnp.int32), jnp.zeros((ntl_pad - ntl,), jnp.int32)])
    return cand_p, ncand_p


def _ring_step0_counted(refine, lb0, cand0, p0, cap0, valid_t, ntl, eps,
                        b_loc, b_perm, payload, q_row0, exclude_self):
    """Counted two-pass step 0 (the single-chip stage-1 schedule,
    ops/nn_pruned.py): probe the ``p0`` lowest-lb chunks all-live, then
    extend each tile IN PLACE to its certificate count through the
    kernel's per-tile SMEM gate.

    The flat cap0-wide step 0 left the 1-device smoke at 35% of the fused
    path (151.5 ms direct vs 53.7 fused at 100k: cap0=256 all-live slot
    visits per tile vs a mean live need of a handful —
    tools/profile_sharded_split.py). Exactness: the final ub <= the probe
    ub, so every chunk qualifying under the final ub lies inside the
    probe-counted lb-prefix the extension covered, or counts0 > cap0
    flags overflow for the caller's escalation ladder.

    Factored out of ring_nn_pruned so the pallas glue is unit-testable
    out-of-mesh (interpret-mode pallas cannot run under a vma-checked
    shard_map on this jax version — see test_refine_local_pallas_*).
    """
    from ..ops.grid import CHUNK

    best_d, best_i, best_pay = refine(
        b_loc, b_perm, payload, cand0[:, :p0], None, q_row0, exclude_self)
    ubp = jnp.max(
        jnp.where(valid_t, best_d.reshape(ntl, CHUNK), -jnp.inf), axis=1)
    ubp_eff = ubp * (1 + 8 * eps) + 8 * eps
    counts0 = jnp.sum(lb0 <= ubp_eff[:, None], axis=1)
    ncand_e = jnp.clip(counts0 - p0, 0, cap0 - p0).astype(jnp.int32)
    d_e, i_e, pay_e = refine(
        b_loc, b_perm, payload, cand0[:, p0:], ncand_e, q_row0,
        exclude_self)
    # Gated-off tiles return +inf/int_max rows and never win the merge.
    better = (d_e < best_d) | ((d_e == best_d) & (i_e < best_i))
    best_d = jnp.where(better, d_e, best_d)
    best_i = jnp.where(better, i_e, best_i)
    if best_pay is not None:
        best_pay = jnp.where(better[:, None], pay_e, best_pay)
    return best_d, best_i, best_pay, jnp.any(counts0 > cap0)


def ring_nn_pruned(
    a_loc: jnp.ndarray,  # (Pl, 3) local MORTON-SORTED query rows
    b_loc: jnp.ndarray,  # (Pl, 3) local Morton-sorted search rows
    b_perm: jnp.ndarray,  # (Pl,) original global row ids of b_loc
    b_bb_lo: jnp.ndarray,  # (Cl, 3) chunk bboxes of b_loc
    b_bb_hi: jnp.ndarray,
    n_a: jnp.ndarray,  # global valid counts
    n_b: jnp.ndarray,
    axis: str = "points",
    payload: typing.Optional[jnp.ndarray] = None,  # (Pl, F) b-sorted-aligned
    exclude_self: bool = False,
    cap: int = 16,
    refine_impl: str = "auto",
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, typing.Optional[jnp.ndarray],
                  jnp.ndarray]:
    """Bound-pruned exact ring 1-NN over Morton-sorted shards.

    The TPU-native multi-chip NN (VERDICT r1 item 3): instead of brute
    force against every rotated shard (ring_nn), the first step solves the
    spatially-aligned OWN shard exactly (Morton sharding makes it the likely
    NN home), after which every rotation refines only the <= ``cap``
    chunks whose bbox lower bound beats the tile's current upper bound —
    normally zero or a handful. Exactness: a chunk skipped at step s has
    lb > ub_s >= ub_final >= every final NN distance in the tile, so it can
    contain no winner; ties are kept because qualifying uses lb <= ub*(1+8e)
    + 8e. If more than ``cap`` chunks qualify at any step the result may be
    inexact and ``overflow`` is set — callers escalate (double cap), exactly
    like the single-chip certificate ladder (ops/nn_pruned.py).

    Returns ``(dist_sq (Pl,), orig_idx (Pl,), payload_row or None, overflow)``
    in local sorted order; tie-break = lowest ORIGINAL global index,
    bit-matching the single-chip backends.
    """
    from ..ops.grid import CHUNK, bbox_lower_bounds

    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    pl_rows = a_loc.shape[0]
    ntl = pl_rows // CHUNK
    ncl = b_loc.shape[0] // CHUNK
    dtype = a_loc.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    q_row0 = me * pl_rows
    valid_t, a_lo, a_hi = _tile_bounds_local(a_loc, q_row0, n_a)

    # Per-shard refinement backend: the pallas merge kernel on TPU f32
    # (the same kernel as the single-chip pruned path — the XLA lax.map
    # refine left the 1-device smoke ~7x off the fused path even after the
    # capped step 0), the XLA refine elsewhere (CPU tests, f64).
    from ..ops.nn_pruned import _resolve_refine_impl

    impl = _resolve_refine_impl(refine_impl, dtype)
    # The merge kernels are f32-only by construction (original ids ride
    # candidate lane 7 as an f32 bitcast); f64 rings stay on XLA.
    use_pallas = (impl in ("pallas", "pallas_interpret")
                  and dtype == jnp.float32)
    interp = impl == "pallas_interpret"
    if use_pallas:
        ntl_pad = ((ntl + 7) // 8) * 8
        qt8c = jnp.pad(a_loc, ((0, 0), (0, 5))).T
        if ntl_pad != ntl:
            qt8c = jnp.pad(qt8c, ((0, 0), (0, (ntl_pad - ntl) * CHUNK)))

    def refine(b_cur, perm_cur, pay_cur, cand, ncand, b_row0, excl):
        if use_pallas:
            cand_p, ncand_p = _pad_tile_table(cand, ncand, ntl_pad)
            return _refine_local_pallas(
                qt8c, ntl, b_cur, perm_cur, pay_cur, cand_p, ncand_p,
                nsh, excl, interp)
        return _refine_local(a_loc, cand, b_cur, perm_cur, pay_cur,
                             q_row0, b_row0, excl)

    # Step 0: the own shard, solved under the same lb-prefix + count
    # certificate as the single-chip stage 1 (ops/nn_pruned.py) instead of
    # refining ALL ncl chunks. The full own-shard refine made the 1-device
    # smoke 57x slower than the fused path (ROUND4_NOTES §4): on a w-wide
    # ring the own shard holds ncl = ncb/w chunks, and brute-refining all
    # of them is O(ncb/w) work per tile vs the certificate's O(cap0).
    # Exactness: if counts0 <= cap0, every chunk that could hold a winner
    # (lb <= ub0_eff) was refined; otherwise overflow is flagged and the
    # caller escalates — identical ladder semantics to the ring steps.
    cap = int(min(cap, ncl))
    cap0 = int(min(max(4 * cap, 64), ncl))
    lb0 = bbox_lower_bounds(a_lo, a_hi, b_bb_lo, b_bb_hi)  # (ntl, ncl)
    _, cand0 = jax.lax.top_k(-lb0, cap0)
    cand0 = cand0.astype(jnp.int32)
    p0 = min(8, cap0)
    if use_pallas and cap0 > p0:
        best_d, best_i, best_pay, ovf0 = _ring_step0_counted(
            refine, lb0, cand0, p0, cap0, valid_t, ntl, eps,
            b_loc, b_perm, payload, me * pl_rows, exclude_self)
    else:
        best_d, best_i, best_pay = refine(
            b_loc, b_perm, payload, cand0, None, me * pl_rows,
            exclude_self)
        ub0 = jnp.max(
            jnp.where(valid_t, best_d.reshape(ntl, CHUNK), -jnp.inf),
            axis=1)
        ub0_eff = ub0 * (1 + 8 * eps) + 8 * eps
        ovf0 = jnp.any(jnp.sum(lb0 <= ub0_eff[:, None], axis=1) > cap0)

    def step(carry, s):
        b_cur, perm_cur, bb_lo, bb_hi, pay_cur, bd, bi, bp, ovf = carry
        src = jax.lax.rem(me.astype(jnp.int32) + s, jnp.int32(nsh))
        ub = jnp.max(jnp.where(valid_t, bd.reshape(ntl, CHUNK), -jnp.inf),
                     axis=1)
        ub_eff = ub * (1 + 8 * eps) + 8 * eps
        lb = bbox_lower_bounds(a_lo, a_hi, bb_lo, bb_hi)  # (ntl, ncl)
        qual = lb <= ub_eff[:, None]
        counts = jnp.sum(qual, axis=1)
        ovf = ovf | jnp.any(counts > cap)
        _, cand = jax.lax.top_k(-jnp.where(qual, lb, jnp.inf), cap)
        # excl=False: the query's own row lives only in its OWN shard
        # (step 0), never in a rotated-in shard, so ring steps have no
        # self-pairs to mask — and the kernel's masking is POSITIONAL
        # (local row == candidate row), which would wrongly mask aligned
        # rows of OTHER shards here.
        d, ii, pay = refine(
            b_cur, perm_cur, pay_cur, cand.astype(jnp.int32),
            jnp.minimum(counts, cap).astype(jnp.int32),
            src * pl_rows, False)
        # On the XLA path tiles with zero qualifying chunks still "refine"
        # the cap lowest-lb chunks (harmless: real distances that simply
        # lose); the pallas path count-gates them to zero executed slots.
        # Merge keeps exactness either way.
        better = (d < bd) | ((d == bd) & (ii < bi))
        bd = jnp.where(better, d, bd)
        bi = jnp.where(better, ii, bi)
        if bp is not None:
            bp = jnp.where(better[:, None], pay, bp)
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        b_nxt = jax.lax.ppermute(b_cur, axis, perm)
        perm_nxt = jax.lax.ppermute(perm_cur, axis, perm)
        lo_nxt = jax.lax.ppermute(bb_lo, axis, perm)
        hi_nxt = jax.lax.ppermute(bb_hi, axis, perm)
        pay_nxt = (jax.lax.ppermute(pay_cur, axis, perm)
                   if pay_cur is not None else None)
        return (b_nxt, perm_nxt, lo_nxt, hi_nxt, pay_nxt, bd, bi, bp,
                ovf), None

    if nsh > 1:
        # Rotate once up-front so step s sees shard me+s.
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        b_cur = jax.lax.ppermute(b_loc, axis, perm)
        perm_cur = jax.lax.ppermute(b_perm, axis, perm)
        lo_cur = jax.lax.ppermute(b_bb_lo, axis, perm)
        hi_cur = jax.lax.ppermute(b_bb_hi, axis, perm)
        pay_cur = (jax.lax.ppermute(payload, axis, perm)
                   if payload is not None else None)
        # Seed with step 0's certificate verdict (operand-derived, so the
        # carry keeps the right varying-axis attributes).
        carry = (b_cur, perm_cur, lo_cur, hi_cur, pay_cur,
                 best_d, best_i, best_pay, ovf0)
        carry, _ = jax.lax.scan(
            step, carry, jnp.arange(1, nsh, dtype=jnp.int32))
        best_d, best_i, best_pay, overflow = carry[5], carry[6], carry[7], \
            carry[8]
    else:
        overflow = ovf0
    return best_d, best_i, best_pay, overflow


def ring_knn_coords_pruned(
    a_loc: jnp.ndarray,
    b_loc: jnp.ndarray,
    b_bb_lo: jnp.ndarray,
    b_bb_hi: jnp.ndarray,
    n_a: jnp.ndarray,
    k: int,
    axis: str = "points",
    cap: int = 16,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bound-pruned ring k-NN COORDINATES (normal estimation's search).

    Same structure as ring_nn_pruned with the tile upper bound taken from
    the running k-th neighbour distance. Returns ``(dists (Pl, k),
    coords (Pl, k, 3), overflow)`` sorted ascending; self-inclusive
    (Open3D semantics), coords only — no cross-shard gathers.
    """
    from ..ops.grid import CHUNK, bbox_lower_bounds

    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    pl_rows = a_loc.shape[0]
    ntl = pl_rows // CHUNK
    ncl = b_loc.shape[0] // CHUNK
    dtype = a_loc.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    valid_t, a_lo, a_hi = _tile_bounds_local(a_loc, me * pl_rows, n_a)
    cap = int(min(cap, ncl))

    def merge(rd, rc, cand, b_cur):
        b_chunks = b_cur.reshape(ncl, CHUNK, 3)
        a_tiles = a_loc.reshape(ntl, CHUNK, 3)
        kk = cand.shape[1]
        batch = 4
        while ntl % batch:
            batch //= 2

        def body(args):
            q, cidx, rd_b, rc_b = args  # per tile batch
            bt = q.shape[0]
            cpts = b_chunks[cidx].reshape(bt, kk * CHUNK, 3)
            d = None
            for c in range(3):
                diff = q[:, :, None, c] - cpts[:, None, :, c]
                d = diff * diff if d is None else d + diff * diff
            # (bt, CHUNK, kk*CHUNK): merge with the running k-buffer.
            cand_d = jnp.concatenate([rd_b, d], axis=2)
            cand_c = jnp.concatenate(
                [rc_b,
                 jnp.broadcast_to(cpts[:, None],
                                  (bt, CHUNK, kk * CHUNK, 3))], axis=2)
            negd, pos = jax.lax.top_k(-cand_d, k)
            return -negd, jnp.take_along_axis(cand_c, pos[..., None], axis=2)

        rd, rc = jax.lax.map(
            body,
            (a_tiles.reshape(ntl // batch, batch, CHUNK, 3),
             cand.reshape(ntl // batch, batch, kk),
             rd.reshape(ntl // batch, batch, CHUNK, k),
             rc.reshape(ntl // batch, batch, CHUNK, k, 3)),
        )
        return rd.reshape(ntl, CHUNK, k), rc.reshape(ntl, CHUNK, k, 3)

    # Step 0: own shard under the lb-prefix + count certificate (same
    # rationale as ring_nn_pruned's step 0 — a full own-shard k-NN is
    # O(ncb/w) per tile). The k-buffer seeds at +inf and merges the cap0
    # lowest-lb chunks; counts0 > cap0 flags overflow for escalation.
    cap0 = int(min(max(4 * cap, 64), ncl))
    lb0 = bbox_lower_bounds(a_lo, a_hi, b_bb_lo, b_bb_hi)
    _, cand0 = jax.lax.top_k(-lb0, cap0)
    zq = _zrow_like(a_loc)
    run_d = jnp.broadcast_to(
        (zq + jnp.asarray(jnp.inf, dtype))[:, None], (pl_rows, k)
    ).reshape(ntl, CHUNK, k)
    run_c = jnp.broadcast_to(
        zq[:, None, None], (pl_rows, k, 3)
    ).astype(dtype).reshape(ntl, CHUNK, k, 3)
    run_d, run_c = merge(run_d, run_c, cand0.astype(jnp.int32), b_loc)
    ub0 = jnp.max(
        jnp.where(valid_t, run_d[..., k - 1], -jnp.inf), axis=1)
    ub0_eff = ub0 * (1 + 8 * eps) + 8 * eps
    ovf0 = jnp.any(jnp.sum(lb0 <= ub0_eff[:, None], axis=1) > cap0)

    def step(carry, s):
        b_cur, bb_lo, bb_hi, rd, rc, ovf = carry
        ub = jnp.max(jnp.where(valid_t, rd[..., k - 1], -jnp.inf), axis=1)
        ub_eff = ub * (1 + 8 * eps) + 8 * eps
        lb = bbox_lower_bounds(a_lo, a_hi, bb_lo, bb_hi)
        qual = lb <= ub_eff[:, None]
        ovf = ovf | jnp.any(jnp.sum(qual, axis=1) > cap)
        _, cand = jax.lax.top_k(-jnp.where(qual, lb, jnp.inf), cap)
        rd, rc = merge(rd, rc, cand.astype(jnp.int32), b_cur)
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        return (jax.lax.ppermute(b_cur, axis, perm),
                jax.lax.ppermute(bb_lo, axis, perm),
                jax.lax.ppermute(bb_hi, axis, perm),
                rd, rc, ovf), None

    overflow = ovf0  # operand-derived, carries step 0's certificate verdict
    if nsh > 1:
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        carry = (jax.lax.ppermute(b_loc, axis, perm),
                 jax.lax.ppermute(b_bb_lo, axis, perm),
                 jax.lax.ppermute(b_bb_hi, axis, perm),
                 run_d, run_c, overflow)
        carry, _ = jax.lax.scan(
            step, carry, jnp.arange(1, nsh, dtype=jnp.int32))
        run_d, run_c, overflow = carry[3], carry[4], carry[5]
    return run_d.reshape(pl_rows, k), run_c.reshape(pl_rows, k, 3), overflow


# ------------------------------------------------------------------ ring k-NN


def ring_knn_coords(
    a_loc: jnp.ndarray,
    b_loc: jnp.ndarray,
    k: int,
    axis: str = "points",
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest NEIGHBOUR COORDINATES from the full ring-sharded cloud.

    Carrying coordinates (not global indices) avoids any cross-shard gather:
    the covariance for normal estimation needs only the coords. Returns
    ``(dists (Na_loc, k), coords (Na_loc, k, 3))`` sorted ascending.
    """
    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i - 1) % nsh) for i in range(nsh)]
    na = a_loc.shape[0]
    dtype = a_loc.dtype

    zq = _zrow_like(a_loc)
    run_d = zq[:, None] + jnp.asarray(jnp.inf, dtype)
    run_d = jnp.broadcast_to(run_d, (na, k))
    run_c = jnp.broadcast_to(zq[:, None, None], (na, k, 3)).astype(dtype)

    def step(carry, s):
        b_cur, run_d, run_c = carry
        idx, d = knn(a_loc, b_cur, k=k)  # local top-k (idx local to b_cur)
        c = jnp.take(b_cur, idx, axis=0)  # (na, k, 3)
        cand_d = jnp.concatenate([run_d, d], axis=1)
        cand_c = jnp.concatenate([run_c, c], axis=1)
        top_negd, pos = jax.lax.top_k(-cand_d, k)
        run_d = -top_negd
        run_c = jnp.take_along_axis(cand_c, pos[:, :, None], axis=1)
        b_next = jax.lax.ppermute(b_cur, axis, perm)
        return (b_next, run_d, run_c), None

    (_, run_d, run_c), _ = jax.lax.scan(step, (b_loc, run_d, run_c),
                                        jnp.arange(nsh, dtype=jnp.int32))
    return run_d, run_c


def ring_normals(points_loc: jnp.ndarray, k: int = DEFAULT_KNN,
                 axis: str = "points") -> jnp.ndarray:
    """PCA normals of a ring-sharded cloud (local queries, global k-NN)."""
    _, coords = ring_knn_coords(points_loc, points_loc, k=k, axis=axis)
    mean = jnp.mean(coords, axis=1, keepdims=True)
    centered = coords - mean
    cov = cov3(centered) / k  # elementwise, not MXU (see ops/normals.py)
    return smallest_eigenvector_sym3(cov)


def ring_normals_pruned(
    pts_sorted_loc: jnp.ndarray,
    bb_lo: jnp.ndarray,
    bb_hi: jnp.ndarray,
    n_valid: jnp.ndarray,
    k: int = DEFAULT_KNN,
    axis: str = "points",
    cap: int = 16,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """PCA normals of a Morton-sorted ring-sharded cloud, bound-pruned."""
    _, coords, ovf = ring_knn_coords_pruned(
        pts_sorted_loc, pts_sorted_loc, bb_lo, bb_hi, n_valid, k=k,
        axis=axis, cap=cap)
    mean = jnp.mean(coords, axis=1, keepdims=True)
    centered = coords - mean
    cov = cov3(centered) / k  # elementwise, not MXU (see ops/normals.py)
    return smallest_eigenvector_sym3(cov), ovf


# ------------------------------------------------------- full sharded step


def _local_masked_sum(x, mask):
    m = mask if x.ndim == 1 else mask[:, None]
    return jnp.sum(jnp.where(m, x, 0), axis=0)


def _local_masked_max(x, mask):
    m = mask if x.ndim == 1 else mask[:, None]
    return jnp.max(jnp.where(m, x, -jnp.inf), axis=0)


def _frame_stats(
    a_pts, b_pts, n_a, n_b, a_col, b_col, a_nrm, b_nrm,
    *, color_scheme, point_to_plane, d2_mode,
):
    """Per-frame sharded stats; runs inside shard_map, vmapped over frames.

    Both clouds of a frame pair share one padded size and the same "points"
    sharding, so the reference-mode D2 positional normal lookup (SURVEY Q3)
    is shard-local: shard i of cloud A's queries aligns with shard i of
    cloud B's normals — zero communication.
    """
    pl_rows = a_pts.shape[0]
    me = jax.lax.axis_index("points")
    q_global = me * pl_rows + jnp.arange(pl_rows)
    mask_a = q_global < n_a
    mask_b = q_global < n_b

    pay_b: list = []
    pay_a: list = []
    if color_scheme is not None:
        pay_b.append(b_col)
        pay_a.append(a_col)
    need_nn_normals = point_to_plane and d2_mode == "pc_error"
    if point_to_plane:
        if a_nrm is None:
            a_nrm = ring_normals(a_pts)
        if b_nrm is None:
            b_nrm = ring_normals(b_pts)
    if need_nn_normals:
        pay_b.append(b_nrm)
        pay_a.append(a_nrm)
    if point_to_plane:
        pay_b.append(b_pts)  # NN coords for error vectors
        pay_a.append(a_pts)

    d0, _, pay0 = ring_nn(a_pts, b_pts, payloads=tuple(pay_b))
    d1, _, pay1 = ring_nn(b_pts, a_pts, payloads=tuple(pay_a))

    def allsum(x):
        return jax.lax.psum(x, "points")

    def allmax(x):
        return jax.lax.pmax(x, "points")

    out = {
        "n_a": n_a,
        "n_b": n_b,
        "d1_sse_l": allsum(_local_masked_sum(d0, mask_a)),
        "d1_sse_r": allsum(_local_masked_sum(d1, mask_b)),
        "d1_max_l": allmax(_local_masked_max(d0, mask_a)),
        "d1_max_r": allmax(_local_masked_max(d1, mask_b)),
    }

    dself, _, _ = ring_nn(a_pts, a_pts, exclude_self=True)
    sqrt_self = jnp.sqrt(dself)
    out["self_min"] = jax.lax.pmin(
        jnp.min(jnp.where(mask_a, sqrt_self, jnp.inf)), "points"
    )
    out["self_max"] = allmax(_local_masked_max(sqrt_self, mask_a))

    k = 0
    if color_scheme is not None:
        from ..ops.color import transform_colors

        nc0, nc1 = pay0[k], pay1[k]
        k += 1
        t0 = transform_colors(a_col, "rgb", color_scheme)
        tn0 = transform_colors(nc0, "rgb", color_scheme)
        t1 = transform_colors(b_col, "rgb", color_scheme)
        tn1 = transform_colors(nc1, "rgb", color_scheme)
        diff0, diff1 = t0 - tn0, t1 - tn1
        out["c_sse_l"] = allsum(_local_masked_sum(diff0**2, mask_a))
        out["c_sse_r"] = allsum(_local_masked_sum(diff1**2, mask_b))
        h0, h1 = diff0, diff1
        if color_scheme == "rgb":  # SURVEY Q5 quirk
            h0, h1 = 255.0 * h0, 255.0 * h1
        out["c_max_l"] = allmax(_local_masked_max(h0**2, mask_a))
        out["c_max_r"] = allmax(_local_masked_max(h1**2, mask_b))

    if point_to_plane:
        if need_nn_normals:
            n_for_0, n_for_1 = pay0[k], pay1[k]
            k += 1
        else:
            n_for_0, n_for_1 = b_nrm, a_nrm  # positional, shard-aligned
        nnb, nna = pay0[k], pay1[k]
        k += 1
        err0 = a_pts - nnb
        err1 = b_pts - nna
        p0 = jnp.sum(err0 * n_for_0, axis=1) ** 2
        p1 = jnp.sum(err1 * n_for_1, axis=1) ** 2
        out["d2_sse_l"] = allsum(_local_masked_sum(p0, mask_a))
        out["d2_sse_r"] = allsum(_local_masked_sum(p1, mask_b))
        out["d2_max_l"] = allmax(_local_masked_max(p0, mask_a))
        out["d2_max_r"] = allmax(_local_masked_max(p1, mask_b))

    return out


def _frame_stats_sorted(
    a_s, b_s, a_perm, b_perm, a_lo, a_hi, b_lo, b_hi, n_a, n_b,
    a_col_s, b_col_s, a_nrm_s, b_nrm_s, nrm_for_a, nrm_for_b,
    *, color_scheme, point_to_plane, d2_mode, cap, refine_impl="auto",
):
    """Pruned per-frame sharded stats over MORTON-SORTED shards.

    Every reduction is permutation-invariant over queries, so working in
    sorted order end-to-end needs no unsort; validity is still
    ``global sorted row < n`` (sentinels sort last). The reference-mode D2
    positional normals (SURVEY Q3) are pre-gathered into the QUERY cloud's
    sorted order outside the mesh (``nrm_for_*``), so they shard with the
    queries — zero communication, unlike the neighbour payloads.
    """
    pl_rows = a_s.shape[0]
    me = jax.lax.axis_index("points")
    qa_global = me * pl_rows + jnp.arange(pl_rows)
    mask_a = qa_global < n_a
    mask_b = qa_global < n_b

    overflows = []
    need_nn_normals = point_to_plane and d2_mode == "pc_error"
    if point_to_plane and d2_mode == "reference" and (
        nrm_for_a is None or nrm_for_b is None
    ):
        # In-mesh ring estimation yields normals in each cloud's OWN sorted
        # shard order; reference-mode (Q3) positional pairing needs the
        # OPPOSITE cloud's normals at the query's original row, which only
        # pack_sorted_frames can pre-gather host-side. Fail loudly instead
        # of multiplying None (ADVICE r2 high).
        raise ValueError(
            "reference-mode D2 on sorted shards requires pre-gathered "
            "positional normals (nrm_for_a/nrm_for_b); pack frames with "
            "pack_sorted_frames(point_to_plane=True, d2_mode='reference') "
            "or use d2_mode='pc_error'"
        )
    if point_to_plane and a_nrm_s is None:
        a_nrm_s, ovf = ring_normals_pruned(a_s, a_lo, a_hi, n_a, cap=cap)
        overflows.append(ovf)
    if point_to_plane and b_nrm_s is None:
        b_nrm_s, ovf = ring_normals_pruned(b_s, b_lo, b_hi, n_b, cap=cap)
        overflows.append(ovf)

    def build_payload(pts, col, nrm):
        parts = []
        if color_scheme is not None:
            parts.append(col)
        if need_nn_normals:
            parts.append(nrm)
        if point_to_plane:
            parts.append(pts)
        if not parts:
            return None
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def split_payload(pay):
        out = {}
        c = 0
        if color_scheme is not None:
            out["col"] = pay[:, c:c + 3]
            c += 3
        if need_nn_normals:
            out["nrm"] = pay[:, c:c + 3]
            c += 3
        if point_to_plane:
            out["pts"] = pay[:, c:c + 3]
        return out

    pay_b = build_payload(b_s, b_col_s, b_nrm_s)
    pay_a = build_payload(a_s, a_col_s, a_nrm_s)

    d0, _, pr0, ovf0 = ring_nn_pruned(
        a_s, b_s, b_perm, b_lo, b_hi, n_a, n_b, payload=pay_b, cap=cap,
        refine_impl=refine_impl)
    d1, _, pr1, ovf1 = ring_nn_pruned(
        b_s, a_s, a_perm, a_lo, a_hi, n_b, n_a, payload=pay_a, cap=cap,
        refine_impl=refine_impl)
    overflows += [ovf0, ovf1]
    pay0 = split_payload(pr0) if pr0 is not None else {}
    pay1 = split_payload(pr1) if pr1 is not None else {}

    def allsum(x):
        return jax.lax.psum(x, "points")

    def allmax(x):
        return jax.lax.pmax(x, "points")

    out = {
        "n_a": n_a,
        "n_b": n_b,
        "d1_sse_l": allsum(_local_masked_sum(d0, mask_a)),
        "d1_sse_r": allsum(_local_masked_sum(d1, mask_b)),
        "d1_max_l": allmax(_local_masked_max(d0, mask_a)),
        "d1_max_r": allmax(_local_masked_max(d1, mask_b)),
    }

    dself, _, _, ovf2 = ring_nn_pruned(
        a_s, a_s, a_perm, a_lo, a_hi, n_a, n_a, exclude_self=True, cap=cap,
        refine_impl=refine_impl)
    overflows.append(ovf2)
    sqrt_self = jnp.sqrt(jnp.maximum(dself, 0.0))
    out["self_min"] = jax.lax.pmin(
        jnp.min(jnp.where(mask_a, sqrt_self, jnp.inf)), "points")
    out["self_max"] = allmax(_local_masked_max(sqrt_self, mask_a))

    if color_scheme is not None:
        from ..ops.color import transform_colors

        t0 = transform_colors(a_col_s, "rgb", color_scheme)
        tn0 = transform_colors(pay0["col"], "rgb", color_scheme)
        t1 = transform_colors(b_col_s, "rgb", color_scheme)
        tn1 = transform_colors(pay1["col"], "rgb", color_scheme)
        diff0, diff1 = t0 - tn0, t1 - tn1
        out["c_sse_l"] = allsum(_local_masked_sum(diff0**2, mask_a))
        out["c_sse_r"] = allsum(_local_masked_sum(diff1**2, mask_b))
        h0, h1 = diff0, diff1
        if color_scheme == "rgb":  # SURVEY Q5 quirk
            h0, h1 = 255.0 * h0, 255.0 * h1
        out["c_max_l"] = allmax(_local_masked_max(h0**2, mask_a))
        out["c_max_r"] = allmax(_local_masked_max(h1**2, mask_b))

    if point_to_plane:
        if need_nn_normals:
            n_for_0, n_for_1 = pay0["nrm"], pay1["nrm"]
        else:
            n_for_0, n_for_1 = nrm_for_a, nrm_for_b  # positional, pre-gathered
        err0 = a_s - pay0["pts"]
        err1 = b_s - pay1["pts"]
        p0 = jnp.sum(err0 * n_for_0, axis=1) ** 2
        p1 = jnp.sum(err1 * n_for_1, axis=1) ** 2
        out["d2_sse_l"] = allsum(_local_masked_sum(p0, mask_a))
        out["d2_sse_r"] = allsum(_local_masked_sum(p1, mask_b))
        out["d2_max_l"] = allmax(_local_masked_max(p0, mask_a))
        out["d2_max_r"] = allmax(_local_masked_max(p1, mask_b))

    ovf = functools.reduce(jnp.logical_or, overflows)
    out["nn_overflow"] = jax.lax.pmax(ovf.astype(jnp.int32), "points") > 0
    return out


def pack_sorted_frames(
    a_clouds, b_clouds, color_scheme=None, point_to_plane=False,
    d2_mode="reference",
):
    """Stack per-frame Morton-sorted arrays for sharded_pair_stats_pruned.

    All clouds must share one padded size (run_sweep_sharded pads the group
    to a common multiple of shards x 256). Uses each Cloud's cached grid
    (host-built Morton sort) and pre-gathers the sorted colours / normals
    and, for reference-mode D2, the opposite cloud's positional normals
    into query-sorted order.
    """
    import numpy as np_

    def np_take(x, perm):
        return jnp.asarray(np_.asarray(x)[np_.asarray(perm)])

    frames: typing.Dict[str, list] = {k: [] for k in (
        "a_s", "b_s", "a_perm", "b_perm", "a_lo", "a_hi", "b_lo", "b_hi",
        "n_a", "n_b", "a_col_s", "b_col_s", "a_nrm_s", "b_nrm_s",
        "nrm_for_a", "nrm_for_b")}
    for a, b in zip(a_clouds, b_clouds):
        ga, gb = a.get_grid(), b.get_grid()
        frames["a_s"].append(ga.points)
        frames["b_s"].append(gb.points)
        frames["a_perm"].append(ga.perm)
        frames["b_perm"].append(gb.perm)
        frames["a_lo"].append(ga.bbox_lo)
        frames["a_hi"].append(ga.bbox_hi)
        frames["b_lo"].append(gb.bbox_lo)
        frames["b_hi"].append(gb.bbox_hi)
        frames["n_a"].append(a.n)
        frames["n_b"].append(b.n)
        if color_scheme is not None:
            frames["a_col_s"].append(np_take(a.colors, ga.perm))
            frames["b_col_s"].append(np_take(b.colors, gb.perm))
        if point_to_plane:
            # Always pack normals for EVERY frame (all-or-nothing across the
            # group — a mixed group would stack fewer normal rows than the
            # frames axis and break shard alignment). Frames whose files
            # carry no normals use the Cloud-cached estimate, matching the
            # single-chip estimate-if-missing path (reference
            # cloud_pair.py:61-64); reference-mode positional pairing needs
            # them host-side anyway (nrm_for_* below). Callers who want
            # in-mesh ring estimation instead (pc_error mode, giant clouds)
            # can delete a_nrm_s/b_nrm_s from the packed dict.
            an, bn = a.get_normals(), b.get_normals()
            frames["a_nrm_s"].append(np_take(an, ga.perm))
            frames["b_nrm_s"].append(np_take(bn, gb.perm))
            if d2_mode == "reference":
                # Q3 positional pairing: normals of the OPPOSITE cloud at
                # the query's ORIGINAL row, pre-gathered into query-sorted
                # order so they shard with the queries.
                frames["nrm_for_a"].append(np_take(bn, ga.perm))
                frames["nrm_for_b"].append(np_take(an, gb.perm))
    packed = {}
    for k, v in frames.items():
        if not v:
            packed[k] = None
        elif k in ("n_a", "n_b"):
            packed[k] = jnp.asarray(v)
        else:
            packed[k] = jnp.stack(v)
    return packed


def sharded_pair_stats_pruned(
    mesh: Mesh,
    packed: typing.Dict[str, typing.Optional[jnp.ndarray]],
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    d2_mode: str = "reference",
    cap: int = 16,
    refine_impl: str = "auto",
) -> typing.Dict[str, jnp.ndarray]:
    """Bound-pruned multi-chip metric evaluation over sorted shards.

    ``packed`` comes from pack_sorted_frames. Returns the same stats dict as
    sharded_pair_stats plus ``nn_overflow`` (B,) — frames with True must be
    re-evaluated with a larger ``cap`` (run_sweep_sharded escalates).
    ``refine_impl``: per-shard refinement backend — "auto" picks the pallas
    merge kernel on TPU f32, the XLA refine elsewhere.
    """
    if point_to_plane and d2_mode == "reference":
        na_h = np.asarray(packed["n_a"])
        nb_h = np.asarray(packed["n_b"])
        bad = np.nonzero(na_h > nb_h)[0]
        if bad.size:
            f = int(bad[0])
            raise IndexError(
                "reference D2 mode requires n_origin <= n_reconst per frame "
                f"(frame {f}: {int(na_h[f])} > {int(nb_h[f])}); "
                "use d2_mode='pc_error'"
            )
    keys = ("a_s", "b_s", "a_perm", "b_perm", "a_lo", "a_hi", "b_lo",
            "b_hi", "n_a", "n_b", "a_col_s", "b_col_s", "a_nrm_s",
            "b_nrm_s", "nrm_for_a", "nrm_for_b")
    present = tuple(k for k in keys if packed.get(k) is not None)
    fn = _pruned_mapped(mesh, present, color_scheme, point_to_plane,
                        d2_mode, cap, refine_impl)
    return fn(*[packed[k] for k in present])


# Rung memo for the sharded escalation ladder, keyed per problem shape
# (same discipline as ops/nn_pruned.py _ESCALATION_MEMO).
_RING_LADDER: typing.Dict[tuple, tuple] = {}


def sharded_pair_stats_pruned_auto(
    mesh: Mesh,
    packed: typing.Dict[str, typing.Optional[jnp.ndarray]],
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    d2_mode: str = "reference",
    cap: int = 16,
    refine_impl: str = "auto",
) -> typing.Dict[str, jnp.ndarray]:
    """sharded_pair_stats_pruned with the cap-escalation ladder + rung memo.

    Callers previously re-climbed the ladder from the base rung on EVERY
    evaluation, paying one full device evaluation plus a synchronous
    overflow readback per wasted rung: 96.5 ms of the 248 ms 1-device
    smoke call at 100k was ladder re-probing
    (tools/profile_sharded_split.py). Remember the settling cap per
    problem shape; ladder_lookup retries the base rung periodically so
    one pathological frame group cannot pin the expensive rung forever.

    Exactness bound: once ``cap >= ncl`` (chunks per shard) no ring step
    can overflow (counts <= ncl = cap), so the ladder terminates exact.
    """
    from ..ops.grid import CHUNK
    from ..utils.cache import ladder_lookup, ladder_store

    nsh = mesh.devices.shape[1]
    ncl = packed["b_s"].shape[1] // (nsh * CHUNK)
    key = (
        mesh.devices.shape,
        packed["a_s"].shape, packed["b_s"].shape,
        color_scheme, point_to_plane, d2_mode, refine_impl,
    )
    cap = min(ladder_lookup(_RING_LADDER, key, cap), max(ncl, 1))
    while True:
        stats = sharded_pair_stats_pruned(
            mesh, packed, color_scheme=color_scheme,
            point_to_plane=point_to_plane, d2_mode=d2_mode, cap=cap,
            refine_impl=refine_impl)
        if cap >= ncl or not bool(np.asarray(stats["nn_overflow"]).any()):
            ladder_store(_RING_LADDER, key, cap)
            return stats
        cap = min(cap * 4, ncl)


@functools.lru_cache(maxsize=64)
def _pruned_mapped(mesh, present, color_scheme, point_to_plane, d2_mode,
                   cap, refine_impl):
    """Build-and-cache the jitted shard_map for sharded_pair_stats_pruned.

    ``jax.jit`` caches traces by FUNCTION IDENTITY; rebuilding the
    shard_map closure per call made every repeat invocation retrace the
    whole ring graph (seconds of host time per pair on a 1-core driver —
    the round-5 smoke measured 0.074 Mpts/s rebuilt vs cached). Keyed on
    the mesh (hashable) and every static that shapes the trace."""
    keys = ("a_s", "b_s", "a_perm", "b_perm", "a_lo", "a_hi", "b_lo",
            "b_hi", "n_a", "n_b", "a_col_s", "b_col_s", "a_nrm_s",
            "b_nrm_s", "nrm_for_a", "nrm_for_b")

    def per_frame(*args):
        named = dict(zip(present, args))
        return _frame_stats_sorted(
            *[named.get(k) for k in keys],
            color_scheme=color_scheme, point_to_plane=point_to_plane,
            d2_mode=d2_mode, cap=cap, refine_impl=refine_impl,
        )

    fspec = P("frames")
    pspec = P("frames", "points")
    in_specs = tuple(fspec if k in ("n_a", "n_b") else pspec
                     for k in present)
    local_fn = jax.vmap(per_frame)
    mapped = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=fspec,
    )
    return jax.jit(mapped)


def sharded_pair_stats(
    mesh: Mesh,
    a_pts: jnp.ndarray,  # (B, P, 3)
    b_pts: jnp.ndarray,  # (B, P, 3) — same padded P as a_pts
    n_a: jnp.ndarray,  # (B,)
    n_b: jnp.ndarray,  # (B,)
    a_col: typing.Optional[jnp.ndarray] = None,
    b_col: typing.Optional[jnp.ndarray] = None,
    a_nrm: typing.Optional[jnp.ndarray] = None,
    b_nrm: typing.Optional[jnp.ndarray] = None,
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    d2_mode: str = "reference",
) -> typing.Dict[str, jnp.ndarray]:
    """Batched multi-chip metric evaluation: DP over frames, ring over points.

    Returns per-frame stats dicts of shape (B,) [or (B, 3) for colour],
    feedable to ops.fused.finalize_stats frame-by-frame.
    """
    if point_to_plane and d2_mode == "reference":
        # Reference-mode D2 reads positional normals of the OTHER cloud at
        # the query's own row (SURVEY Q3); rows beyond n_b hold padding
        # normals and would silently contaminate d2_sse/d2_max. The
        # single-chip paths raise on this input; match them here.
        na_h, nb_h = np.asarray(n_a), np.asarray(n_b)
        bad = np.nonzero(na_h > nb_h)[0]
        if bad.size:
            f = int(bad[0])
            raise IndexError(
                "reference D2 mode requires n_origin <= n_reconst per frame "
                f"(frame {f}: {int(na_h[f])} > {int(nb_h[f])}); "
                "use d2_mode='pc_error'"
            )
    optional = {"a_col": a_col, "b_col": b_col, "a_nrm": a_nrm, "b_nrm": b_nrm}
    present = tuple(k for k, v in optional.items() if v is not None)
    fn = _brute_mapped(mesh, present, color_scheme, point_to_plane, d2_mode)
    return fn(a_pts, b_pts, n_a, n_b, *[optional[k] for k in present])


@functools.lru_cache(maxsize=64)
def _brute_mapped(mesh, present, color_scheme, point_to_plane, d2_mode):
    """Build-and-cache the jitted shard_map for sharded_pair_stats — same
    retrace-per-call trap as _pruned_mapped (jit caches by function
    identity; a per-call closure never hits)."""

    def per_frame(ap, bp, na_, nb_, *rest):
        named = dict(zip(present, rest))
        return _frame_stats(
            ap, bp, na_, nb_,
            named.get("a_col"), named.get("b_col"),
            named.get("a_nrm"), named.get("b_nrm"),
            color_scheme=color_scheme,
            point_to_plane=point_to_plane,
            d2_mode=d2_mode,
        )

    local_fn = jax.vmap(per_frame)
    pspec = P("frames", "points")
    fspec = P("frames")
    in_specs = (pspec, pspec, fspec, fspec) + (pspec,) * len(present)

    # Fresh in-scan carries are explicitly pcast to varying (_pvary), so
    # the varying-axis checker stays ON for the whole sharded path.
    mapped = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=fspec,
    )
    return jax.jit(mapped)
