"""Fused bbox select/count kernel equivalence (interpret mode on CPU).

The fused prologue kernels (ops/select_pallas.py) replace the materialised
(nta, ncb) lower-bound matrix + lax.top_k. Contract:

* on integer-valued (voxel) coordinates every bound is an exact f32
  integer, so the kernel order is BIT-identical to the XLA masked-lb
  order — asserted exactly;
* on arbitrary float coordinates the bound may be recompiled with
  different f32 contraction (measured 1-ulp disagreements), so the
  kernel only promises its own internally-consistent rounded space —
  asserted within one rounding bucket;
* counts use an inflated threshold (count_slack) and must NEVER
  under-count the true-lb qualifying set, from any compilation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds
from open_pcc_metric_tpu.ops.select_pallas import (
    _key_bits, count_bbox_pallas, count_slack, mask_lb, select_bbox_pallas,
)


def _int_boxes(rng, n, scale=1024):
    lo = rng.integers(0, scale, (n, 3)).astype(np.float32)
    hi = lo + rng.integers(0, scale // 20 + 1, (n, 3)).astype(np.float32)
    return lo, hi


def _float_boxes(rng, n, scale=100.0):
    lo = rng.uniform(0, scale, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0, scale / 20, (n, 3)).astype(np.float32)
    return lo, hi


def _lbs(a_lo, a_hi, b_lo, b_hi):
    lb = bbox_lower_bounds(jnp.asarray(a_lo), jnp.asarray(a_hi),
                           jnp.asarray(b_lo), jnp.asarray(b_hi))
    ncbp = ((b_lo.shape[0] + 127) // 128) * 128
    return np.asarray(lb), np.asarray(mask_lb(lb, ncbp)), ncbp


@pytest.mark.quick
@pytest.mark.parametrize("nta,ncb,cap", [
    (5, 7, 4), (16, 300, 32), (33, 129, 16), (40, 1000, 64), (1, 128, 8),
])
def test_select_integer_coords_bit_exact(nta, ncb, cap):
    # integer gaps => exact f32 bounds => compile-order independent
    rng = np.random.default_rng(nta * 1000 + ncb)
    a_lo, a_hi = _int_boxes(rng, nta)
    b_lo, b_hi = _int_boxes(rng, ncb)
    _, lbm, _ = _lbs(a_lo, a_hi, b_lo, b_hi)

    cand, lbsel = select_bbox_pallas(a_lo, a_hi, b_lo, b_hi, cap,
                                     interpret=True)
    cand, lbsel = np.asarray(cand), np.asarray(lbsel)

    ref = np.lexsort(
        (np.tile(np.arange(ncb), (nta, 1)), lbm), axis=1)[:, :cap]
    np.testing.assert_array_equal(cand, ref)
    np.testing.assert_array_equal(
        lbsel, np.take_along_axis(lbm, cand, axis=1))


@pytest.mark.quick
@pytest.mark.parametrize("nta,ncb,cap", [(33, 129, 16), (40, 1000, 64)])
def test_select_float_coords_within_one_bucket(nta, ncb, cap):
    # arbitrary floats: the kernel's rounded space may differ from the
    # XLA-computed one by 1 ulp of the raw bound => at most one bucket.
    rng = np.random.default_rng(nta + ncb)
    a_lo, a_hi = _float_boxes(rng, nta)
    b_lo, b_hi = _float_boxes(rng, ncb)
    _, lbm, ncbp = _lbs(a_lo, a_hi, b_lo, b_hi)

    cand, lbsel = select_bbox_pallas(a_lo, a_hi, b_lo, b_hi, cap,
                                     interpret=True)
    cand, lbsel = np.asarray(cand), np.asarray(lbsel)

    # internally consistent: ascending, unique columns
    assert np.all(np.diff(lbsel, axis=1) >= 0)
    assert all(len(set(r)) == cap for r in cand)
    # within one rounding bucket of the XLA space at the selected cols
    sel_xla = np.take_along_axis(lbm, cand, axis=1)
    bi = lbsel.view(np.int32).astype(np.int64)
    xi = sel_xla.view(np.int32).astype(np.int64)
    assert np.max(np.abs(bi - xi)) <= (1 << _key_bits(ncbp))
    # no non-selected chunk is better than a selected one by > 1 bucket
    worst_sel = lbsel[:, -1]
    mask = np.ones((nta, ncb), bool)
    np.put_along_axis(mask, cand, False, axis=1)
    best_out = np.where(mask, lbm, np.inf).min(axis=1)
    bo = best_out.astype(np.float32).view(np.int32).astype(np.int64)
    ws = worst_sel.view(np.int32).astype(np.int64)
    assert np.all(bo >= ws - (1 << _key_bits(ncbp)))


@pytest.mark.quick
def test_select_tie_order_lowest_index():
    # identical chunk bboxes everywhere: order must be 0..cap-1
    a_lo = np.zeros((3, 3), np.float32)
    a_hi = np.ones((3, 3), np.float32)
    b_lo = np.tile(np.float32([10, 0, 0]), (200, 1))
    b_hi = b_lo + 1
    cand, _ = select_bbox_pallas(a_lo, a_hi, b_lo, b_hi, 16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(cand), np.tile(np.arange(16, dtype=np.int32), (3, 1)))


@pytest.mark.quick
@pytest.mark.parametrize("nta,ncb,integer", [
    (9, 77, True), (32, 513, True), (3, 4096, True), (32, 513, False),
])
def test_count_sound_and_integer_exact(nta, ncb, integer):
    rng = np.random.default_rng(nta + ncb)
    mk = _int_boxes if integer else _float_boxes
    a_lo, a_hi = mk(rng, nta)
    b_lo, b_hi = mk(rng, ncb)
    lb, lbm, ncbp = _lbs(a_lo, a_hi, b_lo, b_hi)

    for q in (0.0, 0.05, 0.5, 1.0):
        thr = np.quantile(lbm, q, axis=1).astype(np.float32)
        cnt = np.asarray(count_bbox_pallas(
            a_lo, a_hi, b_lo, b_hi, thr, interpret=True))
        thr_inf = thr * (1.0 + count_slack(ncbp))
        ref = (lbm <= thr_inf[:, None]).sum(axis=1).astype(np.int32)
        if integer:
            np.testing.assert_array_equal(cnt, ref)
        # soundness from ANY compilation: never under-counts the
        # true-lb qualifying set, nor the select-space one
        true_cnt = (lb <= thr[:, None]).sum(axis=1)
        sel_cnt = (lbm <= thr[:, None]).sum(axis=1)
        assert np.all(cnt >= true_cnt)
        assert np.all(cnt >= sel_cnt)


@pytest.mark.quick
def test_mask_lb_rounds_down_and_is_monotonic():
    rng = np.random.default_rng(7)
    lb = (rng.uniform(0, 1e6, (64, 256)) ** 2).astype(np.float32)
    lb[0, :4] = [0.0, np.inf, 1e-38, 3.4e38]
    m = np.asarray(mask_lb(jnp.asarray(lb), 8192))
    assert np.all(m[np.isfinite(lb)] <= lb[np.isfinite(lb)])
    assert np.isinf(m[0, 1])
    order = np.argsort(lb, axis=1, kind="stable")
    msorted = np.take_along_axis(m, order, axis=1)
    assert np.all(np.diff(msorted, axis=1) >= 0)  # order-preserving


@pytest.mark.quick
@pytest.mark.parametrize("exclude_self,integer", [
    (False, True), (True, True), (False, False),
])
def test_select_prologue_nn_matches_oracle(exclude_self, integer,
                                           monkeypatch):
    """End-to-end 1-NN with PCC_NN_PROLOGUE=select is bit-exact vs the
    brute-force oracle (lowest-original-index tie-breaks included), on
    integer AND float coordinates (float exercises the rounded-space
    certificate). Trace-cache-busted and counter-asserted so the fused
    prologue provably executes (ADVICE r4 discipline)."""
    from tests import oracle
    from open_pcc_metric_tpu.ops import select_pallas
    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.nn_pruned import (
        nn_pruned_sorted, unsort_nn_result,
    )

    monkeypatch.setenv("PCC_NN_SCHED", "counted")
    monkeypatch.setenv("PCC_NN_PROLOGUE", "select")
    nn_pruned_sorted.clear_cache()

    calls = {"select": 0, "count": 0}
    orig_sel = select_pallas.select_bbox_pallas
    orig_cnt = select_pallas.count_bbox_pallas
    monkeypatch.setattr(
        select_pallas, "select_bbox_pallas",
        lambda *a, **k: (calls.__setitem__("select", calls["select"] + 1),
                         orig_sel(*a, **k))[1])
    monkeypatch.setattr(
        select_pallas, "count_bbox_pallas",
        lambda *a, **k: (calls.__setitem__("count", calls["count"] + 1),
                         orig_cnt(*a, **k))[1])

    rng = np.random.default_rng(3 + exclude_self + 2 * integer)
    na, nb, p = 3100, 2900, 4096
    if integer:
        A = rng.integers(0, 64, (na, 3)).astype(float)
        B = A.copy() if exclude_self else rng.integers(
            0, 64, (nb, 3)).astype(float)
    else:
        A = rng.uniform(0, 37.3, (na, 3))
        B = A.copy() if exclude_self else rng.uniform(0, 37.3, (nb, 3))
    ga = build_grid_host(A, p, dtype=jnp.float32)
    gb = ga if exclude_self else build_grid_host(B, p, dtype=jnp.float32)
    try:
        d_s, i_s, ovf = nn_pruned_sorted(
            ga, gb, jnp.asarray(na), exclude_self=exclude_self,
            cap=24, fallback_tiles=48, refine_impl="pallas_interpret")
        assert not bool(ovf)
        assert calls["select"] >= 1 and calls["count"] >= 2
        d, idx = unsort_nn_result(ga, gb, d_s, i_s)
        d, idx = np.asarray(d)[:na], np.asarray(idx)[:na]
        Bv = A if exclude_self else B
        # the oracle works on the same f32 values the kernel saw
        A32 = np.asarray(ga.points)[np.argsort(np.asarray(ga.perm))][:na]
        B32 = A32 if exclude_self else np.asarray(
            gb.points)[np.argsort(np.asarray(gb.perm))][:nb]
        oidx, od = oracle.nn_bruteforce(A32, B32, exclude_self=exclude_self)
        np.testing.assert_array_equal(idx, oidx)
        # integer coords: every distance is an exact f32 integer => bit
        # equality. float coords: XLA emits FMAs the numpy oracle doesn't,
        # so same-winner distances differ by a few ulps (indices above are
        # still exact-equal).
        rtol = 0 if integer else 1e-6
        np.testing.assert_allclose(d, od, rtol=rtol, atol=0)
    finally:
        # the select-mode executable must not leak into later tests that
        # reuse these shapes under the default prologue
        nn_pruned_sorted.clear_cache()


@pytest.mark.quick
@pytest.mark.parametrize("cap,ft", [(16, 32), (12, 64)])
def test_select_prologue_knn_moments_matches_default(cap, ft, monkeypatch):
    """k-NN + in-kernel moments with PCC_KNN_PROLOGUE=select: indices and
    distances bit-equal the default prologue (the exact k-set is unique);
    moment SUMS agree to f32 accumulation order (the sel-mode tier
    recompute sweeps the XLA-space prefix instead of extending the rounded
    one, so the same member set is summed in a different order). Tiny caps
    force the stage-2 tiers and the moments scratch path to execute.
    PCC_KNN_* knobs are call-time statics, so no trace-cache busting is
    needed — but kernel execution is still counter-asserted."""
    from open_pcc_metric_tpu.ops import select_pallas
    from open_pcc_metric_tpu.ops.grid import build_grid
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted
    from open_pcc_metric_tpu.cloud import PAD_SENTINEL

    rng = np.random.default_rng(cap * 100 + ft)
    pts = np.unique(
        rng.integers(0, 128, (9000, 3)), axis=0).astype(np.float32)
    n = pts.shape[0]
    p = ((n + 2047) // 2048) * 2048
    buf = np.full((p, 3), PAD_SENTINEL, np.float32)
    buf[:n] = pts
    g = build_grid(jnp.asarray(buf), jnp.asarray(n))

    d0, i0, ov0, m0 = knn_pruned_sorted(
        g, g, jnp.asarray(n), 30, cap=cap, fallback_tiles=ft,
        refine_impl="pallas_interpret", with_moments=True)

    calls = {"select": 0, "count": 0}
    orig_sel = select_pallas.select_bbox_pallas
    orig_cnt = select_pallas.count_bbox_pallas
    monkeypatch.setattr(
        select_pallas, "select_bbox_pallas",
        lambda *a, **k: (calls.__setitem__("select", calls["select"] + 1),
                         orig_sel(*a, **k))[1])
    monkeypatch.setattr(
        select_pallas, "count_bbox_pallas",
        lambda *a, **k: (calls.__setitem__("count", calls["count"] + 1),
                         orig_cnt(*a, **k))[1])
    monkeypatch.setenv("PCC_KNN_PROLOGUE", "select")
    d1, i1, ov1, m1 = knn_pruned_sorted(
        g, g, jnp.asarray(n), 30, cap=cap, fallback_tiles=ft,
        refine_impl="pallas_interpret", with_moments=True)
    assert calls["select"] >= 1 and calls["count"] >= 3
    assert bool(ov0) == bool(ov1)

    valid = np.arange(p) < n
    np.testing.assert_array_equal(np.asarray(i1)[valid],
                                  np.asarray(i0)[valid])
    np.testing.assert_array_equal(np.asarray(d1)[valid],
                                  np.asarray(d0)[valid])
    np.testing.assert_allclose(np.asarray(m1)[valid],
                               np.asarray(m0)[valid], rtol=2e-5, atol=2e-3)
