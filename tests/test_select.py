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
