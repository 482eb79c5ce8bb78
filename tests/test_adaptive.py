"""Adaptive certificate-driven refinement: exactness + parity (interpret mode).

The adaptive pipeline (ops/refine_adaptive.py + nn_pruned_adaptive_sorted)
must be bit-interchangeable with the legacy pruned path and the brute-force
oracle, across both distance flavours (VPU difference-form and MXU
expanded-norm, the latter only on gated integer clouds).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.cloud import Cloud
from open_pcc_metric_tpu.ops.nn import nn_chunked
from open_pcc_metric_tpu.ops.nn_pruned import (
    nn_pruned_adaptive_sorted,
    nn_pruned_sorted,
    unsort_nn_result,
)


def _clouds(name, seed=0):
    rng = np.random.default_rng(seed)
    # Adaptive refinement is gated on integer clouds (MXU exactness), so
    # every dataset here is integer-valued; "clusters"/"plane" shapes are
    # rounded to keep the adversarial geometry.
    if name == "voxel":
        A = rng.integers(0, 512, (4000, 3)).astype(float)
        B = rng.integers(0, 512, (3500, 3)).astype(float)
    elif name == "clusters":
        A = np.round(np.concatenate(
            [rng.normal(loc=rng.uniform(0, 1000, 3), scale=5,
                        size=(500, 3)) for _ in range(8)]))
        B = np.round(np.concatenate(
            [rng.normal(loc=rng.uniform(0, 1000, 3), scale=5,
                        size=(400, 3)) for _ in range(8)]))
    elif name == "plane":
        A = np.concatenate([rng.integers(0, 100, (2000, 2)),
                            np.zeros((2000, 1), dtype=np.int64)],
                           1).astype(float)
        B = np.concatenate([rng.integers(0, 100, (1500, 2)),
                            np.ones((1500, 1), dtype=np.int64)],
                           1).astype(float)
    else:
        raise KeyError(name)
    a = Cloud.from_numpy(A, dtype=jnp.float32)
    b = Cloud.from_numpy(B, dtype=jnp.float32)
    return a, b


@pytest.mark.parametrize("name", ["voxel", "clusters", "plane"])
@pytest.mark.parametrize("exclude_self", [False, True])
def test_adaptive_bitexact_vs_legacy(name, exclude_self):
    a, b = _clouds(name)
    ga = a.get_grid()
    gs = ga if exclude_self else b.get_grid()
    ld, li, _ = nn_pruned_sorted(ga, gs, jnp.asarray(a.n),
                                 exclude_self=exclude_self,
                                 refine_impl="xla")
    ad, ai, ov = nn_pruned_adaptive_sorted(ga, gs, jnp.asarray(a.n),
                                           exclude_self=exclude_self,
                                           interpret=True)
    assert not bool(ov)
    n = a.n
    assert np.array_equal(np.asarray(ld)[:n], np.asarray(ad)[:n])
    assert np.array_equal(np.asarray(li)[:n], np.asarray(ai)[:n])


def test_adaptive_bitexact_vs_bruteforce():
    a, b = _clouds("voxel")
    assert a.mxu_exact() and b.mxu_exact()
    ga, gb = a.get_grid(), b.get_grid()
    ad, ai, _ = nn_pruned_adaptive_sorted(ga, gb, jnp.asarray(a.n),
                                          interpret=True)
    du, iu = unsort_nn_result(ga, gb, ad, ai)
    ji, jd = nn_chunked(a.points, b.points)
    n = a.n
    np.testing.assert_array_equal(
        np.asarray(du)[:n], np.asarray(jd)[:n].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(iu)[:n], np.asarray(ji)[:n])


def test_mxu_gate():
    rng = np.random.default_rng(3)
    ints = Cloud.from_numpy(rng.integers(0, 1024, (500, 3)).astype(float))
    floats = Cloud.from_numpy(rng.uniform(0, 100, (500, 3)))
    big = Cloud.from_numpy(rng.integers(0, 4096, (500, 3)).astype(float))
    assert ints.mxu_exact()
    assert not floats.mxu_exact()
    assert not big.mxu_exact()  # 6*C^2 would overflow exact f32 integers


def test_adaptive_small_budget_overflows_then_escalates():
    """Tiny caps must flag overflow, never silently return inexact results;
    the caller-level escalation (exercised via small explicit knobs here)
    converges to exact."""
    a, b = _clouds("voxel", seed=7)
    ga, gb = a.get_grid(), b.get_grid()
    d8, i8, ov = nn_pruned_adaptive_sorted(
        ga, gb, jnp.asarray(a.n), cap=8, ft3=8, p1=2, interpret=True
    )
    ji, jd = nn_chunked(a.points, b.points)
    n = a.n
    d8u, _ = unsort_nn_result(ga, gb, d8, i8)
    exact = np.array_equal(np.asarray(d8u)[:n],
                           np.asarray(jd)[:n].astype(np.float32))
    # Either the small budget sufficed (exact) or overflow was reported.
    assert exact or bool(ov)
    # Full-chunk cap == brute force: always exact, never overflows.
    ncb = gb.n_chunks
    dF, iF, ovF = nn_pruned_adaptive_sorted(
        ga, gb, jnp.asarray(a.n), cap=ncb, ft3=8, p1=2, interpret=True
    )
    assert not bool(ovF)
    dFu, iFu = unsort_nn_result(ga, gb, dF, iF)
    np.testing.assert_array_equal(
        np.asarray(dFu)[:n], np.asarray(jd)[:n].astype(np.float32)
    )


def test_adaptive_tail_pass_exercised():
    """Force count > cap for many tiles (tiny cap) and check the P3 tail
    path still produces exact results when the tail budget covers them."""
    rng = np.random.default_rng(11)
    # Dense duplicate-heavy ball: most tiles see many equidistant chunks.
    A = rng.integers(0, 24, (3000, 3)).astype(float)
    B = rng.integers(0, 24, (2600, 3)).astype(float)
    a = Cloud.from_numpy(A, dtype=jnp.float32)
    b = Cloud.from_numpy(B, dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    nta = ga.points.shape[0] // 256
    d, i, ov = nn_pruned_adaptive_sorted(
        ga, gb, jnp.asarray(a.n), cap=2, ft3=nta, p1=1, interpret=True
    )
    assert not bool(ov)
    du, iu = unsort_nn_result(ga, gb, d, i)
    ji, jd = nn_chunked(a.points, b.points)
    n = a.n
    np.testing.assert_array_equal(
        np.asarray(du)[:n], np.asarray(jd)[:n].astype(np.float32)
    )
    # tie-break parity: indices must match the jnp oracle exactly
    np.testing.assert_array_equal(np.asarray(iu)[:n], np.asarray(ji)[:n])
