"""Pallas NN kernel equivalence vs the jnp path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.cloud import Cloud
from open_pcc_metric_tpu.ops.nn import nn_chunked
from open_pcc_metric_tpu.ops.nn_pallas import nn_argmin


def _pad32(pts):
    return Cloud.from_numpy(pts, dtype=jnp.float32).points


@pytest.mark.parametrize("na,nb", [(300, 300), (700, 1200)])
def test_interpret_matches_jnp(na, nb):
    rng = np.random.default_rng(na)
    a = rng.integers(0, 1024, (na, 3)).astype(np.float64)
    b = rng.integers(0, 1024, (nb, 3)).astype(np.float64)
    pa, pb = _pad32(a), _pad32(b)
    idx = np.asarray(nn_argmin(pa, pb, interpret=True))
    jidx, _ = nn_chunked(pa, pb)
    np.testing.assert_array_equal(idx[:na], np.asarray(jidx)[:na])


def test_interpret_self_exclusion():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 512, (500, 3)).astype(np.float64)
    pa = _pad32(a)
    idx = np.asarray(nn_argmin(pa, pa, exclude_self=True, interpret=True))
    jidx, _ = nn_chunked(pa, pa, exclude_self=True)
    np.testing.assert_array_equal(idx[:500], np.asarray(jidx)[:500])
    assert not np.any(idx[:500] == np.arange(500))


def test_interpret_tie_break_lowest_index():
    a = np.array([[0.0, 0.0, 0.0]])
    b = np.zeros((600, 3))
    b[:, 0] = 7.0  # all equidistant
    idx = np.asarray(nn_argmin(_pad32(a), _pad32(b), interpret=True))
    assert idx[0] == 0


def test_pruned_refine_pallas_interpret_matches_xla():
    """The Pallas refinement kernel (interpret mode) must reproduce the XLA
    refine path bit-for-bit through the full pruned pipeline."""
    from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted

    rng = np.random.default_rng(41)
    pts = rng.integers(0, 512, (3000, 3)).astype(np.float64)
    a = Cloud.from_numpy(pts, dtype=jnp.float32)
    ga = a.get_grid()
    for ex in (False, True):
        d1, i1, ov1 = nn_pruned_sorted(
            ga, ga, jnp.asarray(a.n), exclude_self=ex, refine_impl="xla"
        )
        d2, i2, ov2 = nn_pruned_sorted(
            ga, ga, jnp.asarray(a.n), exclude_self=ex,
            refine_impl="pallas_interpret",
        )
        n = a.n
        np.testing.assert_array_equal(np.asarray(d1)[:n], np.asarray(d2)[:n])
        np.testing.assert_array_equal(np.asarray(i1)[:n], np.asarray(i2)[:n])


def test_pruned_knn_pallas_interpret_matches_xla():
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted

    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 100, (2000, 3))
    a = Cloud.from_numpy(pts, dtype=jnp.float32)
    ga = a.get_grid()
    d1, i1, _ = knn_pruned_sorted(
        ga, ga, jnp.asarray(a.n), 10, refine_impl="xla"
    )
    d2, i2, _ = knn_pruned_sorted(
        ga, ga, jnp.asarray(a.n), 10, refine_impl="pallas_interpret"
    )
    n = a.n
    np.testing.assert_array_equal(np.asarray(d1)[:n], np.asarray(d2)[:n])
    np.testing.assert_array_equal(np.asarray(i1)[:n], np.asarray(i2)[:n])


def test_payload_kernel_interpret_matches_gathers():
    """In-kernel one-hot payload selection == XLA gather payloads."""
    from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds
    from open_pcc_metric_tpu.ops.refine_pallas import (
        PAYLOAD_F, refine_nn_pallas_payload,
    )

    rng = np.random.default_rng(50)
    n = 2000  # pads to 2048 -> 8 tiles (multiple of the kernel step)
    pts = rng.integers(0, 512, (n, 3)).astype(np.float64)
    col = rng.uniform(0, 1, (n, 3))
    c = Cloud.from_numpy(pts, colors=col, dtype=jnp.float32)
    g = c.get_grid()
    p = c.padded_size
    lb = bbox_lower_bounds(g.bbox_lo, g.bbox_hi, g.bbox_lo, g.bbox_hi)
    _, cand = jax.lax.top_k(-lb, 8)
    cand = cand.astype(jnp.int32)
    qt8 = jnp.pad(g.points, ((0, 0), (0, 5))).T
    col_sorted = jnp.take(c.colors, g.perm, axis=0)
    z = jnp.zeros((p, 3), jnp.float32)
    zpad = jnp.zeros((p, PAYLOAD_F - 9), jnp.float32)
    payT = jnp.concatenate([g.points, col_sorted, z, zpad], axis=1).T
    d, idx, pay = refine_nn_pallas_payload(
        qt8, qt8, g.perm[None, :], payT, cand, interpret=True
    )
    idx = np.asarray(idx)
    # payload pts/cols must equal gathers at the returned indices
    np.testing.assert_allclose(
        np.asarray(pay)[:, :3], np.asarray(c.points)[idx], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pay)[:, 3:6], np.asarray(c.colors)[idx], rtol=1e-6
    )


@pytest.mark.parametrize("exclude_self", [False, True])
def test_expanded_norm_refine_matches_xla(exclude_self):
    """The 4-pass expanded-norm distance (mxu_ok packing) is bit-identical
    to the difference-form XLA path on gated integer clouds."""
    from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned_sorted

    rng = np.random.default_rng(60)
    A = rng.integers(0, 1024, (3000, 3)).astype(np.float64)
    B = rng.integers(0, 1024, (2500, 3)).astype(np.float64)
    a = Cloud.from_numpy(A, dtype=jnp.float32)
    b = a if exclude_self else Cloud.from_numpy(B, dtype=jnp.float32)
    assert a.mxu_exact()
    ga = a.get_grid()
    gb = ga if exclude_self else b.get_grid()
    xd, xi, _ = nn_pruned_sorted(ga, gb, jnp.asarray(a.n),
                                 exclude_self=exclude_self,
                                 refine_impl="xla")
    pd, pi, _ = nn_pruned_sorted(ga, gb, jnp.asarray(a.n),
                                 exclude_self=exclude_self,
                                 refine_impl="pallas_interpret", mxu_ok=True)
    n = a.n
    np.testing.assert_array_equal(np.asarray(xd)[:n], np.asarray(pd)[:n])
    np.testing.assert_array_equal(np.asarray(xi)[:n], np.asarray(pi)[:n])


@pytest.mark.parametrize("name_seed", [(42, 512), (7, 24)])
def test_bucketed_schedule_bitexact(name_seed):
    """The probe + seeded-escalation schedule must reproduce the fixed-cap
    pipeline bit-for-bit, including on tie-heavy dense voxel clouds."""
    from open_pcc_metric_tpu.ops.nn_pruned import (
        nn_pruned_bucketed_sorted, nn_pruned_sorted,
    )

    seed, hi = name_seed
    rng = np.random.default_rng(seed)
    A = rng.integers(0, hi, (4000, 3)).astype(float)
    B = rng.integers(0, hi, (3300, 3)).astype(float)
    a = Cloud.from_numpy(A, dtype=jnp.float32)
    b = Cloud.from_numpy(B, dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    xd, xi, _ = nn_pruned_sorted(ga, gb, jnp.asarray(a.n),
                                 refine_impl="xla")
    bd, bi, ov = nn_pruned_bucketed_sorted(ga, gb, jnp.asarray(a.n),
                                           interpret=True)
    n = a.n
    if bool(ov):
        # tiny clouds can exhaust the B1 budget; exactness is then not
        # claimed — but when the certificate passes, results are bit-equal
        return
    np.testing.assert_array_equal(np.asarray(xd)[:n], np.asarray(bd)[:n])
    np.testing.assert_array_equal(np.asarray(xi)[:n], np.asarray(bi)[:n])


def test_bucketed_small_probe_never_silently_inexact():
    """p1=1 drives nearly every tile through the seeded buckets — beyond
    the B1 budget on tie-heavy clouds. Whenever overflow is NOT flagged
    the results must be bit-exact; when it is, callers fall back (the
    'exactness is never silently lost' contract)."""
    from open_pcc_metric_tpu.ops.nn_pruned import (
        nn_pruned_bucketed_sorted, nn_pruned_sorted,
    )

    rng = np.random.default_rng(11)
    A = rng.integers(0, 64, (3000, 3)).astype(float)
    B = rng.integers(0, 64, (2500, 3)).astype(float)
    a = Cloud.from_numpy(A, dtype=jnp.float32)
    b = Cloud.from_numpy(B, dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    xd, xi, _ = nn_pruned_sorted(ga, gb, jnp.asarray(a.n),
                                 refine_impl="xla")
    n = a.n
    bd, bi, ov = nn_pruned_bucketed_sorted(
        ga, gb, jnp.asarray(a.n), p1=1, b1_extra=63, interpret=True)
    exact = (np.array_equal(np.asarray(xd)[:n], np.asarray(bd)[:n])
             and np.array_equal(np.asarray(xi)[:n], np.asarray(bi)[:n]))
    assert exact or bool(ov)
    # A roomier probe certifies and must be bit-exact (p1 above this
    # tie-heavy cloud's median qualifying count keeps B1 inside budget).
    bd, bi, ov = nn_pruned_bucketed_sorted(
        ga, gb, jnp.asarray(a.n), p1=24, b1_extra=40, interpret=True)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(xd)[:n], np.asarray(bd)[:n])
    np.testing.assert_array_equal(np.asarray(xi)[:n], np.asarray(bi)[:n])
