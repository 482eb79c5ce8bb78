"""Pruned (Morton-grid) NN: equivalence vs brute force + certificate tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.cloud import Cloud
from open_pcc_metric_tpu.ops.nn import nn_chunked, nearest_neighbors
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned, _nn_pruned_jit
from open_pcc_metric_tpu.ops.grid import build_grid, morton_codes, CHUNK
from open_pcc_metric_tpu.ops.fused import pair_stats

import oracle


def _pad(pts, dtype=jnp.float64):
    c = Cloud.from_numpy(pts, dtype=dtype)
    return c.points, c.n


DATASETS = {
    "uniform": lambda rng: (rng.uniform(0, 100, (3000, 3)),
                            rng.uniform(0, 100, (2500, 3))),
    "voxel": lambda rng: (rng.integers(0, 512, (4000, 3)).astype(float),
                          rng.integers(0, 512, (3500, 3)).astype(float)),
    "clusters": lambda rng: (
        np.concatenate([rng.normal(loc=rng.uniform(0, 1000, 3), scale=5,
                                   size=(500, 3)) for _ in range(8)]),
        np.concatenate([rng.normal(loc=rng.uniform(0, 1000, 3), scale=5,
                                   size=(400, 3)) for _ in range(8)]),
    ),
    "plane": lambda rng: (
        np.concatenate([rng.uniform(0, 100, (2000, 2)),
                        np.zeros((2000, 1))], 1),
        np.concatenate([rng.uniform(0, 100, (1500, 2)),
                        0.5 * np.ones((1500, 1))], 1),
    ),
    "outliers": lambda rng: (
        np.concatenate([rng.uniform(0, 10, (2000, 3)),
                        rng.uniform(1e5, 2e5, (10, 3))]),
        np.concatenate([rng.uniform(0, 10, (1800, 3)),
                        rng.uniform(1e5, 2e5, (5, 3))]),
    ),
}


@pytest.mark.parametrize("name", sorted(DATASETS))
def test_cross_matches_bruteforce(name):
    rng = np.random.default_rng(hash(name) % 2**31)
    a, b = DATASETS[name](rng)
    pa, na = _pad(a)
    pb, nb = _pad(b)
    pi, pd = nn_pruned(pa, pb, na, nb)
    ji, jd = nn_chunked(pa, pb)
    np.testing.assert_allclose(
        np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
    )
    # neighbour indices may differ only on exact distance ties
    diff = np.asarray(pi)[:na] != np.asarray(ji)[:na]
    if diff.any():
        bb = np.asarray(pb)
        d_alt = ((a[diff] - bb[np.asarray(pi)[:na][diff]]) ** 2).sum(1)
        np.testing.assert_allclose(d_alt, np.asarray(jd)[:na][diff], rtol=1e-12)


@pytest.mark.parametrize("name", ["uniform", "voxel", "plane"])
def test_self_matches_bruteforce(name):
    rng = np.random.default_rng(1 + hash(name) % 2**31)
    a, _ = DATASETS[name](rng)
    pa, na = _pad(a)
    pi, pd = nn_pruned(pa, pa, na, na, exclude_self=True)
    ji, jd = nn_chunked(pa, pa, exclude_self=True)
    np.testing.assert_allclose(
        np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
    )
    assert not np.any(np.asarray(pi)[:na] == np.arange(na))


def test_escalation_tiny_cap_is_exact():
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 100, (4000, 3))
    b = rng.uniform(0, 100, (3000, 3))
    pa, na = _pad(a)
    pb, nb = _pad(b)
    # cap=1, fallback=1 forces overflow + escalation loops
    pi, pd = nn_pruned(pa, pb, na, nb, cap=1, fallback_tiles=1)
    ji, jd = nn_chunked(pa, pb)
    np.testing.assert_allclose(
        np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
    )


def test_overflow_flag_reported():
    rng = np.random.default_rng(8)
    a = rng.uniform(0, 100, (4000, 3))
    b = rng.uniform(0, 100, (3000, 3))
    pa, na = _pad(a)
    pb, nb = _pad(b)
    _, _, overflow = _nn_pruned_jit(
        pa, pb, jnp.asarray(na), jnp.asarray(nb), False, 1, 1
    )
    assert bool(overflow)


def test_morton_sentinels_sort_last():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 100, (300, 3))
    pa, na = _pad(pts)
    g = build_grid(pa, jnp.asarray(na))
    # rows >= na in sorted order must be exactly the sentinel originals
    assert set(np.asarray(g.perm)[na:]) == set(range(na, pa.shape[0]))


def test_dispatcher_selects_pruned_for_big():
    # shape-based auto dispatch: >= threshold uses pruned (works on CPU too)
    rng = np.random.default_rng(10)
    a = rng.uniform(0, 100, (70000, 3))
    b = rng.uniform(0, 100, (1000, 3))
    pa, na = _pad(a, jnp.float32)
    pb, nb = _pad(b, jnp.float32)
    idx, d = nearest_neighbors(pa, pb, n_a=na, n_b=nb)
    oidx, od = oracle.nn_bruteforce(a[:2000], np.asarray(pb)[:nb])
    np.testing.assert_allclose(
        np.asarray(d)[:2000], od, rtol=1e-5
    )


def test_fused_pruned_backend_matches_jnp():
    rng = np.random.default_rng(11)
    pts0 = rng.integers(0, 512, (3000, 3)).astype(float)
    pts1 = rng.integers(0, 512, (2500, 3)).astype(float)
    c0 = rng.uniform(0, 1, pts0.shape)
    c1 = rng.uniform(0, 1, pts1.shape)
    a = Cloud.from_numpy(pts0, colors=c0, dtype=jnp.float64)
    b = Cloud.from_numpy(pts1, colors=c1, dtype=jnp.float64)
    kw = dict(a_col=a.colors, b_col=b.colors, color_scheme="ycc")
    s1 = pair_stats(a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
                    backend="jnp", **kw)
    s2 = pair_stats(a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
                    backend="pruned", **kw)
    assert not bool(s2["nn_overflow"])
    for k in s1:
        np.testing.assert_allclose(
            np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-9, err_msg=k
        )


class TestKnnPruned:
    def test_matches_bruteforce(self):
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned
        from open_pcc_metric_tpu.ops.knn import knn as knn_brute

        rng = np.random.default_rng(20)
        a = rng.uniform(0, 100, (3000, 3))
        pa, na = _pad(a)
        pi, pd = knn_pruned(pa, pa, na, na, k=30)
        ji, jd = knn_brute(pa, pa, k=30)
        np.testing.assert_allclose(
            np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
        )
        # tie-free data: index sets must agree exactly
        np.testing.assert_array_equal(np.asarray(pi)[:na], np.asarray(ji)[:na])

    def test_escalation_exact(self):
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned
        from open_pcc_metric_tpu.ops.knn import knn as knn_brute

        rng = np.random.default_rng(21)
        a = rng.uniform(0, 50, (2000, 3))
        pa, na = _pad(a)
        pi, pd = knn_pruned(pa, pa, na, na, k=10, cap=1, fallback_tiles=1)
        ji, jd = knn_brute(pa, pa, k=10)
        np.testing.assert_allclose(
            np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
        )

    def test_normals_via_pruned_match_brute(self):
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned
        from open_pcc_metric_tpu.ops.normals import normals_from_neighbors
        from open_pcc_metric_tpu.ops.normals import estimate_normals

        rng = np.random.default_rng(22)
        v = rng.normal(size=(3000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v * 50.0
        pa, na = _pad(pts)
        idx, _ = knn_pruned(pa, pa, na, na, k=30)
        ours = np.asarray(normals_from_neighbors(pa, idx, 30))[:na]
        ref = np.asarray(estimate_normals(pa))[:na]
        dots = np.abs(np.sum(ours * ref, axis=1))
        assert np.quantile(dots, 0.01) > 0.9999


def test_host_grid_matches_device_grid_results():
    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.nn_pruned import (
        nn_pruned_sorted, unsort_nn_result,
    )

    rng = np.random.default_rng(30)
    a = rng.uniform(0, 100, (3000, 3))
    b = rng.uniform(0, 100, (2500, 3))
    ca = Cloud.from_numpy(a, dtype=jnp.float64)
    cb = Cloud.from_numpy(b, dtype=jnp.float64)
    ga = build_grid_host(ca.host_points, ca.padded_size, dtype=jnp.float64)
    gb = build_grid_host(cb.host_points, cb.padded_size, dtype=jnp.float64)
    d_s, i_s, ov = nn_pruned_sorted(ga, gb, jnp.asarray(ca.n))
    d, idx = unsort_nn_result(ga, gb, d_s, i_s)
    ji, jd = nn_chunked(ca.points, cb.points)
    np.testing.assert_allclose(
        np.asarray(d)[:ca.n], np.asarray(jd)[:ca.n], rtol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(idx)[:ca.n],
                                  np.asarray(ji)[:ca.n])


def test_boundary_stats_cached_from_knn_estimation(monkeypatch):
    """VERDICT r2 #2 shared work: slot 1 of the 30-NN estimation pass IS the
    intra-cloud NN distance; the cached boundary stats must be bit-equal to
    the dedicated self-excluded pass."""
    import numpy as np
    import jax.numpy as jnp

    from open_pcc_metric_tpu.cloud import Cloud
    from open_pcc_metric_tpu.ops import normals as nops
    from open_pcc_metric_tpu.ops.fused import boundary_stats

    monkeypatch.setattr(nops, "_PRUNE_THRESHOLD", 1024)
    rng = np.random.default_rng(3)
    pts = np.unique(rng.integers(0, 64, (3000, 3)), axis=0).astype(float)
    a = Cloud.from_numpy(pts, dtype=jnp.float32, pad_to=4096)
    b = Cloud.from_numpy(pts, dtype=jnp.float32, pad_to=4096)
    mn_ref, mx_ref = boundary_stats(b, backend="jnp")
    nops.estimate_normals_cloud(a)
    assert getattr(a, "_boundary_stats", None) is not None
    mn, mx = a._boundary_stats
    assert float(mn) == float(mn_ref)
    assert float(mx) == float(mx_ref)


@pytest.mark.parametrize("exclude_self", [False, True])
def test_counted_schedule_matches_oracle(exclude_self, monkeypatch):
    """Count-gated two-pass stage 1 (PCC_NN_SCHED=counted) is bit-exact vs
    the oracle, including lowest-original-index tie-breaks."""
    import numpy as np
    import jax.numpy as jnp

    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.nn_pruned import (
        nn_pruned_sorted, unsort_nn_result,
    )

    monkeypatch.setenv("PCC_NN_SCHED", "counted")
    rng = np.random.default_rng(7)
    na, nb = 3000, 2800
    A = rng.integers(0, 64, (na, 3)).astype(float)
    B = A.copy() if exclude_self else rng.integers(
        0, 64, (nb, 3)).astype(float)
    p = 4096
    ga = build_grid_host(A, p, dtype=jnp.float32)
    gb = ga if exclude_self else build_grid_host(B, p, dtype=jnp.float32)
    d_s, i_s, ovf = nn_pruned_sorted(
        ga, gb, jnp.asarray(na), exclude_self=exclude_self,
        cap=16, fallback_tiles=64, refine_impl="pallas_interpret")
    assert not bool(ovf)
    d, idx = unsort_nn_result(ga, gb, d_s, i_s)
    d, idx = np.asarray(d)[:na], np.asarray(idx)[:na]
    Bv = A if exclude_self else B
    oidx, od = oracle.nn_bruteforce(A, Bv, exclude_self=exclude_self)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(d, od, rtol=0, atol=0)


def test_counted_knn_schedule_matches_bruteforce(monkeypatch):
    """Count-gated, probe-seeded k-NN (PCC_KNN_SCHED=counted) reproduces
    brute-force distances exactly."""
    import numpy as np
    import jax.numpy as jnp

    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted

    monkeypatch.setenv("PCC_KNN_SCHED", "counted")
    rng = np.random.default_rng(11)
    na, p, k = 3000, 4096, 30
    A = rng.integers(0, 64, (na, 3)).astype(float)
    ga = build_grid_host(A, p, dtype=jnp.float32)
    dk, ik, ovf = knn_pruned_sorted(
        ga, ga, jnp.asarray(na), k, cap=16, fallback_tiles=64,
        refine_impl="pallas_interpret")
    assert not bool(ovf)
    inv = np.zeros(p, np.int32)
    inv[np.asarray(ga.perm)] = np.arange(p)
    dk = np.asarray(dk)[inv][:na]
    d2 = ((A[:, None, :] - A[None, :, :]) ** 2).sum(-1)
    od = np.sort(d2, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(dk, np.float64), od,
                               rtol=1e-6, atol=1e-6)


def test_ext_sorted_slices_matches_unsorted(monkeypatch):
    """Need-sorted sliced extension (PCC_KNN_EXT_SORTED) is bit-identical
    to the rectangular gated extension: same per-tile candidate order and
    seeds, tiles independent. Covers slice padding (nta=24, slice 16) and
    the width-ladder switch.

    The env flips below genuinely retrace: knn_pruned_sorted resolves
    PCC_KNN_* at call time into a static KnnFlags argument (ADVICE r4
    found the pre-hoist version of this test comparing one cached trace
    to itself). The counters prove the sorted paths actually entered the
    traced program — run 1 must be rectangular-only, run 2 sorted."""
    import numpy as np
    import jax.numpy as jnp

    import open_pcc_metric_tpu.ops.knn_pruned as kp
    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted

    calls = {"ext": 0, "mom": 0}
    real_ext, real_mom = kp._ext_sorted_slices, kp._mom_sorted_slices

    def count_ext(*a, **kw):
        calls["ext"] += 1
        return real_ext(*a, **kw)

    def count_mom(*a, **kw):
        calls["mom"] += 1
        return real_mom(*a, **kw)

    monkeypatch.setattr(kp, "_ext_sorted_slices", count_ext)
    monkeypatch.setattr(kp, "_mom_sorted_slices", count_mom)

    monkeypatch.setenv("PCC_KNN_SCHED", "counted")
    rng = np.random.default_rng(17)
    na, p, k = 5000, 6144, 30
    A = rng.integers(0, 96, (na, 3)).astype(float)
    ga = build_grid_host(A, p, dtype=jnp.float32)

    # Run 1: rectangular extension AND rectangular moments (the default
    # slice of 512 exceeds nta=24, so neither sorted path may engage).
    monkeypatch.setenv("PCC_KNN_EXT_SORTED", "0")
    d0, i0, ov0, m0 = knn_pruned_sorted(
        ga, ga, jnp.asarray(na), k, cap=16, fallback_tiles=64,
        refine_impl="pallas_interpret", with_moments=True)
    assert calls == {"ext": 0, "mom": 0}

    # Run 2: both sorted paths engage (nta=24 >= slice 16).
    monkeypatch.setenv("PCC_KNN_EXT_SORTED", "1")
    monkeypatch.setenv("PCC_KNN_EXT_SLICE", "16")
    d1, i1, ov1, m1 = knn_pruned_sorted(
        ga, ga, jnp.asarray(na), k, cap=16, fallback_tiles=64,
        refine_impl="pallas_interpret", with_moments=True)
    assert calls["ext"] >= 1, "sorted extension never executed (stale trace?)"
    assert calls["mom"] >= 1, "sorted moments never executed (stale trace?)"

    assert bool(ov0) == bool(ov1)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    # Moments: same chunk set per tile, accumulated in a different slice
    # order — bit-identical per-tile sums (each tile's accumulation order
    # over its candidate chunks is unchanged).
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))


def test_ext_two_level_matches_rectangular(monkeypatch):
    """Two-level extension (PCC_KNN_EXT_E1): level-1 in-place + compacted
    tier is bit-identical to the rectangular gated extension, on BOTH
    lax.cond branches (tier and the rectangular-rest fallback).

    Branch coverage is deterministic: the helper is also called directly
    with a synthetic need vector — fte=nta guarantees the tier branch
    (n_exceed <= nta always) and an all-exceed need with fte < nta
    guarantees the fallback branch."""
    import jax
    import jax.numpy as jnp

    import open_pcc_metric_tpu.ops.knn_pruned as kp
    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted
    from open_pcc_metric_tpu.ops.refine_pallas import refine_knn_pallas_t

    calls = {"two": 0}
    real_two = kp._ext_two_level

    def count_two(*a, **kw):
        calls["two"] += 1
        return real_two(*a, **kw)

    monkeypatch.setattr(kp, "_ext_two_level", count_two)
    monkeypatch.setenv("PCC_KNN_SCHED", "counted")
    rng = np.random.default_rng(23)
    na, p, k = 5000, 6144, 30
    A = rng.integers(0, 96, (na, 3)).astype(float)
    ga = build_grid_host(A, p, dtype=jnp.float32)

    monkeypatch.setenv("PCC_KNN_EXT_E1", "0")
    d0, i0, ov0, m0 = knn_pruned_sorted(
        ga, ga, jnp.asarray(na), k, cap=16, fallback_tiles=64,
        refine_impl="pallas_interpret", with_moments=True)
    assert calls["two"] == 0

    # Integrated: e1=2 with a generous and a tiny tier budget.
    for fte in ("24", "8"):
        monkeypatch.setenv("PCC_KNN_EXT_E1", "2")
        monkeypatch.setenv("PCC_KNN_EXT_FTE", fte)
        d1, i1, ov1, m1 = knn_pruned_sorted(
            ga, ga, jnp.asarray(na), k, cap=16, fallback_tiles=64,
            refine_impl="pallas_interpret", with_moments=True)
        assert calls["two"] >= 1, "two-level extension never executed"
        assert bool(ov0) == bool(ov1)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))

    # Direct helper call: deterministic branch selection.
    nta, cap, p1, e1 = p // CHUNK, 16, 8, 2
    g = ga
    valid_t = (np.arange(p) < na).reshape(nta, CHUNK)
    big = jnp.asarray(jnp.finfo(jnp.float32).max)
    tiles = g.points.reshape(nta, CHUNK, 3)
    vt = jnp.asarray(valid_t)
    a_lo = jnp.min(jnp.where(vt[:, :, None], tiles, big), axis=1)
    a_hi = jnp.max(jnp.where(vt[:, :, None], tiles, -big), axis=1)
    lb = bbox_lower_bounds(a_lo, a_hi, g.bbox_lo, g.bbox_hi)
    cand = jax.lax.top_k(-lb, cap)[1].astype(jnp.int32)
    qt8 = jnp.pad(g.points, ((0, 0), (0, 5))).T
    b8r = jnp.pad(g.points, ((0, 0), (0, 5)))
    d1_, i1_ = refine_knn_pallas_t(
        qt8, b8r, g.perm[None, :], cand[:, :p1], k, interpret=True)
    need_all = jnp.full((nta,), e1 + 3, jnp.int32)  # every tile exceeds e1
    want_d, want_i = refine_knn_pallas_t(
        qt8, b8r, g.perm[None, :], cand[:, p1:], k,
        ncand=need_all, init=(d1_, i1_), interpret=True)
    # fte=nta: n_exceed <= fte, tier branch.
    td, ti = real_two(qt8, b8r, g.perm[None, :], cand, p1, e1, need_all,
                      k, (d1_, i1_), True, nta)
    np.testing.assert_array_equal(np.asarray(td), np.asarray(want_d))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(want_i))
    # fte=8 < n_exceed=nta: rectangular-rest fallback branch.
    fd, fi = real_two(qt8, b8r, g.perm[None, :], cand, p1, e1, need_all,
                      k, (d1_, i1_), True, 8)
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(want_d))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(want_i))


class TestKnnMoments:
    """In-kernel covariance moments (knn_pruned_sorted with_moments=True):
    the normal-estimation epilogue without the (P, k, 3) gather."""

    @staticmethod
    def _grid_of(pts):
        from open_pcc_metric_tpu.cloud import PAD_SENTINEL

        n = pts.shape[0]
        p = ((n + 2047) // 2048) * 2048
        buf = np.full((p, 3), PAD_SENTINEL, np.float32)
        buf[:n] = pts
        return build_grid(jnp.asarray(buf), jnp.asarray(n)), buf, n, p

    def test_kernel_matches_gather_fallback(self):
        """Pallas (interpret) moments == the gather-based fallback exactly,
        including the count-gated stage-2 tier extensions (tiny cap)."""
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted

        rng = np.random.default_rng(41)
        pts = np.unique(
            rng.integers(0, 128, (9000, 3)), axis=0).astype(np.float32)
        g, _, n, p = self._grid_of(pts)
        for cap, ft in ((16, 32), (8, 64)):
            dk, ik, _, mom = knn_pruned_sorted(
                g, g, jnp.asarray(n), 30, cap=cap, fallback_tiles=ft,
                with_moments=True)
            dk2, ik2, _, mom2 = knn_pruned_sorted(
                g, g, jnp.asarray(n), 30, cap=cap, fallback_tiles=ft,
                refine_impl="pallas_interpret", with_moments=True)
            valid = np.arange(p) < n
            np.testing.assert_array_equal(np.asarray(ik2)[valid],
                                          np.asarray(ik)[valid])
            np.testing.assert_allclose(np.asarray(mom2)[valid],
                                       np.asarray(mom)[valid],
                                       rtol=1e-6, atol=1e-4)
            # exactly k members per valid query (n >= k)
            assert np.all(np.asarray(mom)[valid, 0] == 30)
            assert np.all(np.asarray(mom2)[valid, 0] == 30)

    def test_moment_normals_match_gather_normals(self):
        """normals_from_moments == normals_from_neighbors on the same
        exact k-NN sets (sign-invariant, fp-tolerance)."""
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted
        from open_pcc_metric_tpu.ops.normals import (
            normals_from_moments, normals_from_neighbors,
        )

        rng = np.random.default_rng(42)
        v = rng.normal(size=(8000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * 50.0).astype(np.float32)
        g, buf, n, p = self._grid_of(pts)
        dk, ik, ov, mom = knn_pruned_sorted(
            g, g, jnp.asarray(n), 30, cap=64, fallback_tiles=256,
            with_moments=True)
        assert not bool(ov)
        nm = np.asarray(normals_from_moments(mom))
        ng = np.asarray(normals_from_neighbors(jnp.asarray(buf), ik, 30))
        valid = np.arange(p) < n
        dots = np.abs(np.sum(nm[valid] * ng[valid], axis=1))
        assert np.quantile(dots, 0.001) > 0.999

    def test_estimate_normals_cloud_uses_moments(self, monkeypatch):
        """The cloud path (moments) agrees with the brute gather path."""
        from open_pcc_metric_tpu.ops import normals as nops
        from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned
        from open_pcc_metric_tpu.ops.normals import normals_from_neighbors

        monkeypatch.setattr(nops, "_PRUNE_THRESHOLD", 1024)
        rng = np.random.default_rng(43)
        pts = np.unique(
            rng.integers(0, 128, (6000, 3)), axis=0).astype(float)
        c = Cloud.from_numpy(pts, dtype=jnp.float32)
        n = c.n
        nrm_new = np.asarray(nops.estimate_normals_cloud(c))
        idx, _ = knn_pruned(c.points, c.points, n, n, k=30)
        nrm_old = np.asarray(normals_from_neighbors(
            c.points, idx, 30, n_valid=jnp.asarray(n)))
        dots = np.abs(np.sum(nrm_new[:n] * nrm_old[:n], axis=1))
        assert np.quantile(dots, 0.001) > 0.999

    def test_fewer_than_k_points_routes_to_brute(self, monkeypatch):
        """n < k clouds keep FLANN 'fewer neighbours' semantics (the
        moments membership would count sentinel rows)."""
        from open_pcc_metric_tpu.ops import normals as nops

        monkeypatch.setattr(nops, "_PRUNE_THRESHOLD", 1024)
        rng = np.random.default_rng(44)
        pts = rng.uniform(0, 10, (20, 3))
        c = Cloud.from_numpy(pts, dtype=jnp.float32, pad_to=2048)
        nrm = np.asarray(nops.estimate_normals_cloud(c))[: c.n]
        assert np.all(np.isfinite(nrm))
        norms = np.linalg.norm(nrm, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_knn_helix_sparse_chunks_matches_xla(monkeypatch):
    """Counted k-NN on a line-structured cloud: later chunks contribute
    only a few qualifying candidates per query (warm k-buffers, exact
    integer ties) — the merge gate's sparse-contribution regime must stay
    lex-exact vs the XLA extractor."""
    from open_pcc_metric_tpu.ops.grid import build_grid_host
    from open_pcc_metric_tpu.ops.knn_pruned import knn_pruned_sorted

    monkeypatch.setenv("PCC_KNN_SCHED", "counted")
    rng = np.random.default_rng(23)
    n, p, k = 4000, 4096, 8
    # Dense integer helix: Morton chunks become arc segments; a query's
    # k-NN live almost entirely in its own chunk, adjacent chunks add
    # 1-2 boundary candidates (ties included: integer coords).
    t = np.arange(n) * 0.11
    A = np.stack([np.round(40 * np.cos(t)) + 64,
                  np.round(40 * np.sin(t)) + 64,
                  np.round(t)], axis=1).astype(float)
    A += rng.integers(0, 2, A.shape)  # integer jitter -> exact ties exist
    ga = build_grid_host(A, p, dtype=jnp.float32)
    dk, ik, ovf = knn_pruned_sorted(
        ga, ga, jnp.asarray(n), k, cap=16, fallback_tiles=64,
        refine_impl="pallas_interpret")
    dk_x, ik_x, ovf_x = knn_pruned_sorted(
        ga, ga, jnp.asarray(n), k, cap=16, fallback_tiles=64,
        refine_impl="xla")
    valid = np.arange(p) < n
    np.testing.assert_array_equal(np.asarray(dk)[valid],
                                  np.asarray(dk_x)[valid])
    np.testing.assert_array_equal(np.asarray(ik)[valid],
                                  np.asarray(ik_x)[valid])
