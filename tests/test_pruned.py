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
