"""Kernel-vs-numpy-oracle equivalence tests (SURVEY §4c)."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.cloud import Cloud, PAD_SENTINEL, pad_bucket
from open_pcc_metric_tpu.ops.nn import nn_chunked, recompute_dist_sq
from open_pcc_metric_tpu.ops.knn import knn
from open_pcc_metric_tpu.ops.eigh3 import smallest_eigenvector_sym3
from open_pcc_metric_tpu.ops.normals import estimate_normals
from open_pcc_metric_tpu.ops.obb import minimal_obb_extent
from open_pcc_metric_tpu.metric import _stable_sum

import oracle


def _pad(pts, dtype=jnp.float64):
    c = Cloud.from_numpy(pts, dtype=dtype)
    return c.points, c.n


class TestNN:
    @pytest.mark.parametrize("na,nb", [(100, 100), (333, 777), (1000, 500)])
    def test_cross_matches_oracle(self, na, nb):
        rng = np.random.default_rng(42)
        a = rng.uniform(0, 100, (na, 3))
        b = rng.uniform(0, 100, (nb, 3))
        pa, _ = _pad(a)
        pb, _ = _pad(b)
        idx, d = nn_chunked(pa, pb)
        oidx, od = oracle.nn_bruteforce(a, b)
        np.testing.assert_array_equal(np.asarray(idx)[:na], oidx)
        np.testing.assert_allclose(np.asarray(d)[:na], od, rtol=1e-12)

    def test_self_exclusion(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 10, (500, 3))
        pa, _ = _pad(a)
        idx, d = nn_chunked(pa, pa, exclude_self=True)
        oidx, od = oracle.nn_bruteforce(a, a, exclude_self=True)
        np.testing.assert_array_equal(np.asarray(idx)[:500], oidx)
        np.testing.assert_allclose(np.asarray(d)[:500], od, rtol=1e-12)
        assert not np.any(np.asarray(idx)[:500] == np.arange(500))

    def test_tie_breaks_lowest_index(self):
        # b contains duplicated points: argmin must return the first copy.
        a = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
        b = np.array(
            [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5.0, 5.0, 4.0], [5.0, 5.0, 4.0]]
        )
        pa, _ = _pad(a)
        pb, _ = _pad(b)
        idx, d = nn_chunked(pa, pb)
        assert int(idx[0]) == 0
        assert int(idx[1]) == 2

    def test_padding_never_wins(self):
        a = np.full((10, 3), 1e6)  # close-ish to nothing
        b = np.zeros((7, 3))
        pa, _ = _pad(a)
        pb, _ = _pad(b)
        idx, d = nn_chunked(pa, pb)
        assert np.all(np.asarray(idx)[:10] < 7)

    def test_recompute_dist_matches(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 100, (200, 3))
        b = rng.uniform(0, 100, (300, 3))
        pa, _ = _pad(a)
        pb, _ = _pad(b)
        idx, d = nn_chunked(pa, pb)
        d2 = recompute_dist_sq(pa, pb, idx)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d), rtol=1e-12)

    def test_float32_voxel_exact(self):
        # Integer coords < 2^10: float32 arithmetic is exact.
        rng = np.random.default_rng(7)
        a = rng.integers(0, 1024, (800, 3)).astype(np.float64)
        b = rng.integers(0, 1024, (600, 3)).astype(np.float64)
        pa, _ = _pad(a, jnp.float32)
        pb, _ = _pad(b, jnp.float32)
        idx, d = nn_chunked(pa, pb)
        oidx, od = oracle.nn_bruteforce(a, b)
        np.testing.assert_array_equal(np.asarray(idx)[:800], oidx)
        np.testing.assert_array_equal(np.asarray(d)[:800].astype(np.float64), od)


class TestKNN:
    @pytest.mark.parametrize("k", [1, 5, 30])
    def test_matches_oracle(self, k):
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 50, (400, 3))
        b = rng.uniform(0, 50, (700, 3))
        pa, _ = _pad(a)
        pb, _ = _pad(b)
        idx, d = knn(pa, pb, k=k)
        oidx, od = oracle.knn_bruteforce(a, b, k)
        np.testing.assert_allclose(np.asarray(d)[:400], od, rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(idx)[:400], oidx)

    def test_self_included_first(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 50, (300, 3))
        pa, _ = _pad(a)
        idx, d = knn(pa, pa, k=5)
        np.testing.assert_array_equal(np.asarray(idx)[:300, 0], np.arange(300))
        np.testing.assert_allclose(np.asarray(d)[:300, 0], 0.0, atol=1e-30)


class TestEigh3:
    def test_random_symmetric(self):
        rng = np.random.default_rng(5)
        M = rng.normal(size=(500, 3, 3))
        A = M @ np.transpose(M, (0, 2, 1))
        v = np.asarray(smallest_eigenvector_sym3(jnp.asarray(A)))
        w, V = np.linalg.eigh(A)
        ref = V[:, :, 0]
        dots = np.abs(np.sum(v * ref, axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-6)

    def test_diagonal_and_degenerate(self):
        A = np.stack(
            [
                np.diag([3.0, 2.0, 1.0]),
                np.diag([1.0, 2.0, 3.0]),
                np.eye(3),  # isotropic -> fallback (0,0,1)
                np.zeros((3, 3)),  # zero -> fallback
            ]
        )
        v = np.asarray(smallest_eigenvector_sym3(jnp.asarray(A)))
        assert abs(abs(v[0] @ [0, 0, 1]) - 1) < 1e-6
        assert abs(abs(v[1] @ [1, 0, 0]) - 1) < 1e-6
        np.testing.assert_allclose(np.abs(v[2]), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.abs(v[3]), [0, 0, 1], atol=1e-6)

    def test_unit_norm(self):
        rng = np.random.default_rng(6)
        M = rng.normal(size=(100, 3, 3))
        A = M @ np.transpose(M, (0, 2, 1))
        v = np.asarray(smallest_eigenvector_sym3(jnp.asarray(A)))
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(8)
        xy = rng.uniform(0, 10, (2000, 2))
        pts = np.concatenate([xy, 0.5 * np.ones((2000, 1))], axis=1)
        pa, n = _pad(pts)
        normals = np.asarray(estimate_normals(pa))[:n]
        dots = np.abs(normals @ [0.0, 0.0, 1.0])
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    def test_matches_oracle_pca_on_surface(self):
        rng = np.random.default_rng(9)
        v = rng.normal(size=(3000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v * 50.0
        pa, n = _pad(pts)
        ours = np.asarray(estimate_normals(pa))[:n]
        ref = oracle.pca_normals(pts)
        dots = np.abs(np.sum(ours * ref, axis=1))
        # sign-invariant agreement; a handful of tie-flipped neighbourhoods ok
        assert np.quantile(dots, 0.01) > 0.999


class TestOBB:
    def test_rotated_box(self):
        rng = np.random.default_rng(10)
        dims = np.array([4.0, 2.0, 1.0])
        pts = rng.uniform(0, 1, (5000, 3)) * dims
        # random rotation
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        rot = pts @ R.T + np.array([5.0, -3.0, 7.0])
        ext = minimal_obb_extent(rot)
        np.testing.assert_allclose(sorted(ext), sorted(dims), rtol=0.02)

    def test_close_to_aabb_on_axis_aligned_data(self):
        # The hull-face search has no AABB candidate frame (same as Open3D's
        # CreateFromPointsMinimal), so it can exceed the AABB volume slightly
        # on axis-aligned data — but must stay close.
        rng = np.random.default_rng(11)
        pts = rng.normal(size=(3000, 3)) * [3.0, 1.0, 0.2]
        ext = minimal_obb_extent(pts)
        aabb = pts.max(0) - pts.min(0)
        assert np.prod(ext) <= np.prod(aabb) * 1.15

    def test_degenerate_small(self):
        pts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
        ext = minimal_obb_extent(pts)
        assert ext.shape == (3,)


# -------------------------- Open3D golden fixtures (optional, see docs/
# OBB_DERIVATION.md): generated by tools/make_o3d_goldens.py in an
# environment where open3d installs; skipped when the file is absent.
_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                        "o3d_goldens.json")


@pytest.mark.skipif(
    not os.path.exists(_GOLDENS),
    reason="Open3D golden fixtures missing — the executed normals/OBB parity "
           "check vs the actual Open3D-backed reference is PENDING. In any "
           "environment where `pip install open3d` works, run "
           "`python tools/make_o3d_goldens.py` and commit "
           "tests/goldens/o3d_goldens.json (install attempts in this "
           "zero-egress env: docs/open3d_install_attempt.log)")
def test_open3d_goldens():
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "make_o3d_goldens",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "make_o3d_goldens.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    with open(_GOLDENS) as f:
        goldens = json.load(f)
    for rec in goldens["clouds"]:
        pts = gen.golden_cloud(rec["seed"], goldens["n"])
        # Minimal-OBB extent: compare as sorted triples (frame order is
        # qhull-enumeration-dependent; the metric uses only max(extent)).
        ext = np.sort(minimal_obb_extent(pts))
        np.testing.assert_allclose(
            ext, np.sort(np.asarray(rec["obb_extent_sorted"])), rtol=1e-6)
        # Normals: sign-invariant comparison (unoriented on both sides).
        ours = np.asarray(estimate_normals(jnp.asarray(pts, jnp.float32)))
        theirs = np.asarray(rec["normals"])
        dot = np.abs(np.sum(ours * theirs, axis=1))
        assert np.quantile(dot, 0.01) > 0.999


def test_stable_sum_accuracy():
    rng = np.random.default_rng(12)
    x = rng.uniform(0, 1, 800_000).astype(np.float32)
    ours = float(_stable_sum(jnp.asarray(x)))
    exact = float(np.sum(x.astype(np.float64)))
    assert abs(ours - exact) / exact < 1e-6


def test_pad_bucket():
    assert pad_bucket(1) == 256
    assert pad_bucket(256) == 256
    assert pad_bucket(257) == 512
    n = 800_000
    p = pad_bucket(n)
    assert p >= n and p % 256 == 0 and (p - n) / n < 0.13


def test_pad_bucket_pow2_policy():
    assert pad_bucket(300_000, policy="pow2") == 1 << 19
    assert pad_bucket(100, policy="pow2") == 256


def test_obb_numpy_mode_matches_device_mode():
    """minimal_obb_extent(device=False) — the accelerator-free path used by
    the bench's CPU baseline — picks the same frame and extent as the
    device projection sweep (up to f32-vs-f64 sweep rounding, which only
    affects WHICH near-tied frame wins; the winning extent is recomputed
    in f64 either way)."""
    rng = np.random.default_rng(17)
    pts = rng.normal(size=(4000, 3)) * [4.0, 2.0, 1.0] + 10.0
    e_dev = minimal_obb_extent(pts, device=True)
    e_np = minimal_obb_extent(pts, device=False)
    np.testing.assert_allclose(sorted(e_np), sorted(e_dev), rtol=1e-5)
