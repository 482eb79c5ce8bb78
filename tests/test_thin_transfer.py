"""Thin host->device transfer path (cloud.from_numpy thin=True).

The sweep pipeline is fetch-bound on the host->device link
(tools/profile_upload.py: ~60 ms fixed + ~40 MB/s through the tunnel), so
integer-voxel points ride int16 and 8-bit colors ride uint8, widened ON
DEVICE. These tests pin the bit-identity contract: a thin-loaded Cloud is
indistinguishable from a wide-loaded one.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from open_pcc_metric_tpu.cloud import (
    PAD_SENTINEL, Cloud, _as_int16_points, _as_uint8_colors,
    _hydrate_colors_u8,
)


def _mk(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 1024, size=(n, 3)).astype(np.float64)
    col = rng.integers(0, 256, size=(n, 3)).astype(np.float64) / 255.0
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts, col, nrm


def test_thin_equals_wide_integer_voxel():
    pts, col, nrm = _mk()
    a = Cloud.from_numpy(pts, colors=col, normals=nrm, thin=True)
    b = Cloud.from_numpy(pts, colors=col, normals=nrm, thin=False)
    assert a.points.dtype == b.points.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
    np.testing.assert_array_equal(np.asarray(a.colors), np.asarray(b.colors))
    np.testing.assert_array_equal(
        np.asarray(a.normals), np.asarray(b.normals))
    # padded tail carries the sentinel in both paths
    assert np.all(np.asarray(a.points)[a.n:] == PAD_SENTINEL)


def test_thin_falls_back_on_float_points_and_nonu8_colors():
    pts, col, nrm = _mk()
    pts = pts + 0.25  # not integer -> no int16 path
    col = col * 0.999  # not u/255 -> no uint8 path
    a = Cloud.from_numpy(pts, colors=col, normals=nrm, thin=True)
    b = Cloud.from_numpy(pts, colors=col, normals=nrm, thin=False)
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
    np.testing.assert_array_equal(np.asarray(a.colors), np.asarray(b.colors))


def test_thin_rejects_out_of_range_int16():
    pts = np.array([[0.0, 1.0, 40000.0]])
    assert _as_int16_points(pts) is None
    pts = np.array([[0.0, 1.0, -40000.0]])
    assert _as_int16_points(pts) is None
    assert _as_int16_points(np.array([[0.0, -5.0, 32766.0]])) is not None


def test_u8_color_hydrate_exhaustive_bit_exact():
    """The device conversion must equal f32(f64(u8)/255) for ALL 256
    values. Arithmetic forms fail this (XLA folds /255.0 into a reciprocal
    multiply, 1 ulp off for 46 values) — the table gather is exact."""
    u = np.arange(256, dtype=np.uint8)
    host = np.asarray(u.astype(np.float64) / 255.0, dtype=np.float32)
    dev = np.asarray(_hydrate_colors_u8(jnp.asarray(u.reshape(-1, 1))))
    np.testing.assert_array_equal(dev.ravel(), host)
    rec = _as_uint8_colors(u.astype(np.float64).reshape(-1, 1) / 255.0)
    np.testing.assert_array_equal(rec.ravel(), u)


def test_thin_full_evaluation_equality():
    """End-to-end: the full fused metric suite is identical through the
    thin and wide load paths (same files, same numbers)."""
    from open_pcc_metric_tpu.ops.fused import fused_evaluate

    pts, col, nrm = _mk(1500, seed=3)
    rec = np.unique(np.round(pts / 3.0) * 3.0, axis=0)
    rng = np.random.default_rng(5)
    rcol = rng.integers(0, 256, size=rec.shape).astype(np.float64) / 255.0
    rnrm = rng.normal(size=rec.shape)
    rnrm /= np.linalg.norm(rnrm, axis=1, keepdims=True)

    outs = []
    for thin in (True, False):
        a = Cloud.from_numpy(pts, colors=col, normals=nrm, thin=thin)
        b = Cloud.from_numpy(rec, colors=rcol, normals=rnrm, thin=thin)
        outs.append(fused_evaluate(
            a, b, color_scheme="ycc", point_to_plane=True,
            d2_mode="pc_error"))
    assert outs[0].keys() == outs[1].keys()
    for k in outs[0]:
        assert np.array_equal(np.asarray(outs[0][k]),
                              np.asarray(outs[1][k])), k


def test_cloud_cache_single_flight_and_retry(tmp_path):
    import concurrent.futures as cf

    from open_pcc_metric_tpu.batch import _CloudCache
    from open_pcc_metric_tpu.io import write_ply

    pts, col, nrm = _mk(300, seed=9)
    p = tmp_path / "c.ply"
    write_ply(str(p), pts, colors=col, normals=nrm)
    cache = _CloudCache()
    with cf.ThreadPoolExecutor(4) as pool:
        clouds = list(pool.map(
            lambda _: cache.get(str(p), "float32", 512), range(4)))
    assert all(c is clouds[0] for c in clouds)  # one load, shared object

    missing = str(tmp_path / "nope.ply")
    with pytest.raises(Exception):
        cache.get(missing, "float32", 512)
    # the failed entry must not be cached (a retry re-attempts the load)
    write_ply(missing, pts)
    assert cache.get(missing, "float32", 512).n == 300
