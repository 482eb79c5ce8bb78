"""Randomized differential tests: all NN backends and both engines must agree
on arbitrary cloud shapes, including degenerate ones."""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu import CalculateOptions, Cloud, evaluate_pair
from open_pcc_metric_tpu.ops.nn import nn_chunked
from open_pcc_metric_tpu.ops.nn_pruned import nn_pruned


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_backends_agree_random_shapes(seed):
    rng = np.random.default_rng(seed)
    na = int(rng.integers(5, 5000))
    nb = int(rng.integers(5, 5000))
    scale = float(rng.choice([1.0, 100.0, 1e4]))
    a = rng.uniform(0, scale, (na, 3))
    b = rng.uniform(0, scale, (nb, 3))
    ca = Cloud.from_numpy(a, dtype=jnp.float64)
    cb = Cloud.from_numpy(b, dtype=jnp.float64)
    ji, jd = nn_chunked(ca.points, cb.points)
    pi, pd = nn_pruned(ca.points, cb.points, ca.n, cb.n)
    np.testing.assert_allclose(
        np.asarray(pd)[:na], np.asarray(jd)[:na], rtol=1e-12
    )


def test_tiny_clouds_full_pipeline():
    # Fewer points than the 30-NN neighbourhood: normals must not be
    # contaminated by padded sentinel rows.
    rng = np.random.default_rng(3)
    pts0 = rng.uniform(0, 10, (6, 3))
    pts1 = pts0 + 0.01
    a = Cloud.from_numpy(pts0, dtype=jnp.float64)
    b = Cloud.from_numpy(pts1, dtype=jnp.float64)
    d = evaluate_pair(
        a, b, CalculateOptions(point_to_plane=True)
    ).as_dict()
    assert np.isfinite(d[("GeoMSE", True, False)])
    assert np.isfinite(d[("GeoMSE", True, True)])
    # D2 MSE cannot exceed D1 MSE (projection shrinks the error)
    assert d[("GeoMSE", True, True)] <= d[("GeoMSE", True, False)] + 1e-12


def test_single_point_cloud_raises():
    # Documented contract (README "Input contract"): boundary metrics need a
    # second point for the self-excluded NN, so a 1-point origin cloud is an
    # explicit ValueError (the reference crashes inside Open3D instead).
    import pytest

    a = Cloud.from_numpy(np.array([[1.0, 2.0, 3.0]]), dtype=jnp.float64)
    b = Cloud.from_numpy(np.array([[1.5, 2.0, 3.0]]), dtype=jnp.float64)
    with pytest.raises(ValueError, match="at least 2 points"):
        evaluate_pair(a, b, CalculateOptions()).as_dict()


def test_identical_points_duplicates():
    # Entire cloud is one repeated point: self-NN distance 0 everywhere.
    pts = np.tile([[5.0, 5.0, 5.0]], (300, 1))
    a = Cloud.from_numpy(pts, dtype=jnp.float64)
    b = Cloud.from_numpy(pts + 1.0, dtype=jnp.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = evaluate_pair(a, b, CalculateOptions()).as_dict()
    assert d[("MinSqrtDistance",)] == 0.0
    assert d[("GeoMSE", True, False)] == 3.0


def test_engines_agree_on_float32_voxel():
    rng = np.random.default_rng(4)
    pts0 = np.unique(rng.integers(0, 256, (2000, 3)), axis=0).astype(float)
    pts1 = pts0 + rng.integers(-1, 2, pts0.shape)
    c = rng.integers(0, 256, pts0.shape) / 255.0
    a = Cloud.from_numpy(pts0, colors=c, dtype=jnp.float32)
    b = Cloud.from_numpy(pts1, colors=c, dtype=jnp.float32)
    opts = CalculateOptions(color="ycc", hausdorff=True)
    r1 = evaluate_pair(a, b, opts, engine="dag").as_dict()
    r2 = evaluate_pair(a, b, opts, engine="fused").as_dict()
    for key in r1:
        np.testing.assert_allclose(
            np.asarray(r1[key], dtype=np.float64),
            np.asarray(r2[key], dtype=np.float64),
            rtol=1e-6, err_msg=str(key),
        )


def test_exact_bucket_boundary_sizes():
    # n exactly at the padded-bucket boundary (no sentinel rows at all) and
    # n one below/above: the masking and certificate logic must not depend
    # on sentinels existing.
    rng = np.random.default_rng(5)
    for n in (256, 255, 257, 512, 2048):
        pts0 = rng.uniform(0, 100, (n, 3))
        pts1 = pts0 + 0.05
        a = Cloud.from_numpy(pts0, dtype=jnp.float64)
        b = Cloud.from_numpy(pts1, dtype=jnp.float64)
        ji, jd = nn_chunked(a.points, b.points)
        pi, pd = nn_pruned(a.points, b.points, a.n, b.n)
        np.testing.assert_allclose(
            np.asarray(pd)[:n], np.asarray(jd)[:n], rtol=1e-12,
            err_msg=f"n={n}",
        )
