"""End-to-end metric parity vs the float64 numpy oracle (SURVEY §4a/b)."""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu import (
    CalculateOptions,
    Cloud,
    CloudPair,
    MetricCalculator,
    transform_options,
    evaluate_pair,
)
from open_pcc_metric_tpu.cloud import synthetic_sphere_pair, synthetic_voxel_pair

import oracle

PSNR_TOL = 1e-4  # BASELINE.md north-star accuracy bar
REL_TOL = 1e-5


def _clouds_to_np(a: Cloud, b: Cloud):
    pts0 = np.asarray(a.points[: a.n], dtype=np.float64)
    pts1 = np.asarray(b.points[: b.n], dtype=np.float64)
    c0 = np.asarray(a.colors[: a.n], dtype=np.float64) if a.colors is not None else None
    c1 = np.asarray(b.colors[: b.n], dtype=np.float64) if b.colors is not None else None
    n0 = np.asarray(a.normals[: a.n], dtype=np.float64) if a.normals is not None else None
    n1 = np.asarray(b.normals[: b.n], dtype=np.float64) if b.normals is not None else None
    return pts0, pts1, c0, c1, n0, n1


# (our as_dict key) -> (oracle key)
GEO_KEYS = {
    ("MinSqrtDistance",): "min_sqrt",
    ("MaxSqrtDistance",): "max_sqrt",
    ("GeoMSE", True, False): "geo_mse_left",
    ("GeoMSE", False, False): "geo_mse_right",
    ("GeoPSNR", True, False): "geo_psnr_left",
    ("GeoPSNR", False, False): "geo_psnr_right",
}


def _check(ours, ref, label, tol=REL_TOL):
    ours = np.asarray(ours, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    denom = np.maximum(np.abs(ref), 1e-12)
    rel = np.max(np.abs(ours - ref) / denom)
    assert rel < tol, f"{label}: ours={ours} ref={ref} rel={rel}"


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_d1_parity_voxel(dtype):
    a, b = synthetic_voxel_pair(4000, dtype=dtype, seed=3)
    res = evaluate_pair(a, b, CalculateOptions(hausdorff=True))
    d = res.as_dict()
    pts0, pts1, *_ = _clouds_to_np(a, b)
    ref = oracle.full_metrics(pts0, pts1, hausdorff=True)

    for key, okey in GEO_KEYS.items():
        tol = PSNR_TOL if "PSNR" in key[0] else REL_TOL
        _check(d[key], ref[okey], key, tol)
    _check(d[("GeoHausdorffDistance", True, False)], ref["geo_hausdorff_left"], "hd_l")
    _check(d[("GeoHausdorffDistance", False, False)], ref["geo_hausdorff_right"], "hd_r")
    _check(
        d[("GeoHausdorffDistancePSNR", True, False)],
        ref["geo_hausdorff_psnr_left"],
        "hdp_l",
        PSNR_TOL,
    )
    sym_mse = d[("SymmetricMetric", "GeoMSE", True, False, "GeoMSE", False, False)]
    _check(sym_mse, ref["geo_mse_sym"], "sym_mse")
    sym_psnr = d[("SymmetricMetric", "GeoPSNR", True, False, "GeoPSNR", False, False)]
    _check(sym_psnr, ref["geo_psnr_sym"], "sym_psnr", PSNR_TOL)


def test_d1_parity_sphere_float32():
    a, b = synthetic_sphere_pair(3000, noise=0.005, dtype=jnp.float32, seed=4)
    res = evaluate_pair(a, b, CalculateOptions())
    d = res.as_dict()
    pts0, pts1, *_ = _clouds_to_np(a, b)
    ref = oracle.full_metrics(pts0, pts1)
    # float32 geometry on float-valued coords: modest tolerance on MSE,
    # PSNR parity bar still 1e-4 absolute-ish via relative on ~70 dB values.
    _check(d[("GeoMSE", True, False)], ref["geo_mse_left"], "mse_l", 1e-4)
    _check(d[("GeoPSNR", True, False)], ref["geo_psnr_left"], "psnr_l", 1e-5)
    sym = d[("SymmetricMetric", "GeoPSNR", True, False, "GeoPSNR", False, False)]
    _check(sym, ref["geo_psnr_sym"], "sym", 1e-5)


@pytest.mark.parametrize("d2_mode", ["reference", "pc_error"])
def test_d2_parity_pinned_normals(d2_mode):
    # Sphere with analytic normals supplied -> decouples D2 math from
    # normal-estimation differences (SURVEY hard-part #2 mitigation).
    rng = np.random.default_rng(5)
    v = rng.normal(size=(2500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts0 = v * 80.0
    pts1 = pts0 + rng.normal(scale=0.3, size=pts0.shape)
    nrm1 = pts1 / np.linalg.norm(pts1, axis=1, keepdims=True)
    a = Cloud.from_numpy(pts0, normals=v, dtype=jnp.float64)
    b = Cloud.from_numpy(pts1, normals=nrm1, dtype=jnp.float64)
    res = evaluate_pair(
        a, b, CalculateOptions(point_to_plane=True, hausdorff=True, d2_mode=d2_mode)
    )
    d = res.as_dict()
    ref = oracle.full_metrics(
        pts0,
        pts1,
        normals0=v,
        normals1=nrm1,
        point_to_plane=True,
        hausdorff=True,
        d2_mode=d2_mode,
    )
    p2p = "pc_error" if d2_mode == "pc_error" else True
    _check(d[("GeoMSE", True, p2p)], ref["d2_mse_left"], "d2mse_l")
    _check(d[("GeoMSE", False, p2p)], ref["d2_mse_right"], "d2mse_r")
    _check(d[("GeoPSNR", True, p2p)], ref["d2_psnr_left"], "d2psnr_l", PSNR_TOL)
    _check(
        d[("GeoHausdorffDistance", True, p2p)], ref["d2_hausdorff_left"], "d2hd_l"
    )
    sym = d[("SymmetricMetric", "GeoPSNR", True, p2p, "GeoPSNR", False, p2p)]
    _check(sym, ref["d2_psnr_sym"], "d2sym", PSNR_TOL)


def test_d2_estimated_normals_smoke():
    # With our own estimated normals, D2 must still be finite and symmetric-max
    # consistent; exact parity vs oracle PCA holds only on clean surfaces.
    a, b = synthetic_sphere_pair(2000, noise=0.002, dtype=jnp.float64, seed=6)
    res = evaluate_pair(a, b, CalculateOptions(point_to_plane=True))
    d = res.as_dict()
    assert np.isfinite(d[("GeoMSE", True, True)])
    assert np.isfinite(d[("GeoPSNR", False, True)])


@pytest.mark.parametrize("scheme", ["rgb", "ycc", "yuv"])
def test_color_parity(scheme):
    a, b = synthetic_voxel_pair(3000, dtype=jnp.float64, seed=7)
    res = evaluate_pair(
        a, b, CalculateOptions(color=scheme, color_hausdorff=True)
    )
    d = res.as_dict()
    pts0, pts1, c0, c1, *_ = _clouds_to_np(a, b)
    ref = oracle.full_metrics(pts0, pts1, c0, c1, color_scheme=scheme)
    _check(d[("ColorMSE", True, scheme)], ref["color_mse_left"], "cmse_l")
    _check(d[("ColorMSE", False, scheme)], ref["color_mse_right"], "cmse_r")
    _check(d[("ColorPSNR", True, scheme)], ref["color_psnr_left"], "cpsnr_l", PSNR_TOL)
    _check(
        d[("ColorHausdorffDistance", True, scheme)],
        ref["color_hausdorff_left"],
        "chd_l",
    )
    _check(
        d[("ColorHausdorffDistancePSNR", False, scheme)],
        ref["color_hausdorff_psnr_right"],
        "chdp_r",
        PSNR_TOL,
    )
    sym = d[("SymmetricMetric", "ColorMSE", True, scheme, "ColorMSE", False, scheme)]
    _check(sym, ref["color_mse_sym"], "csym")


def test_zero_error_properties():
    # Identical clouds: MSE = 0, PSNR = inf (matches reference: log10(x/0)).
    rng = np.random.default_rng(8)
    pts = rng.uniform(0, 100, (1000, 3))
    a = Cloud.from_numpy(pts, dtype=jnp.float64)
    b = Cloud.from_numpy(pts, dtype=jnp.float64)
    with np.errstate(divide="ignore"):
        res = evaluate_pair(a, b, CalculateOptions())
    d = res.as_dict()
    assert d[("GeoMSE", True, False)] == 0.0
    assert np.isposinf(d[("GeoPSNR", True, False)])


def test_permutation_invariance():
    rng = np.random.default_rng(9)
    pts0 = rng.uniform(0, 100, (800, 3))
    pts1 = rng.uniform(0, 100, (900, 3))
    a = Cloud.from_numpy(pts0, dtype=jnp.float64)
    b1 = Cloud.from_numpy(pts1, dtype=jnp.float64)
    b2 = Cloud.from_numpy(pts1[rng.permutation(900)], dtype=jnp.float64)
    d1 = evaluate_pair(a, b1, CalculateOptions()).as_dict()
    d2 = evaluate_pair(a, b2, CalculateOptions()).as_dict()
    _check(
        d1[("GeoMSE", True, False)], d2[("GeoMSE", True, False)], "perm", 1e-12
    )


@pytest.mark.parametrize("kw", [
    dict(),
    dict(color="ycc", hausdorff=True),
    dict(point_to_plane=True, hausdorff=True),
    dict(color="rgb", color_hausdorff=True),
])
def test_fused_engine_equals_dag_engine(kw):
    """The fused engine must reproduce the reference-shaped DAG engine
    value-for-value across the whole option grid."""
    rng = np.random.default_rng(13)
    v = rng.normal(size=(1500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts0 = v * 70.0
    pts1 = pts0 + rng.normal(scale=0.2, size=pts0.shape)
    c0 = rng.uniform(0, 1, pts0.shape)
    c1 = rng.uniform(0, 1, pts1.shape)
    nrm1 = pts1 / np.linalg.norm(pts1, axis=1, keepdims=True)
    a = Cloud.from_numpy(pts0, colors=c0, normals=v, dtype=jnp.float64)
    b = Cloud.from_numpy(pts1, colors=c1, normals=nrm1, dtype=jnp.float64)
    opts = CalculateOptions(**kw)
    r_dag = evaluate_pair(a, b, opts, engine="dag").as_dict()
    r_fused = evaluate_pair(a, b, opts, engine="fused").as_dict()
    assert set(r_dag) == set(r_fused)
    for key in r_dag:
        np.testing.assert_allclose(
            np.asarray(r_fused[key], dtype=np.float64),
            np.asarray(r_dag[key], dtype=np.float64),
            rtol=1e-9, err_msg=str(key),
        )


@pytest.mark.parametrize("engine", ["fused", "dag"])
def test_user_peak_pc_error_convention(engine):
    """VERDICT r2 #5: --peak/--resolution (pc_error's convention) overrides
    both geometric PSNR peaks in both engines, oracle-backed."""
    a, b = synthetic_voxel_pair(3000, dtype=jnp.float64, seed=9)
    peak = 1023.0  # pc_error-style resolution for a 10-bit cloud
    res = evaluate_pair(
        a, b, CalculateOptions(hausdorff=True, peak=peak), engine=engine
    )
    d = res.as_dict()
    pts0, pts1, *_ = _clouds_to_np(a, b)
    ref = oracle.full_metrics(pts0, pts1, hausdorff=True, peak=peak)
    _check(d[("GeoPSNR", True, False, peak)], ref["geo_psnr_left"],
           "psnr_l", PSNR_TOL)
    _check(d[("GeoPSNR", False, False, peak)], ref["geo_psnr_right"],
           "psnr_r", PSNR_TOL)
    _check(d[("GeoHausdorffDistancePSNR", True, False, peak)],
           ref["geo_hausdorff_psnr_left"], "hdp_l", PSNR_TOL)
    # Non-PSNR rows are untouched by the peak override.
    _check(d[("GeoMSE", True, False)], ref["geo_mse_left"], "mse_l")
    # Sanity: the override actually changed the number vs the OBB convention.
    ref_obb = oracle.full_metrics(pts0, pts1, hausdorff=True)
    assert abs(ref["geo_psnr_left"] - ref_obb["geo_psnr_left"]) > 1e-3
