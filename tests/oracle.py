"""Independent float64 numpy oracle for parity tests.

Reimplements the REFERENCE's formulas (reference: open_pcc_metric/metric.py,
cloud_pair.py) directly in plain numpy — deliberately sharing no code with the
package under test except the minimal-OBB routine (whose properties are tested
separately in test_obb.py).
"""
from __future__ import annotations

import numpy as np

from open_pcc_metric_tpu.ops.obb import minimal_obb_extent

RGB_TO_YCC = np.array(
    [
        [0.2126, 0.7152, 0.0722],
        [-0.1146, -0.3854, 0.5],
        [0.5, -0.4542, -0.0458],
    ]
)
RGB_TO_YUV = np.array(
    [[0.25, 0.5, 0.25], [1.0, 0.0, -1.0], [-0.5, 1.0, -0.5]]
)


def nn_bruteforce(a, b, exclude_self=False):
    """Exact 1-NN, lowest-index ties. Returns (idx, squared dists)."""
    idx = np.empty(a.shape[0], dtype=np.int64)
    dist = np.empty(a.shape[0], dtype=np.float64)
    for s in range(0, a.shape[0], 512):
        blk = a[s : s + 512]
        d = ((blk[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        if exclude_self:
            rows = np.arange(s, s + blk.shape[0])
            d[np.arange(blk.shape[0]), rows] = np.inf
        idx[s : s + 512] = d.argmin(1)
        dist[s : s + 512] = d.min(1)
    return idx, dist


def knn_bruteforce(a, b, k, exclude_self=False):
    idxs = np.empty((a.shape[0], k), dtype=np.int64)
    dists = np.empty((a.shape[0], k), dtype=np.float64)
    for s in range(0, a.shape[0], 512):
        blk = a[s : s + 512]
        d = ((blk[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        if exclude_self:
            rows = np.arange(s, s + blk.shape[0])
            d[np.arange(blk.shape[0]), rows] = np.inf
        # stable ascending sort -> lowest-index tie-breaking
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        idxs[s : s + 512] = order
        dists[s : s + 512] = np.take_along_axis(d, order, axis=1)
    return idxs, dists


def pca_normals(points, k=30):
    """Open3D-style 30-NN covariance PCA normals (unoriented)."""
    idx, _ = knn_bruteforce(points, points, k, exclude_self=False)
    neigh = points[idx]  # (N, k, 3)
    mean = neigh.mean(axis=1, keepdims=True)
    c = neigh - mean
    cov = np.einsum("nki,nkj->nij", c, c) / k
    w, v = np.linalg.eigh(cov)
    return v[:, :, 0]  # smallest-eigenvalue eigenvector


def transform_colors(colors, scheme):
    if scheme == "rgb":
        return colors
    m = RGB_TO_YCC if scheme == "ycc" else RGB_TO_YUV
    return colors @ m.T


def full_metrics(
    pts0,
    pts1,
    colors0=None,
    colors1=None,
    normals0=None,
    normals1=None,
    color_scheme=None,
    point_to_plane=False,
    hausdorff=False,
    d2_mode="reference",
    peak=None,
):
    """All reference metrics as a flat dict of float64 values.

    ``peak`` overrides both geometric PSNR peaks (pc_error's --resolution
    convention); default is the reference's OBB / intra-NN conventions.
    """
    out = {}
    idx0, d0 = nn_bruteforce(pts0, pts1)
    idx1, d1 = nn_bruteforce(pts1, pts0)

    _, dself = nn_bruteforce(pts0, pts0, exclude_self=True)
    boundary = np.sqrt(dself)
    out["min_sqrt"] = boundary.min()
    out["max_sqrt"] = boundary.max()

    user_peak = peak
    extent = minimal_obb_extent(pts0)
    peak = user_peak if user_peak is not None else extent.max()

    mse0 = d0.mean()
    mse1 = d1.mean()
    out["geo_mse_left"] = mse0
    out["geo_mse_right"] = mse1
    out["geo_mse_sym"] = max(mse0, mse1)
    psnr0 = 10 * np.log10(peak**2 / mse0)
    psnr1 = 10 * np.log10(peak**2 / mse1)
    out["geo_psnr_left"] = psnr0
    out["geo_psnr_right"] = psnr1
    out["geo_psnr_sym"] = min(psnr0, psnr1)

    if hausdorff:
        h0, h1 = d0.max(), d1.max()
        out["geo_hausdorff_left"] = h0
        out["geo_hausdorff_right"] = h1
        out["geo_hausdorff_sym"] = max(h0, h1)
        hpeak2 = peak**2 if user_peak is not None else out["max_sqrt"] ** 2
        hp0 = 10 * np.log10(hpeak2 / h0)
        hp1 = 10 * np.log10(hpeak2 / h1)
        out["geo_hausdorff_psnr_left"] = hp0
        out["geo_hausdorff_psnr_right"] = hp1
        out["geo_hausdorff_psnr_sym"] = min(hp0, hp1)

    if point_to_plane:
        if normals0 is None:
            normals0 = pca_normals(pts0)
        if normals1 is None:
            normals1 = pca_normals(pts1)
        err0 = pts0 - pts1[idx0]
        err1 = pts1 - pts0[idx1]
        if d2_mode == "reference":
            # Q3: opposite cloud's normals, POSITIONALLY indexed.
            n_for_0 = normals1[: err0.shape[0]]
            n_for_1 = normals0[: err1.shape[0]]
        else:
            n_for_0 = normals1[idx0]
            n_for_1 = normals0[idx1]
        p0 = (err0 * n_for_0).sum(1) ** 2
        p1 = (err1 * n_for_1).sum(1) ** 2
        out["d2_mse_left"] = p0.mean()
        out["d2_mse_right"] = p1.mean()
        out["d2_mse_sym"] = max(out["d2_mse_left"], out["d2_mse_right"])
        dp0 = 10 * np.log10(peak**2 / out["d2_mse_left"])
        dp1 = 10 * np.log10(peak**2 / out["d2_mse_right"])
        out["d2_psnr_left"] = dp0
        out["d2_psnr_right"] = dp1
        out["d2_psnr_sym"] = min(dp0, dp1)
        if hausdorff:
            out["d2_hausdorff_left"] = p0.max()
            out["d2_hausdorff_right"] = p1.max()
            out["d2_hausdorff_sym"] = max(p0.max(), p1.max())
            hh0 = 10 * np.log10(hpeak2 / p0.max())
            hh1 = 10 * np.log10(hpeak2 / p1.max())
            out["d2_hausdorff_psnr_left"] = hh0
            out["d2_hausdorff_psnr_right"] = hh1
            out["d2_hausdorff_psnr_sym"] = min(hh0, hh1)

    if color_scheme is not None:
        nc0 = colors1[idx0]
        nc1 = colors0[idx1]
        t0 = transform_colors(colors0, color_scheme)
        tn0 = transform_colors(nc0, color_scheme)
        t1 = transform_colors(colors1, color_scheme)
        tn1 = transform_colors(nc1, color_scheme)
        cm0 = ((t0 - tn0) ** 2).mean(0)
        cm1 = ((t1 - tn1) ** 2).mean(0)
        out["color_mse_left"] = cm0
        out["color_mse_right"] = cm1
        out["color_mse_sym"] = max([cm0, cm1], key=np.linalg.norm)
        cpeak = 255.0 if color_scheme == "rgb" else 1.0
        cp0 = 10 * np.log10(cpeak**2 / cm0)
        cp1 = 10 * np.log10(cpeak**2 / cm1)
        out["color_psnr_left"] = cp0
        out["color_psnr_right"] = cp1
        out["color_psnr_sym"] = min([cp0, cp1], key=np.linalg.norm)

        dd0 = t0 - tn0
        dd1 = t1 - tn1
        if color_scheme == "rgb":  # Q5 quirk: x255 pre-scale
            dd0 = 255.0 * dd0
            dd1 = 255.0 * dd1
        ch0 = (dd0**2).max(0)
        ch1 = (dd1**2).max(0)
        out["color_hausdorff_left"] = ch0
        out["color_hausdorff_right"] = ch1
        out["color_hausdorff_sym"] = max([ch0, ch1], key=np.linalg.norm)
        chp0 = 10 * np.log10(cpeak**2 / ch0)
        chp1 = 10 * np.log10(cpeak**2 / ch1)
        out["color_hausdorff_psnr_left"] = chp0
        out["color_hausdorff_psnr_right"] = chp1
        out["color_hausdorff_psnr_sym"] = min([chp0, chp1], key=np.linalg.norm)

    return out
