"""Committed golden values (VERDICT r2 item 7): the engine must reproduce the
frozen float64 oracle outputs in tests/goldens/oracle.json — regression
coverage that does NOT recompute the oracle, so engine+oracle drifting
together still trips it. Regenerate deliberately via tools/make_goldens.py.
"""
import json
import os

import numpy as np
import pytest

from open_pcc_metric_tpu import CalculateOptions, evaluate_pair
from open_pcc_metric_tpu.ops.fused import fused_evaluate

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "oracle.json")

with open(GOLDEN_PATH) as f:
    GOLDENS = json.load(f)

PSNR_TOL = 1e-4  # BASELINE.md accuracy bar
REL_TOL = 1e-5


def _build_pair(cfg):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_goldens import _clouds_for

    return _clouds_for(cfg)


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_fused_engine_matches_goldens(name):
    entry = GOLDENS[name]
    cfg = entry["config"]
    a, b = _build_pair(cfg)
    got = fused_evaluate(
        a, b, color_scheme=cfg["color"],
        point_to_plane=cfg["point_to_plane"], d2_mode=cfg["d2_mode"],
        peak=cfg["peak"],
    )
    for key, want in entry["metrics"].items():
        want = np.asarray(want, dtype=np.float64)
        ours = np.asarray(got[key], dtype=np.float64)
        tol = PSNR_TOL if "psnr" in key else REL_TOL
        denom = np.maximum(np.abs(want), 1e-12)
        rel = np.max(np.abs(ours - want) / denom)
        assert rel < tol, f"{name}/{key}: ours={ours} golden={want} rel={rel}"


def test_dag_engine_matches_goldens_voxel():
    entry = GOLDENS["voxel_d1_hausdorff"]
    cfg = entry["config"]
    a, b = _build_pair(cfg)
    res = evaluate_pair(
        a, b,
        CalculateOptions(hausdorff=cfg["hausdorff"], peak=cfg["peak"]),
        engine="dag",
    )
    d = res.as_dict()
    want = entry["metrics"]
    np.testing.assert_allclose(
        float(d[("GeoMSE", True, False)]), want["geo_mse_left"], rtol=REL_TOL)
    np.testing.assert_allclose(
        float(d[("GeoPSNR", True, False)]), want["geo_psnr_left"],
        rtol=PSNR_TOL)
    np.testing.assert_allclose(
        float(d[("GeoHausdorffDistance", True, False)]),
        want["geo_hausdorff_left"], rtol=REL_TOL)
