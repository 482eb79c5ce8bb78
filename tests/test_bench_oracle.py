"""bench.py's accelerated f64 oracle NN must be bit-identical to the
brute-force oracle, including lowest-index tie-breaking on tie-heavy voxel
lattices (the bench clouds are voxelised, so exact ties are common).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "pcc_bench", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["pcc_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _clouds(seed, n_a=700, n_b=500):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 8, size=(n_a, 3)).astype(np.float64)  # many exact ties
    b = np.unique(rng.integers(0, 8, size=(n_b, 3)), axis=0).astype(np.float64)
    return a, b


@pytest.mark.quick
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_nn_matches_bruteforce(bench, seed):
    from oracle import nn_bruteforce

    a, b = _clouds(seed)
    i_ref, d_ref = nn_bruteforce(a, b)
    i_fast, d_fast = bench._oracle_nn_fast(a, b)
    np.testing.assert_array_equal(i_fast, i_ref)
    np.testing.assert_array_equal(d_fast, d_ref)


@pytest.mark.quick
def test_fast_nn_exclude_self(bench):
    _, b = _clouds(3)
    i_ref, d_ref = __import__("oracle").nn_bruteforce(b, b, exclude_self=True)
    i_fast, d_fast = bench._oracle_nn_fast(b, b, exclude_self=True)
    np.testing.assert_array_equal(i_fast, i_ref)
    np.testing.assert_array_equal(d_fast, d_ref)


@pytest.mark.quick
@pytest.mark.parametrize("k", [1, 5, 30])
def test_fast_knn_matches_bruteforce(bench, k):
    from oracle import knn_bruteforce

    a, b = _clouds(4, n_a=300, n_b=400)
    i_ref, d_ref = knn_bruteforce(a, b, k)
    i_fast, d_fast = bench._oracle_knn_fast(a, b, k)
    np.testing.assert_array_equal(i_fast, i_ref)
    np.testing.assert_array_equal(d_fast, d_ref)


@pytest.mark.quick
def test_fast_nn_all_tied(bench):
    """Every candidate equidistant: escalation must still find index 0."""
    a = np.zeros((3, 3))
    b = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                  [-1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    i, d = bench._oracle_nn_fast(a, b)
    np.testing.assert_array_equal(i, [0, 0, 0])
    np.testing.assert_array_equal(d, [1.0, 1.0, 1.0])


@pytest.mark.quick
def test_psnr_delta_ignores_non_psnr_keys(bench):
    res = {"geo_psnr_sym": 50.0, "geo_mse_sym": 99.0,
           "color_psnr_left": np.array([30.0, 31.0, 32.0])}
    gold = {"geo_psnr_sym": 50.00002, "geo_mse_sym": 0.0,
            "color_psnr_left": [30.0, 31.0, 32.0001]}
    assert abs(bench.psnr_delta(res, gold) - 1e-4) < 1e-9
