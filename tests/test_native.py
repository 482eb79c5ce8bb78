"""Native C++ host loops: build, equivalence vs numpy, graceful fallback."""
import numpy as np
import pytest

from open_pcc_metric_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; numpy fallbacks cover this machine")
    return lib


def test_parse_floats(lib):
    data = b"1.5 -2e3\n 0.25\t7\n-0.0 1e-8"
    out = native.parse_floats(data, 6)
    np.testing.assert_allclose(out, [1.5, -2000.0, 0.25, 7.0, -0.0, 1e-8])


def test_parse_floats_correctly_rounded(lib):
    vals = np.random.default_rng(0).uniform(-1e6, 1e6, 1000)
    text = "\n".join(repr(float(v)) for v in vals).encode()
    out = native.parse_floats(text, 1000)
    np.testing.assert_array_equal(out, vals)  # strtod is correctly rounded


def test_parse_floats_short_input_returns_none(lib):
    assert native.parse_floats(b"1 2 3", 5) is None


def test_radix_argsort_matches_numpy_stable(lib):
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**30, 100_000).astype(np.uint32)
    perm = native.radix_argsort_u32(keys)
    ref = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(perm, ref)


def test_gather_rows(lib):
    rng = np.random.default_rng(2)
    src = rng.normal(size=(1000, 3))
    perm = rng.permutation(1000).astype(np.int32)
    out = native.gather_rows(src, perm)
    np.testing.assert_array_equal(out, src[perm])


def test_ascii_ply_roundtrip_uses_native(tmp_path, lib):
    from open_pcc_metric_tpu import read_point_cloud, write_ply

    rng = np.random.default_rng(3)
    pts = rng.uniform(-100, 100, (5000, 3))
    colors = rng.integers(0, 256, (5000, 3)) / 255.0
    p = tmp_path / "a.ply"
    write_ply(p, pts, colors=colors, binary=False)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, pts, rtol=1e-9)
    np.testing.assert_allclose(raw.colors, colors, atol=1e-9)
