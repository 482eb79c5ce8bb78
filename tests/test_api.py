"""API-surface tests: options expansion, calculator memoisation, IO, CLI."""
import numpy as np
import jax.numpy as jnp
import pytest
from click.testing import CliRunner

from open_pcc_metric_tpu import (
    CalculateOptions,
    Cloud,
    CloudPair,
    MetricCalculator,
    transform_options,
    evaluate_pair,
    write_ply,
    read_point_cloud,
)
from open_pcc_metric_tpu.handler import cli
from open_pcc_metric_tpu.metric import GeoMSE, SymmetricMetric
from open_pcc_metric_tpu.cloud import synthetic_voxel_pair


class TestOptions:
    # Reference expansion counts (reference: options.py:32-174).
    @pytest.mark.parametrize(
        "kw,count",
        [
            (dict(), 8),
            (dict(color="ycc"), 14),
            (dict(point_to_plane=True), 14),
            (dict(hausdorff=True), 14),
            (dict(hausdorff=True, point_to_plane=True), 26),
            (dict(color="rgb", hausdorff=True, point_to_plane=True), 32),
        ],
    )
    def test_expansion_counts(self, kw, count):
        assert len(transform_options(CalculateOptions(**kw))) == count

    def test_first_rows_order(self):
        labels = [m.__class__.__name__ for m in transform_options(CalculateOptions())]
        assert labels == [
            "MinSqrtDistance",
            "MaxSqrtDistance",
            "GeoMSE",
            "GeoMSE",
            "SymmetricMetric",
            "GeoPSNR",
            "GeoPSNR",
            "SymmetricMetric",
        ]

    def test_color_hausdorff_extension(self):
        n = len(
            transform_options(
                CalculateOptions(color="ycc", color_hausdorff=True)
            )
        )
        assert n == 20

    def test_rejects_bad_scheme(self):
        with pytest.raises(ValueError):
            CalculateOptions(color="hsv")


class TestCalculator:
    def test_memo_is_per_instance(self):
        # The reference leaks a CLASS-level cache across pairs (SURVEY Q1);
        # two pairs here must produce different values.
        a1, b1 = synthetic_voxel_pair(500, seed=1, with_colors=False)
        a2, b2 = synthetic_voxel_pair(500, seed=2, with_colors=False)
        d1 = evaluate_pair(a1, b1).as_dict()
        d2 = evaluate_pair(a2, b2).as_dict()
        assert d1[("GeoMSE", True, False)] != d2[("GeoMSE", True, False)]

    def test_memo_collapses_duplicates(self):
        a, b = synthetic_voxel_pair(500, seed=1, with_colors=False)
        calc = MetricCalculator(CloudPair(a, b))
        m1 = GeoMSE(is_left=True, point_to_plane=False)
        m2 = GeoMSE(is_left=True, point_to_plane=False)
        res = calc.calculate([m1, m2])
        assert res._metrics[0] is res._metrics[1]

    def test_symmetric_validation(self):
        with pytest.raises(ValueError):
            SymmetricMetric(metrics=[GeoMSE(True, False)], is_proportional=True)
        with pytest.raises(ValueError):
            SymmetricMetric(
                metrics=[
                    GeoMSE(is_left=True, point_to_plane=False),
                    SymmetricMetric.__new__(SymmetricMetric),
                ],
                is_proportional=True,
            )

    def test_as_df_schema(self):
        a, b = synthetic_voxel_pair(500, seed=1)
        df = evaluate_pair(a, b, CalculateOptions(color="ycc")).as_df()
        assert list(df.columns) == ["label", "is_left", "point-to-plane", "value"]
        assert df.shape[0] == 14
        assert df["label"][0] == "MinSqrtDistance"
        assert df["label"][4] == "GeoMSE(symmetric)"


class TestIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_ply_roundtrip(self, tmp_path, binary):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 100, (257, 3))
        colors = rng.integers(0, 256, (257, 3)) / 255.0
        normals = rng.normal(size=(257, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        p = tmp_path / "c.ply"
        write_ply(p, pts, colors=colors, normals=normals, binary=binary)
        raw = read_point_cloud(p)
        np.testing.assert_allclose(raw.points, pts, rtol=1e-9)
        np.testing.assert_allclose(raw.colors, colors, atol=1e-9)
        np.testing.assert_allclose(raw.normals, normals, rtol=1e-9)

    def test_ply_float_colors(self, tmp_path):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (50, 3))
        colors = rng.uniform(0, 1, (50, 3))
        p = tmp_path / "f.ply"
        write_ply(p, pts, colors=colors, color_uchar=False)
        raw = read_point_cloud(p)
        np.testing.assert_allclose(raw.colors, colors.astype(np.float32), rtol=1e-6)

    def test_xyz(self, tmp_path):
        pts = np.array([[1.0, 2, 3], [4, 5, 6]])
        p = tmp_path / "c.xyz"
        np.savetxt(p, pts)
        raw = read_point_cloud(p)
        np.testing.assert_allclose(raw.points, pts)

    def test_pcd_binary(self, tmp_path):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 10, (20, 3)).astype(np.float32)
        rec = np.zeros(20, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        rec["x"], rec["y"], rec["z"] = pts.T
        header = (
            "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
            "TYPE F F F\nCOUNT 1 1 1\nWIDTH 20\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 20\nDATA binary\n"
        )
        p = tmp_path / "c.pcd"
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(rec.tobytes())
        raw = read_point_cloud(p)
        np.testing.assert_allclose(raw.points, pts.astype(np.float64), rtol=1e-6)

    def test_unknown_extension(self, tmp_path):
        with pytest.raises(ValueError):
            read_point_cloud(tmp_path / "c.obj")


class TestCLI:
    def _write_pair(self, tmp_path):
        rng = np.random.default_rng(3)
        pts0 = rng.integers(0, 256, (400, 3)).astype(np.float64)
        pts0 = np.unique(pts0, axis=0)
        pts1 = pts0 + rng.integers(-1, 2, pts0.shape)
        colors = rng.integers(0, 256, pts0.shape) / 255.0
        o, p = tmp_path / "o.ply", tmp_path / "p.ply"
        write_ply(o, pts0, colors=colors)
        write_ply(p, pts1, colors=colors)
        return str(o), str(p)

    def test_basic_run(self, tmp_path):
        o, p = self._write_pair(tmp_path)
        result = CliRunner().invoke(cli, ["--ocloud", o, "--pcloud", p])
        assert result.exit_code == 0, result.output
        assert "GeoPSNR(symmetric)" in result.output
        assert "MinSqrtDistance" in result.output

    def test_full_flags_csv(self, tmp_path):
        o, p = self._write_pair(tmp_path)
        result = CliRunner().invoke(
            cli,
            [
                "--ocloud", o, "--pcloud", p,
                "--color", "ycc", "--hausdorff", "--point-to-plane", "--csv",
            ],
        )
        assert result.exit_code == 0, result.output
        # 26 geo/p2p/hausdorff rows + 6 colour rows + header
        lines = [l for l in result.output.strip().splitlines() if l.strip()]
        assert len(lines) == 33


def test_ply_big_endian(tmp_path):
    # Hand-built big-endian binary PLY (the loader advertises BE support).
    pts = np.array([[1.5, -2.0, 3.25], [4.0, 5.5, -6.0]])
    rec = np.zeros(2, dtype=np.dtype([(c, ">f8") for c in "xyz"]))
    rec["x"], rec["y"], rec["z"] = pts.T
    header = (
        "ply\nformat binary_big_endian 1.0\nelement vertex 2\n"
        "property double x\nproperty double y\nproperty double z\n"
        "end_header\n"
    )
    p = tmp_path / "be.ply"
    with open(p, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())
    raw = read_point_cloud(p)
    np.testing.assert_array_equal(raw.points, pts)


def test_get_neighbour_cloud_arbitrary_n():
    """Parity surface for the reference's get_neighbour_cloud(..., n):
    the (n+1)-th neighbour's distances must match a float64 cKDTree."""
    from scipy.spatial import cKDTree

    from open_pcc_metric_tpu.cloud_pair import get_neighbour_cloud

    rng = np.random.default_rng(77)
    A = rng.uniform(0, 100, (400, 3))
    B = rng.uniform(0, 100, (500, 3))
    col = rng.uniform(0, 1, (500, 3))
    a = Cloud.from_numpy(A, dtype=jnp.float64)
    b = Cloud.from_numpy(B, colors=col, dtype=jnp.float64)
    tree = cKDTree(B)
    for n in (0, 1, 5):
        neigh, d = get_neighbour_cloud(a, b, n=n)
        od, oi = tree.query(A, k=n + 1)
        od = od if n == 0 else od[:, n]
        oi = oi if n == 0 else oi[:, n]
        np.testing.assert_allclose(d, od**2, rtol=1e-10)
        # neighbour cloud carries the winning points and their colours
        np.testing.assert_allclose(
            np.asarray(neigh.points[: a.n]), B[oi], rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(neigh.colors[: a.n]), col[oi], rtol=1e-6)
    with pytest.raises(ValueError):
        get_neighbour_cloud(a, b, n=-1)


def test_ladder_memo_retries_base_rung():
    """ADVICE r2 (low): the escalation-rung memo is not monotone — after
    ``retry`` uses of an escalated rung the cheap base rung is retried."""
    from open_pcc_metric_tpu.utils.cache import ladder_lookup, ladder_store

    memo = {}
    base, hot = (32, 256), (128, 1024)
    assert ladder_lookup(memo, "k", base, retry=4) == base
    ladder_store(memo, "k", hot)
    uses = 0
    while ladder_lookup(memo, "k", base, retry=4) == hot:
        ladder_store(memo, "k", hot)
        uses += 1
        assert uses < 10
    assert uses == 4  # base retried after exactly `retry` repeat uses
    # A FAILED base retry (caller re-climbs and stores the same hot rung)
    # must restart the clock — not re-trigger a base retry every use.
    ladder_store(memo, "k", hot)
    for _ in range(3):
        assert ladder_lookup(memo, "k", base, retry=4) == hot
        ladder_store(memo, "k", hot)
    # A successful base run resets the memo to the cheap rung for good.
    ladder_store(memo, "k", base)
    assert ladder_lookup(memo, "k", base, retry=4) == base


def test_next_rung_budget_first():
    """Certificate escalation widens the tile budget before the cap."""
    from open_pcc_metric_tpu.utils.cache import next_rung

    seq = [(32, 256)]
    while seq[-1] != (512, 1024):
        cap, ft = next_rung(*seq[-1], max_cap=512, max_ft=1024)
        assert (cap, ft) != seq[-1], "escalation must always progress"
        seq.append((cap, ft))
        assert len(seq) < 10
    assert seq[1] == (32, 1024)   # budget first
    assert seq[2] == (128, 1024)  # then cap
    assert seq[3] == (512, 1024)


def test_cloud_get_normals_cached_and_file_preferred():
    import numpy as np

    from open_pcc_metric_tpu.cloud import Cloud

    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, (300, 3))
    nrm = rng.normal(size=(300, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    with_file = Cloud.from_numpy(pts, normals=nrm)
    assert with_file.get_normals() is with_file.normals
    without = Cloud.from_numpy(pts)
    est = without.get_normals()
    assert est.shape == without.points.shape
    assert without.get_normals() is est  # cached
