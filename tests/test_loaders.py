"""Loader completeness: real-world PLY layouts, .pts, malformed-header fuzz.

VERDICT r2 item 6. Reference surface: the reference accepts anything
``o3d.io.read_point_cloud`` accepts (reference handler.py:57); these
layouts appear in scanner exports and mesh files in the wild.
"""
import struct

import numpy as np
import pytest

from open_pcc_metric_tpu.io import point_count, read_point_cloud


PTS0 = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])


def _header(lines):
    return ("ply\n" + "\n".join(lines) + "\nend_header\n").encode("ascii")


# ------------------------------------------------------- layout completeness


def test_ply_ascii_vertex_not_first(tmp_path):
    p = tmp_path / "a.ply"
    body = "9 9 9\n8 8 8\n" + "".join(
        f"{x:g} {y:g} {z:g}\n" for x, y, z in PTS0)
    p.write_bytes(_header([
        "format ascii 1.0",
        "element other 2",
        "property float foo",  # two pre-vertex rows to skip
        "property float bar",
        "property float baz",
        "element vertex 3",
        "property float x", "property float y", "property float z",
    ]) + body.encode())
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)


def test_ply_binary_vertex_not_first_fixed_element(tmp_path):
    p = tmp_path / "b.ply"
    pre = struct.pack("<6f", *range(6))  # 2 rows x 3 floats
    body = PTS0.astype("<f4").tobytes()
    p.write_bytes(_header([
        "format binary_little_endian 1.0",
        "element other 2",
        "property float a", "property float b", "property float c",
        "element vertex 3",
        "property float x", "property float y", "property float z",
    ]) + pre + body)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)


def test_ply_binary_vertex_after_list_element(tmp_path):
    """Faces-before-vertices: list rows have data-dependent sizes."""
    p = tmp_path / "c.ply"
    faces = (struct.pack("<B3i", 3, 0, 1, 2)
             + struct.pack("<B4i", 4, 0, 1, 2, 3))
    body = PTS0.astype("<f4").tobytes()
    p.write_bytes(_header([
        "format binary_little_endian 1.0",
        "element face 2",
        "property list uchar int vertex_indices",
        "element vertex 3",
        "property float x", "property float y", "property float z",
    ]) + faces + body)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)


def test_ply_ascii_list_property_inside_vertex(tmp_path):
    """A list between scalar props makes column indices data-dependent."""
    p = tmp_path / "d.ply"
    rows = [
        "0 0 0 2 7 7 255 0 0",      # 2-member list, then rgb
        "1 2 3 0 0 255 0",          # empty list
        "4 5 6 3 1 2 3 0 0 255",
    ]
    p.write_bytes(_header([
        "format ascii 1.0",
        "element vertex 3",
        "property float x", "property float y", "property float z",
        "property list uchar int segments",
        "property uchar red", "property uchar green", "property uchar blue",
    ]) + ("\n".join(rows) + "\n").encode())
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)
    np.testing.assert_allclose(
        raw.colors, np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]]))


def test_ply_binary_list_property_inside_vertex(tmp_path):
    p = tmp_path / "e.ply"
    body = b""
    lists = [[7, 7], [], [1, 2, 3]]
    for (x, y, z), lst in zip(PTS0, lists):
        body += struct.pack("<3f", x, y, z)
        body += struct.pack(f"<B{len(lst)}i", len(lst), *lst)
        body += struct.pack("<f", 0.5)
    p.write_bytes(_header([
        "format binary_little_endian 1.0",
        "element vertex 3",
        "property float x", "property float y", "property float z",
        "property list uchar int segments",
        "property float quality",
    ]) + body)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)


@pytest.mark.parametrize("with_count", [True, False])
@pytest.mark.parametrize("ncols", [3, 4, 6, 7])
def test_pts_variants(tmp_path, with_count, ncols):
    p = tmp_path / "f.pts"
    extra = {3: "", 4: " 42", 6: " 255 128 0", 7: " 42 255 128 0"}[ncols]
    body = "".join(f"{x:g} {y:g} {z:g}{extra}\n" for x, y, z in PTS0)
    p.write_text((f"{len(PTS0)}\n" if with_count else "") + body)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)
    if ncols >= 6:
        np.testing.assert_allclose(raw.colors[0], [1.0, 128 / 255.0, 0.0])
    else:
        assert raw.colors is None
    if with_count:
        assert point_count(p) == 3


# ----------------------------------------------------- malformed-header fuzz


@pytest.mark.parametrize("header_lines,body", [
    # property before any element
    (["format ascii 1.0", "property float x"], b""),
    # no vertex element at all
    (["format ascii 1.0", "element face 0",
      "property list uchar int vertex_indices"], b""),
    # missing format line
    (["element vertex 1", "property float x", "property float y",
      "property float z"], b"0 0 0\n"),
    # vertex missing a coordinate property
    (["format ascii 1.0", "element vertex 1", "property float x",
      "property float y"], b"0 0\n"),
    # truncated binary body
    (["format binary_little_endian 1.0", "element vertex 4",
      "property float x", "property float y", "property float z"],
     b"\x00" * 12),
    # truncated binary pre-vertex list element
    (["format binary_little_endian 1.0", "element face 3",
      "property list uchar int vertex_indices", "element vertex 1",
      "property float x", "property float y", "property float z"],
     struct.pack("<B3i", 3, 0, 1, 2)),
    # malformed ascii list row (declared members missing)
    (["format ascii 1.0", "element vertex 1", "property float x",
      "property float y", "property float z",
      "property list uchar int seg"], b"0 0 0 5 1\n"),
])
def test_ply_malformed_raises_valueerror(tmp_path, header_lines, body):
    p = tmp_path / "bad.ply"
    p.write_bytes(_header(header_lines) + body)
    with pytest.raises(ValueError):
        read_point_cloud(p)


def test_ply_not_a_ply(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"solid nope\n")
    with pytest.raises(ValueError):
        read_point_cloud(p)


def test_ply_truncated_header(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 3\n")  # no end
    with pytest.raises(ValueError):
        read_point_cloud(p)


def test_pts_count_mismatch(tmp_path):
    p = tmp_path / "bad.pts"
    p.write_text("5\n0 0 0\n1 1 1\n")
    with pytest.raises(ValueError):
        read_point_cloud(p)


def test_faces_after_vertex_still_ignored(tmp_path):
    """The common mesh layout (vertices then faces) keeps the fast path."""
    p = tmp_path / "g.ply"
    body = "".join(f"{x:g} {y:g} {z:g}\n" for x, y, z in PTS0)
    body += "3 0 1 2\n"
    p.write_bytes(_header([
        "format ascii 1.0",
        "element vertex 3",
        "property float x", "property float y", "property float z",
        "element face 1",
        "property list uchar int vertex_indices",
    ]) + body.encode())
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, PTS0)


# ------------------------------------------------ PCD incl. binary_compressed


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
@pytest.mark.parametrize("with_payload", [True, False])
def test_pcd_roundtrip(tmp_path, mode, with_payload):
    from open_pcc_metric_tpu.io import write_pcd

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(257, 3)) * 100.0
    col = rng.integers(0, 256, size=(257, 3)) / 255.0
    nrm = rng.normal(size=(257, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    p = tmp_path / "r.pcd"
    write_pcd(p, pts, colors=col if with_payload else None,
              normals=nrm if with_payload else None, mode=mode)
    raw = read_point_cloud(p)
    np.testing.assert_allclose(raw.points, pts.astype(np.float32), rtol=1e-6)
    if with_payload:
        np.testing.assert_allclose(raw.colors, col, atol=1e-12)
        np.testing.assert_allclose(raw.normals, nrm.astype(np.float32),
                                   rtol=1e-6)
    else:
        assert raw.colors is None and raw.normals is None


def test_pcd_compressed_matches_binary(tmp_path):
    """binary_compressed decodes to bit-identical arrays vs plain binary."""
    from open_pcc_metric_tpu.io import write_pcd

    rng = np.random.default_rng(11)
    # Voxelised coords: repeated float values make the LZF stream take
    # real back-references, not just literal runs.
    pts = np.round(rng.normal(size=(1000, 3)) * 8.0)
    col = rng.integers(0, 4, size=(1000, 3)) / 255.0
    pb, pc = tmp_path / "b.pcd", tmp_path / "c.pcd"
    write_pcd(pb, pts, colors=col, mode="binary")
    write_pcd(pc, pts, colors=col, mode="binary_compressed")
    assert pc.stat().st_size < pb.stat().st_size  # it actually compressed
    rb, rc = read_point_cloud(pb), read_point_cloud(pc)
    np.testing.assert_array_equal(rb.points, rc.points)
    np.testing.assert_array_equal(rb.colors, rc.colors)


def test_lzf_stream_fuzz():
    from open_pcc_metric_tpu.io.loaders import _lzf_compress, _lzf_decompress

    rng = np.random.default_rng(5)
    for n in (0, 1, 2, 3, 31, 32, 33, 300, 5000):
        for alphabet in (2, 256):
            raw = bytes(rng.integers(0, alphabet, size=n, dtype=np.uint8))
            assert _lzf_decompress(_lzf_compress(raw), n) == raw
    # long self-overlapping run (RLE-style back-reference)
    raw = b"ab" * 4000 + b"tail"
    assert _lzf_decompress(_lzf_compress(raw), len(raw)) == raw


def test_lzf_corrupt_raises():
    from open_pcc_metric_tpu.io.loaders import _lzf_compress, _lzf_decompress

    good = _lzf_compress(b"hello hello hello hello")
    with pytest.raises(ValueError):
        _lzf_decompress(good, 7)  # wrong declared size
    with pytest.raises(ValueError):
        _lzf_decompress(good[:-2], 23)  # truncated stream
    with pytest.raises(ValueError):
        _lzf_decompress(b"\xff\xff", 400)  # back-ref before start


def test_pcd_compressed_truncated_raises(tmp_path):
    from open_pcc_metric_tpu.io import write_pcd

    p = tmp_path / "t.pcd"
    write_pcd(p, PTS0, mode="binary_compressed")
    blob = p.read_bytes()
    p.write_bytes(blob[:-3])
    with pytest.raises(ValueError):
        read_point_cloud(p)


def test_pts_integral_dark_colors_normalised(tmp_path):
    """All-integral .pts colours normalise by 255 even when every value is
    <= 1 (near-black scan): the format's documented colour range wins over
    a value-based guess."""
    p = tmp_path / "dark.pts"
    p.write_text("2\n0 0 0 128 1 1 0\n1 0 0 128 0 1 1\n")
    raw = read_point_cloud(str(p))
    assert raw.colors is not None
    np.testing.assert_allclose(raw.colors.max(), 1.0 / 255.0)
