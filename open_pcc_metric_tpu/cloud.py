"""Point-cloud containers with TPU-friendly padded, static-shape storage.

Role parity: the reference keeps clouds as ``open3d.geometry.PointCloud`` objects
(reference: open_pcc_metric/cloud_pair.py:45-59). Here a cloud is a set of padded
``jax.numpy`` arrays plus a static valid-point count, so every downstream kernel
sees static shapes (XLA requirement) and padded sizes fall into a small number of
buckets (bounded recompilation across frames of a sequence).

Padding convention:
  * ``points`` rows >= n are set to ``PAD_SENTINEL`` (a huge coordinate) so a
    padded row can never be the nearest neighbour of a valid query point.
  * ``colors`` / ``normals`` rows >= n are zero.
  * All reductions downstream mask by row index < n.
"""
from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np

# Large-but-finite sentinel: squared distances to it stay finite in float32
# (~3e18 << 3.4e38), so min/argmin logic never sees NaN/inf.
PAD_SENTINEL = 1.0e9

# Pallas NN kernel tiles queries by 256 rows; keep every padded size a multiple.
_MIN_ALIGN = 256


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_bucket(n: int, policy: str = "bucket") -> int:
    """Round ``n`` up to a bucketed padded size.

    policy="bucket": multiples of ``max(_MIN_ALIGN, 2^(floor(log2 n) - 3))``
    — at most ~12.5% padding waste with a logarithmic number of compiled
    shapes. policy="pow2": next power of two — up to 2x waste, but
    heterogeneous sweeps collapse onto very few compiled programs (set
    env PCC_PAD_POLICY=pow2 or pass explicitly).
    """
    import os

    if policy == "auto":
        policy = os.environ.get("PCC_PAD_POLICY", "bucket")
    if n <= _MIN_ALIGN:
        return _MIN_ALIGN
    if policy == "pow2":
        return 1 << int(n - 1).bit_length()
    step = max(_MIN_ALIGN, 1 << (int(n - 1).bit_length() - 4))
    return round_up(n, step)


# --- thin host->device transfers -------------------------------------------
# The axon tunnel moves ~40 MB/s with a ~60 ms fixed cost per batch of
# transfers (tools/profile_upload.py), and a sweep's steady state is
# fetch-bound on exactly these uploads (batch.run_sweep stage split). When a
# cloud's payload is exactly representable in a narrower dtype — integer
# voxel coordinates in int16, 8-bit colours in uint8 — uploading the narrow
# array and widening ON DEVICE is bit-identical and moves 21 B/point instead
# of 36 (normals must stay f32). The hydrate programs below run once per
# padded size (n is traced), dispatched asynchronously at load time.


@jax.jit
def _hydrate_points_i16(pts_i16: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) int16 + valid count -> (P, 3) f32 with PAD_SENTINEL tail.

    Exact: |coord| <= 32766 int16 -> f32 is lossless (f32 mantissa 24 bits).
    """
    f = pts_i16.astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, f.shape, 0) < n
    return jnp.where(rows, f, jnp.float32(PAD_SENTINEL))


# Canonical u8 -> f32 color values, computed on host in f64 (the loaders'
# reference conversion). A 256-entry table gather is bit-exact on every
# backend; arithmetic forms are NOT — XLA constant-folds x/255.0 into
# x * (1/255), which differs by 1 ulp for 46 of the 256 values.
_U8_COLOR_TABLE = np.asarray(
    np.arange(256, dtype=np.float64) / 255.0, dtype=np.float32)


@jax.jit
def _hydrate_colors_u8(col_u8: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) uint8 -> f32 in [0, 1], via the canonical table."""
    return jnp.take(jnp.asarray(_U8_COLOR_TABLE),
                    col_u8.astype(jnp.int32), axis=0)


def _as_int16_points(points: np.ndarray) -> typing.Optional[np.ndarray]:
    """points (n, 3) f64 -> int16 view when exactly representable."""
    r = np.rint(points)
    if np.abs(r).max(initial=0.0) <= 32766.0 and np.array_equal(r, points):
        return r.astype(np.int16)
    return None


def _as_uint8_colors(colors: np.ndarray) -> typing.Optional[np.ndarray]:
    """colors (n, 3) f64 in [0,1] -> uint8 when exactly c = u/255."""
    scaled = colors * 255.0
    r = np.rint(scaled)
    if r.min(initial=0.0) < 0.0 or r.max(initial=0.0) > 255.0:
        return None
    if np.array_equal(r / 255.0, colors):
        return r.astype(np.uint8)
    return None


@dataclasses.dataclass
class Cloud:
    """A padded point cloud on device.

    Attributes:
      points:  (P, 3) float array; rows >= n are PAD_SENTINEL.
      n:       number of valid points (static Python int).
      colors:  optional (P, 3) float array in [0, 1] (Open3D convention —
               reference: colors are read as float64 / 255, cloud_pair.py:38-40).
      normals: optional (P, 3) float array, unit length for valid rows.
    """

    points: jnp.ndarray
    n: int
    colors: typing.Optional[jnp.ndarray] = None
    normals: typing.Optional[jnp.ndarray] = None
    # Original float64 host copy of the valid points (kept by from_numpy).
    # Enables free host-side preprocessing — Morton grid builds at load time,
    # minimal-OBB hulls — without a device round-trip.
    host_points: typing.Optional[np.ndarray] = None

    @property
    def padded_size(self) -> int:
        return int(self.points.shape[0])

    def has_colors(self) -> bool:
        return self.colors is not None

    def has_normals(self) -> bool:
        return self.normals is not None

    @staticmethod
    def from_numpy(
        points: np.ndarray,
        colors: typing.Optional[np.ndarray] = None,
        normals: typing.Optional[np.ndarray] = None,
        dtype: typing.Any = jnp.float32,
        pad_to: typing.Optional[int] = None,
        thin: typing.Union[bool, str] = "auto",
    ) -> "Cloud":
        """Build a padded device Cloud.

        ``thin`` controls the narrow-transfer path (int16 points / uint8
        colors widened on device, see _hydrate_points_i16): "auto" enables
        it on non-CPU backends where the host->device link is the sweep
        bottleneck; results are bit-identical either way (tested).
        """
        points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
        n = points.shape[0]
        if n == 0:
            raise ValueError("empty point cloud")
        p = pad_to if pad_to is not None else pad_bucket(n, policy="auto")
        if p < n:
            raise ValueError(f"pad_to={p} < n={n}")
        if thin == "auto":
            thin = jax.default_backend() != "cpu"
        thin = bool(thin) and dtype == jnp.float32

        jpoints = None
        if thin:
            pts16 = _as_int16_points(points)
            if pts16 is not None:
                ibuf = np.zeros((p, 3), dtype=np.int16)
                ibuf[:n] = pts16
                jpoints = _hydrate_points_i16(
                    jnp.asarray(ibuf), jnp.asarray(n, jnp.int32))
        if jpoints is None:
            buf = np.full((p, 3), PAD_SENTINEL, dtype=np.float64)
            buf[:n] = points
            jpoints = jnp.asarray(buf, dtype=dtype)

        jcolors = None
        if colors is not None:
            colors = np.asarray(colors, dtype=np.float64).reshape(-1, 3)
            if colors.shape[0] != n:
                raise ValueError("colors/points length mismatch")
            if thin:
                col8 = _as_uint8_colors(colors)
                if col8 is not None:
                    cbuf8 = np.zeros((p, 3), dtype=np.uint8)
                    cbuf8[:n] = col8
                    jcolors = _hydrate_colors_u8(jnp.asarray(cbuf8))
            if jcolors is None:
                cbuf = np.zeros((p, 3), dtype=np.float64)
                cbuf[:n] = colors
                jcolors = jnp.asarray(cbuf, dtype=dtype)

        jnormals = None
        if normals is not None:
            normals = np.asarray(normals, dtype=np.float64).reshape(-1, 3)
            if normals.shape[0] != n:
                raise ValueError("normals/points length mismatch")
            nbuf = np.zeros((p, 3), dtype=dtype)
            nbuf[:n] = normals
            jnormals = jnp.asarray(nbuf)

        return Cloud(points=jpoints, n=n, colors=jcolors, normals=jnormals,
                     host_points=points)

    def valid_points(self) -> np.ndarray:
        """Valid points as a host numpy array (for host-side algorithms: OBB, IO)."""
        if self.host_points is not None:
            return self.host_points
        return np.asarray(self.points[: self.n])

    def get_obb_extent(self) -> np.ndarray:
        """Cached minimal-OBB extent (depends only on this cloud's points;
        shared across every pair this cloud participates in, e.g. the
        reference side of a QP sweep)."""
        e = getattr(self, "_obb_extent", None)
        if e is None:
            from .ops.obb import minimal_obb_extent

            e = minimal_obb_extent(self.valid_points())
            self._obb_extent = e
        return e

    def get_grid(self):
        """Lazily-built, cached Morton chunk grid of this cloud.

        Amortised across the cross/reverse/self NN passes of one evaluation,
        repeated evaluations, and QP sweeps that share a reference cloud
        (the reference tool rebuilds its KD-trees per pair instead —
        reference cloud_pair.py:65).
        """
        g = getattr(self, "_grid", None)
        if g is None:
            import os

            import jax

            from .ops.grid import build_grid, build_grid_host

            # Where to build: the points already live on device, so on TPU
            # the jitted build (argsort + gathers, ~0.2 s at 800k) beats the
            # host build, whose ~17 MB of array uploads ride the tunnel
            # (measured 0.8-7 s depending on tunnel health). On CPU backends
            # (tests, parity harness) the host radix build stays the default.
            mode = os.environ.get("PCC_GRID_BUILD", "auto")
            if mode == "auto":
                mode = ("device" if jax.default_backend() != "cpu"
                        else "host")
            if mode == "host" and self.host_points is not None:
                g = build_grid_host(
                    self.host_points, self.padded_size,
                    dtype=self.points.dtype,
                )
            else:
                import jax.numpy as _jnp

                g = build_grid(self.points, _jnp.asarray(self.n))
            self._grid = g
        return g

    def get_normals(self) -> jnp.ndarray:
        """Padded normals: from the file, else estimated (and cached).

        Mirrors the reference's estimate-if-missing behaviour (reference
        cloud_pair.py:61-64, Open3D default 30-NN PCA) at Cloud granularity;
        the estimate depends only on this cloud's points, so it is cached
        like the grid/OBB and shared across every pair the cloud joins.
        """
        if self.normals is not None:
            return self.normals
        est = getattr(self, "_est_normals", None)
        if est is None:
            from .ops.normals import estimate_normals_cloud

            est = estimate_normals_cloud(self)
            self._est_normals = est
        return est

    def valid_mask(self) -> jnp.ndarray:
        idx = jnp.arange(self.padded_size)
        return idx < self.n

    def mxu_exact(self) -> bool:
        """True when MXU expanded-norm distances are bit-exact for this cloud.

        Holds when every valid coordinate is an integer with
        |coord| <= refine_adaptive.MXU_EXACT_MAX_COORD: then |q|^2, |b|^2,
        <q,b> and their combinations are integers below 2^24, exact in f32
        and in the HIGHEST-precision bf16-split MXU matmul. Voxelised
        clouds (the pc_error workload) qualify; general float clouds use
        the bit-identical VPU difference-form path. Cached per cloud.
        """
        cached = getattr(self, "_mxu_exact", None)
        if cached is None:
            from .ops.refine_adaptive import MXU_EXACT_MAX_COORD

            pts = self.valid_points()
            cached = bool(
                np.abs(pts).max(initial=0.0) <= MXU_EXACT_MAX_COORD
                and np.array_equal(pts, np.round(pts))
            )
            self._mxu_exact = cached
        return cached


def synthetic_sphere_pair(
    n: int = 10_000,
    noise: float = 0.01,
    seed: int = 0,
    with_colors: bool = True,
    dtype: typing.Any = jnp.float32,
) -> typing.Tuple[Cloud, Cloud]:
    """Clean-vs-perturbed sphere pair (BASELINE.json config 1 style)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * 100.0
    colors = (pts - pts.min(0)) / (pts.max(0) - pts.min(0)) if with_colors else None
    noisy = pts + rng.normal(scale=noise * 100.0, size=pts.shape)
    a = Cloud.from_numpy(pts, colors=colors, dtype=dtype)
    b = Cloud.from_numpy(noisy, colors=colors, dtype=dtype)
    return a, b


def synthetic_voxel_pair(
    n: int = 10_000,
    grid: int = 512,
    seed: int = 0,
    with_colors: bool = True,
    dtype: typing.Any = jnp.float32,
) -> typing.Tuple[Cloud, Cloud]:
    """Integer-grid (voxelized) pair: original vs re-quantized-with-loss.

    Integer coordinates < 2^10 make all float32 distance math exact, which the
    parity tests exploit.
    """
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, grid, size=(n, 3)), axis=0).astype(np.float64)
    # Quantize to a coarser grid to emulate lossy geometry coding.
    rec = np.unique((pts // 4) * 4 + 2, axis=0)
    colors = None
    rcolors = None
    if with_colors:
        colors = (rng.integers(0, 256, size=pts.shape) / 255.0)
        rcolors = (rng.integers(0, 256, size=rec.shape) / 255.0)
    a = Cloud.from_numpy(pts, colors=colors, dtype=dtype)
    b = Cloud.from_numpy(rec, colors=rcolors, dtype=dtype)
    return a, b
