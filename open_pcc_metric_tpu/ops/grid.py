"""Morton-ordered chunk grid: the spatial acceleration structure for pruned NN.

The TPU-native replacement for the reference's KD-tree (reference:
open_pcc_metric/cloud_pair.py:65 builds FLANN trees; SURVEY §2.2). Trees are
pointer-chasing and data-dependent — hostile to XLA. Instead:

  1. quantise valid points to a 1024^3 lattice over their bounding box and
     interleave bits into 30-bit Morton codes (locality-preserving),
  2. argsort by code (stable; one XLA sort),
  3. cut the sorted order into fixed 256-point chunks and record each chunk's
     axis-aligned bounding box.

Chunks are spatially tight, so chunk-vs-tile bounding-box lower bounds prune
almost all of the O(N*M) distance work (ops/nn_pruned.py) while every shape
stays static. Padded sentinel rows sort to the tail and land in dedicated
chunks whose enormous bboxes are pruned away for free.
"""
from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

CHUNK = 256  # points per chunk; cloud.pad_bucket guarantees divisibility


class ChunkGrid(typing.NamedTuple):
    points: jnp.ndarray  # (P, 3) Morton-sorted
    perm: jnp.ndarray  # (P,) int32: sorted row s holds original row perm[s]
    codes: jnp.ndarray  # (P,) int32 sorted Morton codes
    bbox_lo: jnp.ndarray  # (P/CHUNK, 3)
    bbox_hi: jnp.ndarray  # (P/CHUNK, 3)
    chunk_codes: jnp.ndarray  # (P/CHUNK,) code of each chunk's first point

    @property
    def n_chunks(self) -> int:
        return self.bbox_lo.shape[0]


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(
    points: jnp.ndarray, n_valid: jnp.ndarray
) -> jnp.ndarray:
    """30-bit Morton codes on a 1024^3 lattice fitted to the VALID points.

    Padded sentinel rows clip to the lattice corner (code max-ish) and sort
    to the tail.
    """
    p = points.shape[0]
    mask = (jnp.arange(p) < n_valid)[:, None]
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    lo = jnp.min(jnp.where(mask, points, big), axis=0)
    hi = jnp.max(jnp.where(mask, points, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(
        ((points - lo) * (1023.0 / extent)).astype(jnp.int32), 0, 1023
    )
    return (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )


@jax.jit
def build_grid(points: jnp.ndarray, n_valid: jnp.ndarray) -> ChunkGrid:
    codes = morton_codes(points, n_valid)
    # ONE multi-operand sort carrying the coordinates as payload instead of
    # argsort + two row-gathers: random 850k-row gathers are the expensive
    # part on TPU (measured 11.4 ms of a 19.7 ms build; the fused sort is
    # 3.0 ms — tools/profile_gridparts.py). (codes, iota) as a 2-key sort
    # reproduces the stable argsort's permutation bit-exactly.
    iota = jnp.arange(points.shape[0], dtype=jnp.int32)
    sorted_codes, perm, sx, sy, sz = jax.lax.sort(
        (codes, iota, points[:, 0], points[:, 1], points[:, 2]), num_keys=2
    )
    sorted_pts = jnp.stack([sx, sy, sz], axis=1)
    tiles = sorted_pts.reshape(-1, CHUNK, 3)
    return ChunkGrid(
        points=sorted_pts,
        perm=perm,
        codes=sorted_codes,
        bbox_lo=jnp.min(tiles, axis=1),
        bbox_hi=jnp.max(tiles, axis=1),
        chunk_codes=sorted_codes[::CHUNK],
    )


def bbox_lower_bounds(
    a_lo: jnp.ndarray, a_hi: jnp.ndarray, b_lo: jnp.ndarray, b_hi: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance lower bound between every (a-tile, b-chunk) bbox pair.

    lb[i, c] <= ||x - y||^2 for any x in a-box i, y in b-box c.
    """
    # Per-coordinate 2D broadcasts: XLA materialises only (na, nb) f32
    # temporaries instead of (na, nb, 3) ones — ~3x less HBM traffic on the
    # hot (tiles x chunks) bound matrix.
    out = None
    for k in range(3):
        gap = jnp.maximum(
            0.0,
            jnp.maximum(
                a_lo[:, None, k] - b_hi[None, :, k],
                b_lo[None, :, k] - a_hi[:, None, k],
            ),
        )
        sq = gap * gap
        out = sq if out is None else out + sq
    return out


# Sentinel rows carry the lattice-corner code (all three 10-bit axes maxed).
_SENTINEL_CODE = 0x3FFFFFFF


def _part1by2_np(x):
    import numpy as np

    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def build_grid_host(points_np, pad_to: int, dtype=jnp.float32) -> ChunkGrid:
    """Host-side grid build from the original float64 points.

    Point clouds are born on the host (file IO), so sorting there at load
    time is free compared to the device path: XLA's bitonic sort + gathers
    cost ~0.9 s for an 800k cloud on TPU, numpy ~0.1 s. The resulting grid
    is structurally different from ``build_grid``'s only via f64-vs-f32
    quantisation at cell boundaries — pruned-NN exactness never depends on
    the Morton assignment, only pruning efficiency does.
    """
    import numpy as np

    from ..cloud import PAD_SENTINEL

    pts = np.asarray(points_np, dtype=np.float64).reshape(-1, 3)
    n = pts.shape[0]
    if pad_to % CHUNK or pad_to < n:
        raise ValueError(f"pad_to={pad_to} invalid for n={n}")
    lo = pts.min(axis=0)
    extent = np.maximum(pts.max(axis=0) - lo, 1e-9)
    q = np.clip(((pts - lo) * (1023.0 / extent)).astype(np.int64), 0, 1023)
    codes = (
        _part1by2_np(q[:, 0])
        | (_part1by2_np(q[:, 1]) << 1)
        | (_part1by2_np(q[:, 2]) << 2)
    ).astype(np.int64)
    from .. import native

    perm = native.radix_argsort_u32(codes.astype(np.uint32))
    if perm is None:
        perm = np.argsort(codes, kind="stable")

    buf = np.full((pad_to, 3), PAD_SENTINEL, dtype=np.float64)
    gathered = native.gather_rows(pts, perm)
    buf[:n] = gathered if gathered is not None else pts[perm]
    # Round to the target dtype BEFORE taking bboxes: bounds must enclose the
    # exact on-device point values or the lower bounds stop being sound.
    import numpy as _np

    np_dtype = _np.dtype(jnp.zeros((), dtype).dtype.name)
    buf = buf.astype(np_dtype)
    perm_full = np.concatenate(
        [perm, np.arange(n, pad_to)]
    ).astype(np.int32)
    codes_full = np.concatenate(
        [codes[perm], np.full(pad_to - n, _SENTINEL_CODE, dtype=np.int64)]
    ).astype(np.int32)
    tiles = buf.reshape(-1, CHUNK, 3)

    return ChunkGrid(
        points=jnp.asarray(buf),
        perm=jnp.asarray(perm_full),
        codes=jnp.asarray(codes_full),
        bbox_lo=jnp.asarray(tiles.min(axis=1)),
        bbox_hi=jnp.asarray(tiles.max(axis=1)),
        chunk_codes=jnp.asarray(codes_full[::CHUNK]),
    )
