"""Fused single-jit metric evaluation core.

This is the TPU-first collapse of the reference's "CloudPair precompute +
lazy metric DAG + memo" (SURVEY §7 key design decision): one jit-compiled
function sweeps both NN directions, the intra-origin self-NN, (optionally)
normal estimation, and accumulates every reduction the metric table needs —
sums of squared errors, running maxes (Hausdorff), per-channel colour SSE on
gathered neighbours. What the reference computes in six separate passes
(reference: cloud_pair.py:54-80 + metric.py) falls out of one compiled
program; only O(1) scalars leave the device. The host then applies the OBB
peak and log10s (ops/obb.py stays host-side by design).

All arrays are padded and masked by traced valid counts, so frames of
different sizes within one padded bucket share a single compilation.
"""
from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as nn_ops
from . import normals as normal_ops
from .color import get_color_peak, transform_colors
from ..utils.cache import ladder_lookup, ladder_store, next_rung


def _masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Two-stage masked sum (see metric._stable_sum rationale)."""
    x = jnp.where(mask if x.ndim == 1 else mask[:, None], x, 0)
    n = x.shape[0]
    chunk = 1024
    if n <= chunk:
        return jnp.sum(x, axis=0)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.sum(jnp.sum(x.reshape(-1, chunk, *x.shape[1:]), axis=1), axis=0)


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    big_neg = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.max(jnp.where(mask if x.ndim == 1 else mask[:, None], x, big_neg), axis=0)


def _masked_min(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(jnp.where(mask, x, jnp.inf), axis=0)


def _pair_stats_pruned(
    a_pts, b_pts, n_a, n_b, a_col, b_col, a_nrm, b_nrm, ga, gb,
    a_col_sorted=None, b_col_sorted=None,
    a_nrm_sorted=None, b_nrm_sorted=None,
    qt8_a=None, qt8_b=None,
    *, color_scheme, point_to_plane, d2_mode, with_boundary,
    prune_cap, prune_fallback, mxu_ok=False,
):
    """Pruned-backend body of pair_stats, evaluated in Morton-sorted space.

    Sorted-row validity follows the same `row < n` rule as the original
    order (sentinels carry the max code and sort last), neighbour indices
    come back in ORIGINAL b order (so colour/normal/point gathers hit the
    original arrays directly), and only the D2 positional pairing (SURVEY
    Q3) and query-side colours need a perm gather.
    """
    from .grid import build_grid
    from .nn_pruned import nn_pruned_sorted

    if ga is None:
        ga = build_grid(a_pts, n_a)
    if gb is None:
        gb = build_grid(b_pts, n_b)

    pa = a_pts.shape[0]
    pb = b_pts.shape[0]
    mask_a = jnp.arange(pa) < n_a
    mask_b = jnp.arange(pb) < n_b

    # The winning neighbour's payload (points/colours/normals) either comes
    # straight out of the Pallas refine kernel (in-kernel one-hot selection;
    # TPU f32 with tile counts divisible by the kernel's step) or via ONE
    # concatenated row-gather per direction (gathers pay per row, not byte).
    # The in-kernel path is measurably SLOWER end-to-end at 800k (5.1 vs 5.8
    # Mpts/s: the per-chunk one-hot HIGHEST matmuls + payload block DMAs cost
    # more than the single row-gather they replace), so it stays opt-in
    # (PCC_PAYLOAD_KERNEL=1) pending a cheaper in-kernel selection.
    import os

    need_payload = color_scheme is not None or point_to_plane
    use_paykernel = (
        need_payload
        and os.environ.get("PCC_PAYLOAD_KERNEL") == "1"
        and jax.default_backend() == "tpu"
        and a_pts.dtype == jnp.float32
        and pa % (256 * 8) == 0
        and pb % (256 * 8) == 0
    )

    def split_payload(pay):
        return {"pts": pay[:, :3], "col": pay[:, 3:6], "nrm": pay[:, 6:9]}

    if use_paykernel:
        from .nn_pruned import nn_pruned_sorted_payload
        from .refine_pallas import PAYLOAD_F

        def pack(pts_sorted, col_s, nrm_s, pts_o, col_o, nrm_o, p):
            z = jnp.zeros((p, 3), pts_sorted.dtype)
            zpad = jnp.zeros((p, PAYLOAD_F - 9), pts_sorted.dtype)
            srt = jnp.concatenate(
                [pts_sorted, col_s if col_s is not None else z,
                 nrm_s if nrm_s is not None else z, zpad], axis=1,
            )
            orig = jnp.concatenate(
                [pts_o, col_o if col_o is not None else z,
                 nrm_o if nrm_o is not None else z, zpad], axis=1,
            )
            return srt.T, orig

        payT_b, pay_orig_b = pack(
            gb.points, b_col_sorted, b_nrm_sorted, b_pts, b_col, b_nrm, pb
        )
        payT_a, pay_orig_a = pack(
            ga.points, a_col_sorted, a_nrm_sorted, a_pts, a_col, a_nrm, pa
        )
        d0, i0, pr0, ov0 = nn_pruned_sorted_payload(
            ga, gb, payT_b, pay_orig_b, n_a,
            cap=prune_cap, fallback_tiles=prune_fallback,
        )
        d1, i1, pr1, ov1 = nn_pruned_sorted_payload(
            gb, ga, payT_a, pay_orig_a, n_b,
            cap=prune_cap, fallback_tiles=prune_fallback,
        )
        pay0 = split_payload(pr0)
        pay1 = split_payload(pr1)
    else:
        d0, i0, ov0 = nn_pruned_sorted(
            ga, gb, n_a, cap=prune_cap, fallback_tiles=prune_fallback,
            mxu_ok=mxu_ok, qt8=qt8_a,
        )
        d1, i1, ov1 = nn_pruned_sorted(
            gb, ga, n_b, cap=prune_cap, fallback_tiles=prune_fallback,
            mxu_ok=mxu_ok, qt8=qt8_b,
        )

        def gather_payload(pts, col, nrm, idx):
            parts = [pts]
            if color_scheme is not None:
                parts.append(col)
            if point_to_plane and d2_mode != "reference":
                parts.append(nrm)
            pay = jnp.take(
                jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0],
                idx, axis=0, mode="clip",
            )
            out = {"pts": pay[:, :3]}
            c = 3
            if color_scheme is not None:
                out["col"] = pay[:, c : c + 3]
                c += 3
            if point_to_plane and d2_mode != "reference":
                out["nrm"] = pay[:, c : c + 3]
            return out

        pay0 = gather_payload(b_pts, b_col, b_nrm, i0)
        pay1 = gather_payload(a_pts, a_col, a_nrm, i1)
    overflows = [ov0, ov1]

    out: typing.Dict[str, jnp.ndarray] = {
        "n_a": n_a,
        "n_b": n_b,
        "d1_sse_l": _masked_sum(d0, mask_a),
        "d1_sse_r": _masked_sum(d1, mask_b),
        "d1_max_l": _masked_max(d0, mask_a),
        "d1_max_r": _masked_max(d1, mask_b),
    }

    if with_boundary:
        dself, _, ov2 = nn_pruned_sorted(
            ga, ga, n_a, exclude_self=True,
            cap=prune_cap, fallback_tiles=prune_fallback, mxu_ok=mxu_ok,
            qt8=qt8_a,
        )
        overflows.append(ov2)
        sqrt_self = jnp.sqrt(jnp.maximum(dself, 0.0))
        out["self_min"] = _masked_min(sqrt_self, mask_a)
        out["self_max"] = _masked_max(sqrt_self, mask_a)

    if point_to_plane:
        if a_nrm is None or b_nrm is None:
            raise ValueError(
                "pair_stats requires precomputed normals for point_to_plane"
            )
        err0 = ga.points - pay0["pts"]
        err1 = gb.points - pay1["pts"]
        if d2_mode == "reference":
            # Positional pairing by ORIGINAL query index (SURVEY Q3).
            n_for_0 = jnp.take(b_nrm, ga.perm, axis=0, mode="clip")
            n_for_1 = jnp.take(a_nrm, gb.perm, axis=0, mode="clip")
        else:
            n_for_0 = pay0["nrm"]
            n_for_1 = pay1["nrm"]
        p0 = jnp.sum(err0 * n_for_0, axis=1) ** 2
        p1 = jnp.sum(err1 * n_for_1, axis=1) ** 2
        out["d2_sse_l"] = _masked_sum(p0, mask_a)
        out["d2_sse_r"] = _masked_sum(p1, mask_b)
        out["d2_max_l"] = _masked_max(p0, mask_a)
        out["d2_max_r"] = _masked_max(p1, mask_b)

    if color_scheme is not None:
        a_col_s = a_col_sorted if a_col_sorted is not None else jnp.take(
            a_col, ga.perm, axis=0
        )
        b_col_s = b_col_sorted if b_col_sorted is not None else jnp.take(
            b_col, gb.perm, axis=0
        )
        t0 = transform_colors(a_col_s, "rgb", color_scheme)
        tn0 = transform_colors(pay0["col"], "rgb", color_scheme)
        t1 = transform_colors(b_col_s, "rgb", color_scheme)
        tn1 = transform_colors(pay1["col"], "rgb", color_scheme)
        diff0 = t0 - tn0
        diff1 = t1 - tn1
        out["c_sse_l"] = _masked_sum(diff0**2, mask_a)
        out["c_sse_r"] = _masked_sum(diff1**2, mask_b)
        hd0, hd1 = diff0, diff1
        if color_scheme == "rgb":  # SURVEY Q5 quirk
            hd0 = 255.0 * hd0
            hd1 = 255.0 * hd1
        out["c_max_l"] = _masked_max(hd0**2, mask_a)
        out["c_max_r"] = _masked_max(hd1**2, mask_b)

    out["nn_overflow"] = functools.reduce(jnp.logical_or, overflows)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "color_scheme",
        "point_to_plane",
        "d2_mode",
        "with_boundary",
        "backend",
        "prune_cap",
        "prune_fallback",
        "mxu_ok",
    ),
)
def pair_stats(
    a_pts: jnp.ndarray,
    b_pts: jnp.ndarray,
    n_a: jnp.ndarray,
    n_b: jnp.ndarray,
    a_col: typing.Optional[jnp.ndarray] = None,
    b_col: typing.Optional[jnp.ndarray] = None,
    a_nrm: typing.Optional[jnp.ndarray] = None,
    b_nrm: typing.Optional[jnp.ndarray] = None,
    ga=None,
    gb=None,
    a_col_sorted: typing.Optional[jnp.ndarray] = None,
    b_col_sorted: typing.Optional[jnp.ndarray] = None,
    a_nrm_sorted: typing.Optional[jnp.ndarray] = None,
    b_nrm_sorted: typing.Optional[jnp.ndarray] = None,
    qt8_a: typing.Optional[jnp.ndarray] = None,
    qt8_b: typing.Optional[jnp.ndarray] = None,
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    d2_mode: str = "reference",
    with_boundary: bool = True,
    backend: str = "jnp",
    prune_cap: int = 32,
    prune_fallback: int = 256,
    mxu_ok: bool = False,
) -> typing.Dict[str, jnp.ndarray]:
    """One-pass device-side reductions for the full metric suite.

    Returns a dict of scalars/3-vectors:
      d1_sse/d1_max per direction, self-NN min/max, d2_sse/d2_max per
      direction (if point_to_plane), per-channel colour SSE and max-sq-diff
      per direction (if color_scheme). With backend="pruned" an extra
      ``nn_overflow`` flag reports certificate overflow (the caller must
      re-run with larger prune_cap/prune_fallback for exact results).
    """
    if backend == "pruned":
        # Sorted-space evaluation: every reduction is permutation-invariant
        # over queries, so results stay in Morton order end-to-end — no
        # 850k-row unsort gathers (one of the dominant costs otherwise).
        return _pair_stats_pruned(
            a_pts, b_pts, n_a, n_b, a_col, b_col, a_nrm, b_nrm, ga, gb,
            a_col_sorted, b_col_sorted, a_nrm_sorted, b_nrm_sorted,
            qt8_a, qt8_b,
            color_scheme=color_scheme, point_to_plane=point_to_plane,
            d2_mode=d2_mode, with_boundary=with_boundary,
            prune_cap=prune_cap, prune_fallback=prune_fallback,
            mxu_ok=mxu_ok,
        )

    def nn(a, b, exclude_self=False):
        return nn_ops.nearest_neighbors(a, b, exclude_self=exclude_self,
                                        backend=backend)

    pa = a_pts.shape[0]
    pb = b_pts.shape[0]
    mask_a = jnp.arange(pa) < n_a
    mask_b = jnp.arange(pb) < n_b

    idx0, d0 = nn(a_pts, b_pts)
    idx1, d1 = nn(b_pts, a_pts)

    out: typing.Dict[str, jnp.ndarray] = {
        "n_a": n_a,
        "n_b": n_b,
        "d1_sse_l": _masked_sum(d0, mask_a),
        "d1_sse_r": _masked_sum(d1, mask_b),
        "d1_max_l": _masked_max(d0, mask_a),
        "d1_max_r": _masked_max(d1, mask_b),
    }

    if with_boundary:
        _, dself = nn(a_pts, a_pts, exclude_self=True)
        sqrt_self = jnp.sqrt(dself)
        out["self_min"] = _masked_min(sqrt_self, mask_a)
        out["self_max"] = _masked_max(sqrt_self, mask_a)

    if point_to_plane:
        if a_nrm is None or b_nrm is None:
            raise ValueError(
                "pair_stats requires precomputed normals for point_to_plane "
                "(use ops.normals.estimate_normals or fused_evaluate, which "
                "estimates them host-side with escalation support)"
            )
        err0 = a_pts - jnp.take(b_pts, idx0, axis=0)
        err1 = b_pts - jnp.take(a_pts, idx1, axis=0)
        if d2_mode == "reference":
            # SURVEY Q3: opposite cloud's normals, positionally indexed.
            n_for_0 = jnp.take(b_nrm, jnp.arange(pa), axis=0, mode="clip")
            n_for_1 = jnp.take(a_nrm, jnp.arange(pb), axis=0, mode="clip")
        else:
            n_for_0 = jnp.take(b_nrm, idx0, axis=0)
            n_for_1 = jnp.take(a_nrm, idx1, axis=0)
        p0 = jnp.sum(err0 * n_for_0, axis=1) ** 2
        p1 = jnp.sum(err1 * n_for_1, axis=1) ** 2
        out["d2_sse_l"] = _masked_sum(p0, mask_a)
        out["d2_sse_r"] = _masked_sum(p1, mask_b)
        out["d2_max_l"] = _masked_max(p0, mask_a)
        out["d2_max_r"] = _masked_max(p1, mask_b)

    if color_scheme is not None:
        t0 = transform_colors(a_col, "rgb", color_scheme)
        tn0 = transform_colors(jnp.take(b_col, idx0, axis=0), "rgb", color_scheme)
        t1 = transform_colors(b_col, "rgb", color_scheme)
        tn1 = transform_colors(jnp.take(a_col, idx1, axis=0), "rgb", color_scheme)
        diff0 = t0 - tn0
        diff1 = t1 - tn1
        out["c_sse_l"] = _masked_sum(diff0**2, mask_a)
        out["c_sse_r"] = _masked_sum(diff1**2, mask_b)
        hd0, hd1 = diff0, diff1
        if color_scheme == "rgb":  # SURVEY Q5 quirk
            hd0 = 255.0 * hd0
            hd1 = 255.0 * hd1
        out["c_max_l"] = _masked_max(hd0**2, mask_a)
        out["c_max_r"] = _masked_max(hd1**2, mask_b)

    return out


def finalize_stats(
    stats: typing.Dict[str, typing.Any],
    extent_peak: float,
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    peak: typing.Optional[float] = None,
) -> typing.Dict[str, np.float64]:
    """Host epilogue: MSEs, PSNRs and symmetric selections from raw sums.

    Reproduces the reference's peak conventions (SURVEY Q4): geometric PSNR
    peak = max OBB extent; Hausdorff PSNR peak = max intra-origin NN distance.
    A user-supplied ``peak`` (pc_error's --resolution convention) overrides
    BOTH geometric peaks, enabling direct comparison with published pc_error
    numbers (reference conventions: metric.py:246, 384-386).
    """
    import jax as _jax

    stats = _jax.device_get(stats)  # one host transfer for all scalars
    s = {k: np.asarray(v, dtype=np.float64) for k, v in stats.items()}
    n_a, n_b = float(s["n_a"]), float(s["n_b"])
    gpeak = float(peak) if peak is not None else extent_peak
    out: typing.Dict[str, typing.Any] = {}
    with np.errstate(divide="ignore"):
        out["min_sqrt"] = np.float64(s["self_min"])
        out["max_sqrt"] = np.float64(s["self_max"])
        mse_l, mse_r = s["d1_sse_l"] / n_a, s["d1_sse_r"] / n_b
        out["geo_mse_left"], out["geo_mse_right"] = mse_l, mse_r
        out["geo_mse_sym"] = max(mse_l, mse_r)
        psnr_l = 10 * np.log10(gpeak**2 / mse_l)
        psnr_r = 10 * np.log10(gpeak**2 / mse_r)
        out["geo_psnr_left"], out["geo_psnr_right"] = psnr_l, psnr_r
        out["geo_psnr_sym"] = min(psnr_l, psnr_r)
        out["geo_hausdorff_left"] = s["d1_max_l"]
        out["geo_hausdorff_right"] = s["d1_max_r"]
        out["geo_hausdorff_sym"] = max(s["d1_max_l"], s["d1_max_r"])
        hpeak2 = gpeak**2 if peak is not None else out["max_sqrt"] ** 2
        out["geo_hausdorff_psnr_left"] = 10 * np.log10(hpeak2 / s["d1_max_l"])
        out["geo_hausdorff_psnr_right"] = 10 * np.log10(hpeak2 / s["d1_max_r"])
        out["geo_hausdorff_psnr_sym"] = min(
            out["geo_hausdorff_psnr_left"], out["geo_hausdorff_psnr_right"]
        )
        if point_to_plane:
            d2_l, d2_r = s["d2_sse_l"] / n_a, s["d2_sse_r"] / n_b
            out["d2_mse_left"], out["d2_mse_right"] = d2_l, d2_r
            out["d2_mse_sym"] = max(d2_l, d2_r)
            dp_l = 10 * np.log10(gpeak**2 / d2_l)
            dp_r = 10 * np.log10(gpeak**2 / d2_r)
            out["d2_psnr_left"], out["d2_psnr_right"] = dp_l, dp_r
            out["d2_psnr_sym"] = min(dp_l, dp_r)
            out["d2_hausdorff_left"] = s["d2_max_l"]
            out["d2_hausdorff_right"] = s["d2_max_r"]
            out["d2_hausdorff_sym"] = max(s["d2_max_l"], s["d2_max_r"])
            out["d2_hausdorff_psnr_left"] = 10 * np.log10(hpeak2 / s["d2_max_l"])
            out["d2_hausdorff_psnr_right"] = 10 * np.log10(hpeak2 / s["d2_max_r"])
            out["d2_hausdorff_psnr_sym"] = min(
                out["d2_hausdorff_psnr_left"], out["d2_hausdorff_psnr_right"]
            )
        if color_scheme is not None:
            cm_l, cm_r = s["c_sse_l"] / n_a, s["c_sse_r"] / n_b
            out["color_mse_left"], out["color_mse_right"] = cm_l, cm_r
            out["color_mse_sym"] = max([cm_l, cm_r], key=np.linalg.norm)
            cpeak = get_color_peak(color_scheme)
            cp_l = 10 * np.log10(cpeak**2 / cm_l)
            cp_r = 10 * np.log10(cpeak**2 / cm_r)
            out["color_psnr_left"], out["color_psnr_right"] = cp_l, cp_r
            out["color_psnr_sym"] = min([cp_l, cp_r], key=np.linalg.norm)
            out["color_hausdorff_left"] = s["c_max_l"]
            out["color_hausdorff_right"] = s["c_max_r"]
            out["color_hausdorff_sym"] = max(
                [s["c_max_l"], s["c_max_r"]], key=np.linalg.norm
            )
            chp_l = 10 * np.log10(cpeak**2 / s["c_max_l"])
            chp_r = 10 * np.log10(cpeak**2 / s["c_max_r"])
            out["color_hausdorff_psnr_left"] = chp_l
            out["color_hausdorff_psnr_right"] = chp_r
            out["color_hausdorff_psnr_sym"] = min(
                [chp_l, chp_r], key=np.linalg.norm
            )
    return out


def _packed_qt8(cloud):
    """Per-Cloud cached (8, P) coordinate-major sorted points.

    The transposed query layout the pallas refine kernels read; the
    (P,8)->(8,P) relayout costs ~15 ms at 800k on TPU, so it is computed
    once per immutable Cloud (like grids/sorted colours) instead of inside
    every NN pass."""
    q = getattr(cloud, "_qt8", None)
    if q is None:
        import jax.numpy as _jnp

        q = _jnp.pad(cloud.get_grid().points, ((0, 0), (0, 5))).T
        cloud._qt8 = q
    return q


def _sorted_colors(cloud):
    """Per-Cloud cached Morton-sorted colours (one gather per cloud ever)."""
    if cloud.colors is None:
        return None
    cs = getattr(cloud, "_sorted_colors", None)
    if cs is None:
        cs = jnp.take(cloud.colors, cloud.get_grid().perm, axis=0)
        cloud._sorted_colors = cs
    return cs


def _sorted_normals(cloud, nrm):
    """Per-Cloud cached Morton-sorted normals (file-provided or estimated)."""
    if nrm is None:
        return None
    ns = getattr(cloud, "_sorted_normals", None)
    if ns is None:
        ns = jnp.take(nrm, cloud.get_grid().perm, axis=0)
        cloud._sorted_normals = ns
    return ns


def boundary_stats(cloud, backend: str = "auto"):
    """Cached (min, max) intra-cloud NN distances of one cloud.

    They depend only on the cloud itself (reference: boundary distances come
    from the origin cloud alone, cloud_pair.py:108-109), so a QP sweep
    sharing one reference cloud computes the priciest NN pass exactly once.
    """
    cached = getattr(cloud, "_boundary_stats", None)
    if cached is not None:
        return cached
    if int(cloud.n) < 2:
        # Documented contract (see CloudPair.get_boundary_sqrt_distances):
        # a self-excluded nearest neighbour needs a second point.
        raise ValueError(
            "intra-cloud NN distances need at least 2 points; the cloud "
            f"has {int(cloud.n)}"
        )
    if backend == "auto":
        if cloud.padded_size >= nn_ops.PRUNE_THRESHOLD:
            backend = "pruned"
        else:
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    mask = cloud.valid_mask()
    if backend == "pruned":
        from .nn_pruned import nn_pruned_sorted

        g = cloud.get_grid()
        n_chunks = cloud.padded_size // 256
        cap, fallback = 32, 256
        while True:
            d, _, overflow = nn_pruned_sorted(
                g, g, jnp.asarray(cloud.n), exclude_self=True,
                cap=cap, fallback_tiles=fallback,
                mxu_ok=cloud.mxu_exact(), qt8=_packed_qt8(cloud),
            )
            # Exact iff certified, or stage 1 refined every chunk (at which
            # point the certificate cannot fail).
            if not bool(overflow) or cap >= n_chunks:
                break
            cap, fallback = next_rung(cap, fallback, n_chunks, n_chunks)
    else:
        _, d = nn_ops.nearest_neighbors(
            cloud.points, cloud.points, exclude_self=True, backend=backend,
            n_a=cloud.n, n_b=cloud.n,
        )
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    stats = (
        jnp.min(jnp.where(mask, sqrt_d, jnp.inf)),
        jnp.max(jnp.where(mask, sqrt_d, -jnp.inf)),
    )
    cloud._boundary_stats = stats
    return stats


# Remembers the certificate-passing (cap, fallback) rung per problem shape
# so a sweep of same-shaped pairs starts at the rung that worked instead of
# re-climbing (and re-running) the cheaper-but-overflowing rungs per pair.
# Not monotone: utils.cache.ladder_lookup retries the base rung periodically
# so one pathological pair cannot pin the expensive rung forever.
_LADDER_MEMO: dict = {}


@functools.partial(
    jax.jit,
    static_argnames=(
        "color_scheme", "point_to_plane", "d2_mode", "k", "est_a", "est_b",
        "knn_cap", "knn_ft", "prune_cap", "prune_fallback", "mxu_ok",
        "knn_flags",
    ),
)
def cold_pair_program(
    a_pts, b_pts, n_a, n_b, a_col=None, b_col=None,
    ga=None, gb=None, qt8_a=None, qt8_b=None,
    a_nrm=None, a_nrm_s=None, b_nrm=None, b_nrm_s=None,
    a_col_s=None, b_col_s=None, boundary_a=None,
    color_scheme=None, point_to_plane=True, d2_mode="reference",
    est_a=True, est_b=True,
    k=30, knn_cap=64, knn_ft=256, prune_cap=32, prune_fallback=256,
    mxu_ok=False, knn_flags=None,
):
    """ONE compiled program for a pair whose per-cloud state is (partly)
    cold.

    The stepwise estimation path costs up to ~7 dispatches per pair (grid
    builds, estimation programs, pair_stats, plus round-trips) at ~30 ms
    of tunnel latency each; this folds the reference's entire
    estimate-if-missing pipeline (reference cloud_pair.py:54-80) into one
    device program: Morton grids, 30-NN PCA normals + free boundary stats
    for the cloud(s) that need them (``est_a``/``est_b``), and the pruned
    bidirectional metric sweeps. Already-cached per-Cloud state (grids,
    qt8 packs, normals, sorted colours, boundary stats) is passed in and
    reused — a QP sweep's steady-state pair estimates only the degraded
    cloud, still in one dispatch.

    Returns ``(stats, cacheables)`` where cacheables carries the per-Cloud
    device state for the caller to cache; ``stats['nn_overflow']`` ORs
    every certificate in the program — on overflow the caller falls back
    to the stepwise escalating path.
    """
    from .grid import build_grid
    from .normals import estimation_core

    if ga is None:
        ga = build_grid(a_pts, n_a)
    if gb is None:
        gb = build_grid(b_pts, n_b)
    ov_est = jnp.asarray(False)
    boundary_b = None
    if est_a:
        a_nrm, a_nrm_s, mn_a, mx_a, ov_a = estimation_core(
            ga, n_a, k, knn_cap, knn_ft, flags=knn_flags)
        boundary_a = (mn_a, mx_a)
        ov_est = ov_est | ov_a
    if est_b:
        b_nrm, b_nrm_s, mn_b, mx_b, ov_b = estimation_core(
            gb, n_b, k, knn_cap, knn_ft, flags=knn_flags)
        boundary_b = (mn_b, mx_b)
        ov_est = ov_est | ov_b
    if qt8_a is None:
        qt8_a = jnp.pad(ga.points, ((0, 0), (0, 5))).T
    if qt8_b is None:
        qt8_b = jnp.pad(gb.points, ((0, 0), (0, 5))).T
    if color_scheme is not None:  # geometry-only pairs never read colours
        if a_col is not None and a_col_s is None:
            a_col_s = jnp.take(a_col, ga.perm, axis=0)
        if b_col is not None and b_col_s is None:
            b_col_s = jnp.take(b_col, gb.perm, axis=0)
    stats = _pair_stats_pruned(
        a_pts, b_pts, n_a, n_b, a_col, b_col, a_nrm, b_nrm, ga, gb,
        a_col_s, b_col_s, a_nrm_s, b_nrm_s, qt8_a, qt8_b,
        color_scheme=color_scheme, point_to_plane=point_to_plane,
        d2_mode=d2_mode, with_boundary=boundary_a is None,
        prune_cap=prune_cap, prune_fallback=prune_fallback, mxu_ok=mxu_ok,
    )
    stats = dict(stats)
    if boundary_a is not None:
        stats["self_min"], stats["self_max"] = boundary_a
    stats["nn_overflow"] = stats["nn_overflow"] | ov_est
    cacheables = {
        "ga": ga, "gb": gb, "qt8_a": qt8_a, "qt8_b": qt8_b,
        "nrm_a": a_nrm, "nrm_b": b_nrm,
        "nrm_a_s": a_nrm_s, "nrm_b_s": b_nrm_s,
        "a_col_s": a_col_s, "b_col_s": b_col_s,
        "boundary_a": (stats["self_min"], stats["self_max"]),
        "boundary_b": boundary_b,
    }
    return stats, cacheables


def _prefetch_obb(a, peak):
    """Start the host-side OBB peak on a thread, overlapped with the
    device passes (qhull over the origin cloud, ~0.35 s at 800k, no device
    dependency). Skipped when a user peak (pc_error --resolution) makes it
    irrelevant or the extent is already cached; returns a future or None.
    """
    if peak is not None or getattr(a, "_obb_extent", None) is not None:
        return None
    import concurrent.futures as _cf

    _pool = _cf.ThreadPoolExecutor(1)
    fut = _pool.submit(a.get_obb_extent)
    _pool.shutdown(wait=False)
    return fut


def _needs_est(c):
    return (c.normals is None
            and getattr(c, "_est_normals", None) is None)


def _cold_device_state(a, b, color_scheme):
    """True when either cloud still lacks per-Cloud device state (grid,
    qt8 pack, sorted colours) that the fold would otherwise have to build
    through separate ~30 ms dispatches."""
    for c in (a, b):
        if getattr(c, "_grid", None) is None \
                or getattr(c, "_qt8", None) is None:
            return True
        if color_scheme is not None and c.colors is not None \
                and getattr(c, "_sorted_colors", None) is None:
            return True
    return False


def _cold_fold_applicable(a, b, color_scheme, point_to_plane, backend):
    """The one-dispatch fold handles the big-cloud pruned cases where at
    least one cloud is cold: either it needs normal estimation, or its
    per-cloud device state (grid/qt8/sorted colours) is unbuilt — the
    sweep steady state, where every degraded cloud is brand new (the
    reference rebuilds everything per pair, cloud_pair.py:54-80). Warm
    pairs and every corner (small clouds, non-pruned backends) keep the
    stepwise path, whose behaviour is unchanged."""
    from .normals import DEFAULT_KNN, _PRUNE_THRESHOLD

    if (backend != "pruned"
            or min(a.padded_size, b.padded_size) < _PRUNE_THRESHOLD
            or a.points.dtype != b.points.dtype):
        return False
    if point_to_plane and (_needs_est(a) or _needs_est(b)):
        return min(int(a.n), int(b.n)) >= max(DEFAULT_KNN, 2)
    return _cold_device_state(a, b, color_scheme) and int(a.n) >= 2


def _fused_evaluate_cold(a, b, color_scheme, point_to_plane, d2_mode,
                         peak):
    """fused_evaluate body for pairs needing in-program estimation (one
    dispatch + one host OBB overlapped). Returns None when the program
    overflows a certificate (caller re-runs stepwise with escalation)."""
    import os as _os

    obb_future = _prefetch_obb(a, peak)
    mxu_ok = (a.points.dtype == jnp.float32
              and a.mxu_exact() and b.mxu_exact())
    from .normals import _LADDER_MEMO as _EST_MEMO

    base_cap = int(_os.environ.get("PCC_NN_CAP", "32"))
    base_ft = int(_os.environ.get("PCC_NN_FT", "256"))
    memo_key = (a.padded_size, b.padded_size, str(a.points.dtype),
                color_scheme, point_to_plane, d2_mode, "pruned")
    cap, fallback = ladder_lookup(_LADDER_MEMO, memo_key,
                                  (base_cap, base_ft))

    def nrm_state(c):
        # Pass only CACHED sorted normals: computing them here would cost a
        # grid build + gather dispatch outside the fold, and the default
        # (non-paykernel) pair path never reads them.
        if c.normals is not None:
            return c.normals, getattr(c, "_sorted_normals", None), False
        est = getattr(c, "_est_normals", None)
        if est is not None:
            return est, getattr(c, "_sorted_normals", None), False
        return None, None, point_to_plane

    a_nrm, a_nrm_s, est_a = nrm_state(a)
    b_nrm, b_nrm_s, est_b = nrm_state(b)
    kcap = kft = None
    kflags = None
    if est_a or est_b:
        from .knn_pruned import knn_flags_from_env
        from .normals import _knn_base_rung

        kflags = knn_flags_from_env()
        base = _knn_base_rung()
        kcap_a, kft_a = ladder_lookup(_EST_MEMO, (a.padded_size, 30), base)
        kcap_b, kft_b = ladder_lookup(_EST_MEMO, (b.padded_size, 30), base)
        kcap, kft = max(kcap_a, kcap_b), max(kft_a, kft_b)
    stats, cache = cold_pair_program(
        a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
        a_col=a.colors, b_col=b.colors,
        ga=getattr(a, "_grid", None), gb=getattr(b, "_grid", None),
        qt8_a=getattr(a, "_qt8", None), qt8_b=getattr(b, "_qt8", None),
        a_nrm=a_nrm, a_nrm_s=a_nrm_s, b_nrm=b_nrm, b_nrm_s=b_nrm_s,
        a_col_s=getattr(a, "_sorted_colors", None),
        b_col_s=getattr(b, "_sorted_colors", None),
        boundary_a=getattr(a, "_boundary_stats", None),
        color_scheme=color_scheme, point_to_plane=point_to_plane,
        d2_mode=d2_mode, est_a=est_a, est_b=est_b,
        knn_cap=kcap or 64, knn_ft=kft or 256,
        prune_cap=cap, prune_fallback=fallback, mxu_ok=mxu_ok,
        knn_flags=kflags,
    )
    stats = jax.device_get(stats)  # one round-trip for scalars + overflow
    if bool(stats["nn_overflow"]):
        if obb_future is not None:
            obb_future.result()  # let it finish caching before stepwise
        return None
    ladder_store(_LADDER_MEMO, memo_key, (cap, fallback))
    if est_a or est_b:
        # Store the certified rung only under the shape that DEMANDED it:
        # the program runs both estimations at max(rung_a, rung_b), but
        # pinning the cheaper shape at the other's expensive rung would
        # slow every later same-shaped cloud (and resetting its retry
        # clock each pair would defer the base retry forever).
        if est_a and (kcap_a, kft_a) == (kcap, kft):
            ladder_store(_EST_MEMO, (a.padded_size, 30), (kcap, kft))
        if est_b and (kcap_b, kft_b) == (kcap, kft):
            ladder_store(_EST_MEMO, (b.padded_size, 30), (kcap, kft))
    # Cache the device-side per-Cloud state exactly like the stepwise path.
    a._grid, b._grid = cache["ga"], cache["gb"]
    a._qt8, b._qt8 = cache["qt8_a"], cache["qt8_b"]
    if est_a:
        a._est_normals = cache["nrm_a"]
        a._sorted_normals = cache["nrm_a_s"]
    if est_b:
        b._est_normals = cache["nrm_b"]
        b._sorted_normals = cache["nrm_b_s"]
    if cache["a_col_s"] is not None:
        a._sorted_colors = cache["a_col_s"]
        b._sorted_colors = cache["b_col_s"]
    a._boundary_stats = cache["boundary_a"]
    if cache["boundary_b"] is not None \
            and getattr(b, "_boundary_stats", None) is None:
        b._boundary_stats = cache["boundary_b"]
    if peak is not None:
        extent_peak = float(peak)
    elif obb_future is not None:
        extent_peak = float(np.max(obb_future.result()))
    else:
        extent_peak = float(np.max(a.get_obb_extent()))
    return finalize_stats(
        stats, extent_peak, color_scheme=color_scheme,
        point_to_plane=point_to_plane, peak=peak,
    )


def fused_evaluate(
    a, b, color_scheme=None, point_to_plane=False, d2_mode="reference",
    backend: str = "auto", peak: typing.Optional[float] = None,
) -> typing.Dict[str, np.float64]:
    """Full fused evaluation of a Cloud pair (bench / batch fast path)."""
    if backend == "auto":
        if max(a.padded_size, b.padded_size) >= nn_ops.PRUNE_THRESHOLD:
            backend = "pruned"
        else:
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if point_to_plane and d2_mode == "reference" and a.n > b.n:
        raise IndexError(
            "reference D2 mode requires n_origin <= n_reconst "
            f"(got {a.n} > {b.n}); use d2_mode='pc_error'"
        )
    if _cold_fold_applicable(a, b, color_scheme, point_to_plane, backend):
        out = _fused_evaluate_cold(a, b, color_scheme, point_to_plane,
                                   d2_mode, peak)
        if out is not None:
            return out
        # A certificate overflowed inside the one-dispatch program: the
        # stepwise path below re-runs with per-stage escalation ladders.
    obb_future = _prefetch_obb(a, peak)
    a_nrm, b_nrm = a.normals, b.normals
    if point_to_plane:
        # Cloud-level cache: estimated normals depend only on the cloud.
        a_nrm = a.get_normals()
        b_nrm = b.get_normals()
    ga = gb = None
    a_col_sorted = b_col_sorted = None
    a_nrm_sorted = b_nrm_sorted = None
    qt8_a = qt8_b = None
    if backend == "pruned":
        ga = a.get_grid()
        gb = b.get_grid()
        qt8_a = _packed_qt8(a)
        qt8_b = _packed_qt8(b)
        if color_scheme is not None:
            a_col_sorted = _sorted_colors(a)
            b_col_sorted = _sorted_colors(b)
        if point_to_plane:
            a_nrm_sorted = _sorted_normals(a, a_nrm)
            b_nrm_sorted = _sorted_normals(b, b_nrm)
    # One-dispatch cold pairs (VERDICT r2 item 4): when the origin cloud has
    # no cached boundary stats yet (normals estimation above may have just
    # cached them for free), fold the self-NN pass INTO the pair_stats
    # program instead of paying a separate ~30 ms dispatch; the result is
    # cached on the Cloud either way so sweeps sharing a reference cloud
    # still compute it once.
    cached_boundary = getattr(a, "_boundary_stats", None)
    with_boundary = cached_boundary is None
    if with_boundary and int(a.n) < 2:
        # Same contract as boundary_stats (documented degenerate input).
        raise ValueError(
            "intra-cloud NN distances need at least 2 points; the cloud "
            f"has {int(a.n)}"
        )
    self_min = self_max = None
    if not with_boundary:
        self_min, self_max = cached_boundary
    mxu_ok = (backend == "pruned" and a.points.dtype == jnp.float32
              and a.mxu_exact() and b.mxu_exact())
    import os as _os

    memo_key = (a.padded_size, b.padded_size, str(a.points.dtype),
                color_scheme, point_to_plane, d2_mode, backend)
    base_cap = int(_os.environ.get("PCC_NN_CAP", "32"))
    base_ft = int(_os.environ.get("PCC_NN_FT", "256"))
    cap, fallback = ladder_lookup(_LADDER_MEMO, memo_key,
                                  (base_cap, base_ft))
    while True:
        stats = pair_stats(
            a.points,
            b.points,
            jnp.asarray(a.n),
            jnp.asarray(b.n),
            a_col=a.colors,
            b_col=b.colors,
            a_nrm=a_nrm,
            b_nrm=b_nrm,
            ga=ga,
            gb=gb,
            a_col_sorted=a_col_sorted,
            b_col_sorted=b_col_sorted,
            a_nrm_sorted=a_nrm_sorted,
            b_nrm_sorted=b_nrm_sorted,
            qt8_a=qt8_a,
            qt8_b=qt8_b,
            color_scheme=color_scheme,
            point_to_plane=point_to_plane,
            d2_mode=d2_mode,
            with_boundary=with_boundary,
            backend=backend,
            prune_cap=cap,
            prune_fallback=fallback,
            mxu_ok=mxu_ok,
        )
        max_chunks = max(a.padded_size, b.padded_size) // 256
        stats = jax.device_get(stats)  # one round-trip: results + overflow
        # Exact iff every direction's certificate passed, or the stage-1 cap
        # covers all chunks of the larger cloud (brute force for both
        # directions, where the certificate cannot fail).
        if (
            "nn_overflow" not in stats
            or not bool(stats["nn_overflow"])
            or cap >= max_chunks
        ):
            ladder_store(_LADDER_MEMO, memo_key, (cap, fallback))
            break
        cap, fallback = next_rung(cap, fallback, max_chunks, max_chunks)
    stats = dict(stats)
    if with_boundary:
        a._boundary_stats = (stats["self_min"], stats["self_max"])
    else:
        stats["self_min"], stats["self_max"] = jax.device_get(
            (self_min, self_max)
        )
    # User peak (pc_error --resolution) skips the OBB entirely.
    if peak is not None:
        extent_peak = float(peak)
    elif obb_future is not None:
        extent_peak = float(np.max(obb_future.result()))
    else:
        extent_peak = float(np.max(a.get_obb_extent()))
    return finalize_stats(
        stats, extent_peak, color_scheme=color_scheme,
        point_to_plane=point_to_plane, peak=peak
    )
