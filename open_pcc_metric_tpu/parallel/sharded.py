"""Multi-chip sharded evaluation: DP over frames x ring-sharded NN over points.

The reference has no parallelism of any kind (SURVEY §5: single-threaded
Python loop over KD-tree queries). The TPU-native scaling story (SURVEY §5
"long-context" row) is:

  * ``frames`` mesh axis — pure data parallelism: one frame pair per device
    group, no communication (BASELINE.json configs 4-5);
  * ``points`` mesh axis — for clouds too big for one chip: the QUERY axis is
    sharded and the SEARCH cloud's shards rotate around the ring via
    ``lax.ppermute`` with a running (min, argmin) — the moral equivalent of
    ring attention for NN search. Per-shard argmin PAYLOADS (the winning
    neighbour's coordinates / colours / normals) ride along with the rotation,
    so colour and D2 gathers never need a global all-gather;
  * epilogue reductions cross shards with ``psum`` / ``pmax`` / ``pmin`` over
    ICI.

Everything is built on ``jax.shard_map`` over a ``Mesh(("frames", "points"))``
and runs identically on a virtual CPU mesh (tests) and a real TPU slice.
"""
from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.nn import nn_chunked
from ..ops.knn import knn
from ..ops.normals import DEFAULT_KNN
from ..ops.eigh3 import smallest_eigenvector_sym3


def make_mesh(
    n_devices: typing.Optional[int] = None, dp: int = 1
) -> Mesh:
    """Mesh with axes ("frames", "points"): dp frame-groups x ring width."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    if n % dp:
        raise ValueError(f"dp={dp} does not divide {n} devices")
    return Mesh(devices.reshape(dp, n // dp), axis_names=("frames", "points"))


# ------------------------------------------------------------------ ring 1-NN


def ring_nn(
    a_loc: jnp.ndarray,
    b_loc: jnp.ndarray,
    axis: str = "points",
    payloads: typing.Tuple[jnp.ndarray, ...] = (),
    exclude_self: bool = False,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray, typing.Tuple[jnp.ndarray, ...]]:
    """Exact 1-NN of local queries against the FULL ring-sharded search cloud.

    Must run inside shard_map with mesh axis ``axis``. ``payloads`` are
    b-aligned arrays (e.g. colours, normals, the points themselves) whose
    rows rotate with ``b_loc``; the returned payloads are the rows belonging
    to each query's winning neighbour.

    Returns ``(dist_sq (Na_loc,), global_idx (Na_loc,), best_payloads)``.
    Ties break to the lowest GLOBAL index, matching the single-chip path.
    """
    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    rows_b = b_loc.shape[0]
    a_offset = me * a_loc.shape[0]
    perm = [(i, (i - 1) % nsh) for i in range(nsh)]

    dtype = a_loc.dtype
    best_d = jnp.full((a_loc.shape[0],), jnp.asarray(jnp.inf, dtype), dtype)
    best_i = jnp.zeros((a_loc.shape[0],), jnp.int32)
    best_pay = tuple(jnp.zeros((a_loc.shape[0],) + p.shape[1:], p.dtype)
                     for p in payloads)

    def step(carry, s):
        b_cur, pay_cur, best_d, best_i, best_pay = carry
        src = jax.lax.rem(me.astype(jnp.int32) + s, jnp.int32(nsh))
        b_base = src * jnp.int32(rows_b)
        idx, d = nn_chunked(
            a_loc,
            b_cur,
            exclude_self=exclude_self,
            a_offset=a_offset,
            b_offset=b_base,
        )
        gidx = idx + b_base
        better = (d < best_d) | ((d == best_d) & (gidx < best_i))
        best_d = jnp.where(better, d, best_d)
        best_i = jnp.where(better, gidx, best_i)
        new_pay = tuple(
            jnp.where(
                better[:, None] if p.ndim > 1 else better,
                jnp.take(pc, idx, axis=0),
                p,
            )
            for p, pc in zip(best_pay, pay_cur)
        )
        b_next = jax.lax.ppermute(b_cur, axis, perm)
        pay_next = tuple(jax.lax.ppermute(pc, axis, perm) for pc in pay_cur)
        return (b_next, pay_next, best_d, best_i, new_pay), None

    init = (b_loc, tuple(payloads), best_d, best_i, best_pay)
    (_, _, best_d, best_i, best_pay), _ = jax.lax.scan(
        step, init, jnp.arange(nsh, dtype=jnp.int32)
    )
    return best_d, best_i, best_pay


# ------------------------------------------------------------------ ring k-NN


def ring_knn_coords(
    a_loc: jnp.ndarray,
    b_loc: jnp.ndarray,
    k: int,
    axis: str = "points",
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest NEIGHBOUR COORDINATES from the full ring-sharded cloud.

    Carrying coordinates (not global indices) avoids any cross-shard gather:
    the covariance for normal estimation needs only the coords. Returns
    ``(dists (Na_loc, k), coords (Na_loc, k, 3))`` sorted ascending.
    """
    nsh = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i - 1) % nsh) for i in range(nsh)]
    na = a_loc.shape[0]
    dtype = a_loc.dtype

    run_d = jnp.full((na, k), jnp.asarray(jnp.inf, dtype), dtype)
    run_c = jnp.zeros((na, k, 3), dtype)

    def step(carry, s):
        b_cur, run_d, run_c = carry
        idx, d = knn(a_loc, b_cur, k=k)  # local top-k (idx local to b_cur)
        c = jnp.take(b_cur, idx, axis=0)  # (na, k, 3)
        cand_d = jnp.concatenate([run_d, d], axis=1)
        cand_c = jnp.concatenate([run_c, c], axis=1)
        top_negd, pos = jax.lax.top_k(-cand_d, k)
        run_d = -top_negd
        run_c = jnp.take_along_axis(cand_c, pos[:, :, None], axis=1)
        b_next = jax.lax.ppermute(b_cur, axis, perm)
        return (b_next, run_d, run_c), None

    (_, run_d, run_c), _ = jax.lax.scan(step, (b_loc, run_d, run_c),
                                        jnp.arange(nsh, dtype=jnp.int32))
    return run_d, run_c


def ring_normals(points_loc: jnp.ndarray, k: int = DEFAULT_KNN,
                 axis: str = "points") -> jnp.ndarray:
    """PCA normals of a ring-sharded cloud (local queries, global k-NN)."""
    _, coords = ring_knn_coords(points_loc, points_loc, k=k, axis=axis)
    mean = jnp.mean(coords, axis=1, keepdims=True)
    centered = coords - mean
    cov = jnp.einsum("pki,pkj->pij", centered, centered) / k
    return smallest_eigenvector_sym3(cov)


# ------------------------------------------------------- full sharded step


def _local_masked_sum(x, mask):
    m = mask if x.ndim == 1 else mask[:, None]
    return jnp.sum(jnp.where(m, x, 0), axis=0)


def _local_masked_max(x, mask):
    m = mask if x.ndim == 1 else mask[:, None]
    return jnp.max(jnp.where(m, x, -jnp.inf), axis=0)


def _frame_stats(
    a_pts, b_pts, n_a, n_b, a_col, b_col, a_nrm, b_nrm,
    *, color_scheme, point_to_plane, d2_mode,
):
    """Per-frame sharded stats; runs inside shard_map, vmapped over frames.

    Both clouds of a frame pair share one padded size and the same "points"
    sharding, so the reference-mode D2 positional normal lookup (SURVEY Q3)
    is shard-local: shard i of cloud A's queries aligns with shard i of
    cloud B's normals — zero communication.
    """
    pl_rows = a_pts.shape[0]
    me = jax.lax.axis_index("points")
    q_global = me * pl_rows + jnp.arange(pl_rows)
    mask_a = q_global < n_a
    mask_b = q_global < n_b

    pay_b: list = []
    pay_a: list = []
    if color_scheme is not None:
        pay_b.append(b_col)
        pay_a.append(a_col)
    need_nn_normals = point_to_plane and d2_mode == "pc_error"
    if point_to_plane:
        if a_nrm is None:
            a_nrm = ring_normals(a_pts)
        if b_nrm is None:
            b_nrm = ring_normals(b_pts)
    if need_nn_normals:
        pay_b.append(b_nrm)
        pay_a.append(a_nrm)
    if point_to_plane:
        pay_b.append(b_pts)  # NN coords for error vectors
        pay_a.append(a_pts)

    d0, _, pay0 = ring_nn(a_pts, b_pts, payloads=tuple(pay_b))
    d1, _, pay1 = ring_nn(b_pts, a_pts, payloads=tuple(pay_a))

    def allsum(x):
        return jax.lax.psum(x, "points")

    def allmax(x):
        return jax.lax.pmax(x, "points")

    out = {
        "n_a": n_a,
        "n_b": n_b,
        "d1_sse_l": allsum(_local_masked_sum(d0, mask_a)),
        "d1_sse_r": allsum(_local_masked_sum(d1, mask_b)),
        "d1_max_l": allmax(_local_masked_max(d0, mask_a)),
        "d1_max_r": allmax(_local_masked_max(d1, mask_b)),
    }

    dself, _, _ = ring_nn(a_pts, a_pts, exclude_self=True)
    sqrt_self = jnp.sqrt(dself)
    out["self_min"] = jax.lax.pmin(
        jnp.min(jnp.where(mask_a, sqrt_self, jnp.inf)), "points"
    )
    out["self_max"] = allmax(_local_masked_max(sqrt_self, mask_a))

    k = 0
    if color_scheme is not None:
        from ..ops.color import transform_colors

        nc0, nc1 = pay0[k], pay1[k]
        k += 1
        t0 = transform_colors(a_col, "rgb", color_scheme)
        tn0 = transform_colors(nc0, "rgb", color_scheme)
        t1 = transform_colors(b_col, "rgb", color_scheme)
        tn1 = transform_colors(nc1, "rgb", color_scheme)
        diff0, diff1 = t0 - tn0, t1 - tn1
        out["c_sse_l"] = allsum(_local_masked_sum(diff0**2, mask_a))
        out["c_sse_r"] = allsum(_local_masked_sum(diff1**2, mask_b))
        h0, h1 = diff0, diff1
        if color_scheme == "rgb":  # SURVEY Q5 quirk
            h0, h1 = 255.0 * h0, 255.0 * h1
        out["c_max_l"] = allmax(_local_masked_max(h0**2, mask_a))
        out["c_max_r"] = allmax(_local_masked_max(h1**2, mask_b))

    if point_to_plane:
        if need_nn_normals:
            n_for_0, n_for_1 = pay0[k], pay1[k]
            k += 1
        else:
            n_for_0, n_for_1 = b_nrm, a_nrm  # positional, shard-aligned
        nnb, nna = pay0[k], pay1[k]
        k += 1
        err0 = a_pts - nnb
        err1 = b_pts - nna
        p0 = jnp.sum(err0 * n_for_0, axis=1) ** 2
        p1 = jnp.sum(err1 * n_for_1, axis=1) ** 2
        out["d2_sse_l"] = allsum(_local_masked_sum(p0, mask_a))
        out["d2_sse_r"] = allsum(_local_masked_sum(p1, mask_b))
        out["d2_max_l"] = allmax(_local_masked_max(p0, mask_a))
        out["d2_max_r"] = allmax(_local_masked_max(p1, mask_b))

    return out


def sharded_pair_stats(
    mesh: Mesh,
    a_pts: jnp.ndarray,  # (B, P, 3)
    b_pts: jnp.ndarray,  # (B, P, 3) — same padded P as a_pts
    n_a: jnp.ndarray,  # (B,)
    n_b: jnp.ndarray,  # (B,)
    a_col: typing.Optional[jnp.ndarray] = None,
    b_col: typing.Optional[jnp.ndarray] = None,
    a_nrm: typing.Optional[jnp.ndarray] = None,
    b_nrm: typing.Optional[jnp.ndarray] = None,
    color_scheme: typing.Optional[str] = None,
    point_to_plane: bool = False,
    d2_mode: str = "reference",
) -> typing.Dict[str, jnp.ndarray]:
    """Batched multi-chip metric evaluation: DP over frames, ring over points.

    Returns per-frame stats dicts of shape (B,) [or (B, 3) for colour],
    feedable to ops.fused.finalize_stats frame-by-frame.
    """
    if point_to_plane and d2_mode == "reference":
        # Reference-mode D2 reads positional normals of the OTHER cloud at
        # the query's own row (SURVEY Q3); rows beyond n_b hold padding
        # normals and would silently contaminate d2_sse/d2_max. The
        # single-chip paths raise on this input; match them here.
        na_h, nb_h = np.asarray(n_a), np.asarray(n_b)
        bad = np.nonzero(na_h > nb_h)[0]
        if bad.size:
            f = int(bad[0])
            raise IndexError(
                "reference D2 mode requires n_origin <= n_reconst per frame "
                f"(frame {f}: {int(na_h[f])} > {int(nb_h[f])}); "
                "use d2_mode='pc_error'"
            )
    optional = {"a_col": a_col, "b_col": b_col, "a_nrm": a_nrm, "b_nrm": b_nrm}
    present = tuple(k for k, v in optional.items() if v is not None)

    def per_frame(ap, bp, na_, nb_, *rest):
        named = dict(zip(present, rest))
        return _frame_stats(
            ap, bp, na_, nb_,
            named.get("a_col"), named.get("b_col"),
            named.get("a_nrm"), named.get("b_nrm"),
            color_scheme=color_scheme,
            point_to_plane=point_to_plane,
            d2_mode=d2_mode,
        )

    local_fn = jax.vmap(per_frame)
    pspec = P("frames", "points")
    fspec = P("frames")
    in_specs = (pspec, pspec, fspec, fspec) + (pspec,) * len(present)

    # check_vma=False: the ring scans create fresh carries inside the mapped
    # body, which JAX's varying-axis tracker would reject as "unvarying".
    mapped = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=fspec,
        check_vma=False,
    )
    return jax.jit(mapped)(
        a_pts, b_pts, n_a, n_b, *[optional[k] for k in present]
    )
