"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY §4d)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from open_pcc_metric_tpu.cloud import Cloud
from open_pcc_metric_tpu.parallel import (
    make_mesh,
    ring_nn,
    ring_normals,
    sharded_pair_stats,
)
from open_pcc_metric_tpu.ops.fused import pair_stats, finalize_stats
from open_pcc_metric_tpu.ops.obb import minimal_obb_extent

import oracle


def _padded(pts, p, dtype=jnp.float64):
    return Cloud.from_numpy(pts, dtype=dtype, pad_to=p)


def test_mesh_shapes():
    m = make_mesh(8, dp=2)
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("frames", "points")


@pytest.mark.parametrize("dp", [1, 2])
def test_ring_nn_matches_oracle(dp):
    mesh = make_mesh(8, dp=dp)
    sp = 8 // dp
    rng = np.random.default_rng(0)
    na, nb = 600, 500
    p = 1024  # common padded size; 1024 % sp == 0
    a = _padded(rng.uniform(0, 100, (na, 3)), p)
    b = _padded(rng.uniform(0, 100, (nb, 3)), p)

    def fn(ap, bp):
        d, i, _ = ring_nn(ap[0], bp[0])
        return d[None], i[None]

    mapped = jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(None, "points"), P(None, "points")),
            out_specs=P(None, "points"),
        )
    )
    # add a dummy leading axis of size 1 replicated over "frames"
    d, i = mapped(a.points[None], b.points[None])
    d, i = np.asarray(d)[0], np.asarray(i)[0]
    oidx, od = oracle.nn_bruteforce(
        np.asarray(a.points[:na]), np.asarray(b.points[:nb])
    )
    np.testing.assert_array_equal(i[:na], oidx)
    np.testing.assert_allclose(d[:na], od, rtol=1e-12)


def test_ring_nn_self_exclusion():
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(1)
    n = 700
    a = _padded(rng.uniform(0, 50, (n, 3)), 1024)

    def fn(ap):
        d, i, _ = ring_nn(ap[0], ap[0], exclude_self=True)
        return d[None], i[None]

    mapped = jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(P(None, "points"),),
            out_specs=P(None, "points"),
        )
    )
    d, i = mapped(a.points[None])
    i = np.asarray(i)[0]
    oidx, od = oracle.nn_bruteforce(
        np.asarray(a.points[:n]), np.asarray(a.points[:n]), exclude_self=True
    )
    np.testing.assert_array_equal(i[:n], oidx)


def test_ring_normals_match_single_chip():
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(2)
    xy = rng.uniform(0, 10, (900, 2))
    pts = np.concatenate([xy, 0.25 * np.ones((900, 1))], axis=1)
    a = _padded(pts, 1024)

    mapped = jax.jit(
        jax.shard_map(
            lambda ap: ring_normals(ap[0])[None],
            mesh=mesh, in_specs=(P(None, "points"),),
            out_specs=P(None, "points"),
        )
    )
    normals = np.asarray(mapped(a.points[None]))[0][:900]
    dots = np.abs(normals @ [0.0, 0.0, 1.0])
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


@pytest.mark.parametrize("dp,scheme,p2p", [(2, "ycc", False), (1, None, True)])
def test_sharded_full_step_matches_fused(dp, scheme, p2p):
    """The 8-device sharded step must reproduce the single-chip fused stats."""
    mesh = make_mesh(8, dp=dp)
    rng = np.random.default_rng(3)
    B = 2
    p = 1024
    frames = []
    for f in range(B):
        v = rng.normal(size=(700 + 50 * f, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts0 = v * 60.0
        pts1 = pts0 + rng.normal(scale=0.2, size=pts0.shape)
        c0 = rng.uniform(0, 1, pts0.shape)
        c1 = rng.uniform(0, 1, pts1.shape)
        frames.append((pts0, pts1, c0, c1, v))

    a_pts = jnp.stack([_padded(f[0], p).points for f in frames])
    b_pts = jnp.stack([_padded(f[1], p).points for f in frames])
    n_a = jnp.asarray([f[0].shape[0] for f in frames])
    n_b = jnp.asarray([f[1].shape[0] for f in frames])
    def stack_padded(arrs):
        return jnp.stack(
            [jnp.asarray(np.pad(x, ((0, p - x.shape[0]), (0, 0))))
             for x in arrs]
        )

    kw = {}
    if scheme is not None:
        kw["a_col"] = stack_padded([f[2] for f in frames])
        kw["b_col"] = stack_padded([f[3] for f in frames])
    if p2p:
        kw["a_nrm"] = stack_padded([f[4] for f in frames])
        kw["b_nrm"] = stack_padded(
            [f[1] / np.linalg.norm(f[1], axis=1, keepdims=True)
             for f in frames]
        )

    stats = sharded_pair_stats(
        mesh, a_pts, b_pts, n_a, n_b,
        color_scheme=scheme, point_to_plane=p2p, **kw
    )

    for f in range(B):
        single = pair_stats(
            a_pts[f], b_pts[f], n_a[f], n_b[f],
            a_col=kw.get("a_col")[f] if scheme else None,
            b_col=kw.get("b_col")[f] if scheme else None,
            a_nrm=kw.get("a_nrm")[f] if p2p else None,
            b_nrm=kw.get("b_nrm")[f] if p2p else None,
            color_scheme=scheme, point_to_plane=p2p,
        )
        for key, val in single.items():
            np.testing.assert_allclose(
                np.asarray(stats[key])[f], np.asarray(val),
                rtol=1e-10, err_msg=key,
            )


@pytest.mark.parametrize("exclude_self", [False, True])
def test_ring_nn_pruned_matches_oracle(exclude_self):
    """Pruned ring == oracle bit-for-bit, including original-index ties.

    This exercises the XLA per-shard refinement backend in-mesh. The pallas
    backend (what real TPU meshes run) cannot run interpret-mode under a
    vma-checked shard_map on this jax version (scalar-prefetch Ref avals
    drop their varying-axes set, so the index-map jaxpr is traced
    replicated but re-evaluated varying and dynamic_slice rejects the mix);
    its glue is covered out-of-mesh by test_refine_local_pallas_matches_xla
    below and compiled in-mesh by the real-chip smoke (tools/)."""
    impl = "xla"
    from open_pcc_metric_tpu.parallel import ring_nn_pruned

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(7)
    na, nb = 900, 800
    p = 2048  # 8 shards x 256-chunk alignment
    # Integer voxel cloud: plenty of exact ties to exercise the tie-break.
    dtype = jnp.float64
    A = rng.integers(0, 64, (na, 3)).astype(float)
    B = A if exclude_self else rng.integers(0, 64, (nb, 3)).astype(float)
    a = _padded(A, p, dtype=dtype)
    b = a if exclude_self else _padded(B, p, dtype=dtype)
    ga, gb = a.get_grid(), b.get_grid()
    payload = jnp.concatenate(
        [gb.points, jnp.asarray(gb.perm, gb.points.dtype)[:, None]], axis=1)

    def fn(apts, bpts, bperm, blo, bhi, pay):
        d, i, pw, ovf = ring_nn_pruned(
            apts[0], bpts[0], bperm[0], blo[0], bhi[0],
            jnp.asarray(a.n), jnp.asarray(b.n),
            payload=pay[0], exclude_self=exclude_self, cap=8,
            refine_impl=impl)
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), "points") > 0
        return d[None], i[None], pw[None], ovf[None]

    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "points"),) * 3 + (P(None, "points"),) * 2
        + (P(None, "points"),),
        out_specs=(P(None, "points"), P(None, "points"),
                   P(None, "points"), P(None)),

    ))
    d, i, pw, ovf = mapped(
        ga.points[None], gb.points[None], gb.perm[None],
        gb.bbox_lo[None], gb.bbox_hi[None], payload[None])
    assert not bool(np.asarray(ovf).any())
    # Unsort back to original row order.
    inv = np.zeros(p, np.int64)
    inv[np.asarray(ga.perm)] = np.arange(p)
    d = np.asarray(d)[0][inv][: a.n]
    i = np.asarray(i)[0][inv][: a.n]
    pw = np.asarray(pw)[0][inv][: a.n]
    oidx, od = oracle.nn_bruteforce(
        A, np.asarray(B if not exclude_self else A),
        exclude_self=exclude_self)
    np.testing.assert_array_equal(i, oidx)
    np.testing.assert_allclose(d, od, rtol=1e-12)
    # The payload rows are the winning neighbour's (coords + orig idx).
    np.testing.assert_array_equal(pw[:, 3].astype(np.int64), oidx)


@pytest.mark.parametrize("exclude_self", [False, True])
def test_refine_local_pallas_matches_xla(exclude_self):
    """The ring's pallas per-shard refine glue == the XLA refine, bit for
    bit, out-of-mesh (interpret mode cannot run in-mesh on this jax — see
    test_ring_nn_pruned_matches_oracle). Covers the padded tile table
    (ntl=3 -> ntl_pad=8 / ntl=4 -> 8), the per-tile ncand gate (emulated on
    the XLA side by duplicating slot 0 into gated-out slots — duplicates
    never change a min), original-id tie-breaks on integer f32 coords, the
    inverse-permutation payload gather, and positional self-exclusion."""
    from open_pcc_metric_tpu.ops.grid import CHUNK
    from open_pcc_metric_tpu.parallel.sharded import (
        _pad_tile_table, _refine_local, _refine_local_pallas)

    rng = np.random.default_rng(11)
    if exclude_self:
        ntl = ncl = 4  # positional masking needs a-rows aligned to b-rows
    else:
        ntl, ncl = 3, 4
    cap = 3
    A = rng.integers(0, 64, (ntl * CHUNK, 3)).astype(np.float32)
    B = A if exclude_self else (
        rng.integers(0, 64, (ncl * CHUNK, 3)).astype(np.float32))
    a_loc = jnp.asarray(A)
    b_cur = jnp.asarray(B)
    perm_cur = jnp.asarray(rng.permutation(ncl * CHUNK).astype(np.int32))
    payload = jnp.concatenate(
        [b_cur, jnp.asarray(perm_cur, jnp.float32)[:, None]], axis=1)
    # Own chunk first (so self-masking bites), then random others.
    cand = np.stack([
        np.concatenate(([t % ncl],
                        rng.integers(0, ncl, cap - 1))).astype(np.int32)
        for t in range(ntl)])
    ncand = jnp.asarray((np.arange(ntl) % cap + 1).astype(np.int32))
    cand = jnp.asarray(cand)

    # Pallas backend, exactly as ring_nn_pruned prepares it.
    ntl_pad = ((ntl + 7) // 8) * 8
    qt8c = jnp.pad(a_loc, ((0, 0), (0, 5))).T
    if ntl_pad != ntl:
        qt8c = jnp.pad(qt8c, ((0, 0), (0, (ntl_pad - ntl) * CHUNK)))
    cand_p, ncand_p = _pad_tile_table(cand, ncand, ntl_pad)
    d_pl, i_pl, pay_pl = _refine_local_pallas(
        qt8c, ntl, b_cur, perm_cur, payload, cand_p, ncand_p,
        nsh=1, exclude_self=exclude_self, interpret=True)

    # XLA backend on the gate-emulated table.
    gate = jnp.arange(cap, dtype=jnp.int32)[None, :] < ncand[:, None]
    cand_x = jnp.where(gate, cand, cand[:, :1])
    d_x, i_x, pay_x = _refine_local(
        a_loc, cand_x, b_cur, perm_cur, payload, 0, 0, exclude_self)

    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_x))
    np.testing.assert_array_equal(np.asarray(d_pl), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(pay_pl), np.asarray(pay_x))


@pytest.mark.parametrize("exclude_self", [False, True])
def test_ring_step0_counted_matches_flat(exclude_self):
    """The counted two-pass step 0 (probe + per-tile gated extension) is
    bit-identical to the flat all-live cap0 refine, out-of-mesh (interpret
    pallas — in-mesh interpret is impossible on this jax, see
    test_refine_local_pallas_matches_xla), payload rows included. cap0 =
    ncl makes the flat pass the exact reference and forbids overflow."""
    from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds
    from open_pcc_metric_tpu.parallel.sharded import (
        _pad_tile_table, _refine_local_pallas, _ring_step0_counted,
        _tile_bounds_local)

    rng = np.random.default_rng(13)
    A = rng.integers(0, 64, (1800, 3)).astype(float)
    B = A if exclude_self else rng.integers(0, 64, (1900, 3)).astype(float)
    p = 2048
    a = _padded(A, p, dtype=jnp.float32)
    b = a if exclude_self else _padded(B, p, dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    ntl = ncl = p // CHUNK
    valid_t, a_lo, a_hi = _tile_bounds_local(ga.points, 0, jnp.asarray(a.n))
    lb0 = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)
    cap0 = ncl
    _, cand0 = jax.lax.top_k(-lb0, cap0)
    cand0 = cand0.astype(jnp.int32)
    payload = jnp.concatenate(
        [gb.points, jnp.asarray(gb.perm, jnp.float32)[:, None]], axis=1)
    qt8c = jnp.pad(ga.points, ((0, 0), (0, 5))).T

    def refine(b_cur, perm_cur, pay_cur, cand, ncand, b_row0, excl):
        cand_p, ncand_p = _pad_tile_table(cand, ncand, ntl)
        return _refine_local_pallas(qt8c, ntl, b_cur, perm_cur, pay_cur,
                                    cand_p, ncand_p, 1, excl, True)

    fd, fi, fp = refine(gb.points, gb.perm, payload, cand0, None, 0,
                        exclude_self)
    eps = jnp.asarray(jnp.finfo(jnp.float32).eps, jnp.float32)
    cd, ci, cp, ovf = _ring_step0_counted(
        refine, lb0, cand0, 4, cap0, valid_t, ntl, eps,
        gb.points, gb.perm, payload, 0, exclude_self)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(fi))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(fd))
    np.testing.assert_array_equal(np.asarray(cp), np.asarray(fp))


def test_ring_nn_pruned_overflow_escalates():
    """cap=1 on a tie-heavy cloud must flag overflow, never silently
    return inexact results; a full-width cap is exact and quiet."""
    from open_pcc_metric_tpu.parallel import ring_nn_pruned

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(8)
    A = rng.integers(0, 8, (900, 3)).astype(float)  # duplicate-heavy
    B = rng.integers(0, 8, (800, 3)).astype(float)
    p = 2048
    a, b = _padded(A, p), _padded(B, p)
    ga, gb = a.get_grid(), b.get_grid()

    def run(cap):
        def fn(apts, bpts, bperm, blo, bhi):
            d, i, _, ovf = ring_nn_pruned(
                apts[0], bpts[0], bperm[0], blo[0], bhi[0],
                jnp.asarray(a.n), jnp.asarray(b.n), cap=cap)
            ovf = jax.lax.pmax(ovf.astype(jnp.int32), "points") > 0
            return d[None], i[None], ovf[None]

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(None, "points"),) * 5,
            out_specs=(P(None, "points"), P(None, "points"), P(None)),

        ))
        d, i, ovf = mapped(ga.points[None], gb.points[None], gb.perm[None],
                           gb.bbox_lo[None], gb.bbox_hi[None])
        inv = np.zeros(p, np.int64)
        inv[np.asarray(ga.perm)] = np.arange(p)
        return (np.asarray(d)[0][inv][: a.n], np.asarray(i)[0][inv][: a.n],
                bool(np.asarray(ovf).any()))

    oidx, od = oracle.nn_bruteforce(A, B)
    d1, i1, ovf1 = run(cap=1)
    exact1 = np.array_equal(i1, oidx) and np.allclose(d1, od)
    assert exact1 or ovf1  # never silently inexact
    dF, iF, ovfF = run(cap=256 // 8)  # cap == per-shard chunk count
    assert not ovfF
    np.testing.assert_array_equal(iF, oidx)
    np.testing.assert_allclose(dF, od, rtol=1e-12)


def test_ring_knn_pruned_matches_bruteforce_ring():
    from open_pcc_metric_tpu.parallel.sharded import (
        ring_knn_coords, ring_knn_coords_pruned,
    )

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(9)
    n, p, k = 1000, 2048, 12
    A = rng.uniform(0, 30, (n, 3))
    a = _padded(A, p)
    ga = a.get_grid()

    def fn(apts, blo, bhi):
        d1, c1 = ring_knn_coords(apts[0], apts[0], k=k)
        d2, c2, ovf = ring_knn_coords_pruned(
            apts[0], apts[0], blo[0], bhi[0], jnp.asarray(a.n), k=k, cap=8)
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), "points") > 0
        return d1[None], c1[None], d2[None], c2[None], ovf[None]

    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(None, "points"),) * 3,
        out_specs=(P(None, "points"),) * 4 + (P(None),),

    ))
    d1, c1, d2, c2, ovf = mapped(
        ga.points[None], ga.bbox_lo[None], ga.bbox_hi[None])
    assert not bool(np.asarray(ovf).any())
    nv = a.n
    # Distances must agree exactly (coords may differ on exact ties).
    np.testing.assert_allclose(
        np.asarray(d1)[0][:nv], np.asarray(d2)[0][:nv], rtol=1e-12)


@pytest.mark.parametrize("scheme,p2p,d2", [("ycc", True, "pc_error"),
                                           (None, True, "reference")])
def test_sharded_pruned_step_matches_fused(scheme, p2p, d2):
    """The pruned sorted-shard step must reproduce single-chip fused stats."""
    from open_pcc_metric_tpu.parallel.sharded import (
        pack_sorted_frames, sharded_pair_stats_pruned,
    )

    mesh = make_mesh(8, dp=2)
    rng = np.random.default_rng(13)
    B, p = 2, 2048
    a_clouds, b_clouds = [], []
    for f in range(B):
        v = rng.normal(size=(1500 + 100 * f, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts0 = np.round(v * 200.0)
        pts1 = pts0 + rng.integers(-1, 2, pts0.shape)
        c0 = rng.uniform(0, 1, pts0.shape)
        c1 = rng.uniform(0, 1, pts1.shape)
        nrm0 = v
        nrm1 = pts1 / np.maximum(np.linalg.norm(pts1, axis=1,
                                                keepdims=True), 1e-9)
        a_clouds.append(Cloud.from_numpy(pts0, colors=c0, normals=nrm0,
                                         pad_to=p, dtype=jnp.float32))
        b_clouds.append(Cloud.from_numpy(pts1, colors=c1, normals=nrm1,
                                         pad_to=p, dtype=jnp.float32))

    packed = pack_sorted_frames(a_clouds, b_clouds, color_scheme=scheme,
                                point_to_plane=p2p, d2_mode=d2)
    stats = sharded_pair_stats_pruned(
        mesh, packed, color_scheme=scheme, point_to_plane=p2p, d2_mode=d2)
    assert not bool(np.asarray(stats["nn_overflow"]).any())

    for f in range(B):
        a, b = a_clouds[f], b_clouds[f]
        single = pair_stats(
            a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
            a_col=a.colors if scheme else None,
            b_col=b.colors if scheme else None,
            a_nrm=a.normals, b_nrm=b.normals,
            color_scheme=scheme, point_to_plane=p2p, d2_mode=d2,
        )
        for key, val in single.items():
            np.testing.assert_allclose(
                np.asarray(stats[key])[f], np.asarray(val),
                rtol=1e-5, atol=1e-7, err_msg=key,
            )


def test_finalize_matches_oracle_through_sharded_path():
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(4)
    pts0 = rng.uniform(0, 100, (800, 3))
    pts1 = rng.uniform(0, 100, (750, 3))
    p = 1024
    a = _padded(pts0, p)
    b = _padded(pts1, p)
    stats = sharded_pair_stats(
        mesh, a.points[None], b.points[None],
        jnp.asarray([800]), jnp.asarray([750]),
    )
    peak = float(np.max(minimal_obb_extent(pts0)))
    final = finalize_stats({k: np.asarray(v)[0] for k, v in stats.items()}, peak)
    ref = oracle.full_metrics(pts0, pts1, hausdorff=True)
    for key in ("geo_mse_left", "geo_mse_right", "geo_psnr_sym",
                "min_sqrt", "max_sqrt", "geo_hausdorff_sym"):
        np.testing.assert_allclose(final[key], ref[key], rtol=1e-9, err_msg=key)


def test_ring_nn_pruned_work_reduction():
    """VERDICT r1 item 3 'done' criterion: show pruning actually engages.

    The pruned ring's structural work is ntl*(ncl + (nsh-1)*cap) chunk pairs
    per device vs the brute ring's ntl*nsh*ncl; this test runs at a scale
    where cap < ncl (so rotations really refine a strict subset) and checks
    (a) bit-exactness vs the oracle and (b) that the certificate's
    qualifying counts — the chunks a rotation MUST refine — are far below
    ncl, i.e. the lb<=ub rule prunes most of every rotated shard.
    """
    from open_pcc_metric_tpu.ops.grid import CHUNK, bbox_lower_bounds
    from open_pcc_metric_tpu.parallel import ring_nn_pruned

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(21)
    n, p = 14000, 16384  # 8 chunks per shard
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    A = np.round(v * 120.0 + 128.0)
    a = _padded(A, p)
    ga = a.get_grid()
    ncl = (p // 8) // CHUNK

    def run(cap):
        def fn(apts, bperm, blo, bhi):
            d, i, _, ovf = ring_nn_pruned(
                apts[0], apts[0], bperm[0], blo[0], bhi[0],
                jnp.asarray(a.n), jnp.asarray(a.n), cap=cap)
            ovf = jax.lax.pmax(ovf.astype(jnp.int32), "points") > 0
            return d[None], i[None], ovf[None]

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(None, "points"),) * 4,
            out_specs=(P(None, "points"), P(None, "points"), P(None)),
        ))
        return mapped(ga.points[None], ga.perm[None],
                      ga.bbox_lo[None], ga.bbox_hi[None])

    # Production-style escalation: sphere shells have heavy-tailed tiles
    # (a few tiles' qualifying sets span most of a foreign shard), so small
    # caps overflow and the ladder escalates — exactness is certified,
    # never assumed.
    for cap in (4, 8):
        d, i, ovf = run(cap)
        if not bool(np.asarray(ovf).any()):
            break
    assert cap <= ncl
    assert not bool(np.asarray(ovf).any())
    inv = np.zeros(p, np.int64)
    inv[np.asarray(ga.perm)] = np.arange(p)
    oidx, od = oracle.nn_bruteforce(A, A)
    np.testing.assert_array_equal(np.asarray(i)[0][inv][: a.n], oidx)
    np.testing.assert_allclose(np.asarray(d)[0][inv][: a.n], od, rtol=1e-12)

    # (b) qualifying-count evidence, recomputed on the host: after step 0
    # each tile's ub is its true max NN distance, so a rotated shard's
    # qualifying chunks are #{lb <= ub_eff} — assert the mean over all
    # (tile, foreign shard) pairs is a small fraction of ncl.
    pts = np.asarray(ga.points, np.float64)
    nta = p // CHUNK
    valid = (np.arange(p) < a.n).reshape(nta, CHUNK)
    tiles = pts.reshape(nta, CHUNK, 3)
    big = 1e30
    t_lo = np.min(np.where(valid[:, :, None], tiles, big), axis=1)
    t_hi = np.max(np.where(valid[:, :, None], tiles, -big), axis=1)
    dfull = np.zeros(p)
    dfull[np.asarray(ga.perm[: a.n])] = od  # orig -> sorted via scatter
    dsorted = np.asarray(d)[0]
    ub = np.max(np.where(valid, dsorted.reshape(nta, CHUNK), -np.inf),
                axis=1)
    lo = np.asarray(ga.bbox_lo, np.float64)
    hi = np.asarray(ga.bbox_hi, np.float64)
    lb = np.zeros((nta, lo.shape[0]))
    for k in range(3):
        gap = np.maximum(0.0, np.maximum(t_lo[:, None, k] - hi[None, :, k],
                                         lo[None, :, k] - t_hi[:, None, k]))
        lb += gap * gap
    qual = lb <= ub[:, None] * (1 + 1e-5) + 1e-5
    live = valid.any(1)
    # Exclude each tile's own shard (step 0 refines it in full by design).
    shard_of_tile = np.arange(nta) // (nta // 8)
    shard_of_chunk = np.arange(lo.shape[0]) // ncl
    foreign = shard_of_tile[:, None] != shard_of_chunk[None, :]
    frac = qual[live][:, :][foreign[live]].mean()
    # Brute force would refine 100% of foreign chunks; the bound rule
    # qualifies only a few percent on a voxel surface.
    assert frac < 0.10, f"pruning ineffective: {frac:.1%} qualify"


@pytest.mark.parametrize("d2", ["reference", "pc_error"])
def test_sharded_pruned_estimates_missing_normals(d2):
    """ADVICE r2 (high): pruned sorted-shard p2p on clouds WITHOUT file
    normals must work in both D2 modes and match the single-chip path's
    estimate-if-missing semantics (reference cloud_pair.py:61-64)."""
    from open_pcc_metric_tpu.parallel.sharded import (
        pack_sorted_frames, sharded_pair_stats_pruned,
    )
    from open_pcc_metric_tpu.ops.fused import pair_stats

    mesh = make_mesh(8, dp=2)
    rng = np.random.default_rng(21)
    B, p = 2, 2048
    a_clouds, b_clouds = [], []
    for f in range(B):
        v = rng.normal(size=(1200 + 80 * f, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts0 = np.round(v * 150.0)
        pts1 = pts0 + rng.integers(-1, 2, pts0.shape)
        a_clouds.append(Cloud.from_numpy(pts0, pad_to=p, dtype=jnp.float32))
        b_clouds.append(Cloud.from_numpy(pts1, pad_to=p, dtype=jnp.float32))

    packed = pack_sorted_frames(a_clouds, b_clouds, point_to_plane=True,
                                d2_mode=d2)
    stats = sharded_pair_stats_pruned(
        mesh, packed, point_to_plane=True, d2_mode=d2)
    assert not bool(np.asarray(stats["nn_overflow"]).any())
    for f in range(B):
        a, b = a_clouds[f], b_clouds[f]
        single = pair_stats(
            a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
            a_nrm=a.get_normals(), b_nrm=b.get_normals(),
            point_to_plane=True, d2_mode=d2,
        )
        for key, val in single.items():
            np.testing.assert_allclose(
                np.asarray(stats[key])[f], np.asarray(val),
                rtol=1e-5, atol=1e-7, err_msg=key)


def test_sharded_pruned_mixed_normals_group():
    """ADVICE r2 (medium): a group mixing normal-ful and normal-less frames
    must stay frame-aligned (file normals where present, estimates where
    absent) instead of stacking fewer normal rows than frames."""
    from open_pcc_metric_tpu.parallel.sharded import (
        pack_sorted_frames, sharded_pair_stats_pruned,
    )
    from open_pcc_metric_tpu.ops.fused import pair_stats

    mesh = make_mesh(8, dp=2)
    rng = np.random.default_rng(22)
    B, p = 2, 2048
    a_clouds, b_clouds = [], []
    for f in range(B):
        v = rng.normal(size=(1100, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts0 = np.round(v * 140.0)
        pts1 = pts0 + rng.integers(-1, 2, pts0.shape)
        nrm = v if f == 0 else None  # frame 1 carries no normals
        a_clouds.append(Cloud.from_numpy(pts0, normals=nrm, pad_to=p,
                                         dtype=jnp.float32))
        b_clouds.append(Cloud.from_numpy(pts1, normals=nrm, pad_to=p,
                                         dtype=jnp.float32))

    packed = pack_sorted_frames(a_clouds, b_clouds, point_to_plane=True,
                                d2_mode="reference")
    stats = sharded_pair_stats_pruned(
        mesh, packed, point_to_plane=True, d2_mode="reference")
    assert not bool(np.asarray(stats["nn_overflow"]).any())
    for f in range(B):
        a, b = a_clouds[f], b_clouds[f]
        single = pair_stats(
            a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
            a_nrm=a.get_normals(), b_nrm=b.get_normals(),
            point_to_plane=True, d2_mode="reference",
        )
        for key, val in single.items():
            np.testing.assert_allclose(
                np.asarray(stats[key])[f], np.asarray(val),
                rtol=1e-5, atol=1e-7, err_msg=key)


def test_sharded_pruned_reference_requires_positional_normals():
    """Dropping the pre-gathered positional normals must fail loudly, not
    with a TypeError from None arithmetic (ADVICE r2 high)."""
    from open_pcc_metric_tpu.parallel.sharded import (
        pack_sorted_frames, sharded_pair_stats_pruned,
    )

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(23)
    pts0 = np.round(rng.uniform(0, 100, (900, 3)))
    a = [Cloud.from_numpy(pts0, pad_to=2048, dtype=jnp.float32)]
    b = [Cloud.from_numpy(pts0 + 0.5, pad_to=2048, dtype=jnp.float32)]
    packed = pack_sorted_frames(a, b, point_to_plane=True,
                                d2_mode="reference")
    packed = dict(packed)
    packed["nrm_for_a"] = packed["nrm_for_b"] = None
    with pytest.raises(ValueError, match="positional normals"):
        sharded_pair_stats_pruned(mesh, packed, point_to_plane=True,
                                  d2_mode="reference")


def test_ring_nn_payload_rank3():
    """ADVICE r2 (low): ring_nn (public API) accepts payloads of any rank."""
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(24)
    na, nb, p = 600, 500, 1024
    a = _padded(rng.uniform(0, 100, (na, 3)), p)
    b = _padded(rng.uniform(0, 100, (nb, 3)), p)
    pay = jnp.asarray(rng.uniform(size=(p, 2, 3)))

    def fn(ap, bp, pl):
        d, i, (best,) = ring_nn(ap[0], bp[0], payloads=(pl[0],))
        return d[None], i[None], best[None]

    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "points"), P(None, "points"), P(None, "points")),
        out_specs=P(None, "points"),
    ))
    _, i, got = mapped(a.points[None], b.points[None], pay[None])
    i = np.asarray(i)[0]
    np.testing.assert_array_equal(
        np.asarray(got)[0][:na], np.asarray(pay)[i[:na]])
