"""Stage split of the sharded ring vs the fused single-chip path (VERDICT r4 #4).

Measures, on the real chip at the smoke's exact inputs:
  1. fused pair_stats (backend=pruned)      -- the comparator
  2. sharded pruned ring, full smoke call   -- what bench.py reports
  3. sharded, jitted fn called directly     -- minus wrapper/packing overhead
  4. knob A/Bs: cap, refine_impl            -- attribute residual

Run: python tools/profile_sharded_split.py [n_target]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def med_time(fn, sync, runs=5):
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import jax
    import jax.numpy as jnp
    from open_pcc_metric_tpu.cloud import Cloud, round_up
    from open_pcc_metric_tpu.ops.fused import pair_stats
    from open_pcc_metric_tpu.parallel import sharded as sh
    from open_pcc_metric_tpu.utils import enable_compile_cache
    from bench import make_clouds

    enable_compile_cache()
    origin, reconst = make_clouds(n_target)
    pad = round_up(max(origin[0].shape[0], reconst[0].shape[0]), 256)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         pad_to=pad, dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         pad_to=pad, dtype=jnp.float32)
    n_total = int(a.n) + int(b.n)
    kwargs = dict(color_scheme="ycc", point_to_plane=True,
                  d2_mode="pc_error")
    mesh = sh.make_mesh(1, dp=1)
    packed = sh.pack_sorted_frames([a], [b], **kwargs)

    def sync_stats(stats):
        np.asarray(stats["d1_sse_l"]).reshape(-1)[:1]

    # --- 1. fused comparator (same inputs, single chip) ------------------
    def run_fused():
        return pair_stats(
            a.points, b.points, jnp.asarray(a.n), jnp.asarray(b.n),
            a_col=a.colors, b_col=b.colors, a_nrm=a.normals,
            b_nrm=b.normals, backend="pruned", **kwargs)

    t_fused = med_time(run_fused, sync_stats)

    # --- 2. sharded full smoke call (ladder + rung memo wrapper) ---------
    def run_sharded():
        return sh.sharded_pair_stats_pruned_auto(mesh, packed, **kwargs)

    t_sharded = med_time(run_sharded, sync_stats)

    # The OLD per-call ladder re-climb, for the wrapper-overhead split.
    def run_reclimb(cap=16, refine_impl="auto"):
        c = cap
        while True:
            stats = sh.sharded_pair_stats_pruned(
                mesh, packed, cap=c, refine_impl=refine_impl, **kwargs)
            if not bool(np.asarray(stats["nn_overflow"]).any()) \
                    or c >= pad // 256:
                return stats
            c *= 4

    t_reclimb = med_time(run_reclimb, sync_stats)

    # Which cap does the ladder settle at? (extra device roundtrip per rung)
    c, rungs = 16, 0
    while True:
        stats = sh.sharded_pair_stats_pruned(mesh, packed, cap=c, **kwargs)
        if not bool(np.asarray(stats["nn_overflow"]).any()) \
                or c >= pad // 256:
            break
        c *= 4
        rungs += 1
    settle_cap = c

    # --- 3. jitted fn direct (no wrapper, no overflow readback) ----------
    keys = ("a_s", "b_s", "a_perm", "b_perm", "a_lo", "a_hi", "b_lo",
            "b_hi", "n_a", "n_b", "a_col_s", "b_col_s", "a_nrm_s",
            "b_nrm_s", "nrm_for_a", "nrm_for_b")
    present = tuple(k for k in keys if packed.get(k) is not None)
    args = [packed[k] for k in present]

    def direct(cap, refine_impl="auto"):
        fn = sh._pruned_mapped(mesh, present, kwargs["color_scheme"],
                               kwargs["point_to_plane"], kwargs["d2_mode"],
                               cap, refine_impl)
        return lambda: fn(*args)

    t_direct = med_time(direct(settle_cap), sync_stats)
    t_direct_c16 = med_time(direct(16), sync_stats) if settle_cap != 16 \
        else t_direct

    # --- 4. knob A/Bs ------------------------------------------------------
    t_xla = med_time(direct(settle_cap, "xla"), sync_stats)
    t_pallas = med_time(direct(settle_cap, "pallas"), sync_stats)

    out = {
        "n_target": n_target, "n_total": n_total, "pad": pad,
        "settle_cap": settle_cap, "escalation_rungs": rungs,
        "fused_ms": round(t_fused * 1e3, 1),
        "fused_mpts": round(n_total / t_fused / 1e6, 3),
        "sharded_smoke_ms": round(t_sharded * 1e3, 1),
        "sharded_smoke_mpts": round(n_total / t_sharded / 1e6, 3),
        "sharded_reclimb_ms": round(t_reclimb * 1e3, 1),
        "sharded_direct_ms": round(t_direct * 1e3, 1),
        "sharded_direct_mpts": round(n_total / t_direct / 1e6, 3),
        "sharded_direct_cap16_ms": round(t_direct_c16 * 1e3, 1),
        "sharded_refine_xla_ms": round(t_xla * 1e3, 1),
        "sharded_refine_pallas_ms": round(t_pallas * 1e3, 1),
        "wrapper_overhead_ms": round((t_sharded - t_direct) * 1e3, 1),
        "frac_of_fused": round(t_fused / t_direct, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
