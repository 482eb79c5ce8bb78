"""Host simulation of the counted k-NN probe/extension merge sequence.

For each (tile, slot) in lb-ascending candidate order, replays the running
k-buffer and records, per firing chunk, the max-over-queries count of
entries that beat the current k-th (the merge's per-query contribution).
This decides whether a width-reduced merge tier (pre-extract top-T of the
chunk when no query has more than T qualifiers) can fire often enough to
beat its gate cost — the first tier attempt (MERGE_E=4 insertion) never
fired in the probe and was reverted.

Run: python tools/qmax_stats.py [n_points] [k] [p1] [cap]
CPU-only (numpy); ~1 min at 200k.
"""
from __future__ import annotations

import sys

import numpy as np

_HERE = __file__.rsplit("/", 2)[0]
sys.path.insert(0, _HERE)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.ops.grid import CHUNK, build_grid_host  # noqa: E402


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    p1 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    origin, _ = make_clouds(n_target)
    pts = origin[0]
    n = pts.shape[0]
    pad = ((n + 2047) // 2048) * 2048
    g = build_grid_host(pts, pad, dtype=jnp.float32)
    P = np.asarray(g.points, np.float64)
    lo = np.asarray(g.bbox_lo, np.float64)
    hi = np.asarray(g.bbox_hi, np.float64)
    nta = pad // CHUNK

    # tile-vs-chunk bbox lower bounds (valid rows only per tile)
    valid = (np.arange(pad) < n).reshape(nta, CHUNK)
    tiles = P.reshape(nta, CHUNK, 3)
    big = np.finfo(np.float64).max
    a_lo = np.where(valid[:, :, None], tiles, big).min(1)
    a_hi = np.where(valid[:, :, None], tiles, -big).max(1)
    lb = np.zeros((nta, nta))
    for ax in range(3):
        gap = np.maximum(
            0.0,
            np.maximum(a_lo[:, None, ax] - hi[None, :, ax],
                       lo[None, :, ax] - a_hi[:, None, ax]))
        lb += gap * gap
    order = np.argsort(lb, axis=1, kind="stable")[:, :cap]

    rng = np.random.default_rng(0)
    sample = rng.choice(nta, min(256, nta), replace=False)
    qmax_by_slot = {s: [] for s in range(cap)}
    fired_by_slot = np.zeros(cap)
    seen_by_slot = np.zeros(cap)
    for t in sample:
        q = tiles[t]  # (256, 3)
        kth = np.full(CHUNK, np.inf)
        buf = np.full((CHUNK, k), np.inf)
        for s in range(cap):
            c = order[t, s]
            d = ((q[:, None, :] - tiles[c][None, :, :]) ** 2).sum(-1)
            qcnt = (d < kth[:, None]).sum(1)
            mind = d.min(1)
            improves = (mind < kth).any()
            seen_by_slot[s] += 1
            if improves:
                fired_by_slot[s] += 1
                qmax_by_slot[s].append(int(qcnt.max()))
                both = np.concatenate([buf, d], axis=1)
                both.sort(axis=1)
                buf = both[:, :k]
                kth = buf[:, k - 1]

    print(f"nta={nta} sampled={len(sample)} k={k} p1={p1} cap={cap}")
    print("slot  fire%   qmax: p50  p90  max   (over firing chunks)")
    for s in range(min(cap, 16)):
        qs = qmax_by_slot[s]
        if not qs:
            print(f"{s:4d}  {100 * fired_by_slot[s] / max(seen_by_slot[s], 1):5.1f}    (never fires)")
            continue
        qs = np.array(qs)
        print(f"{s:4d}  {100 * fired_by_slot[s] / seen_by_slot[s]:5.1f}   "
              f"{np.percentile(qs, 50):5.0f} {np.percentile(qs, 90):4.0f} "
              f"{qs.max():4d}")
    allq = np.concatenate([np.array(v) for v in qmax_by_slot.values() if v])
    for T in (4, 8, 16, 32):
        frac = (allq <= T).mean()
        print(f"firing chunks with qmax <= {T:2d}: {100 * frac:5.1f}%")


if __name__ == "__main__":
    main()
