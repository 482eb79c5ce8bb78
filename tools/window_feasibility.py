"""Measure whether qualifying chunk sets fit contiguous Morton windows.

For each query tile: the certificate's qualifying set Q_t = {chunks c with
lb(t,c) <= ub_t} must be refined for exactness. A windowed kernel fetches one
contiguous chunk range per tile; this script measures, on the bench clouds,
what fraction of tiles have Q_t inside a +-K window around the searchsorted
code position, for several K — i.e. the escalation rate the windowed design
would pay. Runs entirely on the host (cKDTree for exact NN distances).
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
from scipy.spatial import cKDTree  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import CHUNK  # noqa: E402


def lb_matrix(a_lo, a_hi, b_lo, b_hi):
    out = 0.0
    for k in range(3):
        gap = np.maximum(
            0.0,
            np.maximum(a_lo[:, None, k] - b_hi[None, :, k],
                       b_lo[None, :, k] - a_hi[:, None, k]),
        )
        out = out + gap * gap
    return out


def analyse(tag, ga, gb, n_a, exclude_self=False):
    apts = np.asarray(ga.points, np.float64)
    bpts = np.asarray(gb.points, np.float64)
    nta = apts.shape[0] // CHUNK
    ncb = gb.n_chunks
    valid = np.arange(apts.shape[0]) < n_a
    bvalid_n = int(np.sum(np.asarray(gb.codes) != 0x3FFFFFFF))

    tree = cKDTree(bpts[:bvalid_n])
    k = 2 if exclude_self else 1
    d, _ = tree.query(apts[valid], k=k, workers=-1)
    dq = (d[:, -1] if exclude_self else d.ravel()) ** 2

    dfull = np.zeros(apts.shape[0])
    dfull[valid] = dq
    ub = np.where(
        valid.reshape(nta, CHUNK).any(1),
        np.max(np.where(valid, dfull, -np.inf).reshape(nta, CHUNK), axis=1),
        -np.inf,
    )
    eps = np.float32(np.finfo(np.float32).eps)
    ub_eff = ub * (1 + 8 * eps) + 8 * eps

    a_tiles = apts.reshape(nta, CHUNK, 3)
    vt = valid.reshape(nta, CHUNK)
    big = 1e30
    a_lo = np.min(np.where(vt[:, :, None], a_tiles, big), axis=1)
    a_hi = np.max(np.where(vt[:, :, None], a_tiles, -big), axis=1)
    lb = lb_matrix(a_lo, a_hi, np.asarray(gb.bbox_lo, np.float64),
                   np.asarray(gb.bbox_hi, np.float64))

    qual = lb <= ub_eff[:, None]  # (nta, ncb)
    counts = qual.sum(1)
    live = vt.any(1)

    pos = np.searchsorted(np.asarray(gb.chunk_codes),
                          np.asarray(ga.chunk_codes))
    pos = np.clip(pos, 0, ncb - 1)

    print(f"[{tag}] nta={nta} ncb={ncb} live={live.sum()} "
          f"count mean={counts[live].mean():.1f} "
          f"p99={np.quantile(counts[live], 0.99):.0f} "
          f"max={counts[live].max()}")
    cols = np.arange(ncb)
    for K in (8, 16, 32, 64, 128):
        inwin = np.abs(cols[None, :] - pos[:, None]) <= K
        escal = (qual & ~inwin).any(1) & live
        print(f"  K={K:4d} (window {2*K+1} chunks): escalate "
              f"{escal.sum()}/{live.sum()} = {100*escal.mean():.2f}%")

    # Superchunk granularity: group G consecutive chunks; a supergroup
    # qualifies when ANY member chunk does (tight lb = min over members).
    for G in (2, 4, 8):
        ns = (ncb + G - 1) // G
        pad = ns * G - ncb
        q = qual
        if pad:
            q = np.concatenate(
                [qual, np.zeros((qual.shape[0], pad), bool)], axis=1)
        qs = q.reshape(-1, ns, G).any(2)
        cs = qs.sum(1)[live]
        print(f"  G={G} ({G*CHUNK}-pt supers, ns={ns}): count "
              f"mean={cs.mean():.2f} p90={np.quantile(cs, 0.90):.0f} "
              f"p99={np.quantile(cs, 0.99):.0f} max={cs.max()}; "
              + " ".join(
                  f"cap{c}->esc {100*np.mean(cs > c):.1f}%"
                  for c in (2, 3, 4, 6, 8)))


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], dtype=jnp.float32)
    ga, gb = a.get_grid(), b.get_grid()
    analyse("a->b", ga, gb, a.n)
    analyse("b->a", gb, ga, b.n)
    analyse("self", ga, ga, a.n, exclude_self=True)


if __name__ == "__main__":
    main()
