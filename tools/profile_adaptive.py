"""Validate the adaptive-refinement redesign on the bench workload.

Questions:
 1. ub from refining only the top-A lb chunks (A in 1,2,4,8): how do the
    qualifying counts look, and what total work (sum min(count, cap_max))
    would the skip-enabled prefix refinement do?
 2. For tail tiles (count > cap_max), how much do 32-query subtile bounds
    shrink the counts?
 3. Is the HIGHEST-precision MXU dot bit-exact vs difference-form on the
    integer workload?
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_clouds  # noqa: E402
from open_pcc_metric_tpu.cloud import Cloud  # noqa: E402
from open_pcc_metric_tpu.ops.grid import bbox_lower_bounds, CHUNK  # noqa: E402
from open_pcc_metric_tpu.ops.refine_pallas import refine_nn_pallas_t  # noqa: E402

CAP_MAX = 64
SUB = 32  # subtile height


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    origin, reconst = make_clouds(n_target)
    a = Cloud.from_numpy(origin[0], colors=origin[1], normals=origin[2],
                         dtype=jnp.float32)
    b = Cloud.from_numpy(reconst[0], colors=reconst[1], normals=reconst[2],
                         dtype=jnp.float32)

    # --- 3. MXU exactness spot check (host-side emulation of the kernel) ---
    ga, gb = a.get_grid(), b.get_grid()
    q = ga.points[:256]  # (256, 3) integer-valued f32
    c = gb.points[:256]
    qt = jnp.pad(q, ((0, 0), (0, 5))).T  # (8, 256)
    bt = jnp.pad(c, ((0, 0), (0, 5)))  # (256, 8)

    @jax.jit
    def mxu_d(bt, qt):
        s = jax.lax.dot_general(
            bt, qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        bsq = jnp.sum(bt * bt, axis=1, keepdims=True)
        qsq = jnp.sum(qt * qt, axis=0, keepdims=True)
        return bsq + qsq - 2.0 * s

    @jax.jit
    def diff_d(bt, qt):
        d = None
        for k in range(3):
            diff = bt[:, k].reshape(-1, 1) - qt[k, :].reshape(1, -1)
            d = diff * diff if d is None else d + diff * diff
        return d

    dm = np.asarray(mxu_d(bt, qt))
    dd = np.asarray(diff_d(bt, qt))
    print(f"MXU vs diff-form: max |delta| = {np.abs(dm - dd).max()}  "
          f"(bit-exact: {np.array_equal(dm, dd)})")

    # --- 1 + 2: adaptive counts ---
    for qc, sc, na, tag in ((a, b, a.n, "a->b"), (b, a, b.n, "b->a"),
                            (a, a, a.n, "self")):
        ga, gb = qc.get_grid(), sc.get_grid()
        self_mode = qc is sc
        nta = ga.points.shape[0] // CHUNK
        ncb = gb.n_chunks
        n_a = jnp.asarray(na)
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

        a_tiles = ga.points.reshape(nta, CHUNK, 3)
        valid_t = (jnp.arange(nta * CHUNK) < n_a).reshape(nta, CHUNK)
        a_lo = jnp.min(jnp.where(valid_t[:, :, None], a_tiles, big), axis=1)
        a_hi = jnp.max(jnp.where(valid_t[:, :, None], a_tiles, -big), axis=1)
        lb = bbox_lower_bounds(a_lo, a_hi, gb.bbox_lo, gb.bbox_hi)
        lb_np = np.asarray(lb)

        qt8 = jnp.pad(ga.points, ((0, 0), (0, 5))).T
        bt8 = qt8 if self_mode else jnp.pad(gb.points, ((0, 0), (0, 5))).T
        borig = gb.perm[None, :]
        eps = np.finfo(np.float32).eps
        print(f"--- {tag}: nta={nta} ncb={ncb}")
        for A in (1, 2, 4, 8):
            cand = jax.lax.top_k(-lb, A)[1].astype(jnp.int32)
            d, _ = refine_nn_pallas_t(qt8, bt8.T, borig, cand,
                                      exclude_self=self_mode)
            d = d.reshape(nta, CHUNK)
            ub = jnp.max(jnp.where(valid_t, d, -jnp.inf), axis=1)
            ub_eff = ub * (1 + 8 * eps) + 8 * eps
            counts = np.asarray(
                jnp.sum(lb <= ub_eff[:, None], axis=1).astype(jnp.int32)
            )
            work = np.minimum(counts, CAP_MAX).sum()
            tail = int((counts > CAP_MAX).sum())
            print(f"A={A}: count p50={np.median(counts):6.1f} "
                  f"p90={np.percentile(counts, 90):7.1f} "
                  f"max={counts.max():6d} work@cap{CAP_MAX}={work:8d} "
                  f"tail(>cap)={tail:5d}")
            if A == 4:
                counts4, ub4 = counts, np.asarray(ub_eff)
                d4 = np.asarray(d)

        # subtile counts for tail tiles (ub from the A=4 refinement)
        tail_ids = np.nonzero(counts4 > CAP_MAX)[0]
        if tail_ids.size == 0:
            print("no tail tiles")
            continue
        pts = np.asarray(ga.points).reshape(nta, CHUNK, 3)
        vt = np.asarray(valid_t)
        blo = np.asarray(gb.bbox_lo)
        bhi = np.asarray(gb.bbox_hi)
        tot2 = 0
        sub_counts = []
        for t in tail_ids:
            p = pts[t].reshape(CHUNK // SUB, SUB, 3)
            v = vt[t].reshape(CHUNK // SUB, SUB)
            dref = d4[t].reshape(CHUNK // SUB, SUB)
            for s in range(CHUNK // SUB):
                if not v[s].any():
                    continue
                slo = np.where(v[s, :, None], p[s], big).min(axis=0)
                shi = np.where(v[s, :, None], p[s], -big).max(axis=0)
                ub_s = np.where(v[s], dref[s], -np.inf).max()
                ub_s = ub_s * (1 + 8 * eps) + 8 * eps
                dlo = np.maximum(np.maximum(blo - shi, slo - bhi), 0.0)
                lb_s = (dlo * dlo).sum(axis=1)
                c2 = int((lb_s <= ub_s).sum())
                sub_counts.append(c2)
                tot2 += c2
        sc_arr = np.array(sub_counts)
        print(f"tail tiles={tail_ids.size}: tile-level work="
              f"{counts4[tail_ids].sum()}  subtile(32q) work={tot2} "
              f"(sub p50={np.median(sc_arr):.0f} p90="
              f"{np.percentile(sc_arr, 90):.0f} max={sc_arr.max()})")


if __name__ == "__main__":
    main()
