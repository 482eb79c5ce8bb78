"""Micro-bench of the adaptive fused-loop kernel: isolate per-piece costs.

Variants (fixed ncand=32 slots, 1024 tiles => 32k chunk-pairs):
  full    - the real kernel body
  nodot   - distance matrix replaced by a cheap broadcast (no MXU)
  noepi   - MXU dot only, epilogue replaced by one column write
  empty   - DMA loop only, constant output
"""
from __future__ import annotations

import functools
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

CHUNK = 256
_TT = 8
INT_MAX = jnp.iinfo(jnp.int32).max


def kernel(cand_ref, ncand_ref, tids_ref, *refs, n_slots, variant):
    qs = refs[:_TT]
    b_hbm = refs[_TT]
    bestd_ref, besti_ref = refs[_TT + 1], refs[_TT + 2]
    bbuf, bsem = refs[_TT + 3], refs[_TT + 4]
    i = pl.program_id(0)

    bestd_ref[:] = jnp.full_like(bestd_ref, jnp.inf)
    besti_ref[:] = jnp.full_like(besti_ref, INT_MAX)

    def dma(buf_slot, t, j):
        cj = cand_ref[i * _TT + t, j]
        return pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(cj * CHUNK, CHUNK)],
            bbuf.at[buf_slot, t], bsem.at[buf_slot, t],
        )

    for t in range(_TT):
        @pl.when(ncand_ref[i * _TT + t] > 0)
        def _warm(t=t):
            dma(0, t, 0).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)
        for t in range(_TT):
            row = i * _TT + t

            @pl.when(j + 1 < ncand_ref[row])
            def _pf(t=t, row=row, nxt=nxt, j=j):
                dma(nxt, t, j + 1).start()

        for t in range(_TT):
            row = i * _TT + t

            @pl.when(j < ncand_ref[row])
            def _work(t=t, row=row, slot=slot, j=j):
                dma(slot, t, j).wait()
                q = qs[t][:]
                b = bbuf[slot, t]
                if variant == "empty":
                    bestd_ref[pl.ds(t * CHUNK, CHUNK), :] = (
                        b[0, :].reshape(CHUNK, 1))
                    return
                if variant == "nodot":
                    d = jnp.broadcast_to(q[0:1, :].reshape(CHUNK, 1),
                                         (CHUNK, CHUNK)) + b[0, :]
                else:
                    d = jax.lax.dot_general(
                        q, b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                if variant == "noepi":
                    bestd_ref[pl.ds(t * CHUNK, CHUNK), :] = d[:, :1]
                    return
                dmin = jnp.min(d, axis=1, keepdims=True)
                at_min = d == dmin
                bor_lane = jax.lax.bitcast_convert_type(b[5:6, :], jnp.int32)
                bor = jnp.broadcast_to(bor_lane, d.shape)
                ii = jnp.min(jnp.where(at_min, bor, INT_MAX), axis=1,
                             keepdims=True)
                prev_d = bestd_ref[pl.ds(t * CHUNK, CHUNK), :]
                prev_i = besti_ref[pl.ds(t * CHUNK, CHUNK), :]
                better = (dmin < prev_d) | ((dmin == prev_d) & (ii < prev_i))
                bestd_ref[pl.ds(t * CHUNK, CHUNK), :] = jnp.where(
                    better, dmin, prev_d)
                besti_ref[pl.ds(t * CHUNK, CHUNK), :] = jnp.where(
                    better, ii, prev_i)

        return carry

    jax.lax.fori_loop(0, n_slots, body, 0)


@functools.partial(jax.jit, static_argnames=("variant", "n_slots"))
def run(qhat, bhat, cand, ncand, tids, variant, n_slots):
    rows = cand.shape[0]

    def q_spec(t):
        return pl.BlockSpec(
            (8, CHUNK), lambda i, c, n, td, t=t: (0, td[i * _TT + t]))

    io_spec = pl.BlockSpec((_TT * CHUNK, 1), lambda i, c, n, td: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rows // _TT,),
        in_specs=[q_spec(t) for t in range(_TT)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[io_spec, io_spec],
        scratch_shapes=[
            pltpu.VMEM((2, _TT, 8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _TT)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, n_slots=n_slots, variant=variant),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows * CHUNK, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows * CHUNK, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(cand, ncand, tids, *([qhat] * _TT), bhat)


def main():
    rows, ncb, n_slots = 1024, 2048, 32
    rng = np.random.default_rng(0)
    qhat = jnp.asarray(rng.integers(0, 1024, (8, rows * CHUNK)), jnp.float32)
    bhat = jnp.asarray(rng.integers(0, 1024, (8, ncb * CHUNK)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, ncb, (rows, n_slots)), jnp.int32)
    ncand = jnp.full((rows,), n_slots, jnp.int32)
    tids = jnp.arange(rows, dtype=jnp.int32)
    pairs = rows * n_slots

    for variant in ("empty", "nodot", "noepi", "full"):
        out = run(qhat, bhat, cand, ncand, tids, variant, n_slots)
        np.asarray(out[0][:1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(qhat, bhat, cand, ncand, tids, variant, n_slots)
            np.asarray(out[0][:1])
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{variant:8s} {med*1e3:8.2f} ms  "
              f"({med/pairs*1e9:7.1f} ns/chunk-pair)", flush=True)


if __name__ == "__main__":
    main()
