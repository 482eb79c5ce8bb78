"""Measure host->device transfer characteristics through the axon tunnel.

The sweep pipeline (batch.run_sweep) is fetch-bound: the per-pair stage
split shows ~0.2 s of upload wait for one ~200k-point cloud (points +
colors + normals, padded). This tool answers which lever cuts it:

  * bandwidth vs latency: device_put wall across sizes 1..32 MB;
  * 3 separate arrays (points/colors/normals, as Cloud.from_numpy does)
    vs ONE packed (N, 9) array — if each transfer pays a fixed tunnel
    round-trip, packing wins ~3x;
  * async overlap: issue all three, then sync once — does the tunnel
    pipeline them?
  * dtype thinning: uint8 colors (PLY stores uchar anyway).

Run: python tools/profile_upload.py  (real TPU; ~1 min)
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(*arrs):
    for a in arrs:
        np.asarray(a[:1])


def timeit(fn, repeats=5):
    # warm-up (allocator paths, any lazy compile)
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")

    # --- bandwidth curve ----------------------------------------------------
    print("\n-- single-array device_put, f32 --")
    for mb in (1, 2, 4, 8, 16, 32):
        n = mb * 1024 * 1024 // 4
        host = np.random.rand(n).astype(np.float32)

        def put():
            sync(jax.device_put(host, dev))

        t = timeit(put)
        print(f"{mb:3d} MB: {t*1e3:7.1f} ms  ({mb/t:6.1f} MB/s)")

    # --- 3 arrays vs packed -------------------------------------------------
    pad = 262144
    pts = np.random.rand(pad, 3).astype(np.float32)
    col = np.random.rand(pad, 3).astype(np.float32)
    nrm = np.random.rand(pad, 3).astype(np.float32)
    packed = np.concatenate([pts, col, nrm], axis=1)  # (pad, 9)
    col_u8 = (col * 255).astype(np.uint8)

    print("\n-- cloud-shaped uploads (262144 rows) --")

    def three_sync_each():
        a = jax.device_put(pts, dev); sync(a)
        b = jax.device_put(col, dev); sync(b)
        c = jax.device_put(nrm, dev); sync(c)

    def three_async_then_sync():
        a = jax.device_put(pts, dev)
        b = jax.device_put(col, dev)
        c = jax.device_put(nrm, dev)
        sync(a, b, c)

    def one_packed():
        p = jax.device_put(packed, dev)
        sync(p)

    def thin_colors():
        a = jax.device_put(pts, dev)
        b = jax.device_put(col_u8, dev)
        c = jax.device_put(nrm, dev)
        sync(a, b, c)

    for name, fn in (
        ("3 x (N,3) f32, sync each  (9 MB)", three_sync_each),
        ("3 x (N,3) f32, async+sync (9 MB)", three_async_then_sync),
        ("1 x (N,9) f32 packed      (9 MB)", one_packed),
        ("pts/nrm f32 + colors u8 (6.75 MB)", thin_colors),
    ):
        t = timeit(fn)
        print(f"{name}: {t*1e3:7.1f} ms")

    # --- device-side unpack cost (slice the packed array) -------------------
    @jax.jit
    def unpack(p):
        return p[:, 0:3], p[:, 3:6], p[:, 6:9]

    pdev = jax.device_put(packed, dev)
    sync(pdev)
    unpack(pdev)  # compile

    def unpack_run():
        a, b, c = unpack(pdev)
        sync(a, b, c)

    print(f"\ndevice-side unpack (N,9)->3x(N,3): "
          f"{timeit(unpack_run)*1e3:7.1f} ms")

    # --- small-transfer latency floor ---------------------------------------
    tiny = np.zeros((8,), np.float32)

    def put_tiny():
        sync(jax.device_put(tiny, dev))

    print(f"tiny (32 B) device_put:            {timeit(put_tiny)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
