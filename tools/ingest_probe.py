"""Ingest-wall diagnosis for the 1M e2e workload (VERDICT r4 task 4).

The r4 driver run's e2e_256x256_1M train wall phased 7.6-20.9 s at a
near-constant ~0.25 s of device math.  This probe isolates, in one
process on the real chip:

  1. H2D transfer throughput through the tunnel at several piece sizes
     (is the wall transfer-bound, and do bigger pieces help?)
  2. the fused-step loop with PRE-STAGED device batches (pure dispatch +
     device wall — the floor any ingest pipeline can reach)
  3. the bench's actual streamed fit (host slicing + device_put + steps)
  4. the one-dispatch 1M qerror eval (r5 change)

Usage: timeout 900 python tools/ingest_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SOMVQ_COMPILE_CACHE",
                                     "/tmp/somvq_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    NTOT, D = 1_000_000, 64
    X = rng.normal(0, 1, size=(NTOT, D)).astype(np.float32)  # 256 MB

    # --- 1. H2D throughput at several piece sizes -----------------------
    for mb, n_pieces in ((1, 64), (4, 32), (16, 16), (64, 4), (256, 1)):
        rows = mb * (1 << 20) // (D * 4)
        pieces = [np.ascontiguousarray(X[i * rows:(i + 1) * rows])
                  for i in range(n_pieces)]
        # warm the transfer path once
        jax.block_until_ready(jax.device_put(pieces[0]))
        t0 = time.perf_counter()
        outs = [jax.device_put(p) for p in pieces]
        for o in outs:
            jax.block_until_ready(o)
        # force a real fetch so completion cannot be misreported
        _ = float(np.asarray(outs[-1][0, 0]))
        dt = time.perf_counter() - t0
        total_mb = mb * n_pieces
        print(f"h2d {mb:4d}MB x{n_pieces:3d}: {dt:6.2f}s "
              f"{total_mb / dt:7.1f} MB/s", flush=True)

    # --- 2. fused-step loop with pre-staged device batches --------------
    from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
    from som_lvq_pak_tpu.ops.pallas_som import som_fused_train_step

    N, DP, XDIM, BS = 65536, 128, 256, 4096
    k = jax.random.PRNGKey(0)
    codes = jnp.zeros((N, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k, (N, D)))
    nsteps = 64
    host_batches = [np.ascontiguousarray(X[i * BS:(i + 1) * BS])
                    for i in range(nsteps)]
    dev_batches = [
        jnp.zeros((BS, DP), jnp.float32).at[:, :D].set(jnp.asarray(b))
        for b in host_batches]
    for b in dev_batches:
        jax.block_until_ready(b)
    aw = jnp.full((BS,), jnp.float32(0.02))
    rad = jnp.float32(8.0)

    def run_steps(Mp, batches):
        _, bmu = dist_argmin(batches[0], Mp)
        for i in range(len(batches)):
            nxt = batches[(i + 1) % len(batches)]
            Mp, bmu, _ = som_fused_train_step(
                Mp, batches[i], bmu, nxt, XDIM, True, aw, rad,
                gaussian=True, tile_n=256, factored=True, d_real=D,
                batch_chunk=1024, wxa_bf16=True)
        return Mp

    Mp = run_steps(codes, dev_batches[:2])  # compile
    _ = float(np.asarray(Mp[0, 0]))
    t0 = time.perf_counter()
    Mp = run_steps(codes, dev_batches)
    _ = float(np.asarray(Mp[0, 0]))
    dt = time.perf_counter() - t0
    print(f"prestaged {nsteps} fused steps: {dt:.2f}s "
          f"({dt / nsteps * 1e3:.1f} ms/step)", flush=True)

    # 2b. same loop but device_put per batch inline (the trainer's
    # streamed pattern: does the transfer overlap the chained steps?)
    def pad_put(b):
        arr = np.zeros((BS, DP), np.float32)
        arr[:, :D] = b
        return jax.device_put(arr)

    t0 = time.perf_counter()
    Mp2 = codes
    bmu = None
    prev = pad_put(host_batches[0])
    _, bmu = dist_argmin(prev, Mp2)
    for i in range(nsteps):
        nxt = pad_put(host_batches[(i + 1) % nsteps])
        Mp2, bmu, _ = som_fused_train_step(
            Mp2, prev, bmu, nxt, XDIM, True, aw, rad,
            gaussian=True, tile_n=256, factored=True, d_real=D,
            batch_chunk=1024, wxa_bf16=True)
        prev = nxt
    _ = float(np.asarray(Mp2[0, 0]))
    dt = time.perf_counter() - t0
    print(f"device_put-per-batch {nsteps} fused steps: {dt:.2f}s "
          f"({dt / nsteps * 1e3:.1f} ms/step)", flush=True)

    # 2c. pad on device instead of host (ship 1 MB not 2 MB)
    t0 = time.perf_counter()
    Mp3 = codes
    pad_dev = jax.jit(lambda b: jnp.zeros((BS, DP), jnp.float32)
                      .at[:, :D].set(b))
    prev = pad_dev(jax.device_put(host_batches[0]))
    _, bmu = dist_argmin(prev, Mp3)
    for i in range(nsteps):
        nxt = pad_dev(jax.device_put(host_batches[(i + 1) % nsteps]))
        Mp3, bmu, _ = som_fused_train_step(
            Mp3, prev, bmu, nxt, XDIM, True, aw, rad,
            gaussian=True, tile_n=256, factored=True, d_real=D,
            batch_chunk=1024, wxa_bf16=True)
        prev = nxt
    _ = float(np.asarray(Mp3[0, 0]))
    dt = time.perf_counter() - t0
    print(f"devpad device_put-per-batch {nsteps} steps: {dt:.2f}s "
          f"({dt / nsteps * 1e3:.1f} ms/step)", flush=True)

    # --- 4. one-dispatch 1M eval (r5) -----------------------------------
    from som_lvq_pak_tpu.data.dataset import Dataset
    from som_lvq_pak_tpu.models import som as som_mod

    codes_ds = Dataset(points=np.asarray(Mp[:, :D]), topol=3, neigh=2,
                       xdim=XDIM, ydim=N // XDIM)
    Xdev = jnp.asarray(X)
    jax.block_until_ready(Xdev)
    data_dev = Dataset(points=Xdev)
    q = som_mod.find_qerror(codes_ds, data_dev, mode="fast")  # compile+run
    t0 = time.perf_counter()
    q = som_mod.find_qerror(codes_ds, data_dev, mode="fast")
    dt = time.perf_counter() - t0
    print(f"one-dispatch 1M eval: {dt:.2f}s (q/sample {q / NTOT:.4f})",
          flush=True)


if __name__ == "__main__":
    main()
