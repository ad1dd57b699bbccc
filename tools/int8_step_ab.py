"""A/B the int8 winner contraction inside the fused step on the real
chip (VERDICT r4 task 5): step time interleaved vs the f32 twin at the
B=4096 chunked headline shape, plus a training-quality gate (same
training run with and without int8_win; final qerror must agree within
1 %).

Context: the k128_vs_d64 bench ratio measured 0.979 — the winner
contraction's depth is FREE in the fused kernel, so the standalone
1.61x int8 winner win (tools/int8_probe.py) is expected to buy ~nothing
here.  This measures it rather than assuming it.

Usage: timeout 900 python tools/int8_step_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/somvq_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
from som_lvq_pak_tpu.ops.pallas_som import som_fused_train_step

N, DP, D, XDIM, B = 65536, 128, 64, 256, 4096


def make_chain(codes0, xb, xn, bmu0, **kw):
    @jax.jit
    def step(c, bm, x, xnext):
        c2, bm2, _ = som_fused_train_step(
            c, x, bm, xnext, XDIM, True, jnp.float32(0.02), jnp.float32(3.0),
            gaussian=True, tile_n=256, factored=True, batch_chunk=1024,
            wxa_bf16=True, **kw)
        return c2, bm2

    def chain(iters):
        c, bm = step(codes0, bmu0, xb, xn)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, bm = step(c, bm, xb, xn)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 4.0, size=(16, D)).astype(np.float32)

    def clustered(n, seed):
        r = np.random.default_rng(seed)
        return (centers[r.integers(0, 16, size=n)]
                + r.normal(0, 1.0, size=(n, D)).astype(np.float32))

    k = jax.random.PRNGKey(0)
    codes = jnp.zeros((N, DP), jnp.float32).at[:, :D].set(
        jnp.asarray(clustered(N, 1)))
    xb = jnp.zeros((B, DP), jnp.float32).at[:, :D].set(
        jnp.asarray(clustered(B, 2)))
    xn = jnp.zeros((B, DP), jnp.float32).at[:, :D].set(
        jnp.asarray(clustered(B, 3)))
    _, bmu0 = dist_argmin(xb, codes)

    chains = {
        "f32_dreal64": make_chain(codes, xb, xn, bmu0, d_real=D),
        "int8_win_dreal64": make_chain(codes, xb, xn, bmu0, d_real=D,
                                       int8_win=True),
        "int8_win_k128": make_chain(codes, xb, xn, bmu0, d_real=None,
                                    int8_win=True),
    }
    slopes = {n: [] for n in chains}
    for _ in range(3):
        for n, ch in chains.items():
            ts, tl = ch(50), ch(200)
            slopes[n].append((tl - ts) / 150)
    for n, ss in slopes.items():
        pos = sorted(s for s in ss if s > 0)
        dt = pos[len(pos) // 2] if pos else float("nan")
        print(f"{n}: {dt * 1e6:.1f} us/step", flush=True)

    # quality gate: 64 training steps, final qerror on 262k samples
    from som_lvq_pak_tpu.data.dataset import Dataset
    from som_lvq_pak_tpu.models.som import find_qerror

    batches = [jnp.zeros((B, DP), jnp.float32).at[:, :D].set(
        jnp.asarray(clustered(B, 100 + i))) for i in range(64)]
    evalX = jnp.asarray(clustered(262144, 999))
    jax.block_until_ready(evalX)

    def train(int8):
        @jax.jit
        def step(c, bm, x, xnext):
            return som_fused_train_step(
                c, x, bm, xnext, XDIM, True, jnp.float32(0.05),
                jnp.float32(24.0), gaussian=True, tile_n=256, factored=True,
                batch_chunk=1024, wxa_bf16=True, d_real=D,
                int8_win=int8)[:2]

        c = codes
        _, bm = dist_argmin(batches[0], c)
        for i in range(64):
            c, bm = step(c, bm, batches[i], batches[(i + 1) % 64])
        ds = Dataset(points=np.asarray(c[:, :D]), topol=3, neigh=2,
                     xdim=XDIM, ydim=N // XDIM)
        q = find_qerror(ds, Dataset(points=evalX), mode="fast") / 262144
        return q

    q32 = train(False)
    q8 = train(True)
    print(f"qerror f32 {q32:.4f}  int8_win {q8:.4f}  "
          f"rel delta {abs(q8 - q32) / q32 * 100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
