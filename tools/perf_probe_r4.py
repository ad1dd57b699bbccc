"""Round-4 ad-hoc perf probe: chunked/stagger fused-kernel configs vs the
r3 headline, all interleaved in ONE process with same-process MXU/HBM
probes (the shared chip has fast/slow phases; only within-process
comparisons mean anything).  Slope-timed (see bench.py slope_time)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
from som_lvq_pak_tpu.ops.pallas_som import som_fused_train_step

N, DP, XDIM = 65536, 128, 256
ALPHA, RADIUS = jnp.float32(0.02), jnp.float32(3.0)

def slope_time(chain, short=30, long_=120, best_of=3):
    slopes, longs = [], []
    for _ in range(best_of):
        ts, tl = chain(short), chain(long_)
        slopes.append((tl - ts) / (long_ - short)); longs.append(tl / long_)
    pos = sorted(s for s in slopes if s > 0)
    return pos[len(pos)//2] if pos else min(longs)

def make_chain(B, kw):
    k = jax.random.PRNGKey(0)
    codes = jax.random.normal(k, (N, DP), jnp.float32)
    xb = jax.random.normal(jax.random.PRNGKey(1), (B, DP), jnp.float32)
    _, bmu0 = dist_argmin(xb, codes)
    @jax.jit
    def step(c, bm, x):
        c2, bm2, _ = som_fused_train_step(
            c, x, bm, x, XDIM, True, ALPHA, RADIUS, gaussian=True, **kw)
        return c2, bm2
    def chain(iters):
        c, bm = step(codes, bmu0, xb)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            c, bm = step(c, bm, xb)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0
    chain(1)
    return chain

def mxu_probe():
    k = jax.random.PRNGKey(7)
    a = jax.random.normal(k, (4096, 4096), dtype=jnp.bfloat16)
    b0 = jax.random.normal(k, (4096, 4096), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.bfloat16))
    def chain(iters):
        o = mm(a, b0); _ = float(np.asarray(o[0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters): o = mm(o, b0)
        _ = float(np.asarray(o[0, 0]))
        return time.perf_counter() - t0
    chain(1)
    return (2 * 4096**3) / slope_time(chain, short=10, long_=40)

CONFIGS = [
    ("r3_B2048_t256_dual", 2048, dict(tile_n=256, factored=True, d_real=64)),
    ("chk_B4096_bc1024", 4096, dict(tile_n=256, factored=True, d_real=64,
                                    batch_chunk=1024, wxa_bf16=True)),
    ("chk_B8192_bc1024_bf16", 8192, dict(
        tile_n=256, factored=True, d_real=64, batch_chunk=1024,
        wxa_bf16=True, batch_bf16=True)),
]

def main():
    print("compiling...", flush=True)
    chains = []
    for name, B, kw in CONFIGS:
        try:
            chains.append((name, B, make_chain(B, kw)))
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}: {str(e)[-160:]}", flush=True)
    mxu = mxu_probe()
    print(f"mxu_probe_tflops {mxu/1e12:.1f}", flush=True)
    # interleaved: 3 rounds, each measures every config once
    results = {name: [] for name, _, _ in chains}
    for rnd in range(3):
        for name, B, chain in chains:
            results[name].append(slope_time(chain, best_of=1))
        print(f"round {rnd} done", flush=True)
    mxu2 = mxu_probe()
    print(f"mxu_probe_tflops_end {mxu2/1e12:.1f}", flush=True)
    print(f"{'config':36s} {'us/step':>9s} {'evals/s':>10s} {'mxu_floor':>9s} {'roofline%':>9s}")
    for name, B, _ in chains:
        t = sorted(results[name])[1]  # median of 3
        evals = B * N / t
        flops = 2 * B * N * DP + 2 * B * N * 64
        floor = flops / mxu
        print(f"{name:36s} {t*1e6:9.1f} {evals:10.3e} {floor*1e6:9.1f} {100*floor/t:9.1f}")

if __name__ == "__main__":
    main()
