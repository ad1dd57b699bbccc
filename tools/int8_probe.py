"""int8 MXU probe (VERDICT r4 task 5): is an int8 winner contraction
worth a kernel?  v5e lists 394 int8 TOPS vs 197 bf16 TFLOP/s; this
measures (a) the achievable XLA int8 matmul rate vs the bf16 probe in
one window, and (b) whether a Pallas kernel with an int8 dot compiles
and runs on this chip at the winner-contraction shape.

Usage: timeout 600 python tools/int8_probe.py
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

import functools

import jax.numpy as jnp
import numpy as np


def slope(chain, short=10, long_=40, reps=3):
    vals = []
    for _ in range(reps):
        ts, tl = chain(short), chain(long_)
        vals.append((tl - ts) / (long_ - short))
    pos = sorted(v for v in vals if v > 0)
    return pos[len(pos) // 2] if pos else min(vals)


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    # (a) XLA 4096^3 matmul: bf16 vs int8, interleaved
    a16 = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    b16 = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    a8 = jax.random.randint(k, (4096, 4096), -127, 127, jnp.int8)
    b8 = jax.random.randint(k, (4096, 4096), -127, 127, jnp.int8)
    mm16 = jax.jit(lambda x, y: jnp.dot(x, y,
                                        preferred_element_type=jnp.bfloat16))
    mm8 = jax.jit(lambda x, y: jnp.dot(x, y,
                                       preferred_element_type=jnp.int32))

    def chain16(iters):
        o = mm16(a16, b16)
        _ = float(np.asarray(o[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            o = mm16(o, b16)
        _ = float(np.asarray(o[0, 0]))
        return time.perf_counter() - t0

    def chain8(iters):
        o = mm8(a8, b8)
        _ = int(np.asarray(o[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            o = mm8((o & 127).astype(jnp.int8), b8)
        _ = int(np.asarray(o[0, 0]))
        return time.perf_counter() - t0

    chain16(1)
    chain8(1)
    flops = 2 * 4096**3
    # interleave
    t16s, t8s = [], []
    for _ in range(3):
        s16, l16 = chain16(10), chain16(40)
        s8, l8 = chain8(10), chain8(40)
        t16s.append((l16 - s16) / 30)
        t8s.append((l8 - s8) / 30)
    d16 = sorted(t16s)[1]
    d8 = sorted(t8s)[1]
    print(f"bf16 4096^3: {d16*1e6:.0f} us = {flops/d16/1e12:.1f} TF/s",
          flush=True)
    print(f"int8 4096^3: {d8*1e6:.0f} us = {flops/d8/1e12:.1f} TOP/s "
          f"(ratio {d16/d8:.2f}x)", flush=True)

    # (b) Pallas winner-contraction shape with an int8 dot:
    # (256 codes x 64) @ (64 x 4096 batch) int8 -> int32, argmax epilogue
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TN, D8, B = 256, 64, 4096

    def kern(m_ref, x_ref, out_ref):
        i = pl.program_id(0)
        mx = jax.lax.dot_general(
            m_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        lm = jnp.max(mx, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            out_ref[:] = lm

        @pl.when(i > 0)
        def _():
            out_ref[:] = jnp.maximum(out_ref[:], lm)

    N = 65536

    @jax.jit
    def winner8(m8, x8):
        return pl.pallas_call(
            kern,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((TN, D8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D8, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * N * D8 * B, bytes_accessed=N * D8 + D8 * B,
                transcendentals=0),
        )(m8, x8)

    m8 = jax.random.randint(k, (N, D8), -127, 127, jnp.int8)
    x8 = jax.random.randint(k, (D8, B), -127, 127, jnp.int8)
    try:
        o = winner8(m8, x8)
        _ = int(np.asarray(o[0, 0]))
        print("pallas int8 winner contraction: COMPILES on this chip",
              flush=True)

        def chainw(iters):
            o = winner8(m8, x8)
            _ = int(np.asarray(o[0, 0]))
            t0 = time.perf_counter()
            for _i in range(iters):
                # dependency via x8 copy trick: reuse o's first row
                o = winner8(m8, x8)
            _ = int(np.asarray(o[0, 0]))
            return time.perf_counter() - t0

        dw = slope(chainw, 10, 40)
        print(f"pallas int8 winner: {dw*1e6:.0f} us "
              f"({2*N*D8*B/dw/1e12:.1f} TOP/s effective)", flush=True)

        # f32 comparison at the same shape through the same structure
        def kern32(m_ref, x_ref, out_ref):
            i = pl.program_id(0)
            mx = jax.lax.dot_general(
                m_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            lm = jnp.max(mx, axis=0, keepdims=True)

            @pl.when(i == 0)
            def _():
                out_ref[:] = lm

            @pl.when(i > 0)
            def _():
                out_ref[:] = jnp.maximum(out_ref[:], lm)

        @jax.jit
        def winner32(m, x):
            return pl.pallas_call(
                kern32,
                grid=(N // TN,),
                in_specs=[
                    pl.BlockSpec((TN, D8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((D8, B), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, B), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * N * D8 * B, bytes_accessed=4 * (N * D8 + D8 * B),
                    transcendentals=0),
            )(m, x)

        m32 = m8.astype(jnp.float32)
        x32 = x8.astype(jnp.float32)
        o = winner32(m32, x32)
        _ = float(np.asarray(o[0, 0]))

        def chainw32(iters):
            o = winner32(m32, x32)
            _ = float(np.asarray(o[0, 0]))
            t0 = time.perf_counter()
            for _i in range(iters):
                o = winner32(m32, x32)
            _ = float(np.asarray(o[0, 0]))
            return time.perf_counter() - t0

        dw32 = slope(chainw32, 10, 40)
        print(f"pallas f32 winner (same shape): {dw32*1e6:.0f} us "
              f"-> int8 speedup {dw32/dw:.2f}x", flush=True)
    except Exception as e:
        print(f"pallas int8 winner contraction FAILED: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
