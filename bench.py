"""Headline benchmark: fused dist+argmin winner-search throughput per chip.

Workload: B=1024 samples x N=65536 codes x D=64 (the BASELINE.md pod-scale
SOM shape, single chip).  The metric is codebook-distance evaluations per
second per chip; vs_baseline compares against the reference C package's
measured 63 M evals/s (vsom hot loop, 1 CPU core — BASELINE.md).

Prints ONE JSON line.  Timing chains ITERS async kernel dispatches with a
data dependency between iterations (each call's winner distances perturb
the next batch), so XLA cannot elide work, and blocks once at the end —
dispatch overhead amortizes without paying lax.scan's (very slow through
the TPU tunnel) trace/compile cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin

B, N, D = 1024, 65536, 64
ITERS = 200
BASELINE_EVALS_PER_S = 63e6  # reference vsom, 1 CPU core (BASELINE.md)


def make_step(tile_b, tile_n):
    @jax.jit
    def step(x, m, m2):
        val, idx = dist_argmin(x, m, m2, tile_b=tile_b, tile_n=tile_n)
        # data dependency for the next iteration; numerically a no-op
        return x + 1e-30 * val[:, None], idx

    return step


def time_config(tile_b, tile_n, x, m, m2):
    step = make_step(tile_b, tile_n)
    xx, idx = step(x, m, m2)  # compile + warm
    idx.block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        xx, idx = step(xx, m, m2)
    idx.block_until_ready()
    dt = (time.time() - t0) / ITERS
    return B * N / dt


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, D), dtype=jnp.float32) * 10
    m = jax.random.normal(k2, (N, D), dtype=jnp.float32) * 10
    m2 = jnp.sum(m * m, axis=-1)

    best = 0.0
    for tile_b, tile_n in ((512, 4096), (1024, 4096)):
        best = max(best, time_config(tile_b, tile_n, x, m, m2))

    print(
        json.dumps(
            {
                "metric": "dist_argmin_evals_per_s_chip",
                "value": round(best),
                "unit": "codebook-distance evals/s/chip (B=1024,N=65536,D=64,f32)",
                "vs_baseline": round(best / BASELINE_EVALS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
