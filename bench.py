"""Headline benchmark: full fused SOM training-step throughput per chip.

Workload: one complete training step — winner search (fused
dist+argmin), codebook-norm recompute, and the fused neighborhood
update — at B=1024 samples x N=65536 codes x D=64 (the BASELINE.md
pod-scale SOM shape, single chip), codebook chained step-to-step like
real training.  The metric is codebook-distance evaluations per second
per chip (B*N per step, the winner-search convention); vs_baseline
compares against the reference C package's measured 63 M evals/s (vsom
hot loop incl. neighborhood adapt, 1 CPU core — BASELINE.md).

Prints ONE JSON line.  Timing chains ITERS dispatches with a real data
dependency (each step's output codebook feeds the next step), so XLA
cannot elide work, and blocks once at the end — dispatch overhead
amortizes without paying lax.scan's (very slow through the TPU tunnel)
trace/compile cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
from som_lvq_pak_tpu.ops.pallas_som import som_neighborhood_update_idx

B, N, D = 1024, 65536, 64
XDIM = 256  # N = 256 x 256 hexa map
ITERS = 200
BASELINE_EVALS_PER_S = 63e6  # reference vsom, 1 CPU core (BASELINE.md)


def make_step(tile_b, tile_n):
    @jax.jit
    def step(codes, xb):
        m2 = jnp.sum(codes * codes, axis=-1)
        _, bmu = dist_argmin(xb, codes, m2, tile_b=tile_b, tile_n=tile_n)
        return som_neighborhood_update_idx(
            codes, xb, bmu, XDIM, True,
            jnp.float32(0.02), jnp.float32(3.0), gaussian=True,
        )

    return step


def time_config(tile_b, tile_n, codes, xb):
    step = make_step(tile_b, tile_n)
    c = step(codes, xb)  # compile + warm
    c.block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        c = step(c, xb)
    c.block_until_ready()
    dt = (time.time() - t0) / ITERS
    return B * N / dt


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    codes = jax.random.normal(k1, (N, D), dtype=jnp.float32)
    xb = jax.random.normal(k2, (B, D), dtype=jnp.float32) * 3

    best = 0.0
    for tile_b, tile_n in ((512, 4096), (1024, 4096)):
        best = max(best, time_config(tile_b, tile_n, codes, xb))

    print(
        json.dumps(
            {
                "metric": "som_train_step_evals_per_s_chip",
                "value": round(best),
                "unit": "codebook-distance evals/s/chip, full fused train step (B=1024,N=65536,D=64,f32)",
                "vs_baseline": round(best / BASELINE_EVALS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
