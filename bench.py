"""Headline benchmark: fused dist+argmin winner-search throughput per chip.

Workload: B=1024 samples x N=65536 codes x D=64 (the BASELINE.md pod-scale
SOM shape, single chip).  The metric is codebook-distance evaluations per
second per chip; vs_baseline compares against the reference C package's
measured 63 M evals/s (vsom hot loop, 1 CPU core — BASELINE.md).

Prints ONE JSON line.  Timing runs the kernel in an on-device scan loop
with a data dependency between iterations (each call's winner distances
perturb the next batch), so queue/tunnel latency is amortized and XLA
cannot elide work.
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
ITERS = 400
BASELINE_EVALS_PER_S = 63e6  # reference vsom, 1 CPU core (BASELINE.md)


def make_loop(tile_b, tile_n, iters):
    @jax.jit
    def loop(x, m, m2):
        def body(carry, _):
            xx, acc = carry
            val, idx = dist_argmin(xx, m, m2, tile_b=tile_b, tile_n=tile_n)
            xx = xx + 1e-30 * val[:, None]
            return (xx, acc + idx.sum()), None
        (_, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None, length=iters)
        return acc

    return loop


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, D), dtype=jnp.float32) * 10
    m = jax.random.normal(k2, (N, D), dtype=jnp.float32) * 10
    m2 = jnp.sum(m * m, axis=-1)

    best = 0.0
    for tile_b, tile_n in ((512, 1024), (1024, 2048)):
        loop = make_loop(tile_b, tile_n, ITERS)
        int(loop(x, m, m2))  # compile + warm
        t0 = time.time()
        int(loop(x + 1.0, m, m2))  # force full execution + result fetch
        dt = (time.time() - t0) / ITERS
        evals = B * N / dt
        best = max(best, evals)

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
