"""Fused SOM neighborhood-update Pallas kernel.

Completes the two-kernel TPU SOM step: ops.pallas_distance finds the
BMUs; this kernel applies the neighborhood update

    codes += W^T X - (W^T 1) * codes,   W[b, n] = alpha * h(||g_bmu(b) - g_n||)

without ever materializing W (B, noc) in HBM: each (codebook-tile,
batch-tile) grid cell recomputes its W block on the VPU from the 2-D
unit coordinates (the closed-form grid geometry of som_rout.c:434-468)
and accumulates the partial W^T X contraction on the MXU into the output
tile.  HBM traffic per step is one read+write of the codebook plus the
(B, D) batch and (B, 2)/(noc, 2) coordinates — the roofline for this
update.

h = bubble (1 inside radius, som_rout.c:472-506) or gaussian
(exp(-d^2/2r^2), :511-549)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _som_update_kernel(
    bxy_ref,      # (TB, 2)   BMU grid coordinates of the batch tile
    x_ref,        # (TB, D)   batch tile
    lxy_ref,      # (TN, 2)   grid coordinates of the local codebook rows
    codes_ref,    # (TN, D)   codebook tile (input)
    ar_ref,       # (1, 2)    [alpha, radius]
    out_ref,      # (TN, D)   updated codebook tile
    acc_ref,      # (TN, D)   f32 scratch: running W^T X
    wsum_ref,     # (TN, 1)   f32 scratch: running W^T 1
    *,
    gaussian: bool,
    n_btiles: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    alpha = ar_ref[0, 0]
    radius = ar_ref[0, 1]
    bxy = bxy_ref[:]                      # (TB, 2)
    lxy = lxy_ref[:]                      # (TN, 2)
    # W computed directly in (TN, TB) orientation: the contraction dim
    # (TB) lands on W's lanes and X's sublanes, the MXU-native layout —
    # no transpose between the VPU weight computation and the matmul
    dx = lxy[:, 0][:, None] - bxy[:, 0][None, :]
    dy = lxy[:, 1][:, None] - bxy[:, 1][None, :]
    d2 = dx * dx + dy * dy                # (TN, TB)
    if gaussian:
        w = alpha * jnp.exp(-d2 / (2.0 * radius * radius))
    else:
        w = jnp.where(d2 <= radius * radius, alpha, 0.0)

    # padded batch rows carry bxy = (inf, inf) -> w = 0/NaN-free guard
    acc_ref[:] += jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    wsum_ref[:] += jnp.sum(w, axis=1)[:, None]

    @pl.when(j == n_btiles - 1)
    def _():
        c = codes_ref[:]
        out_ref[:] = c + acc_ref[:] - wsum_ref[:] * c


@functools.partial(
    jax.jit, static_argnames=("gaussian", "tile_b", "tile_n", "interpret")
)
def som_neighborhood_update(
    codes: jnp.ndarray,     # (noc, D)
    xb: jnp.ndarray,        # (B, D)
    bmu_xy: jnp.ndarray,    # (B, 2) grid coordinates of each sample's BMU
    coords: jnp.ndarray,    # (noc, 2) unit grid coordinates
    alpha,
    radius,
    gaussian: bool = False,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """codes + sum_b W_b (x_b - codes) with W recomputed per tile."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    noc, D = codes.shape
    B = xb.shape[0]
    tile_b = min(tile_b, _round_up(B, 8))
    tile_n = min(tile_n, _round_up(noc, 8))
    Bp = _round_up(B, tile_b)
    Np = _round_up(noc, tile_n)
    Dp = _round_up(D, 128)

    xp = jnp.zeros((Bp, Dp), dtype=jnp.float32).at[:B, :D].set(xb)
    cp = jnp.zeros((Np, Dp), dtype=jnp.float32).at[:noc, :D].set(codes)
    # padded batch rows get far-away BMU coords so their weight is 0
    # (bubble) or exp(-huge) = 0 (gaussian)
    bxyp = jnp.full((Bp, 2), 1e30, dtype=jnp.float32).at[:B].set(bmu_xy)
    lxyp = jnp.full((Np, 2), -1e30, dtype=jnp.float32).at[:noc].set(coords)
    ar = jnp.asarray([[alpha, radius]], dtype=jnp.float32)

    n_btiles = Bp // tile_b
    grid = (Np // tile_n, n_btiles)
    out = pl.pallas_call(
        functools.partial(
            _som_update_kernel, gaussian=gaussian, n_btiles=n_btiles
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, Dp), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * Dp,
            bytes_accessed=(2 * Np * Dp + Bp * Dp + 2 * Bp + 2 * Np) * 4,
            transcendentals=Bp * Np if gaussian else 0,
        ),
        interpret=interpret,
    )(bxyp, xp, lxyp, cp, ar)
    return out[:noc, :D]
