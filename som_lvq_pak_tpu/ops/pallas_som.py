"""Fused SOM neighborhood-update Pallas kernel.

Completes the two-kernel TPU SOM step: ops.pallas_distance finds the
BMUs; this kernel applies the neighborhood update

    codes += W^T X - (W^T 1) * codes,   W[b, n] = alpha * h(||g_bmu(b) - g_n||)

without ever materializing W (B, noc) in HBM: each (codebook-tile,
batch-tile) grid cell recomputes its W block on the VPU from the 2-D
unit grid geometry (the closed form of som_rout.c:434-468) and
accumulates the partial W^T X contraction on the MXU into the output
tile.  HBM traffic per step is one read+write of the codebook plus the
(B, D) batch and the (1, B) BMU index vector — the roofline for this
update.

The BMU enters as a flat unit index in a lane-major (1, B) int32 vector
and both endpoints' grid coordinates are computed inside the kernel
from iota (hexa: odd rows offset x by +0.5, y scaled sqrt(0.75)).
(B, 2)/(noc, 2) coordinate arrays never exist: 2-wide arrays force a
pathological TPU lane layout whose relayout costs more than the whole
update (measured ~0.5 ms per step at B=1024).

h = bubble (1 inside radius, som_rout.c:472-506) or gaussian
(exp(-d^2/2r^2), :511-549)."""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT075 = math.sqrt(0.75)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _grid_xy(idx, xdim: int, hexa: bool):
    """Grid coordinates of flat unit indices (som_rout.c:434-455).

    idx int32 array -> (x, y) float32 arrays of the same shape.  The C
    pairwise hexa formula equals embedding odd rows at x+0.5 with y
    scaled by sqrt(0.75) and taking plain euclidean distance."""
    col = (idx % xdim).astype(jnp.float32)
    row = idx // xdim
    if hexa:
        x = col + 0.5 * (row % 2).astype(jnp.float32)
        y = row.astype(jnp.float32) * _SQRT075
    else:
        x = col
        y = row.astype(jnp.float32)
    return x, y


def _neighborhood_w(bmu, aw, radius, base, tile_n, xdim, hexa, gaussian):
    """(TN, TB) neighborhood weights for one (codebook-tile, batch-tile)
    cell, recomputed on the VPU from grid geometry.  `aw` is the (1, TB)
    per-sample effective alpha (carries weight= scaling, empty-sample
    zeroing, and batch padding zeros).  `base` = GLOBAL unit index of the
    tile's first row (i * tile_n, plus the shard offset when the
    codebook is a model-axis shard of a larger map) — may be traced.

    The hexa y-term is computed as (row_u - row_b)^2 * 0.75 — EXACT in
    f32 (0.75 and small integer squares are exactly representable), so
    the bubble radius comparison d2 <= r^2 is exact math: the scaled
    form (row * sqrt075) rounds, and whether the compiler factors
    (ry - rb) * c decides inclusion at exact-boundary distances (e.g.
    dy = 3*sqrt075, dx = 1.5, r = 3), making kernels disagree with each
    other.  dx is built from columns and 0.5-offsets, exact as well."""
    bcol = (bmu % xdim).astype(jnp.float32)            # (1, TB)
    brow = bmu // xdim
    # local codebook rows' grid coordinates from the global row index
    lidx = base + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
    lcol = (lidx % xdim).astype(jnp.float32)           # (TN, 1)
    lrow = lidx // xdim

    # W computed directly in (TN, TB) orientation: the contraction dim
    # (TB) lands on W's lanes and X's sublanes, the MXU-native layout
    if hexa:
        bx = bcol + 0.5 * (brow % 2).astype(jnp.float32)
        lx = lcol + 0.5 * (lrow % 2).astype(jnp.float32)
        dx = lx - bx
        rd = (lrow - brow).astype(jnp.float32)
        d2 = dx * dx + (rd * rd) * 0.75                # (TN, TB)
    else:
        dx = lcol - bcol
        rd = (lrow - brow).astype(jnp.float32)
        d2 = dx * dx + rd * rd                         # (TN, TB)
    if gaussian:
        w = aw * jnp.exp(-d2 / (2.0 * radius * radius))
    else:
        w = jnp.where(d2 <= radius * radius, aw, 0.0)
    # padded batch rows carry bmu = -1 -> weight 0 (aw is 0 there too)
    return jnp.where(bmu < 0, 0.0, w)


def _guarded_blend(c, acc, wsum):
    """Saturating stability guard (models.fast._guarded_sum_update):
    exact c + acc - wsum*c while wsum <= 1, full blend to the batch
    weighted mean acc/wsum beyond that."""
    safe = jnp.maximum(wsum, 1e-30)
    blend = jnp.minimum(wsum, 1.0)
    return c + blend * (acc / safe - c)


def _som_update_kernel(
    bmu_ref,      # (1, TB)   int32 flat BMU index of each batch sample
    aw_ref,       # (1, TB)   f32 per-sample effective alpha
    x_ref,        # (TB, D)   batch tile
    codes_ref,    # (TN, D)   codebook tile (input)
    r_ref,        # (1, 1)    radius
    out_ref,      # (TN, D)   updated codebook tile
    acc_ref,      # (TN, D)   f32 scratch: running W^T X
    wsum_ref,     # (TN, 1)   f32 scratch: running W^T 1
    *,
    gaussian: bool,
    n_btiles: int,
    tile_n: int,
    xdim: int,
    hexa: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = _neighborhood_w(bmu_ref[:], aw_ref[:], r_ref[0, 0], i * tile_n,
                        tile_n, xdim, hexa, gaussian)
    acc_ref[:] += jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    wsum_ref[:] += jnp.sum(w, axis=1)[:, None]

    @pl.when(j == n_btiles - 1)
    def _():
        out_ref[:] = _guarded_blend(codes_ref[:], acc_ref[:], wsum_ref[:])


def _som_update_masked_kernel(
    bmu_ref,      # (1, TB)   int32 flat BMU index of each batch sample
    aw_ref,       # (1, TB)   f32 per-sample effective alpha
    x_ref,        # (TB, D)   batch tile (masked comps pre-zeroed)
    k_ref,        # (TB, D)   f32 keep flags (1 = component present)
    codes_ref,    # (TN, D)   codebook tile (input)
    r_ref,        # (1, 1)    radius
    out_ref,      # (TN, D)   updated codebook tile
    acc_ref,      # (TN, D)   f32 scratch: running W^T (K*X)
    wsum_ref,     # (TN, D)   f32 scratch: running W^T K  (per-component!)
    *,
    gaussian: bool,
    n_btiles: int,
    tile_n: int,
    xdim: int,
    hexa: bool,
):
    """Masked-component neighborhood update: a sample's masked comps
    leave every unit's matching comp untouched (adapt_vector skips masked
    comps, lvq_pak.c:349-356), so the weight mass wsum becomes
    per-(unit, component) — a second MXU contraction W^T K."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = _neighborhood_w(bmu_ref[:], aw_ref[:], r_ref[0, 0], i * tile_n,
                        tile_n, xdim, hexa, gaussian)
    acc_ref[:] += jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    wsum_ref[:] += jax.lax.dot_general(
        w, k_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == n_btiles - 1)
    def _():
        out_ref[:] = _guarded_blend(codes_ref[:], acc_ref[:], wsum_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("xdim", "hexa", "gaussian", "tile_b", "tile_n", "interpret"),
)
def som_neighborhood_update_idx(
    codes: jnp.ndarray,     # (noc, D)
    xb: jnp.ndarray,        # (B, D)
    bmu: jnp.ndarray,       # (B,) int32 flat BMU unit index per sample
    xdim: int,
    hexa: bool,
    alpha,
    radius,
    gaussian: bool = False,
    tile_b: int = 1024,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """codes + sum_b W_b (x_b - codes), W recomputed per tile from the
    BMU indices and static grid geometry (xdim, hexa), saturating-guarded.

    `alpha` is a scalar or a per-sample (B,) vector — the per-sample form
    carries the reference's weight= scaling 1-(1-a)^w (som_rout.c:622-624)
    and zeros for empty samples.  `mask` (B, D), nonzero = component
    masked: that sample leaves every unit's masked comps untouched
    (lvq_pak.c:349-356) via a per-(unit, comp) weight-mass contraction."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    noc, D = codes.shape
    B = xb.shape[0]
    tile_b = min(tile_b, _round_up(B, 8))
    tile_n = min(tile_n, _round_up(noc, 8))
    Bp = _round_up(B, tile_b)
    Np = _round_up(noc, tile_n)
    Dp = _round_up(D, 128)

    masked = mask is not None
    if masked:
        keep = 1.0 - mask.astype(jnp.float32)
        xb = xb * keep
    if (Bp, Dp) == xb.shape:
        xp = xb
    else:
        xp = jnp.zeros((Bp, Dp), dtype=jnp.float32).at[:B, :D].set(xb)
    if (Np, Dp) == codes.shape:
        cp = codes
    else:
        cp = jnp.zeros((Np, Dp), dtype=jnp.float32).at[:noc, :D].set(codes)
    # padded batch entries -> bmu -1 and alpha 0 (zero weight in-kernel)
    bp = jnp.full((1, Bp), -1, dtype=jnp.int32).at[0, :B].set(bmu.astype(jnp.int32))
    aw = jnp.broadcast_to(jnp.asarray(alpha, dtype=jnp.float32), (B,))
    awp = jnp.zeros((1, Bp), dtype=jnp.float32).at[0, :B].set(aw)
    rr = jnp.asarray([[radius]], dtype=jnp.float32)

    n_btiles = Bp // tile_b
    grid = (Np // tile_n, n_btiles)
    kparams = dict(gaussian=gaussian, n_btiles=n_btiles, tile_n=tile_n,
                   xdim=xdim, hexa=hexa)
    row_b = pl.BlockSpec((1, tile_b), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    batch_spec = pl.BlockSpec((tile_b, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    code_spec = pl.BlockSpec((tile_n, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec(
            (tile_n, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
        interpret=interpret,
    )
    if masked:
        kp = jnp.zeros((Bp, Dp), dtype=jnp.float32).at[:B, :D].set(keep)
        out = pl.pallas_call(
            functools.partial(_som_update_masked_kernel, **kparams),
            in_specs=[row_b, row_b, batch_spec, batch_spec, code_spec, r_spec],
            scratch_shapes=[
                pltpu.VMEM((tile_n, Dp), jnp.float32),
                pltpu.VMEM((tile_n, Dp), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * Bp * Np * Dp,
                bytes_accessed=(2 * Np * Dp + 2 * Bp * Dp + 2 * Bp) * 4,
                transcendentals=Bp * Np if gaussian else 0,
            ),
            **common,
        )(bp, awp, xp, kp, cp, rr)
    else:
        out = pl.pallas_call(
            functools.partial(_som_update_kernel, **kparams),
            in_specs=[row_b, row_b, batch_spec, code_spec, r_spec],
            scratch_shapes=[
                pltpu.VMEM((tile_n, Dp), jnp.float32),
                pltpu.VMEM((tile_n, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * Np * Dp,
                bytes_accessed=(2 * Np * Dp + Bp * Dp + 2 * Bp) * 4,
                transcendentals=Bp * Np if gaussian else 0,
            ),
            **common,
        )(bp, awp, xp, cp, rr)
    if (Np, Dp) == (noc, D):
        return out
    return out[:noc, :D]


def _som_accum_kernel(
    bmu_ref,      # (1, B)    int32 GLOBAL BMU index of each batch sample
    aw_ref,       # (1, B)    f32 per-sample effective alpha
    x_ref,        # (B, D)    batch block
    r_ref,        # (1, 1)    radius
    off_ref,      # (1, 1)    int32 GLOBAL unit index of local row 0
    acc_ref,      # (TN, D)   out: W^T X for this tile
    wsum_ref,     # (TN, 1)   out: W^T 1 for this tile
    *,
    gaussian: bool,
    tile_n: int,
    xdim: int,
    hexa: bool,
):
    """Neighborhood ACCUMULATORS only — no codebook I/O at all: acc and
    wsum depend on just (bmu, alpha, grid geometry), so the mixed
    data x model sharded step can psum these partials over the data axis
    BEFORE the blend touches the codebook (parallel.sharded.
    make_mixed_fused_som_train_step).  One pass: W recomputed per tile
    on the VPU (exact grid algebra of _neighborhood_w), contraction on
    the MXU."""
    i = pl.program_id(0)
    w = _neighborhood_w(bmu_ref[:], aw_ref[:], r_ref[0, 0],
                        off_ref[0, 0] + i * tile_n, tile_n,
                        xdim, hexa, gaussian)            # (TN, B)
    acc_ref[:] = jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    wsum_ref[:] = jnp.sum(w, axis=1)[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("xdim", "hexa", "gaussian", "tile_n", "n_local",
                     "interpret"),
)
def som_neighborhood_accumulate(
    xb: jnp.ndarray,        # (B, D) batch (D lane-padded)
    bmu: jnp.ndarray,       # (B,) int32 GLOBAL BMU unit index per sample
    n_local: int,           # local codebook rows (the shard height)
    xdim: int,
    hexa: bool,
    alpha,                  # scalar or (B,) per-sample effective alpha
    radius,
    gaussian: bool = False,
    tile_n: int = 512,
    unit_offset=None,       # traced int: GLOBAL index of local row 0
    interpret: Optional[bool] = None,
):
    """(acc (n_local, D), wsum (n_local, 1)) = W^T X and W^T 1 for the
    local codebook rows, W never materialized in HBM.  The building
    block of the mixed-mesh fused step: partials psum over the data
    axis, then blend+winner run against the summed totals."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, D = xb.shape
    if D % 128 != 0:
        raise ValueError("som_neighborhood_accumulate: D must be lane-padded")
    tile_n = min(tile_n, _round_up(n_local, 8))
    if n_local % tile_n != 0:
        raise ValueError(
            f"som_neighborhood_accumulate: n_local={n_local} must be a "
            f"multiple of tile_n={tile_n}")
    bp = jnp.reshape(bmu.astype(jnp.int32), (1, B))
    aw = jnp.broadcast_to(jnp.asarray(alpha, dtype=jnp.float32), (B,))
    awp = jnp.reshape(aw, (1, B))
    rr = jnp.asarray([[radius]], dtype=jnp.float32)
    oo = jnp.reshape(jnp.asarray(
        0 if unit_offset is None else unit_offset, jnp.int32), (1, 1))
    acc, wsum = pl.pallas_call(
        functools.partial(_som_accum_kernel, gaussian=gaussian,
                          tile_n=tile_n, xdim=xdim, hexa=hexa),
        grid=(n_local // tile_n,),
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_local, D), jnp.float32),
            jax.ShapeDtypeStruct((n_local, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_local * D,
            bytes_accessed=(n_local * D + B * D + 2 * B + n_local) * 4,
            transcendentals=B * n_local if gaussian else 0,
        ),
        interpret=interpret,
    )(bp, awp, xb, rr, oo)
    return acc, wsum


def _som_blend_winner_kernel(
    acc_ref,      # (TN, D)   psummed W^T X for this tile
    wsum_ref,     # (TN, 1)   psummed W^T 1
    codes_ref,    # (TN, D)   codebook tile (input)
    xn_ref,       # (B', D)   NEXT batch (winner search target)
    out_ref,      # (TN, D)   blended codebook tile
    val_ref,      # (1, B')   winner partial sq-dist (||m||^2 - 2 x.m)
    idx_ref,      # (1, B')   winner LOCAL row index
    vmin_ref,     # (1, B')   f32 scratch: running max score
    varg_ref,     # (1, B')   i32 scratch: running argmax
    *,
    tile_n: int,
    d_real: Optional[int],
    precision,
    n_tiles: int,
    batch_chunk: int,
):
    """Pass B of the mixed-mesh fused step: guarded blend of the
    psummed accumulators into the codebook tile + the next batch's
    winner fold against the just-blended tile — ONE codebook read+write
    for what the XLA fallback does in a blend read/write plus a separate
    winner read.  Same transposed-score winner contract as
    _som_fused_step_kernel (strict >, first tile wins ties)."""
    i = pl.program_id(0)
    BC = batch_chunk
    Bn = xn_ref.shape[0]
    newc = _guarded_blend(codes_ref[:].astype(jnp.float32), acc_ref[:],
                          wsum_ref[:])
    out_ref[:] = newc.astype(out_ref.dtype)
    # norm over the same lanes as the contraction: with d_real the
    # padded lanes are excluded on BOTH sides (they are zero in
    # production; slicing keeps score = x.m - ||m||^2/2 self-consistent
    # even if a caller blends mass into them)
    nw = newc[:, :d_real] if d_real is not None else newc
    m2h = 0.5 * jnp.sum(nw * nw, axis=1, keepdims=True)      # (TN, 1)
    cw = nw.astype(xn_ref.dtype)
    for c in range(Bn // BC):
        sl = pl.ds(c * BC, BC)
        xw = (xn_ref[sl, :d_real] if d_real is not None
              else xn_ref[sl, :])
        mx = jax.lax.dot_general(
            cw, xw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                 # (TN, BC)
        s_t = mx - m2h
        lm = jnp.max(s_t, axis=0, keepdims=True)
        la = jnp.argmax(s_t, axis=0)[None, :] + i * tile_n

        @pl.when(i == 0)
        def _():
            vmin_ref[:, sl] = lm
            varg_ref[:, sl] = la

        @pl.when(i > 0)
        def _():
            better = lm > vmin_ref[:, sl]
            varg_ref[:, sl] = jnp.where(better, la, varg_ref[:, sl])
            vmin_ref[:, sl] = jnp.where(better, lm, vmin_ref[:, sl])

    @pl.when(i == n_tiles - 1)
    def _():
        val_ref[:] = -2.0 * vmin_ref[:]
        idx_ref[:] = varg_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("tile_n", "d_real", "precision", "interpret"),
)
def som_blend_winner(
    codes: jnp.ndarray,     # (n_local, D), D lane-padded
    acc: jnp.ndarray,       # (n_local, D) summed W^T X
    wsum: jnp.ndarray,      # (n_local, 1) summed W^T 1
    xn: jnp.ndarray,        # (B', D) next batch
    tile_n: int = 512,
    d_real: Optional[int] = None,
    precision=None,
    interpret: Optional[bool] = None,
):
    """(codes', val (B',), local_idx (B',)) = blend + next-batch winner
    in one pass over the codebook — the Pallas pass B of
    parallel.sharded.make_mixed_fused_som_train_step."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_local, D = codes.shape
    Bn = xn.shape[0]
    tile_n = min(tile_n, _round_up(n_local, 8))
    if n_local % tile_n != 0:
        raise ValueError(
            f"som_blend_winner: n_local={n_local} must be a multiple of "
            f"tile_n={tile_n}")
    BC = Bn if Bn <= 2048 else math.gcd(Bn, 2048)
    n_tiles = n_local // tile_n
    codes_new, val, idx = pl.pallas_call(
        functools.partial(
            _som_blend_winner_kernel, tile_n=tile_n, d_real=d_real,
            precision=precision, n_tiles=n_tiles, batch_chunk=BC,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_local, D), codes.dtype),
            jax.ShapeDtypeStruct((1, Bn), jnp.float32),
            jax.ShapeDtypeStruct((1, Bn), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, Bn), jnp.float32),
            pltpu.VMEM((1, Bn), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bn * n_local * (d_real or D),
            bytes_accessed=(3 * n_local * D + Bn * D + n_local) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(acc, wsum, codes, xn)
    return codes_new, val[0, :], idx[0, :]


def som_neighborhood_update(
    codes: jnp.ndarray,
    xb: jnp.ndarray,
    bmu_xy: jnp.ndarray,    # (B, 2) grid coordinates of each sample's BMU
    coords: jnp.ndarray,    # (noc, 2) unit grid coordinates
    alpha,
    radius,
    gaussian: bool = False,
    tile_b: int = 1024,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Coordinate-array compatibility wrapper.

    Recovers the flat BMU index and grid geometry from the (B, 2)/(noc, 2)
    coordinate arrays, then calls the index-based kernel.  Needs concrete
    `coords` (call outside jit).  Prefer som_neighborhood_update_idx — it
    avoids materializing the 2-wide coordinate arrays (pathological TPU
    layout) altogether."""
    from ..models.fast import derive_grid_geometry

    xdim, hexa = derive_grid_geometry(coords)
    # invert each bmu_xy back to its flat unit index
    bx = bmu_xy[:, 0]
    by = bmu_xy[:, 1]
    if hexa:
        row = jnp.round(by / _SQRT075).astype(jnp.int32)
        col = jnp.round(bx - 0.5 * (row % 2).astype(jnp.float32)).astype(jnp.int32)
    else:
        row = jnp.round(by).astype(jnp.int32)
        col = jnp.round(bx).astype(jnp.int32)
    bmu = row * xdim + col
    return som_neighborhood_update_idx(
        codes, xb, bmu, xdim, hexa, alpha, radius,
        gaussian=gaussian, tile_b=tile_b, tile_n=tile_n, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fully-fused training step: update(batch t) + winner search(batch t+1)
# in ONE pass over the codebook
# ---------------------------------------------------------------------------

def _som_fused_step_kernel(
    bmu_ref,      # (1, B)    int32 BMU of the CURRENT batch (from step t-1)
    aw_ref,       # (1, B)    f32 per-sample effective alpha
    x_ref,        # (B, D)    current batch
    xn_ref,       # (B', D)   NEXT batch (winner search target)
    codes_ref,    # (TN, D)   codebook tile (input)
    r_ref,        # (1, 1)    radius
    off_ref,      # (1, 1)    int32 GLOBAL unit index of local row 0 (0 on
    #             a whole codebook; the shard's row offset under model-TP)
    out_ref,      # (TN, D)   updated codebook tile
    val_ref,      # (B', 1)   next batch: running min partial distance
    idx_ref,      # (B', 1)   next batch: running argmin
    *,
    gaussian: bool,
    tile_n: int,
    xdim: int,
    hexa: bool,
    precision=None,
    noc: Optional[int] = None,
    d_real: Optional[int] = None,
):
    """One grid step = one codebook tile: apply the neighborhood update
    for the whole current batch, write the updated tile, then fold the
    NEXT batch's partial distances against the *updated* tile into the
    running argmin.  `d_real` < D slices the winner contraction to the
    real (pre-padding) feature count — padded lanes are zero on both
    sides, so K=d_real halves the winner matmul's MXU cycles at D=64-in-
    128 (same slice as the factored kernel).  `noc` = real row count when the codebook was padded
    to a tile multiple (padded rows are masked out of the winner search).  The tile is read from HBM once and written once per
    training step — versus three reads + one write for the unfused
    sequence (dist read, ||m||^2 recompute read, update read+write) —
    and ||m||^2 never exists in HBM at all (computed from the tile in
    VMEM).  This is the HBM floor for online-minibatch SOM training."""
    i = pl.program_id(0)

    w = _neighborhood_w(bmu_ref[:], aw_ref[:], r_ref[0, 0],
                        off_ref[0, 0] + i * tile_n, tile_n,
                        xdim, hexa, gaussian)           # (TN, B)
    acc = jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # (TN, D)
    wsum = jnp.sum(w, axis=1)[:, None]                   # (TN, 1)
    newc = _guarded_blend(codes_ref[:].astype(jnp.float32), acc, wsum)
    out_ref[:] = newc.astype(out_ref.dtype)

    # winner search for the next batch against the updated tile.  The
    # distance block is computed TRANSPOSED, (TN, B'): the row norms
    # ||m||^2 are a (TN, 1) sublane vector broadcasting along lanes —
    # the (TN,) -> (1, TN) cross-lane relayout of the row-major form
    # crashes/OOMs the Mosaic compiler inside this fused kernel.
    # norm over the same lanes as the contraction (padded lanes are zero
    # in production; the slice keeps the partial distance self-consistent)
    nw = newc[:, :d_real] if d_real is not None else newc
    m2 = jnp.sum(nw * nw, axis=1, keepdims=True)         # (TN, 1)
    if noc is not None:
        # padded codebook rows (global index >= noc) can never win
        gidx = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
        m2 = jnp.where(gidx < noc, m2, jnp.inf)
    cw = nw
    xw = xn_ref[:, :d_real] if d_real is not None else xn_ref[:]
    mx = jax.lax.dot_general(
        cw.astype(xn_ref.dtype), xw,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                    # (TN, B')
    d_t = m2 - 2.0 * mx
    _fused_argmin_epilogue(d_t, i, tile_n, val_ref, idx_ref)


def _fused_argmin_epilogue(d_t, j, tile_n, val_ref, idx_ref):
    """Transposed-orientation argmin fold: d_t is (TN, B'), the running
    (min, argmin) rows are (1, B').  Same tie contract as
    pallas_distance._argmin_epilogue (strict <, first tile wins ties)."""
    local_min = jnp.min(d_t, axis=0, keepdims=True)              # (1, B')
    local_arg = jnp.argmin(d_t, axis=0)[None, :] + j * tile_n    # (1, B')

    @pl.when(j == 0)
    def _():
        val_ref[:] = local_min
        idx_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < val_ref[:]
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
        val_ref[:] = jnp.where(better, local_min, val_ref[:])


def fused_step_vmem_bytes(tile_n: int, B: int, D: int,
                          factored: bool = False,
                          dual: bool = False) -> int:
    """Approximate VMEM working set of one fused-step grid cell: batch
    blocks + codebook tiles + the (tile_n, B) weight/distance blocks
    (wxa axis-factor scratch on the factored path; `dual` = the
    one-grid-row-per-tile hexa case whose scratch stacks both parity
    patterns).  Used to derive a tile_n that respects the ~16 MB
    scoped-VMEM limit for user-set batch sizes (Mosaic compilation
    fails outright when exceeded)."""
    common = 2 * B * D * 4 + 3 * tile_n * D * 4
    if factored:
        # wxa scratch + w/wy_exp/mx working blocks (y factor is in-tile,
        # rows_per_tile x B — negligible)
        blocks = (5 if dual else 4) * tile_n * B * 4
    else:
        blocks = 3 * tile_n * B * 4
    return common + blocks


def pick_fused_tile_n(noc: int, B: int, D: int, xdim: int = 0,
                      factored: bool = False,
                      budget: int = 12 << 20) -> int:
    """Largest power-of-two-ish tile_n whose fused-step working set fits
    `budget` (default 12 MB, leaving headroom under the ~16 MB scoped
    limit).  When `factored`, only tile_n values compatible with the
    separable-kernel geometry (multiples of xdim) are considered."""
    for tn in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tn > noc:
            continue
        if factored and (xdim <= 0 or tn % xdim != 0):
            continue
        if fused_step_vmem_bytes(tn, B, D, factored,
                                 dual=(tn == xdim)) <= budget:
            return tn
    return 8


def chunked_step_vmem_bytes(tile_n: int, B: int, BC: int, D: int,
                            xdim: int, hexa: bool,
                            wxa_bf16: bool = False,
                            batch_bf16: bool = False) -> int:
    """Approximate VMEM working set of the batch-chunked factored step:
    both batch blocks, the x-pattern scratch (doubled for the hexa
    one-row-per-tile dual-parity case), codebook tiles, and the per-chunk
    (tile_n, BC) working blocks.  Used to keep auto-selected
    (tile_n, batch_chunk, wxa_bf16) combinations under the ~16 MB scoped
    limit (Mosaic OOMs at compile otherwise — observed at 17.4-18.0 MB)."""
    batch_item = 2 if batch_bf16 else 4
    wxa_item = 2 if wxa_bf16 else 4
    dual = hexa and tile_n == xdim
    pat_rows = 2 * tile_n if dual else tile_n
    return (2 * B * D * batch_item          # x + xn blocks
            + pat_rows * B * wxa_item       # x-pattern scratch
            + 3 * tile_n * D * 4            # codes in/out (+ headroom)
            + 3 * tile_n * BC * 4           # w / mx / wy-expand chunks
            + 2 * B * 4)                    # bmu/alpha rows, winner scratch


def _factored_geometry_ok(noc: int, xdim: int, tile_n: int, hexa: bool) -> bool:
    """True when the separable-neighborhood kernel applies: tiles cover
    whole grid rows (tile_n % xdim == 0), the codebook has no padded
    rows (noc % tile_n == 0), the sublane merge is layout-free
    (xdim % 8 == 0), and for hexa maps either every tile starts on an
    even grid row (even rows_per_tile: the x-offset pattern is
    tile-invariant) or each tile is exactly one grid row (the kernel
    then keeps BOTH parity patterns in scratch and selects by i % 2)."""
    if noc % tile_n != 0 or tile_n % xdim != 0 or xdim % 8 != 0:
        return False
    rows_per_tile = tile_n // xdim
    if hexa and rows_per_tile % 2 != 0 and rows_per_tile != 1:
        return False
    return True


def _som_fused_factored_kernel(
    bmu_ref,      # (1, B)    int32 BMU of the CURRENT batch
    aw_ref,       # (1, B)    f32 per-sample effective alpha
    x_ref,        # (B, D)    current batch
    xn_ref,       # (B', D)   NEXT batch (winner search target)
    codes_ref,    # (TN, D)   codebook tile (input)
    r_ref,        # (1, 1)    radius
    out_ref,      # (TN, D)   updated codebook tile
    val_ref,      # (1, B')   next batch: running MAX score (x.m - ||m||^2/2);
    #             rewritten to the partial distance -2*score after the last tile
    idx_ref,      # (1, B')   next batch: running argmax
    wxa_ref,      # (TN, B)   scratch: x-axis factor, built once at i == 0
    #             (gaussian: aw * exp(-dx^2/2r^2); bubble: dx^2)
    *,
    gaussian: bool,
    tile_n: int,
    xdim: int,
    hexa: bool,
    ydim: int,
    d_real: Optional[int],
    precision=None,
):
    """Separable-neighborhood fused step: the grid metric decomposes as
    d^2 = dx^2 + dy^2 with dx a function of (unit column, row parity)
    only and dy of the unit row only, so exp(-d^2/2r^2) factors into an
    x-pattern shared by every tile (period 2*xdim rows, built once into
    scratch at i == 0) times a per-grid-row y-factor computed IN-TILE
    on the tile's own rows_per_tile rows — each grid row's y-exp runs
    exactly once per step either way (tiles cover disjoint rows), and
    an in-tile compute avoids the sublane-misaligned scratch load that
    Mosaic rejects when rows_per_tile % 8 != 0 ("cannot statically
    prove that index in dimension 0 is a multiple of 8").  The per-tile
    (TN, B) weight block costs ONE VPU multiply instead of ~12 VPU
    passes + a (TN, B) exp; exp count per step drops from noc*B to
    (tile_n + ydim)*B.  Matmuls and the update algebra are identical to
    _som_fused_step_kernel.

    `d_real` < D slices the winner contraction to the real feature
    count (padded lanes are zero and contribute nothing): the MXU
    streams K=d_real instead of K=D."""
    i = pl.program_id(0)
    rows_per_tile = tile_n // xdim
    # hexa with one grid row per tile: tiles alternate row parity, so
    # scratch holds BOTH x-patterns stacked ((2*TN, B); even rows in
    # [0, TN), odd in [TN, 2*TN)) and each tile selects by i % 2 — the
    # slice offset parity*TN is provably a lane-tile multiple
    dual_parity = hexa and rows_per_tile == 1

    @pl.when(i == 0)
    def _():
        bmu = bmu_ref[:]                                  # (1, B)
        colb = (bmu % xdim).astype(jnp.float32)
        rowb = bmu // xdim
        if hexa:
            bx = colb + 0.5 * (rowb % 2).astype(jnp.float32)
        else:
            bx = colb
        r = r_ref[0, 0]
        s = 1.0 / (2.0 * r * r)
        # x pattern over local rows: col = l % xdim, parity = (l//xdim)%2
        # (dual_parity: the two stacked blocks are parities 0 and 1)
        rows = 2 * tile_n if dual_parity else tile_n
        l = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        col = (l % xdim).astype(jnp.float32)
        if hexa:
            par = ((l // xdim) % 2).astype(jnp.float32)
            xq = col + 0.5 * par
        else:
            xq = col
        dx = xq - bx                                      # (rows, B)
        dx2 = dx * dx
        if gaussian:
            wxa_ref[:] = aw_ref[:] * jnp.exp(-dx2 * s)
        else:
            wxa_ref[:] = dx2

    B = wxa_ref.shape[1]
    # y factor for THIS tile's grid rows (rows_per_tile of them),
    # expanded to (TN, B) with a tiny 0/1 MXU matmul — E[t, r] = 1 iff
    # local row t belongs to grid row r.  A vector broadcast along the
    # sublane axis ((R,1,B) -> (R,xdim,B)) relayouts sublanes and was
    # measured SLOWER than the plain kernel; the K=rows_per_tile matmul
    # is noise next to the update contraction.
    bmu = bmu_ref[:]
    rowb = bmu // xdim                                    # (1, B)
    r = r_ref[0, 0]
    ry = (i * rows_per_tile
          + jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, 1), 0))
    # row-difference form: dy^2 = (ry - rowb)^2 * 0.75 is EXACT in f32
    # (see _neighborhood_w) — the scaled (row * sqrt075) subtraction
    # rounds and makes the bubble boundary compiler-dependent
    rd = (ry - rowb).astype(jnp.float32)                  # (R, B)
    dy2 = (rd * rd) * 0.75 if hexa else rd * rd
    if gaussian:
        wy_blk = jnp.exp(-dy2 * (1.0 / (2.0 * r * r)))
    else:
        wy_blk = dy2
    if dual_parity:
        # one grid row per tile: wy_blk is (1, B) and broadcasts; the
        # x-pattern is the parity-matched half of the stacked scratch
        wxa = wxa_ref[pl.ds((i % 2) * tile_n, tile_n), :]
        wy_exp = wy_blk                                   # (1, B)
    else:
        wxa = wxa_ref[:]
        t_row = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, rows_per_tile), 0) // xdim
        r_row = jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, rows_per_tile), 1)
        expand = (t_row == r_row).astype(jnp.float32)     # (TN, R)
        wy_exp = jax.lax.dot_general(
            expand, wy_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TN, B)
    if gaussian:
        w = wxa * wy_exp                                  # (TN, B)
    else:
        w = jnp.where(wxa + wy_exp <= r * r, aw_ref[:], 0.0)

    acc = jax.lax.dot_general(
        w, x_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (TN, D)
    wsum = jnp.sum(w, axis=1)[:, None]                    # (TN, 1)
    newc = _guarded_blend(codes_ref[:].astype(jnp.float32), acc, wsum)
    out_ref[:] = newc.astype(out_ref.dtype)

    # winner search against the updated tile, in max-score form:
    # argmin(||m||^2 - 2 x.m) == argmax(x.m - ||m||^2/2), saving the
    # d = m2 - 2*mx materialization pass (score = mx - h2 is one op)
    nw = newc[:, :d_real] if d_real is not None else newc
    m2h = 0.5 * jnp.sum(nw * nw, axis=1, keepdims=True)       # (TN, 1)
    if d_real is not None:
        cw = nw
        xw = xn_ref[:, :d_real]
    else:
        cw = nw
        xw = xn_ref[:]
    mx = jax.lax.dot_general(
        cw.astype(xn_ref.dtype), xw,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                     # (TN, B')
    s_t = mx - m2h
    local_max = jnp.max(s_t, axis=0, keepdims=True)               # (1, B')
    local_arg = jnp.argmax(s_t, axis=0)[None, :] + i * tile_n     # (1, B')

    @pl.when(i == 0)
    def _():
        val_ref[:] = local_max
        idx_ref[:] = local_arg

    @pl.when(i > 0)
    def _():
        better = local_max > val_ref[:]
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
        val_ref[:] = jnp.where(better, local_max, val_ref[:])

    # keep the public contract: val = partial sq-dist ||m||^2 - 2 x.m
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        val_ref[:] = -2.0 * val_ref[:]


def _som_fused_factored_chunked_kernel(
    bmu_ref,      # (1, B)    int32 BMU of the CURRENT batch
    aw_ref,       # (1, B)    f32 per-sample effective alpha
    x_ref,        # (B, D)    current batch
    xn_ref,       # (B', D)   NEXT batch (winner search target); int8
    #             pre-quantized when int8_win
    codes_ref,    # (TN, D)   codebook tile (input; index clamped on the
    #             extra stagger drain cell)
    r_ref,        # (1, 1)    radius
    *rest,        # [q_ref (1, 2) f32: (quant 127/sm, dequant sm*sx/127^2)
    #             — int8_win only], out_ref (TN, D), val_ref (1, B'),
    #             idx_ref (1, B'), wxa_ref (PAT, B) scratch (PAT = 2*TN
    #             for hexa one-row-per-tile, else TN; optionally bf16),
    #             vmin_ref (1, B') f32 scratch (running MAX score),
    #             varg_ref (1, B') i32 scratch (running argmax),
    #             [prev_ref (TN, D) f32 scratch — stagger only]
    gaussian: bool,
    tile_n: int,
    xdim: int,
    hexa: bool,
    d_real: Optional[int],
    precision,
    batch_chunk: int,
    stagger: bool,
    n_tiles: int,
    int8_win: bool = False,
):
    """Batch-chunked (and optionally staggered) separable-neighborhood
    fused step — the large-B variant of _som_fused_factored_kernel.

    `separable_y` (dual-parity gaussian only): the per-chunk (TN, BC)
    weight block is never materialized — the y-factor scales the BATCH
    instead (acc += wxa_par @ (wy * x), wsum += wxa_par @ wy), feeding
    the MXU straight from the x-pattern scratch.  Replaces the (TN, BC)
    VPU multiply (noc*B elements/step) with a (BC, D) scale
    (noc/tile_n * B * D elements — half at tile_n = 2*D) and moves the
    wsum reduction onto the MXU.  The y-exponentials run per (tile,
    sample): noc/tile_n * B per step, ~2M at the headline shape.

    The (TN, B) weight / score blocks never materialize whole: both the
    update accumulation and the winner fold run in `batch_chunk`-lane
    slices, so B=4096/8192 fit scoped VMEM (the r3 kernel's blocks
    exceeded it past B=2048 — VERDICT r3 task 1a).  The per-chunk
    running winner (max score, argmax) lives in tiny (1, B') scratch and
    the val/idx outputs are written once at the last fold.

    `stagger=True` additionally breaks the in-tile read->update->write->
    winner dependency chain (VERDICT r3 task 1b): grid cell i interleaves,
    chunk by chunk, tile i's update contraction with tile i-1's winner
    contraction against the PREVIOUS updated tile (kept in scratch) —
    two independent MXU streams per cell instead of one serial chain.
    One extra grid cell at the end drains the last tile's winner.
    Semantics are unchanged: the winner of batch t+1 is still computed
    against every tile as updated by batch t.

    Grid-distance terms are the exact-f32 forms of _neighborhood_w
    (dx from columns and 0.5-offsets, dy^2 = rowdiff^2 * 0.75), so the
    bubble boundary decision agrees with every other kernel exactly.

    `int8_win` (opt-in experiment, VERDICT r4 task 5): the winner
    contraction runs int8 x int8 -> int32 on the MXU — the updated tile
    is quantized in-kernel against a global codebook scale (q_ref) and
    the batch arrives pre-quantized; scores dequantize to f32 before
    the fold, and ||m||^2/2 stays exact f32, so only near-tie winners
    within the quantization noise can flip (quality-gated, not
    bit-parity).  Measured standalone: the int8 dot at the winner shape
    runs 1.61x the f32 rate on v5e (tools/int8_probe.py)."""
    i = pl.program_id(0)
    if int8_win:
        q_ref, *rest = rest
    (out_ref, val_ref, idx_ref, wxa_ref, vmin_ref, varg_ref,
     *prev_ref) = rest
    rows_per_tile = tile_n // xdim
    dual_parity = hexa and rows_per_tile == 1
    B = x_ref.shape[0]
    Bn = xn_ref.shape[0]
    BC = batch_chunk
    r = r_ref[0, 0]
    s = 1.0 / (2.0 * r * r)

    @pl.when(i == 0)
    def _():
        # x pattern over local rows (chunked along lanes): col = l % xdim,
        # parity = (l//xdim) % 2 (dual_parity: two stacked parity blocks)
        rows = 2 * tile_n if dual_parity else tile_n
        l = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        col = (l % xdim).astype(jnp.float32)
        if hexa:
            par = ((l // xdim) % 2).astype(jnp.float32)
            xq = col + 0.5 * par
        else:
            xq = col
        for c in range(B // BC):
            sl = pl.ds(c * BC, BC)
            bmu_c = bmu_ref[:, sl]
            colb = (bmu_c % xdim).astype(jnp.float32)
            if hexa:
                bx = colb + 0.5 * ((bmu_c // xdim) % 2).astype(jnp.float32)
            else:
                bx = colb
            dx = xq - bx                                  # (rows, BC)
            dx2 = dx * dx
            if gaussian:
                wxa_ref[:, sl] = (aw_ref[:, sl] * jnp.exp(-dx2 * s)
                                  ).astype(wxa_ref.dtype)
            else:
                wxa_ref[:, sl] = dx2.astype(wxa_ref.dtype)

    def update_chunk(c, acc, wsum):
        """One batch chunk of tile i's neighborhood accumulation."""
        sl = pl.ds(c * BC, BC)
        bmu_c = bmu_ref[:, sl]
        rowb = bmu_c // xdim                              # (1, BC)
        ry = (i * rows_per_tile
              + jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, 1), 0))
        rd = (ry - rowb).astype(jnp.float32)              # (R, BC)
        dy2 = (rd * rd) * 0.75 if hexa else rd * rd
        if gaussian:
            wy_blk = jnp.exp(-dy2 * s)
        else:
            wy_blk = dy2
        if dual_parity:
            wxa = wxa_ref[pl.ds((i % 2) * tile_n, tile_n), sl]
            wy_exp = wy_blk                               # (1, BC)
        else:
            wxa = wxa_ref[:, sl]
            t_row = jax.lax.broadcasted_iota(
                jnp.int32, (tile_n, rows_per_tile), 0) // xdim
            r_row = jax.lax.broadcasted_iota(
                jnp.int32, (tile_n, rows_per_tile), 1)
            expand = (t_row == r_row).astype(jnp.float32)  # (TN, R)
            wy_exp = jax.lax.dot_general(
                expand, wy_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (TN, BC)
        if gaussian:
            w = wxa.astype(jnp.float32) * wy_exp
        else:
            w = jnp.where(wxa.astype(jnp.float32) + wy_exp <= r * r,
                          aw_ref[:, sl], 0.0)
        # bf16 batches (the B=8192 VMEM regime): the MXU contraction runs
        # bf16 x bf16 -> f32; wsum stays f32 (w is exact there)
        acc = acc + jax.lax.dot_general(
            w.astype(x_ref.dtype), x_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TN, D)
        wsum = wsum + jnp.sum(w, axis=1)[:, None]
        return acc, wsum

    def winner_chunk(c, j, cw, m2h):
        """One batch chunk of the winner fold against updated tile j."""
        sl = pl.ds(c * BC, BC)
        xw = (xn_ref[sl, :d_real] if d_real is not None
              else xn_ref[sl, :])
        if int8_win:
            mxi = jax.lax.dot_general(
                cw, xw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                             # (TN, BC) int32
            mx = mxi.astype(jnp.float32) * q_ref[0, 1]
        else:
            mx = jax.lax.dot_general(
                cw, xw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                                             # (TN, BC)
        s_t = mx - m2h
        lm = jnp.max(s_t, axis=0, keepdims=True)          # (1, BC)
        la = jnp.argmax(s_t, axis=0)[None, :] + j * tile_n

        @pl.when(j == 0)
        def _():
            vmin_ref[:, sl] = lm
            varg_ref[:, sl] = la

        @pl.when(j > 0)
        def _():
            better = lm > vmin_ref[:, sl]
            varg_ref[:, sl] = jnp.where(better, la, varg_ref[:, sl])
            vmin_ref[:, sl] = jnp.where(better, lm, vmin_ref[:, sl])

    def finish_update(acc, wsum):
        newc = _guarded_blend(codes_ref[:].astype(jnp.float32), acc, wsum)
        out_ref[:] = newc.astype(out_ref.dtype)
        return newc

    def winner_prep(newc):
        nw = newc[:, :d_real] if d_real is not None else newc
        m2h = 0.5 * jnp.sum(nw * nw, axis=1, keepdims=True)  # (TN, 1)
        if int8_win:
            cw8 = jnp.clip(jnp.round(nw * q_ref[0, 0]),
                           -127.0, 127.0).astype(jnp.int8)
            return cw8, m2h
        return nw.astype(xn_ref.dtype), m2h

    def flush_outputs(j):
        @pl.when(j == n_tiles - 1)
        def _():
            # public contract: val = partial sq-dist ||m||^2 - 2 x.m
            val_ref[:] = -2.0 * vmin_ref[:]
            idx_ref[:] = varg_ref[:]

    zero_acc = jnp.zeros((tile_n, x_ref.shape[1]), jnp.float32)
    zero_w = jnp.zeros((tile_n, 1), jnp.float32)

    if not stagger:
        acc, wsum = zero_acc, zero_w
        for c in range(B // BC):
            acc, wsum = update_chunk(c, acc, wsum)
        newc = finish_update(acc, wsum)
        cw, m2h = winner_prep(newc)
        for c in range(Bn // BC):
            winner_chunk(c, i, cw, m2h)
        flush_outputs(i)
        return

    prev = prev_ref[0]

    @pl.when(i == 0)
    def _():
        acc, wsum = zero_acc, zero_w
        for c in range(B // BC):
            acc, wsum = update_chunk(c, acc, wsum)
        prev[:] = finish_update(acc, wsum)

    @pl.when((i > 0) & (i < n_tiles))
    def _():
        # interleave tile i's update chunks with tile i-1's winner
        # chunks: adjacent independent MXU contractions, so the VPU
        # weight-gen / fold work of one stream can hide under the other
        # stream's matmul instead of serializing the whole cell
        cw, m2h = winner_prep(prev[:])
        acc, wsum = zero_acc, zero_w
        for c in range(max(B, Bn) // BC):
            if c < B // BC:
                acc, wsum = update_chunk(c, acc, wsum)
            if c < Bn // BC:
                winner_chunk(c, i - 1, cw, m2h)
        prev[:] = finish_update(acc, wsum)

    @pl.when(i == n_tiles)
    def _():
        # drain: the last tile's winner fold
        cw, m2h = winner_prep(prev[:])
        for c in range(Bn // BC):
            winner_chunk(c, n_tiles - 1, cw, m2h)
        flush_outputs(n_tiles - 1)


def _fused_factored_chunked_call(
    codes, xb, bp, awp, xb_next, rr, *, xdim, hexa, gaussian, tile_n,
    d_real, precision, batch_chunk, stagger, wxa_bf16, interpret,
    int8_win=False,
):
    """pallas_call plumbing for _som_fused_factored_chunked_kernel."""
    noc, D = codes.shape
    B = xb.shape[0]
    Bn = xb_next.shape[0]
    BC = batch_chunk if batch_chunk is not None else math.gcd(B, Bn)
    if B % BC or Bn % BC or BC % 128:
        raise ValueError(
            f"som_fused_train_step: batch_chunk={BC} must divide B={B} "
            f"and B'={Bn} and be a multiple of 128")
    n_tiles = noc // tile_n
    dual = hexa and tile_n == xdim
    pat_rows = 2 * tile_n if dual else tile_n
    # bubble's threshold compare needs the exact f32 dx^2 pattern — bf16
    # mantissa would wobble the boundary; the bf16 option only ever pays
    # off for gaussian (where wxa holds tiny smooth weights) anyway
    wxa_bf16 = wxa_bf16 and gaussian
    grid = (n_tiles + (1 if stagger else 0),)
    if stagger:
        def cix(i):
            return (jnp.minimum(i, n_tiles - 1), 0)
    else:
        def cix(i):
            return (i, 0)
    extra_in = []
    extra_specs = []
    if int8_win:
        # global scales for the step: the codebook quantizer must cover
        # the post-update values — updates are convex blends toward
        # batch samples, so max(|codes|, |x|) bounds them exactly
        sm = jnp.maximum(jnp.max(jnp.abs(codes.astype(jnp.float32))),
                         jnp.max(jnp.abs(xb.astype(jnp.float32)))) + 1e-30
        sx = jnp.max(jnp.abs(xb_next.astype(jnp.float32))) + 1e-30
        xb_next = jnp.clip(
            jnp.round(xb_next.astype(jnp.float32) * (127.0 / sx)),
            -127.0, 127.0).astype(jnp.int8)
        q = jnp.stack([127.0 / sm,
                       (sm * sx) / (127.0 * 127.0)]).reshape(1, 2)
        extra_in = [q]
        extra_specs = [pl.BlockSpec((1, 2), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)]
    scratch = [
        pltpu.VMEM((pat_rows, B), jnp.bfloat16 if wxa_bf16 else jnp.float32),
        pltpu.VMEM((1, Bn), jnp.float32),
        pltpu.VMEM((1, Bn), jnp.int32),
    ]
    if stagger:
        scratch.append(pltpu.VMEM((tile_n, D), jnp.float32))
    codes_new, val, idx = pl.pallas_call(
        functools.partial(
            _som_fused_factored_chunked_kernel,
            gaussian=gaussian, tile_n=tile_n, xdim=xdim, hexa=hexa,
            d_real=d_real, precision=precision, batch_chunk=BC,
            stagger=stagger, n_tiles=n_tiles, int8_win=int8_win,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=[
            pl.BlockSpec((tile_n, D), cix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((noc, D), codes.dtype),
            jax.ShapeDtypeStruct((1, Bn), jnp.float32),
            jax.ShapeDtypeStruct((1, Bn), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * noc * D + 2 * Bn * noc * (d_real or D),
            bytes_accessed=(2 * noc * D * codes.dtype.itemsize
                            + (B + Bn) * D * 4 + 2 * B * 4 + 2 * Bn * 4),
            transcendentals=(tile_n + noc // xdim) * B if gaussian else 0,
        ),
        interpret=interpret,
    )(bp, awp, xb, xb_next, codes, rr, *extra_in)
    return codes_new, idx[0, :], val[0, :]


@functools.partial(
    jax.jit,
    static_argnames=("xdim", "hexa", "gaussian", "tile_n", "interpret",
                     "precision", "factored", "d_real", "batch_chunk",
                     "stagger", "wxa_bf16", "batch_bf16", "int8_win"),
)
def som_fused_train_step(
    codes: jnp.ndarray,     # (noc, D) — keep D lane-padded (mult of 128)
    xb: jnp.ndarray,        # (B, D)   current batch
    bmu: jnp.ndarray,       # (B,) int32 BMU of xb (from the previous step)
    xb_next: jnp.ndarray,   # (B', D)  next batch
    xdim: int,
    hexa: bool,
    alpha,                  # scalar or (B,) per-sample effective alpha
    radius,
    gaussian: bool = False,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    precision=None,
    factored: Optional[bool] = None,
    d_real: Optional[int] = None,
    unit_offset=None,       # traced int: GLOBAL unit index of row 0 when
    #                       `codes` is a model-axis shard of a larger map
    #                       (grid geometry and the BMU contract stay
    #                       global; returned winner indices stay LOCAL)
    batch_chunk: Optional[int] = None,  # factored path: process the batch
    #                       in lane-chunks of this size so the (TN, B)
    #                       weight/score blocks never materialize whole —
    #                       unlocks B >= 4096 under the VMEM limit
    stagger: bool = False,  # factored path: interleave tile i's update
    #                       with tile i-1's winner (breaks the in-tile
    #                       update->winner dependency chain)
    wxa_bf16: bool = False,  # factored path: keep the x-pattern scratch
    #                       in bfloat16 (halves its VMEM at large B;
    #                       gaussian only — bubble keeps exact f32)
    batch_bf16: bool = False,  # factored chunked path: hold the batch
    #                       blocks in bfloat16 (halves their VMEM; the
    #                       MXU truncates f32 inputs at default
    #                       precision anyway — required at B=8192)
    int8_win: bool = False,  # factored chunked path: run the winner
    #                       contraction int8 x int8 -> int32 (1.61x the
    #                       f32 MXU rate at this shape — int8_probe.py);
    #                       winner selection gains quantization noise on
    #                       near-ties and the returned val is approximate
    #                       (quality-gated opt-in, not bit parity)
):
    """One fused SOM training step at the HBM roofline.

    Returns (codes_new, bmu_next (B',) int32, val_next (B',) partial
    sq-dist without the ||x||^2 constant).  Software-pipelined usage:

        bmu = dist_argmin(x[0], codes)[1]          # prologue
        for t in range(T):
            codes, bmu, _ = som_fused_train_step(
                codes, x[t], bmu, x[t+1], ...)     # one codebook pass/step

    The whole batch must fit VMEM alongside a (tile_n, B) weight block:
    keep tile_n * B * 4  +  2 * B * D * 4  +  3 * tile_n * D * 4 well
    under the ~16 MB VMEM budget (tile_n=1024, B=1024, D=128 ~= 7 MB).
    Codebook may be float32 or bfloat16 (bf16 halves the step's HBM
    traffic; accumulation is f32 in-kernel either way).

    `factored` (None = auto when the grid geometry allows) selects the
    separable-neighborhood kernel: the (TN, B) weight block is ONE VPU
    multiply of precomputed x/y axis factors instead of a full closed-form
    recompute with a (TN, B) exp — the VPU-bound path becomes MXU-bound.
    `d_real` < D slices the winner contraction to the real (pre-padding)
    feature count."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    noc, D = codes.shape
    B = xb.shape[0]
    Bn = xb_next.shape[0]
    tile_n = min(tile_n, _round_up(noc, 8))
    Np = _round_up(noc, tile_n)
    if D % 128 != 0:
        raise ValueError(
            f"som_fused_train_step: D={D} must be lane-padded to a "
            "multiple of 128 (pad once, train padded — see "
            "models.fast.som_train_fast)")
    if factored is None:
        factored = unit_offset is None and _factored_geometry_ok(
            noc, xdim, tile_n, hexa)
    if factored and unit_offset is not None:
        raise ValueError(
            "som_fused_train_step: unit_offset needs factored=False (the "
            "separable x-pattern assumes the shard starts at unit 0)")
    if factored:
        if not _factored_geometry_ok(noc, xdim, tile_n, hexa):
            raise ValueError(
                f"som_fused_train_step: factored path needs noc % tile_n "
                f"== 0, tile_n % xdim == 0, xdim % 8 == 0 (and even rows "
                f"per tile for hexa); got noc={noc} xdim={xdim} "
                f"tile_n={tile_n} hexa={hexa}")
        ydim = noc // xdim
        bp = jnp.reshape(bmu.astype(jnp.int32), (1, B))
        aw = jnp.broadcast_to(jnp.asarray(alpha, dtype=jnp.float32), (B,))
        awp = jnp.reshape(aw, (1, B))
        rr = jnp.asarray([[radius]], dtype=jnp.float32)
        if (batch_chunk is not None or stagger or wxa_bf16 or batch_bf16
                or int8_win):
            if batch_bf16:
                xb = xb.astype(jnp.bfloat16)
                xb_next = xb_next.astype(jnp.bfloat16)
            return _fused_factored_chunked_call(
                codes, xb, bp, awp, xb_next, rr, xdim=xdim, hexa=hexa,
                gaussian=gaussian, tile_n=tile_n, d_real=d_real,
                precision=precision, batch_chunk=batch_chunk,
                stagger=stagger, wxa_bf16=wxa_bf16, interpret=interpret,
                int8_win=int8_win)
        codes_new, val, idx = pl.pallas_call(
            functools.partial(
                _som_fused_factored_kernel,
                gaussian=gaussian, tile_n=tile_n, xdim=xdim, hexa=hexa,
                ydim=ydim, d_real=d_real, precision=precision,
            ),
            grid=(noc // tile_n,),
            in_specs=[
                pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bn, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((noc, D), codes.dtype),
                jax.ShapeDtypeStruct((1, Bn), jnp.float32),
                jax.ShapeDtypeStruct((1, Bn), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM(
                    ((2 * tile_n if (hexa and tile_n == xdim) else tile_n), B),
                    jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * noc * D + 2 * Bn * noc * (d_real or D),
                bytes_accessed=(2 * noc * D * codes.dtype.itemsize
                                + (B + Bn) * D * 4 + 2 * B * 4 + 2 * Bn * 4),
                transcendentals=(tile_n + ydim) * B if gaussian else 0,
            ),
            interpret=interpret,
        )(bp, awp, xb, xb_next, codes, rr)
        return codes_new, idx[0, :], val[0, :]
    if Np != noc:
        # pad rows to the tile multiple; the kernel masks them out of
        # the winner search and the wrapper slices them back off.  For
        # steady-state training prefer a pre-padded resident codebook
        # (this per-step pad/slice costs an extra codebook copy).
        codes = jnp.zeros((Np, D), dtype=codes.dtype).at[:noc].set(codes)

    bp = jnp.reshape(bmu.astype(jnp.int32), (1, B))
    aw = jnp.broadcast_to(jnp.asarray(alpha, dtype=jnp.float32), (B,))
    awp = jnp.reshape(aw, (1, B))
    rr = jnp.asarray([[radius]], dtype=jnp.float32)
    oo = jnp.reshape(jnp.asarray(
        0 if unit_offset is None else unit_offset, jnp.int32), (1, 1))

    grid = (Np // tile_n,)
    codes_new, val, idx = pl.pallas_call(
        functools.partial(
            _som_fused_step_kernel,
            gaussian=gaussian, tile_n=tile_n, xdim=xdim, hexa=hexa,
            precision=precision, noc=noc if Np != noc else None,
            d_real=d_real,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, D), codes.dtype),
            jax.ShapeDtypeStruct((1, Bn), jnp.float32),
            jax.ShapeDtypeStruct((1, Bn), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * D + 2 * Bn * Np * (d_real or D),
            bytes_accessed=(2 * Np * D * codes.dtype.itemsize
                            + (B + Bn) * D * 4 + 2 * B * 4 + 2 * Bn * 4),
            transcendentals=B * Np if gaussian else 0,
        ),
        interpret=interpret,
    )(bp, awp, xb, xb_next, codes, rr, oo)
    if Np != noc:
        codes_new = codes_new[:noc]
    return codes_new, idx[0, :], val[0, :]


# ---------------------------------------------------------------------------
# VMEM-resident multi-step training: K sequential steps in ONE kernel
# (codebooks that fit VMEM, <= ~8k units at D=128)
# ---------------------------------------------------------------------------

def _som_vmem_steps_kernel(
    bmu0_ref,     # (1, B)    int32 BMU of batch 0 (prologue)
    x_ref,        # (1, B, D) batch t (grid dim 0 = t)
    xn_ref,       # (1, B, D) batch t+1 (same array shifted by one)
    aw_ref,       # (1, 1, B) per-sample alpha of step t
    r_ref,        # (1, 1, 1) radius of step t
    codes_ref,    # (noc, D)  initial codebook (read once at t=0)
    out_ref,      # (noc, D)  codebook: initialized at t=0, updated in
    #             place in VMEM across all grid steps, flushed at the end
    bmu_out_ref,  # (1, B)    BMU of the batch AFTER the last step
    vmin_ref,     # (1, B)    f32 scratch: running min partial distance
    *,
    gaussian: bool,
    row_chunk: int,
    xdim: int,
    hexa: bool,
    noc: int,
):
    """One grid step = one full training step against the VMEM-resident
    codebook.  The codebook lives in the constant-index output block:
    copied in at t=0, updated in place every step, and written back to
    HBM once after the last grid step — K steps of training cost ONE
    codebook read + ONE write + the batch stream, plus zero per-step
    dispatch overhead.

    Row chunks bound VMEM: the (rows, B) neighborhood/distance blocks
    are materialized row_chunk rows at a time."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = codes_ref[:]

    bmu = jnp.where(t == 0, bmu0_ref[:], bmu_out_ref[:])  # (1, B)
    aw = aw_ref[0]        # (1, B)
    radius = r_ref[0, 0, 0]
    x = x_ref[0]    # (B, D)
    xn = xn_ref[0]  # (B, D)

    n_chunks = noc // row_chunk
    # pass 1: neighborhood update, row chunk at a time (in-VMEM R/W)
    for c in range(n_chunks):
        rows = pl.ds(c * row_chunk, row_chunk)
        w = _neighborhood_w(bmu, aw, radius, c * row_chunk, row_chunk,
                            xdim, hexa, gaussian)         # (RC, B)
        acc = jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (RC, D)
        wsum = jnp.sum(w, axis=1)[:, None]
        cblk = out_ref[rows, :].astype(jnp.float32)
        out_ref[rows, :] = _guarded_blend(cblk, acc, wsum).astype(out_ref.dtype)

    # pass 2: winner search for the next batch against the updated codes
    for c in range(n_chunks):
        rows = pl.ds(c * row_chunk, row_chunk)
        cblk = out_ref[rows, :].astype(jnp.float32)
        m2 = jnp.sum(cblk * cblk, axis=1, keepdims=True)  # (RC, 1)
        mx = jax.lax.dot_general(
            cblk, xn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (RC, B)
        d_t = m2 - 2.0 * mx
        lm = jnp.min(d_t, axis=0, keepdims=True)          # (1, B)
        la = jnp.argmin(d_t, axis=0)[None, :] + c * row_chunk
        if c == 0:
            bmu_out_ref[:] = la
            vmin_ref[:] = lm
        else:
            better = lm < vmin_ref[:]
            bmu_out_ref[:] = jnp.where(better, la, bmu_out_ref[:])
            vmin_ref[:] = jnp.where(better, lm, vmin_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("xdim", "hexa", "gaussian", "row_chunk", "interpret"),
)
def som_vmem_train_steps(
    codes: jnp.ndarray,     # (noc, D), D multiple of 128, noc of row_chunk
    batches: jnp.ndarray,   # (K, B, D) — K sequential minibatches
    bmu0: jnp.ndarray,      # (B,) int32 BMU of batches[0]
    alphas: jnp.ndarray,    # (K,) or (K, B) per-step (per-sample) alpha
    radii: jnp.ndarray,     # (K,) per-step radius
    xdim: int,
    hexa: bool,
    gaussian: bool = False,
    row_chunk: int = 512,
    interpret: Optional[bool] = None,
    next_first: Optional[jnp.ndarray] = None,
):
    """K sequential SOM training steps in ONE kernel dispatch with the
    codebook resident in VMEM throughout: HBM sees one codebook read, one
    write, and the (K, B, D) batch stream, however large K is — the
    small/medium-map fast path (noc*D*4 <= ~8 MB), where per-step HBM
    and dispatch costs would otherwise dominate.  Step semantics are
    identical to the som_fused_train_step pipeline (winner of batch t
    computed against codes after step t-1).

    Returns (codes_new, bmu_next (B,)).  `next_first` = the FIRST batch
    of the following call: bmu_next is then its winner against the final
    codebook, chaining groups exactly; without it, bmu_next re-searches
    batches[-1]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    noc, D = codes.shape
    K, B, _ = batches.shape
    if D % 128 != 0:
        raise ValueError("som_vmem_train_steps: D must be a multiple of 128")
    row_chunk = min(row_chunk, noc)
    if noc % row_chunk != 0:
        raise ValueError(
            f"som_vmem_train_steps: noc={noc} must be a multiple of "
            f"row_chunk={row_chunk}")

    aw = jnp.asarray(alphas, jnp.float32)
    if aw.ndim == 1:
        aw = jnp.broadcast_to(aw[:, None], (K, B))
    aw = aw.reshape(K, 1, B)
    rr = jnp.asarray(radii, jnp.float32).reshape(K, 1, 1)
    bp = jnp.reshape(bmu0.astype(jnp.int32), (1, B))
    # next-batch view: batches shifted by one; the tail is the next
    # call's first batch when chaining, else the last batch repeated
    tail = (batches[-1:] if next_first is None
            else jnp.reshape(next_first, (1, B, D)))
    xn = jnp.concatenate([batches[1:], tail], axis=0)

    kern = functools.partial(
        _som_vmem_steps_kernel,
        gaussian=gaussian, row_chunk=row_chunk,
        xdim=xdim, hexa=hexa, noc=noc,
    )
    codes_new, bmu_next = pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, D), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, D), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((noc, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((noc, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((noc, D), codes.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * K * B * noc * D,
            bytes_accessed=(2 * noc * D + K * B * D + 2 * K * B) * 4,
            transcendentals=K * B * noc if gaussian else 0,
        ),
        interpret=interpret,
    )(bp, batches, xn, aw, rr, codes)
    return codes_new, bmu_next[0]
