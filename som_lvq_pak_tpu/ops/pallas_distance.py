"""Fused distance + argmin Pallas TPU kernel — the framework's hot op.

Replaces the reference's scalar winner scan (find_winner_euc,
lvq_pak.c:41-94) at MXU speed.  For a batch X (B, D) against a codebook
M (N, D) the kernel tiles the codebook, computes the partial distance

    d[b, n] = -2 x_b . m_n + ||m_n||^2        (the ||x||^2 term is a
                                               per-row constant that
                                               cannot change the argmin)

on the MXU and folds the running (min, argmin) reduction into the matmul
epilogue, so the (B, N) distance matrix is never materialized in HBM —
for a 65 k codebook that saves B*65536*4 bytes of HBM traffic per batch,
which is what keeps the op at roofline (SURVEY.md §7 hard part 3).

Tie-breaking matches the C scan: strict less-than, first index wins.

The wrapper pads shapes to hardware tiles and adds back ||x||^2 so the
returned values are true squared distances.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _argmin_epilogue(d, j, tile_n, val_ref, idx_ref):
    """Fold a tile's (TB, TN) partial distances into the running
    (min, argmin); strict <: the first (lowest-index) tile wins ties,
    matching the C scan (lvq_pak.c:79)."""
    local_min = jnp.min(d, axis=1, keepdims=True)  # (TB, 1)
    local_arg = jnp.argmin(d, axis=1)[:, None] + j * tile_n  # (TB, 1)

    @pl.when(j == 0)
    def _():
        val_ref[:] = local_min
        idx_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < val_ref[:]
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
        val_ref[:] = jnp.where(better, local_min, val_ref[:])


def _dist_argmin_kernel(x_ref, m_ref, m2_ref, val_ref, idx_ref, *, tile_n: int,
                        precision=None):
    j = pl.program_id(1)
    x = x_ref[:]  # (TB, D)
    m = m_ref[:]  # (TN, D)
    # -2 X . M^T + ||m||^2 : contraction over D on the MXU
    xm = jax.lax.dot_general(
        x, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    d = m2_ref[:] - 2.0 * xm  # (TB, TN); m2 broadcast from (1, TN)
    _argmin_epilogue(d, j, tile_n, val_ref, idx_ref)


def _dist_argmin_masked_kernel(x_ref, k_ref, m_ref, bias_ref, val_ref, idx_ref,
                               *, tile_n: int, precision=None):
    """Masked-component winner search (SURVEY.md §7 hard part 6): the
    sample's ||m||^2 term depends on its mask, so the broadcast m2 row
    becomes a second MXU contraction  keep @ (M^2)^T  — M^2 computed from
    the codebook tile already resident in VMEM, so the masked path costs
    2x FLOPs but zero extra HBM traffic (exactly the reference's
    skip-masked-comps semantics, lvq_pak.c:63-72)."""
    j = pl.program_id(1)
    x = x_ref[:]  # (TB, D) — masked comps pre-zeroed (x * keep)
    k = k_ref[:]  # (TB, D) keep floats (1 = use the component)
    m = m_ref[:]  # (TN, D)
    xm = jax.lax.dot_general(
        x, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    km2 = jax.lax.dot_general(
        k, m * m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    # bias = 0 for real codebook rows, +inf for padding rows
    d = bias_ref[:] + km2 - 2.0 * xm  # (TB, TN)
    _argmin_epilogue(d, j, tile_n, val_ref, idx_ref)


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n", "bf16", "interpret", "precision"))
def dist_argmin(
    x: jnp.ndarray,
    codes: jnp.ndarray,
    m2: Optional[jnp.ndarray] = None,
    tile_b: Optional[int] = None,
    tile_n: Optional[int] = None,
    bf16: bool = False,
    interpret: Optional[bool] = None,
    precision=None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused 1-NN winner search: returns (sq_dists (B,), indices (B,)).

    `tile_b`/`tile_n` default to the conservative (256, 512) at every
    shape (a (512, 1024) large-shape auto-upgrade was tried in r5 and
    reverted as chip-phase-dependent — see the inline note); callers
    with same-process A/B evidence for a shape pass explicit tiles.

    `m2` = precomputed ||m||^2 (N,) float32; recomputed if None.

    `mask` = optional (B, D), nonzero where a component is masked off
    (excluded from the distance — the reference's 'x' missing-value
    semantics, lvq_pak.c:63-72).  The masked path fuses the per-sample
    keep @ (M^2)^T correction as a second MXU contraction in the same
    kernel; `m2` is ignored.

    `precision`: the MXU contraction precision.  The default (None) runs
    the dot at the TPU's native matmul precision — measured 2.4e12
    evals/s/chip with 99.6 % winner agreement against the exact-f32
    oracle (disagreements only among codes within ~1e-3 relative
    distance, immaterial for training).  Pass jax.lax.Precision.HIGHEST
    for exact-f32 winners at ~30x lower throughput; the parity trainers
    never use this kernel at all.  bf16=True additionally casts the
    inputs to bfloat16 before the call.
    """
    B, D = x.shape
    N, _ = codes.shape
    # big unmasked default-tile batches dispatch to the TRANSPOSED
    # kernel (sublane-oriented winner fold): same-window A/B at
    # N=65536 measured 1.53x at B=16384, 1.23x at B=32768, 1.40x at
    # B=65536 over the best classic tiling, winners identical (classic
    # kept only the B=8192 window, hence the >= 16384 gate)
    if (mask is None and not bf16 and tile_b is None and tile_n is None
            and B >= 16384 and N >= 1024 and D <= 512):
        # D-gate keeps the (1024, Dp) + (512, Dp) blocks within the
        # measured-VMEM regime (cf. the r5 review's large-D finding)
        return dist_argmin_t(x, codes, interpret=interpret,
                             precision=precision)
    # default tiling: (256, 512).  A (512, 1024) auto-upgrade at large
    # B x N was tried in r5 and REVERTED: across three interleaved bench
    # windows the bigger tiles won once by 1.7x and lost twice by
    # 12-27 % — the preference is chip-phase-dependent at this shape, so
    # the conservative tiling (smaller VMEM working set, safe at any D)
    # stays the default.  Callers with measured same-process evidence
    # pass their own tiles (e.g. the whole-array qerror's (512, 2048),
    # A/B'd at 2.1x in r4).
    if tile_b is None:
        tile_b = 256
    if tile_n is None:
        tile_n = 512
    if interpret is None:
        # Mosaic only compiles on TPU; fall back to the interpreter on CPU
        interpret = jax.default_backend() == "cpu"
    masked = mask is not None
    if m2 is None and not masked:
        m2 = jnp.sum(codes.astype(jnp.float32) ** 2, axis=-1)

    tile_b = min(tile_b, _round_up(B, 8))
    tile_n = min(tile_n, _round_up(N, 128))
    Bp = _round_up(B, tile_b)
    Np = _round_up(N, tile_n)
    Dp = _round_up(D, 128)

    if masked:
        keep = 1.0 - mask.astype(jnp.float32)
        x = x * keep  # zero masked comps (usually already zero in the file)
    if (Bp, Dp) == x.shape:
        xp = x
    else:
        xp = jnp.zeros((Bp, Dp), dtype=x.dtype).at[:B, :D].set(x)
    if (Np, Dp) == codes.shape:
        mp = codes
    else:
        mp = jnp.zeros((Np, Dp), dtype=codes.dtype).at[:N, :D].set(codes)
    if bf16:
        xp = xp.astype(jnp.bfloat16)
        mp = mp.astype(jnp.bfloat16)

    grid = (Bp // tile_b, Np // tile_n)
    row_spec = pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )
    if masked:
        kp = jnp.zeros((Bp, Dp), dtype=xp.dtype).at[:B, :D].set(
            keep.astype(xp.dtype))
        # bias row: 0 for real codebook rows, +inf for padding rows
        biasp = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1) < N, 0.0, jnp.inf
        ).astype(jnp.float32)
        val, idx = pl.pallas_call(
            functools.partial(_dist_argmin_masked_kernel, tile_n=tile_n,
                              precision=precision),
            in_specs=[
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                row_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * Bp * Np * Dp,
                bytes_accessed=(2 * Bp * Dp + Np * Dp + 2 * Bp) * 4,
                transcendentals=0,
            ),
            **common,
        )(xp, kp, mp, biasp)
    else:
        # padded codebook rows get +inf norm so they can never win
        if Np == N:
            m2p = m2.reshape(1, N)
        else:
            m2p = jnp.full((1, Np), jnp.inf, dtype=jnp.float32).at[0, :N].set(m2)
        val, idx = pl.pallas_call(
            functools.partial(_dist_argmin_kernel, tile_n=tile_n, precision=precision),
            in_specs=[
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                row_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * Np * Dp,
                bytes_accessed=(Bp * Dp + Np * Dp + 2 * Bp) * 4,
                transcendentals=0,
            ),
            **common,
        )(xp, mp, m2p)

    # add back ||x||^2 (over kept comps) for true squared distances
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
    vals = jnp.maximum(val[:B, 0] + x2, 0.0)
    return vals, idx[:B, 0]


def _top2_epilogue(d, j, tile_n, v1_ref, i1_ref, v2_ref, i2_ref):
    """Fold a tile's (TB, TN) partial distances into the running
    (best, second) pair per row across codebook tiles."""
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    a1 = jnp.argmin(d, axis=1)[:, None]  # (TB, 1) local best
    b1 = jnp.min(d, axis=1, keepdims=True)
    masked = jnp.where(col == a1, jnp.inf, d)
    a2 = jnp.argmin(masked, axis=1)[:, None]
    b2 = jnp.min(masked, axis=1, keepdims=True)
    base = j * tile_n
    g1 = a1 + base
    g2 = a2 + base

    @pl.when(j == 0)
    def _():
        v1_ref[:] = b1
        i1_ref[:] = g1
        v2_ref[:] = b2
        i2_ref[:] = g2

    @pl.when(j > 0)
    def _():
        # merge the running (v1, v2) with the tile's (b1, b2).  Both
        # pairs are sorted (ov1<=ov2, b1<=b2), so:
        #   tile takes first  (b1 < ov1): second = min(ov1, b2)
        #   old keeps first   (else):     second = min(ov2, b1)
        # strict < keeps the earlier tile on ties (the C scan order).
        ov1, oi1 = v1_ref[:], i1_ref[:]
        ov2, oi2 = v2_ref[:], i2_ref[:]
        new_best = b1 < ov1
        nv1 = jnp.where(new_best, b1, ov1)
        ni1 = jnp.where(new_best, g1, oi1)
        tile_second = b2 < ov1  # only used when new_best
        nv2_new = jnp.where(tile_second, b2, ov1)
        ni2_new = jnp.where(tile_second, g2, oi1)
        old_second = b1 < ov2  # only used when not new_best
        nv2_old = jnp.where(old_second, b1, ov2)
        ni2_old = jnp.where(old_second, g1, oi2)
        v1_ref[:], i1_ref[:] = nv1, ni1
        v2_ref[:] = jnp.where(new_best, nv2_new, nv2_old)
        i2_ref[:] = jnp.where(new_best, ni2_new, ni2_old)


def _dist_top2_kernel(x_ref, m_ref, m2_ref, v1_ref, i1_ref, v2_ref, i2_ref,
                      *, tile_n: int, precision=None):
    """Fused distance + top-2 epilogue (for lvq2/lvq3's 2-NN rule,
    lvq_rout.c:750,855)."""
    j = pl.program_id(1)
    xm = jax.lax.dot_general(
        x_ref[:], m_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    d = m2_ref[:] - 2.0 * xm  # (TB, TN)
    _top2_epilogue(d, j, tile_n, v1_ref, i1_ref, v2_ref, i2_ref)


def _dist_top2_masked_kernel(x_ref, k_ref, m_ref, bias_ref,
                             v1_ref, i1_ref, v2_ref, i2_ref,
                             *, tile_n: int, precision=None):
    """Masked top-2: per-sample keep @ (M^2)^T correction fused as a
    second contraction (see _dist_argmin_masked_kernel)."""
    j = pl.program_id(1)
    m = m_ref[:]
    xm = jax.lax.dot_general(
        x_ref[:], m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    km2 = jax.lax.dot_general(
        k_ref[:], m * m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    d = bias_ref[:] + km2 - 2.0 * xm
    _top2_epilogue(d, j, tile_n, v1_ref, i1_ref, v2_ref, i2_ref)


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n", "interpret", "precision"))
def dist_top2(
    x: jnp.ndarray,
    codes: jnp.ndarray,
    m2: Optional[jnp.ndarray] = None,
    tile_b: int = 256,
    tile_n: int = 512,
    interpret: Optional[bool] = None,
    precision=None,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 2-NN winner search: returns (d1, i1, d2, i2), each (B,) —
    true squared distances of the best and second-best codes.

    Tie order between exactly-equal distances is lowest-index-first
    (the C insertion rule orders ties later-index-first — parity paths
    use ops.exact; this kernel is the throughput path).  `precision` as
    in dist_argmin: None = native MXU precision, HIGHEST = exact f32.
    `mask` (B, D) nonzero = component masked off; fused like
    dist_argmin's masked path."""
    B, D = x.shape
    N, _ = codes.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    masked = mask is not None
    if m2 is None and not masked:
        m2 = jnp.sum(codes.astype(jnp.float32) ** 2, axis=-1)

    tile_b = min(tile_b, _round_up(B, 8))
    tile_n = min(tile_n, _round_up(N, 128))
    Bp = _round_up(B, tile_b)
    Np = _round_up(N, tile_n)
    Dp = _round_up(D, 128)

    if masked:
        keep = 1.0 - mask.astype(jnp.float32)
        x = x * keep
    xp = jnp.zeros((Bp, Dp), dtype=x.dtype).at[:B, :D].set(x)
    mp = jnp.zeros((Np, Dp), dtype=codes.dtype).at[:N, :D].set(codes)

    grid = (Bp // tile_b, Np // tile_n)
    common = dict(
        grid=grid,
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )
    row_spec = pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    if masked:
        kp = jnp.zeros((Bp, Dp), dtype=xp.dtype).at[:B, :D].set(keep)
        biasp = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1) < N, 0.0, jnp.inf
        ).astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(_dist_top2_masked_kernel, tile_n=tile_n,
                              precision=precision),
            in_specs=[
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                row_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * Bp * Np * Dp,
                bytes_accessed=(2 * Bp * Dp + Np * Dp + 4 * Bp) * 4,
                transcendentals=0,
            ),
            **common,
        )(xp, kp, mp, biasp)
    else:
        m2p = jnp.full((1, Np), jnp.inf, dtype=jnp.float32).at[0, :N].set(m2)
        out = pl.pallas_call(
            functools.partial(_dist_top2_kernel, tile_n=tile_n, precision=precision),
            in_specs=[
                pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                row_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * Np * Dp,
                bytes_accessed=(Bp * Dp + Np * Dp + 4 * Bp) * 4,
                transcendentals=0,
            ),
            **common,
        )(xp, mp, m2p)
    v1, i1, v2, i2 = out
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
    d1 = jnp.maximum(v1[:B, 0] + x2, 0.0)
    d2 = jnp.maximum(v2[:B, 0] + x2, 0.0)
    return d1, i1[:B, 0], d2, i2[:B, 0]


def _dist_argmin_t_kernel(x_ref, m_ref, val_ref, idx_ref, *, tile_n: int,
                          noc: Optional[int], precision=None):
    """TRANSPOSED winner search: the (TN, TB) score block keeps the
    codebook on SUBLANES and the batch on LANES, so the per-tile winner
    fold is a sublane max/argmax producing (1, TB) — the cheap
    orientation (CLAUDE.md: cross-lane reductions relayout and were the
    classic kernel's dominant cost at small B; the fused SOM kernel's
    winner uses exactly this layout).  Scores are the max-score form
    s = m.x - ||m||^2/2 (argmin distance == argmax score); ||m||^2 is
    computed from the tile already in VMEM (a (TN, 1) sublane vector),
    so no m2 input row is needed.  Padded codebook rows (noc is the
    real count) are masked to -inf.  Ties: within a tile argmax takes
    the first (lowest) row; across tiles strict > keeps the earlier
    tile — the C scan's rule (lvq_pak.c:79)."""
    i = pl.program_id(1)  # codebook-tile axis
    m = m_ref[:]                                      # (TN, D)
    mx = jax.lax.dot_general(
        m, x_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                 # (TN, TB)
    m2h = 0.5 * jnp.sum(m.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    s = mx - m2h
    if noc is not None:
        row = (i * tile_n
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
        s = jnp.where(row < noc, s, -jnp.inf)
    lm = jnp.max(s, axis=0, keepdims=True)            # (1, TB)
    la = jnp.argmax(s, axis=0)[None, :] + i * tile_n

    @pl.when(i == 0)
    def _():
        val_ref[:] = lm
        idx_ref[:] = la

    @pl.when(i > 0)
    def _():
        better = lm > val_ref[:]
        idx_ref[:] = jnp.where(better, la, idx_ref[:])
        val_ref[:] = jnp.where(better, lm, val_ref[:])

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        # public contract: val = partial sq-dist ||m||^2 - 2 x.m
        val_ref[:] = -2.0 * val_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n",
                                             "interpret", "precision"))
def dist_argmin_t(
    x: jnp.ndarray,
    codes: jnp.ndarray,
    tile_b: int = 1024,
    tile_n: int = 512,
    interpret: Optional[bool] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed-layout 1-NN winner search (unmasked): same contract as
    dist_argmin — (sq_dists (B,), indices (B,)) — with the winner fold
    in the cheap sublane orientation.  Numerics use the max-score form
    (like the fused SOM kernel's winner), so near-tie winners can
    differ from the classic kernel by float rounding; both are quality
    paths (parity uses ops.exact).  Measured r5 on the real chip vs the
    best classic tiling, same window, N=65536: **1.27x at B=1024**
    (tile 2048x256) and **1.40x at B=65536** (tile 1024x512 — the
    whole-array qerror's chunk shape); classic (512, 2048) stays ahead
    at B=8192.  Winner agreement 1.0 at all three shapes."""
    B, D = x.shape
    N, _ = codes.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tile_b = min(tile_b, _round_up(B, 128))
    tile_n = min(tile_n, _round_up(N, 8))
    Bp = _round_up(B, tile_b)
    Np = _round_up(N, tile_n)
    Dp = _round_up(D, 128)
    xp = (x if (Bp, Dp) == x.shape else
          jnp.zeros((Bp, Dp), dtype=x.dtype).at[:B, :D].set(x))
    mp = (codes if (Np, Dp) == codes.shape else
          jnp.zeros((Np, Dp), dtype=codes.dtype).at[:N, :D].set(codes))
    grid = (Bp // tile_b, Np // tile_n)
    val, idx = pl.pallas_call(
        functools.partial(_dist_argmin_t_kernel, tile_n=tile_n,
                          noc=N if Np != N else None, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * Dp,
            bytes_accessed=(Bp * Dp + Np * Dp + 2 * Bp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, mp)
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
    vals = jnp.maximum(val[0, :B] + x2, 0.0)
    return vals, idx[0, :B]


def dist_argmin_reference(x, codes):
    """XLA oracle for the kernel (same partial-distance formulation)."""
    m2 = jnp.sum(codes.astype(jnp.float32) ** 2, axis=-1)
    d = m2[None, :] - 2.0 * jax.lax.dot_general(
        x, codes, (((1,), (1,)), ((), ())),
        precision="highest", preferred_element_type=jnp.float32,
    )
    idx = jnp.argmin(d, axis=-1)
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
    val = jnp.maximum(jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0] + x2, 0.0)
    return val, idx


# ---------------------------------------------------------------------------
# Fused distance + top-k (k <= 16) — the kNN kernel (SURVEY.md §7 hard
# part 7: knntest/setlabel/elimin/eveninit need top-k, k <= 10)
# ---------------------------------------------------------------------------

def _select_topk(d, base_idx, k):
    """(TB, k) smallest values + global indices from a (TB, C) block by
    k rounds of (min, argmin, mask-out); lowest index wins ties.

    `base_idx` is either a scalar offset (tile phase: global index =
    column + offset) or a (TB, C) index array (merge phase).  The merge
    lookup is gather-free — Mosaic's in-kernel gather lowering rejects
    (TB, 1)-into-(TB, C) take_along_axis — using a masked row-min at the
    argmin column instead."""
    vals = []
    idxs = []
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    intmax = jnp.iinfo(jnp.int32).max
    for _ in range(k):
        a = jnp.argmin(d, axis=1)[:, None]          # (TB, 1)
        v = jnp.min(d, axis=1, keepdims=True)
        if isinstance(base_idx, jnp.ndarray) and base_idx.ndim == 2:
            g = jnp.min(jnp.where(col == a, base_idx, intmax),
                        axis=1, keepdims=True)
        else:
            g = a + base_idx
        vals.append(v)
        idxs.append(g)
        d = jnp.where(col == a, jnp.inf, d)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _dist_topk_kernel(x_ref, m_ref, m2_ref, val_ref, idx_ref,
                      *, k: int, tile_n: int, precision=None):
    """Running top-k across codebook tiles: each tile's local top-k is
    merged with the running (TB, k) state by re-selecting k from the 2k
    candidates.  Ties take the lowest global index (the throughput-path
    convention; the parity kNN ops keep the C insertion order)."""
    j = pl.program_id(1)
    xm = jax.lax.dot_general(
        x_ref[:], m_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    d = m2_ref[:] - 2.0 * xm  # (TB, TN)
    tv, ti = _select_topk(d, jnp.int32(j * tile_n), k)

    @pl.when(j == 0)
    def _():
        val_ref[:] = tv
        idx_ref[:] = ti

    @pl.when(j > 0)
    def _():
        cv = jnp.concatenate([val_ref[:], tv], axis=1)   # (TB, 2k)
        ci = jnp.concatenate([idx_ref[:], ti], axis=1)
        # lower-index-first on ties: order candidates so the running
        # (earlier-tile) entries come first and argmin's first-hit rule
        # picks them
        mv, mi = _select_topk(cv, ci, k)
        val_ref[:] = mv
        idx_ref[:] = mi


@functools.partial(jax.jit, static_argnames=("k", "tile_b", "tile_n",
                                             "interpret", "precision"))
def dist_topk(
    x: jnp.ndarray,
    codes: jnp.ndarray,
    k: int,
    m2: Optional[jnp.ndarray] = None,
    tile_b: int = 256,
    tile_n: int = 512,
    interpret: Optional[bool] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused k-NN search: returns (sq_dists (B, k), indices (B, k)),
    ascending, without materializing (B, N) in HBM.  k <= 16 (the
    reference tops out at k=10, elimin.c:30).  Ties order lowest index
    first (parity paths use ops.exact's C insertion order instead)."""
    if not 1 <= k <= 16:
        raise ValueError(f"dist_topk: k={k} out of range (1..16)")
    B, D = x.shape
    N, _ = codes.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if m2 is None:
        m2 = jnp.sum(codes.astype(jnp.float32) ** 2, axis=-1)

    tile_b = min(tile_b, _round_up(B, 8))
    tile_n = min(tile_n, _round_up(N, 128))
    Bp = _round_up(B, tile_b)
    Np = _round_up(N, tile_n)
    Dp = _round_up(D, 128)

    xp = jnp.zeros((Bp, Dp), dtype=x.dtype).at[:B, :D].set(x)
    mp = jnp.zeros((Np, Dp), dtype=codes.dtype).at[:N, :D].set(codes)
    m2p = jnp.full((1, Np), jnp.inf, dtype=jnp.float32).at[0, :N].set(m2)

    grid = (Bp // tile_b, Np // tile_n)
    val, idx = pl.pallas_call(
        functools.partial(_dist_topk_kernel, k=k, tile_n=tile_n,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, k), jnp.float32),
            jax.ShapeDtypeStruct((Bp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Np * Dp,
            bytes_accessed=(Bp * Dp + Np * Dp + 2 * Bp * k) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, mp, m2p)
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)
    vals = jnp.maximum(val[:B] + x2[:, None], 0.0)
    return vals, idx[:B]
