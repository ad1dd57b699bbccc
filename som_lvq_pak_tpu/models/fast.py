"""Minibatch TPU training steps — the production throughput path.

The reference trains strictly online (one sample per step,
som_rout.c:600, lvq_rout.c:637).  On TPU the unit of work becomes a
minibatch: one fused dist+argmin kernel call finds B winners at once,
and the neighborhood/winner updates collapse into a second matmul
(W^T X) — so a training step is two MXU contractions and stays at
roofline.  This deviates from the reference's sequential-update
semantics (documented; the parity trainers in som.py/lvq.py preserve
them exactly); for small learning rates the accumulated-update batch is
a first-order approximation of B online steps, and `update='mean'`
implements the classic Kohonen batch-SOM rule instead.

Grid distances are computed closed-form from unit coordinates on the
VPU (hexa geometry: odd-row x offset +-0.5, y scaled sqrt(0.75),
som_rout.c:434-455) instead of gathering rows of a (noc, noc) matrix —
no HBM gather, works for maps of any size.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset, Neighborhood, Topology
from .common import alpha_schedule, radius_schedule


def unit_coords(xdim: int, ydim: int, hexa: bool) -> jnp.ndarray:
    """(noc, 2) float32 effective grid coordinates.

    For hexa maps the C pairwise formula (som_rout.c:434-455) is
    equivalent to embedding odd rows at x+0.5 and scaling y by
    sqrt(0.75), then taking plain euclidean distance.
    """
    idx = np.arange(xdim * ydim)
    x = (idx % xdim).astype(np.float32)
    y = (idx // xdim).astype(np.float32)
    if hexa:
        x = x + 0.5 * ((idx // xdim) % 2)
        y = y * np.float32(np.sqrt(0.75))
    return jnp.asarray(np.stack([x, y], axis=1))


def grid_sq_dists(coords: jnp.ndarray, bmu: jnp.ndarray) -> jnp.ndarray:
    """(B, noc) squared grid distances from each BMU to every unit."""
    c = coords[bmu]  # (B, 2)
    d = c[:, None, :] - coords[None, :, :]
    return jnp.sum(d * d, axis=-1)


def grid_sq_dists_idx(bmu: jnp.ndarray, noc: int, xdim: int,
                      hexa: bool) -> jnp.ndarray:
    """(B, noc) squared grid distances computed EXACTLY from flat unit
    indices: dx from columns and 0.5-offsets, hexa dy^2 = rowdiff^2 *
    0.75 — every term exactly representable in f32, so the bubble
    radius comparison is exact math and agrees with the Pallas kernels'
    identical formulation (ops.pallas_som._neighborhood_w) at exact-
    boundary distances, where the scaled (row * sqrt075) coordinate form
    rounds compiler-dependently."""
    u = jnp.arange(noc, dtype=jnp.int32)
    ucol = (u % xdim).astype(jnp.float32)[None, :]        # (1, noc)
    urow = (u // xdim)[None, :]
    bcol = (bmu % xdim).astype(jnp.float32)[:, None]      # (B, 1)
    brow = (bmu // xdim)[:, None]
    rd = (urow - brow).astype(jnp.float32)
    if hexa:
        dx = (ucol + 0.5 * (urow % 2).astype(jnp.float32)
              - bcol - 0.5 * (brow % 2).astype(jnp.float32))
        return dx * dx + (rd * rd) * 0.75
    dx = ucol - bcol
    return dx * dx + rd * rd


def neighborhood_matrix(
    coords: jnp.ndarray,
    bmu: jnp.ndarray,
    radius: jnp.ndarray,
    alpha: jnp.ndarray,
    gaussian: bool,
) -> jnp.ndarray:
    """(B, noc) adaptation weights (bubble: som_rout.c:472-506,
    gaussian: :511-549).  `alpha` may be a scalar or a per-sample (B,)
    vector (weight= scaling, empty-sample zeroing)."""
    d2 = grid_sq_dists(coords, bmu)
    a = jnp.asarray(alpha, dtype=jnp.float32)
    if a.ndim == 1:
        a = a[:, None]
    if gaussian:
        return a * jnp.exp(-d2 / (2.0 * radius * radius))
    return jnp.where(d2 <= radius * radius, a, 0.0)


def derive_grid_geometry(coords) -> Tuple[int, bool]:
    """(xdim, hexa) back from a unit_coords table.

    Needs concrete coordinates (call before/outside jit): row 1 starts at
    the first index whose y > 0; hexa iff that y is sqrt(0.75)."""
    c = np.asarray(coords)
    noc = c.shape[0]
    nz = np.nonzero(c[:, 1] > 0)[0]
    if nz.size == 0:
        return noc, False  # single-row map: hexa offsets never apply
    xdim = int(nz[0])
    hexa = bool(abs(c[xdim, 1] - np.sqrt(0.75)) < 1e-4)
    return xdim, hexa


@functools.partial(
    jax.jit, static_argnames=("gaussian", "update", "use_pallas", "xdim", "hexa")
)
def som_batch_step(
    codes: jnp.ndarray,
    xb: jnp.ndarray,
    coords: jnp.ndarray,
    alpha,
    radius,
    gaussian: bool = False,
    update: str = "sum",
    use_pallas: bool = True,
    xdim: Optional[int] = None,
    hexa: bool = True,
    mask: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    fixed_bmu: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One minibatch SOM step: fused winner search + W^T X update.

    update='sum':  codes += sum_b W_bj (x_b - m_j)   (accumulated online,
                   saturating-guarded — see _guarded_sum_update)
    update='mean': blend toward (W^T X)_j / (W^T 1)_j  (batch SOM)
    With the guard the two coincide: 'sum' is exact accumulation while a
    unit's weight mass <= 1 and saturates at the 'mean' target beyond.

    Reference training-loop semantics carried onto the batch path
    (som_rout.c:612-640): `weights` (B,) scales each sample's alpha as
    1-(1-a)^w; `fixed_bmu` (B,) int32 >= 0 bypasses winner search for
    fixed-point samples; `mask` (B, D) excludes masked comps from both
    the winner distance and the update, and all-masked (empty) samples
    are skipped.

    Pass static `xdim`/`hexa` (see derive_grid_geometry) on the pallas
    path: the update kernel then receives raw BMU indices and computes
    all grid coordinates internally from iota — 2-wide coordinate arrays
    like coords[bmu] have a pathological TPU layout whose relayout costs
    more than the entire update (~0.5 ms at B=1024, N=65536).
    """
    # per-sample effective alpha (som_rout.c:622-624); empty samples -> 0
    a = jnp.broadcast_to(jnp.asarray(alpha, dtype=jnp.float32), xb.shape[:1])
    if weights is not None:
        w = jnp.where(weights > 0.0, weights, 1.0).astype(jnp.float32)
        a = 1.0 - jnp.power(1.0 - a, w)
    if mask is not None:
        a = jnp.where(jnp.all(mask != 0, axis=-1), 0.0, a)

    if use_pallas:
        from ..ops.pallas_distance import dist_argmin

        _, bmu = dist_argmin(xb, codes, mask=mask)
        if fixed_bmu is not None:
            bmu = jnp.where(fixed_bmu >= 0, fixed_bmu, bmu)
        if xdim is not None:
            # fully fused path: neither W (B, noc) nor (., 2) coordinate
            # arrays ever exist
            from ..ops.pallas_som import som_neighborhood_update_idx

            return som_neighborhood_update_idx(
                codes, xb, bmu, xdim, hexa, a, radius, gaussian=gaussian,
                mask=mask,
            )
    else:
        from ..ops.distance import find_winners

        bmu, _ = find_winners(xb, codes, mask)
        if fixed_bmu is not None:
            bmu = jnp.where(fixed_bmu >= 0, fixed_bmu, bmu)
    if xdim is not None:
        # exact index-based grid distances: agrees with the Pallas
        # kernels' bubble boundary decisions bit-for-bit (see
        # grid_sq_dists_idx); coords-based fallback when the caller has
        # only a coordinate table
        d2 = grid_sq_dists_idx(bmu, codes.shape[0], xdim, hexa)
        aa = a[:, None] if a.ndim == 1 else jnp.asarray(a, jnp.float32)
        if gaussian:
            W = aa * jnp.exp(-d2 / (2.0 * radius * radius))
        else:
            W = jnp.where(d2 <= radius * radius, aa, 0.0)
    else:
        W = neighborhood_matrix(coords, bmu, radius, a, gaussian)  # (B, noc)
    if mask is not None:
        keep = 1.0 - mask.astype(jnp.float32)
        wx = jax.lax.dot_general(
            W, xb * keep, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (noc, D)
        # per-(unit, comp) weight mass: masked comps contribute nothing
        wsum = jax.lax.dot_general(
            W, keep, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (noc, D)
    else:
        wx = jax.lax.dot_general(
            W, xb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (noc, D)
        wsum = jnp.sum(W, axis=0)[:, None]  # (noc, 1)
    return _guarded_sum_update(codes, wx, wsum)


def _guarded_sum_update(codes, wx, wsum):
    """codes + (wx - wsum*codes), saturated for stability.

    The raw accumulated-online update is exact only while a unit's total
    neighborhood weight wsum <= 1; beyond that (large B x alpha x wide
    gaussian) the multiplier (1 - wsum) goes negative and training
    diverges.  Saturate at the batch weighted mean: identical result for
    wsum <= 1, a full blend to wx/wsum otherwise — the sequential
    reference can never overshoot past its samples (som_rout.c:472-549
    applies alpha <= 1 per sample), and neither does this."""
    safe = jnp.maximum(wsum, 1e-30)
    blend = jnp.minimum(wsum, 1.0)
    return codes + blend * (wx / safe - codes)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def olvq1_batch_step(
    codes: jnp.ndarray,
    code_labels: jnp.ndarray,
    alphas: jnp.ndarray,
    xb: jnp.ndarray,
    xlabels: jnp.ndarray,
    clip: float = 0.3,
    use_pallas: bool = True,
    mask: Optional[jnp.ndarray] = None,
    m2: Optional[jnp.ndarray] = None,
):
    """One minibatch olvq1 step: winners for B samples, signed
    segment-sum update, per-code alpha adaptation (lvq_rout.c:650-673
    batched; winners sharing a code within the batch accumulate).
    `mask` (B, D) excludes masked comps from the winner distance and the
    update (lvq_pak.c:63-72, :349-356).

    `m2` = optional maintained ||m||^2 (N,): passed to the winner kernel
    (skipping its full-codebook norm recompute) and returned updated as a
    third output — only the <= B winner rows are re-normed (a (B, D)
    gather instead of an (N, D) read; the large-N steady-state path)."""
    if use_pallas:
        from ..ops.pallas_distance import dist_argmin

        _, bmu = dist_argmin(xb, codes, m2=m2, mask=mask)
    else:
        from ..ops.distance import find_winners

        bmu, _ = find_winners(xb, codes, mask)
    noc = codes.shape[0]
    correct = code_labels[bmu] == xlabels  # (B,)
    a = alphas[bmu]
    sign = jnp.where(correct, a, -a)  # (B,)
    delta = sign[:, None] * (xb - codes[bmu])
    if mask is not None:
        delta = jnp.where(mask != 0, 0.0, delta)
    upd = jax.ops.segment_sum(delta, bmu, num_segments=noc)
    ncorrect = jax.ops.segment_sum(correct.astype(jnp.float32), bmu, num_segments=noc)
    nwrong = jax.ops.segment_sum((~correct).astype(jnp.float32), bmu, num_segments=noc)
    # apply the alpha recurrences once per hit: a/(1+a) applied k times
    # equals a/(1+k a); a/(1-a) likewise, but its closed form blows up
    # when k*a >= 1 — the sequential reference clips after EVERY sample
    # (lvq_rout.c:668-672) so alpha stays in (0, clip]; saturate to clip
    # whenever the batched denominator leaves that regime
    new_a = alphas / (1.0 + ncorrect * alphas)
    denom = 1.0 - nwrong * new_a
    grown = jnp.where(denom > 1e-6, new_a / jnp.where(denom > 1e-6, denom, 1.0), clip)
    new_a = jnp.where(nwrong > 0, jnp.minimum(grown, clip), new_a)
    codes_new = codes + upd
    if m2 is None:
        return codes_new, new_a
    m2_new = m2.at[bmu].set(jnp.sum(codes_new[bmu] ** 2, axis=1))
    return codes_new, new_a, m2_new


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def lvq1_batch_step(
    codes: jnp.ndarray,
    code_labels: jnp.ndarray,
    xb: jnp.ndarray,
    xlabels: jnp.ndarray,
    alpha,
    use_pallas: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One minibatch lvq1 step: signed segment-sum toward/away from the
    winner (lvq1_training, lvq_rout.c:498-577 batched); `mask` as in
    olvq1_batch_step."""
    if use_pallas:
        from ..ops.pallas_distance import dist_argmin

        _, bmu = dist_argmin(xb, codes, mask=mask)
    else:
        from ..ops.distance import find_winners

        bmu, _ = find_winners(xb, codes, mask)
    noc = codes.shape[0]
    correct = code_labels[bmu] == xlabels
    sign = jnp.where(correct, alpha, -alpha)
    delta = sign[:, None] * (xb - codes[bmu])
    if mask is not None:
        delta = jnp.where(mask != 0, 0.0, delta)
    return codes + jax.ops.segment_sum(delta, bmu, num_segments=noc)


@functools.partial(jax.jit, static_argnames=("lvq3", "use_pallas"))
def lvq23_batch_step(
    codes: jnp.ndarray,
    code_labels: jnp.ndarray,
    xb: jnp.ndarray,
    xlabels: jnp.ndarray,
    alpha,
    winlen,
    epsilon=0.0,
    lvq3: bool = False,
    use_pallas: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One minibatch lvq2.1/lvq3 step: fused top-2 winner search, the
    window predicate d1/d2 > (1-w)/(1+w), and the signed pair update
    (lvq_rout.c:702-916 batched).  lvq3 adds the same-class epsilon pull.
    `mask` as in olvq1_batch_step."""
    if use_pallas:
        from ..ops.pallas_distance import dist_top2

        d1, i1, d2, i2 = dist_top2(xb, codes, mask=mask)
    else:
        from ..ops.distance import topk_winners

        idx, vals = topk_winners(xb, codes, 2, mask)
        i1, i2 = idx[:, 0], idx[:, 1]
        d1, d2 = vals[:, 0], vals[:, 1]
    noc = codes.shape[0]
    l1, l2 = code_labels[i1], code_labels[i2]
    wl = (1.0 - winlen) / (1.0 + winlen)
    in_window = d1 / jnp.maximum(d2, 1e-30) > wl

    differ = l1 != l2
    one_matches = (l1 == xlabels) | (l2 == xlabels)
    window_rule = differ & one_matches & in_window
    # orient: b = the code matching the sample's label
    swap = l2 == xlabels
    b_idx = jnp.where(swap, i2, i1)
    nb_idx = jnp.where(swap, i1, i2)
    a_b = jnp.where(window_rule, alpha, 0.0)
    keep = 1.0 if mask is None else (1.0 - mask.astype(jnp.float32))
    delta = jax.ops.segment_sum(
        a_b[:, None] * keep * (xb - codes[b_idx]), b_idx, num_segments=noc
    ) + jax.ops.segment_sum(
        -a_b[:, None] * keep * (xb - codes[nb_idx]), nb_idx, num_segments=noc
    )
    if lvq3:
        same = (l1 == l2) & (l1 == xlabels)
        ae = jnp.where(same, alpha * epsilon, 0.0)
        delta = delta + jax.ops.segment_sum(
            ae[:, None] * keep * (xb - codes[i1]), i1, num_segments=noc
        ) + jax.ops.segment_sum(
            ae[:, None] * keep * (xb - codes[i2]), i2, num_segments=noc
        )
    return codes + delta


def som_train_fast(
    codes: Dataset,
    data: Dataset,
    rlen: int,
    alpha: float,
    radius: float,
    batch_size: int = 1024,
    update: str = "sum",
    seed: int = 0,
) -> Dataset:
    """Minibatch SOM training driver: rlen counts *samples* like the
    reference, grouped into batches; schedules follow the reference decay
    evaluated at each batch's first sample."""
    from dataclasses import replace

    if not codes.is_map:
        raise ValueError("not a map codebook")
    gaussian = codes.neigh == Neighborhood.GAUSSIAN
    coords = unit_coords(codes.xdim, codes.ydim, codes.topol == Topology.HEXA)

    nb = max(1, rlen // batch_size)
    talp = alpha_schedule(rlen, alpha)[:: max(1, batch_size)][:nb]
    trad = radius_schedule(rlen, radius)[:: max(1, batch_size)][:nb]

    key = jax.random.PRNGKey(seed)
    # keep the feature axis lane-padded (multiple of 128) for the whole
    # run: zero columns leave distances and updates unchanged, and the
    # kernels then skip their per-step pad/slice copies of the codebook
    D = codes.dim
    Dp = -(-D // 128) * 128
    X = jnp.zeros((data.n, Dp), jnp.float32).at[:, :D].set(jnp.asarray(data.points))
    M = jnp.zeros((codes.n, Dp), jnp.float32).at[:, :D].set(jnp.asarray(codes.points))
    n = data.n

    steps = jax.random.randint(key, (nb, batch_size), 0, n)
    talp_j = jnp.asarray(talp)
    trad_j = jnp.asarray(trad)

    # host loop over batches of ONE jitted step — not lax.scan: compiling
    # device loops through the TPU tunnel takes minutes (CLAUDE.md), and
    # the per-batch dispatch is negligible against the step's matmuls
    use_pallas = jax.default_backend() == "tpu"
    for b in range(nb):
        xb = X[steps[b]]
        M = som_batch_step(M, xb, coords, talp_j[b], trad_j[b],
                           gaussian=gaussian, update=update,
                           use_pallas=use_pallas,
                           xdim=codes.xdim,
                           hexa=codes.topol == Topology.HEXA)
    return replace(codes, points=np.asarray(M)[:, :D], comments=[])
