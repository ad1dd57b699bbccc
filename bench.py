"""Headline benchmark: fused SOM training-step throughput per chip.

Workload: one complete training step at the BASELINE.md pod-scale SOM
shape (B=1024 samples x N=65536 codes x D=64 real / 128 lane-padded,
single chip) through the single-pass FUSED kernel
(ops/pallas_som.som_fused_train_step): neighborhood update of batch t
and winner search of batch t+1 in ONE pass over the codebook — one
codebook read + one write per step, with ||m||^2 never materialized in
HBM.  The headline sweeps the kernel's configurations (plain vs
separable-neighborhood "factored" weights, real-D winner contraction,
f32 vs bf16-resident codebook, tile_n) and reports the best; every
swept config's step time is in `extra` so the win is attributable.

The metric is codebook-distance evaluations per second per chip (B*N
per step); vs_baseline compares against the reference C package's
measured 63 M evals/s (vsom hot loop incl. neighborhood adapt, 1 CPU
core — BASELINE.md).  Roofline: both an in-process HBM triad probe and
an in-process MXU matmul probe are measured; the step's floor under
each is computed from its actual bytes/FLOPs and `roofline_pct` is
taken against the BINDING (larger-floor) resource, with the
padded-vs-useful split (D=64 real work inside 128 lanes) reported
honestly.

Phases: (1) WARM — compile every config (persistent cache at
SOMVQ_COMPILE_CACHE makes reruns cheap), bounded by
SOMVQ_BENCH_COMPILE_BUDGET_S, essential configs first so one slow
compile phase can no longer starve the whole evidence base (the r02
failure mode); (2) MEASURE — budget clock (SOMVQ_BENCH_BUDGET_S)
starts only now; each warmed config measures in well under a second.

Prints ONE JSON line whose LAST key is a compact `summary` object
repeating every verdict-grade number (the driver records only the tail
of the line).  Timing methodology: chained dispatches with a real data
dependency (each step's outputs feed the next) so XLA cannot elide
work, ended by an actual HOST FETCH of the result, at two chain
lengths — the per-step time is the SLOPE (T(long) - T(short)) /
(long - short), which cancels both the per-dispatch floor and any
readiness-tracking slack in the TPU tunnel (block_until_ready alone
has been observed to return early through the tunnel, inflating
throughput ~10x; a fetched value cannot lie).  Comparison sets
(the fused-config sweep, the headline + skeleton + probes, the sharded
family, the throughput extras) measure as round-robin INTERLEAVED
groups with same-window anchors; dispatch/collective-bound chains
aggregate min-above-half-median (heavy-tailed contention pockets),
everything else the median.  See PERF.md for the round-by-round
history (the r01 figure recorded before this methodology is retracted
there) and the r5 estimator analysis."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# persistent compilation cache: first compiles through the TPU tunnel can
# take minutes in contended phases; cached executables make reruns cheap
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SOMVQ_COMPILE_CACHE",
                                     "/tmp/somvq_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from som_lvq_pak_tpu.models.fast import olvq1_batch_step
from som_lvq_pak_tpu.ops.pallas_distance import dist_argmin
from som_lvq_pak_tpu.ops.pallas_som import (
    som_fused_train_step,
    som_neighborhood_update_idx,
)

B, N, D = 1024, 65536, 64
DP = 128  # lane-padded feature axis, resident across steps
XDIM = 256  # N = 256 x 256 hexa map
BASELINE_EVALS_PER_S = 63e6  # reference vsom, 1 CPU core (BASELINE.md)
PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak (bf16); f32 inputs are truncated
ALPHA, RADIUS = jnp.float32(0.02), jnp.float32(3.0)


def slope_time(chain, short=50, long_=200, best_of=3):
    """True per-step seconds: `chain(iters)` runs a warm dependent chain
    of `iters` steps ending in a host fetch and returns its wall time;
    the (long - short) slope cancels dispatch floor and readiness slack.
    Non-positive slopes (pure noise: the short chain outran the long
    one) are discarded and the MEDIAN of the rest is reported (a lucky
    near-zero slope must not win); if every repeat is noise, fall back
    to the smallest long-chain average as an upper bound."""
    slopes = []
    longs = []
    for _ in range(best_of):
        ts, tl = chain(short), chain(long_)
        slopes.append((tl - ts) / (long_ - short))
        longs.append(tl / long_)
    pos = sorted(s for s in slopes if s > 0)
    if not pos:
        return min(longs)
    return pos[len(pos) // 2]


def interleave_medians(specs, rounds=3, agg="median"):
    """Round-robin slope measurement of a COMPARISON GROUP: one
    (short, long) slope sample per chain per round, cycling through the
    group, so every chain's repeats sample the same chip phase — the
    r4 driver record showed that measuring related extras sequentially
    lets a mid-process phase shift (PERF.md documents 2-13x swings)
    masquerade as a config difference (VERDICT r4 task 2).

    `specs`: {name: (chain, short, long)}.  Returns ({name: dt_or_None},
    fallback_names): a name lands in `fallback_names` when every slope
    sample was noise and the min long-chain AVERAGE (an upper bound that
    still carries per-dispatch overhead) substituted — ratio consumers
    must not treat such values as slopes (review finding r5).

    `agg="min"` takes the smallest positive slope NO LOWER than half
    the median: the capability estimator for dispatch/collective-bound
    chains (the sharded steps), whose rounds suffer HEAVY-TAILED
    contention pockets — a same-process probe saw both the mixed and
    the fused TP step wander 412-1518 us across interleaved rounds
    while the other stayed at its floor, so a median can latch onto a
    pocket that hit one config's rounds by chance (the r5 run-3/5 mixed
    dips).  The half-median floor rejects the opposite artifact: a
    short/long pair STRADDLING a pocket yields a spuriously tiny slope
    (short chain slow, long chain fast -> slope far below the true
    floor) that a raw min would latch onto.

    Returns (values, fallback_names, failed_names) — `failed_names`
    are chains whose measurement raised (recorded by callers so a
    missing metric is distinguishable from a skipped compile)."""
    slopes = {n: [] for n in specs}
    longs = {n: [] for n in specs}
    failed = set()
    for _ in range(rounds):
        for n, (ch, s, l) in specs.items():
            if n in failed:
                continue
            try:
                ts, tl = ch(s), ch(l)
                slopes[n].append((tl - ts) / (l - s))
                longs[n].append(tl / l)
            except Exception:
                failed.add(n)
    out = {}
    fallback = set()
    for n in specs:
        pos = sorted(x for x in slopes[n] if x > 0)
        if pos:
            med = pos[len(pos) // 2]
            if agg == "min":
                sane = [x for x in pos if x >= 0.5 * med]
                out[n] = sane[0] if sane else med
            else:
                out[n] = med
        elif longs[n]:
            out[n] = min(longs[n])
            fallback.add(n)
        else:
            out[n] = None
    return out, fallback, failed


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------

HBM_PROBE_BYTES = 2 * 256 * 1024 * 1024 * 4   # triad read + write, 1 GB array
MXU_PROBE_FLOPS = 2 * 4096**3                  # one 4096^3 matmul


def prep_hbm_probe():
    """In-process HBM bandwidth probe: chained donated triad on 1 GB,
    slope-timed like every other config.  Returns the raw chain;
    bandwidth = HBM_PROBE_BYTES / slope."""
    big = jnp.ones((256 * 1024 * 1024,), jnp.float32)
    triad = jax.jit(lambda x: x * 1.0001 + 1.0)

    def chain(iters):
        o = triad(big)
        _ = float(np.asarray(o[0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            o = triad(o)
        _ = float(np.asarray(o[0]))
        return time.perf_counter() - t0

    chain(1)  # compile
    return chain


def prep_mxu_probe():
    """In-process achievable MXU rate: 4096^3 bf16 matmul (134 GFLOP per
    step), chained with a data dependency.  This is the fair in-process
    'speed of light' to compare kernels against on a shared chip whose
    clock phase shifts hour to hour.  Returns the raw chain;
    rate = MXU_PROBE_FLOPS / slope."""
    k = jax.random.PRNGKey(7)
    a = jax.random.normal(k, (4096, 4096), dtype=jnp.bfloat16)
    b0 = jax.random.normal(k, (4096, 4096), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.bfloat16))

    def chain(iters):
        o = mm(a, b0)
        _ = float(np.asarray(o[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            o = mm(o, b0)
        _ = float(np.asarray(o[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


# ---------------------------------------------------------------------------
# headline sweep: fused-step configurations
# ---------------------------------------------------------------------------

def prep_fused(codes0, xb, xn, bmu0, *, tile_n, factored, d_real, **kw):
    """kw passes through to som_fused_train_step (batch_chunk, stagger,
    wxa_bf16, batch_bf16 — the r4 large-B kernel knobs)."""
    @jax.jit
    def step(c, bm, x, xnext):
        c2, bm2, _ = som_fused_train_step(
            c, x, bm, xnext, XDIM, True, ALPHA, RADIUS,
            gaussian=True, tile_n=tile_n, factored=factored, d_real=d_real,
            **kw,
        )
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
    # returns the RAW chain: the sweep interleaves all fused configs
    # round-robin so every config's repeats sample the same chip phase
    # (sequential per-config best-of-3 lets a phase shift masquerade as
    # a config difference)
    return chain


# ---------------------------------------------------------------------------
# extras
# ---------------------------------------------------------------------------

def prep_unfused(codes0, xb):
    """The r1-style step: per-step norm recompute + dist + update."""
    @jax.jit
    def step(c, x):
        m2 = jnp.sum(c * c, axis=-1)
        _, bmu = dist_argmin(x, c, m2, tile_b=512, tile_n=1024)
        return som_neighborhood_update_idx(
            c, x, bmu, XDIM, True, ALPHA, RADIUS, gaussian=True,
        )

    def chain(iters):
        c = step(codes0, xb)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c = step(c, xb)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def prep_dist(codes0, xb):
    """Bare dist+argmin at two tilings (reported separately so a bad
    tiling or a compile failure of one cannot silently poison the
    extra).  r02 forced (1024, 4096) whose f32 distance block sits AT
    the ~16 MB scoped-VMEM limit and measured slower than the full fused
    step; the kernel default (256, 512) and a mid tiling are both
    measured.  Returns {name: chain}."""
    m2 = jnp.sum(codes0 * codes0, axis=-1)
    fns = {
        "dist_t256x512": jax.jit(
            lambda x, c: dist_argmin(x, c, m2, tile_b=256, tile_n=512)[0]),
        "dist_t512x1024": jax.jit(
            lambda x, c: dist_argmin(x, c, m2, tile_b=512, tile_n=1024)[0]),
    }

    def make_chain(f):
        def chain(iters):
            v = f(xb, codes0)
            _ = float(np.asarray(v[0]))
            t0 = time.perf_counter()
            for _i in range(iters):
                v = f(v[:, None] * 0 + xb, codes0)  # dependency via v
            _ = float(np.asarray(v[0]))
            return time.perf_counter() - t0
        return chain

    chains = {n: make_chain(f) for n, f in fns.items()}
    for c in chains.values():
        c(1)
    return chains


def prep_olvq1(codes0, xb):
    k = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(k)
    clab = jax.random.randint(k1, (N,), 1, 21)
    xlab = jax.random.randint(k2, (B,), 1, 21)
    alphas = jnp.full((N,), 0.3, dtype=jnp.float32)
    m20 = jnp.sum(codes0 * codes0, axis=-1)
    step = jax.jit(lambda c, a, m2, x: olvq1_batch_step(
        c, clab, a, x, xlab, m2=m2))

    def chain(iters):
        c, a, m = step(codes0, alphas, m20, xb)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, a, m = step(c, a, m, xb)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def run_e2e_1m_65k():
    """The BASELINE.md north-star workload, literally: a 256x256 hexa
    gaussian map (65,536 codes) trained over 1,000,000 synthetic 64-dim
    vectors (one lap, B=4096 through the batch-chunked fused kernel),
    then the fast qerror over all 1M vectors.  Wall numbers include host
    streaming + tunnel transfers (~256 MB each way); compiles excluded
    via a warmup fit/eval."""
    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.som import find_qerror, randinit
    from som_lvq_pak_tpu.models.trainer import SOMTrainer
    from som_lvq_pak_tpu.utils.rng import CRandom

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 4.0, size=(16, 64)).astype(np.float32)
    NTOT = 1_000_000
    X = (centers[rng.integers(0, 16, size=NTOT)]
         + rng.normal(0, 1.0, size=(NTOT, 64)).astype(np.float32))
    data = Dataset(points=X)
    crng = CRandom()
    crng.init_random(123)
    codes = randinit(data, topol=Topology.HEXA, neigh=Neighborhood.GAUSSIAN,
                     xdim=256, ydim=256, rng=crng)

    def stream(total):
        chunk = 16384
        sent = 0
        while sent < total:
            lo = sent % NTOT
            hi = min(lo + chunk, NTOT)
            yield Dataset(points=X[lo:hi])
            sent += hi - lo

    bs = 4096
    warm = SOMTrainer(codes, batch_size=bs, use_pallas=True)
    wout = warm.fit(stream(2 * bs), rlen=2 * bs, alpha=0.05, radius=64,
                    allow_short_stream=True)
    # device-resident eval target (see run_e2e_config4): the 256 MB
    # already crossed the tunnel during training; the timed eval must
    # measure EVALUATION.  The warm eval runs at the FULL 1M shape so
    # the single-dispatch whole-array executable (r5 fast qerror) is
    # compiled before the clock starts.
    data_dev = Dataset(points=jnp.asarray(X))
    jax.block_until_ready(data_dev.points)
    find_qerror(wout, data_dev, mode="fast")

    trainer = SOMTrainer(codes, batch_size=bs, use_pallas=True)
    t0 = time.perf_counter()
    out = trainer.fit(stream(NTOT), rlen=NTOT, alpha=0.05, radius=64,
                      allow_short_stream=True)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    q = find_qerror(out, data_dev, mode="fast") / data.n
    t_eval = time.perf_counter() - t0
    # bf16 input stream: halves the tunnel bytes (the measured H2D path
    # runs ~25-45 MB/s, so the f32 lap pays ~6-10 s of transfer); the
    # quality delta is gated in tests and reported here
    tr16 = SOMTrainer(codes, batch_size=bs, use_pallas=True,
                      stream_bf16=True)
    tr16.fit(stream(2 * bs), rlen=2 * bs, alpha=0.05, radius=64,
             allow_short_stream=True)  # warm the bf16 transfer/step shapes
    tr16 = SOMTrainer(codes, batch_size=bs, use_pallas=True,
                      stream_bf16=True)
    t0 = time.perf_counter()
    out16 = tr16.fit(stream(NTOT), rlen=NTOT, alpha=0.05, radius=64,
                     allow_short_stream=True)
    t_train16 = time.perf_counter() - t0
    q16 = find_qerror(out16, data_dev, mode="fast") / data.n
    steps = NTOT // bs
    return {
        "train_s": round(t_train, 2),
        "qerror_eval_s": round(t_eval, 2),
        "qerror_per_sample": round(q, 4),
        "evals_per_s": round(steps * bs * 65536 / t_train),
        "train_bf16_stream_s": round(t_train16, 2),
        "qerror_bf16_stream": round(q16, 4),
        "shape": "256x256 hexa gaussian map, 1M x 64-dim streamed, 1 lap",
    }


def prep_sharded(codes0, xb):
    """TP+DP sharded step on a 1-device mesh: records the shard_map +
    collective machinery overhead on real hardware (multi-chip execution
    itself is validated by dryrun_multichip on a virtual mesh)."""
    from som_lvq_pak_tpu.models.fast import unit_coords
    from som_lvq_pak_tpu.parallel.mesh import make_mesh
    from som_lvq_pak_tpu.parallel.sharded import (
        make_sharded_som_train_step,
        shard_arrays,
    )

    mesh = make_mesh(1, data=1, model=1)
    coords = unit_coords(XDIM, N // XDIM, hexa=True)
    step = make_sharded_som_train_step(mesh, gaussian=True, use_pallas=True)
    cs, xs, cl, cf = shard_arrays(mesh, codes0, xb, coords)

    def chain(iters):
        c = step(cs, xs, cl, cf, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c = step(c, xs, cl, cf, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def prep_sharded_fused(codes0, xb, bmu0, tile_n=512):
    """Fused TP step on a 1-device model-only mesh: one pass per
    codebook shard + allgather-min winner, vs the unfused sharded
    step's separate winner + update passes (sharded_1chip_mesh).
    `tile_n` exposes the A/B the r4 verdict asked for: 512 is the bench
    tile every round; 256 is what SOMTrainer's auto-pick would choose
    for small shard heights after the divides-shard-height clamp
    (commit 6345bc3) — measured in ONE process to separate a real
    tile-geometry regression from chip phase."""
    from som_lvq_pak_tpu.parallel.mesh import make_mesh
    from som_lvq_pak_tpu.parallel.sharded import (
        make_sharded_fused_som_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(1, data=1, model=1)
    step = make_sharded_fused_som_train_step(
        mesh, gaussian=True, xdim=XDIM, hexa=True, tile_n=tile_n, d_real=D)
    cs = jax.device_put(codes0, NamedSharding(mesh, P("model", None)))

    def chain(iters):
        c, bm = step(cs, xb, bmu0, xb, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, bm = step(c, xb, bm, xb, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def prep_sharded_mixed(codes0, xb, bmu0):
    """Mixed data x model fused step on the 1-device mesh: accumulate
    (no codebook I/O) + psum + blend + winner.  The composed-DPxTP
    replacement for the two-pass sharded step (VERDICT r3 task 4: the
    done-bar is >= 3x over sharded_step_us_1chip_mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from som_lvq_pak_tpu.parallel.mesh import make_mesh
    from som_lvq_pak_tpu.parallel.sharded import (
        make_mixed_fused_som_train_step,
    )

    mesh = make_mesh(1, data=1, model=1)
    step = make_mixed_fused_som_train_step(
        mesh, gaussian=True, xdim=XDIM, hexa=True, tile_n=512, d_real=D)
    cs = jax.device_put(codes0, NamedSharding(mesh, P("model", None)))

    def chain(iters):
        c, bm = step(cs, xb, bmu0, xb, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, bm = step(c, xb, bm, xb, ALPHA, RADIUS)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def _skeleton_kernel(w_ref, x_ref, xn_ref, codes_ref, out_ref, vmax_ref,
                     *, tile_n, batch_chunk, d_real):
    """Matmul-only SKELETON of the fused step: the same grid, tiles, and
    two MXU contractions per tile (update K=batch-chunk, winner
    K=d_real) with NO weight generation, NO blend, NO argmax — the
    attainable ceiling for any implementation of this exact computation
    on this chip.  Measured r4: 59-67 % of the square-4096^3 probe —
    i.e. the gap between the full kernel and the square-matmul roofline
    is dominated by the MXU's own efficiency at these shapes, not by
    kernel epilogue work (the full kernel runs at ~93-99 % of this
    skeleton).  See PERF.md."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    B = x_ref.shape[0]
    BC = batch_chunk
    acc = jnp.zeros((tile_n, x_ref.shape[1]), jnp.float32)
    for c in range(B // BC):
        sl = pl.ds(c * BC, BC)
        acc = acc + jax.lax.dot_general(
            w_ref[:, sl], x_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    newc = codes_ref[:] + acc * 1e-30   # touch codes, keep the chain real
    out_ref[:] = newc
    cw = newc[:, :d_real].astype(xn_ref.dtype)
    for c in range(B // BC):
        sl = pl.ds(c * BC, BC)
        mx = jax.lax.dot_general(
            cw, xn_ref[sl, :d_real], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lm = jnp.max(mx, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            vmax_ref[:, sl] = lm

        @pl.when(i > 0)
        def _():
            vmax_ref[:, sl] = jnp.maximum(vmax_ref[:, sl], lm)


def prep_skeleton(Bc, bc, batch_bf16):
    """Chain for the skeleton kernel at batch size Bc; the headline's
    attainable floor = this skeleton's step time (same window)."""
    import functools

    from jax.experimental import pallas as pl_
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def step(codes, w, x):
        return pl_.pallas_call(
            functools.partial(_skeleton_kernel, tile_n=256,
                              batch_chunk=bc, d_real=D),
            grid=(N // 256,),
            in_specs=[
                pl_.BlockSpec((256, Bc), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                pl_.BlockSpec((Bc, DP), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                pl_.BlockSpec((Bc, DP), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                pl_.BlockSpec((256, DP), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl_.BlockSpec((256, DP), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                pl_.BlockSpec((1, Bc), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((N, DP), jnp.float32),
                       jax.ShapeDtypeStruct((1, Bc), jnp.float32)],
            cost_estimate=pl_.CostEstimate(
                flops=2 * Bc * N * DP + 2 * Bc * N * D,
                bytes_accessed=2 * N * DP * 4, transcendentals=0),
        )(w, x, x, codes)

    k = jax.random.PRNGKey(5)
    codes0 = jax.random.normal(k, (N, DP), jnp.float32)
    wdtype = jnp.bfloat16 if batch_bf16 else jnp.float32
    w = (jax.random.uniform(k, (256, Bc)) * 0.001).astype(wdtype)
    x = jax.random.normal(k, (Bc, DP), jnp.float32).astype(wdtype)

    def chain(iters):
        c, v = step(codes0, w, x)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, v = step(c, w, x)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain


def prep_vmem_steps():
    """VMEM-resident K-steps-per-dispatch path at a mid-size map
    (noc=4096 fits VMEM): the codebook never touches HBM between steps."""
    from som_lvq_pak_tpu.ops.pallas_som import som_vmem_train_steps

    noc, Bv, K, xdim = 4096, 512, 32, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    codes = jax.random.normal(k1, (noc, DP), dtype=jnp.float32)
    batches = jax.random.normal(k2, (K, Bv, DP), dtype=jnp.float32)
    alphas = jnp.full((K,), 0.02)
    radii = jnp.full((K,), 3.0)
    _, bmu0 = dist_argmin(batches[0], codes)
    f = jax.jit(lambda c, bs, b0: som_vmem_train_steps(
        c, bs, b0, alphas, radii, xdim, True, gaussian=True, row_chunk=512))

    def chain(iters):
        c, bm = f(codes, batches, bmu0)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, bm = f(c, batches, bm)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain  # per-STEP time = slope / VMEM_K (K steps per dispatch)


VMEM_K, VMEM_NOC, VMEM_B = 32, 4096, 512   # prep_vmem_steps geometry
SOMEX_K, SOMEX_NOC, SOMEX_B = 64, 96, 128  # prep_somexample_shape geometry


def prep_somexample_shape():
    """The reference's own vsom workload shape (96 units x 5 dim, the
    63 M evals/s baseline) through the VMEM-resident path: the
    apples-to-apples comparison at equal codebook size."""
    from som_lvq_pak_tpu.ops.pallas_som import som_vmem_train_steps

    noc, Bv, K, xdim = 96, 128, 64, 12
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    codes = jnp.zeros((noc, DP), jnp.float32).at[:, :5].set(
        jax.random.normal(k1, (noc, 5)))
    batches = jnp.zeros((K, Bv, DP), jnp.float32).at[:, :, :5].set(
        jax.random.normal(k2, (K, Bv, 5)))
    alphas = jnp.full((K,), 0.02)
    radii = jnp.full((K,), 3.0)
    _, bmu0 = dist_argmin(batches[0], codes)
    f = jax.jit(lambda c, bs, b0: som_vmem_train_steps(
        c, bs, b0, alphas, radii, xdim, True, gaussian=False, row_chunk=96))

    def chain(iters):
        c, bm = f(codes, batches, bmu0)
        _ = float(np.asarray(c[0, 0]))
        t0 = time.perf_counter()
        for _i in range(iters):
            c, bm = f(c, batches, bm)
        _ = float(np.asarray(c[0, 0]))
        return time.perf_counter() - t0

    chain(1)
    return chain  # evals/s = SOMEX_NOC * SOMEX_B / (slope / SOMEX_K)


def prep_vfind():
    """Device-parallel vfind: 8 random-seed trials trained AT ONCE
    (models.som.vfind_trials, vmapped minibatch steps) vs the same 8
    trials run one at a time through the identical fast path — the
    speedup of batching the package's only natural fleet workload."""
    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.som import vfind_trials

    rng = np.random.default_rng(9)
    X = rng.normal(0, 1, size=(2048, 16)).astype(np.float32)
    data = Dataset(points=X)
    phases = [(2048, 0.05, 4.0), (2048, 0.02, 2.0)]

    def batched():
        return vfind_trials(data, data, 8, Topology.HEXA,
                            Neighborhood.GAUSSIAN, 16, 16, phases)

    def sequential():
        best = None
        for t in range(8, 0, -1):
            # 8 one-trial calls: same per-trial work (randinit + both
            # training phases + qerror), one trial on device at a time
            _, _, q, qs = vfind_trials(
                data, data, 1, Topology.HEXA, Neighborhood.GAUSSIAN,
                16, 16, phases)
            best = q if best is None else min(best, q)
        return best

    batched()      # compile both shapes (T=8 and T=1 vmapped steps)
    sequential()

    def measure():
        t0 = time.perf_counter()
        _, _, q8, _ = batched()
        t_b = time.perf_counter() - t0
        t0 = time.perf_counter()
        sequential()
        t_s = time.perf_counter() - t0
        return {"batched_8trials_s": round(t_b, 2),
                "sequential_8x1_s": round(t_s, 2),
                "speedup": round(t_s / t_b, 1),
                "best_qerror_per_sample": round(q8 / 2048, 4)}

    return measure


def run_e2e_config4():
    """BASELINE.json config 4, end to end on the real chip: 128x128
    gaussian hexa map on synthetic 100k x 64-dim data, one full lap of
    streamed minibatch training through SOMTrainer (fused kernel path),
    then the fast qerror over all 100k vectors.  Reports wall-clock for
    train and eval separately (compiles excluded via a 2-batch warmup
    fit) plus the final per-sample qerror."""
    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.som import find_qerror, randinit
    from som_lvq_pak_tpu.models.trainer import SOMTrainer
    from som_lvq_pak_tpu.utils.rng import CRandom

    rng = np.random.default_rng(42)
    # 4 gaussian clusters so qerror has structure to find
    centers = rng.normal(0, 4.0, size=(4, 64)).astype(np.float32)
    X = (centers[rng.integers(0, 4, size=100_000)]
         + rng.normal(0, 1.0, size=(100_000, 64)).astype(np.float32))
    data = Dataset(points=X)
    crng = CRandom()
    crng.init_random(123)
    codes = randinit(data, topol=Topology.HEXA, neigh=Neighborhood.GAUSSIAN,
                     xdim=128, ydim=128, rng=crng)

    def stream(total):
        chunk = 8192
        sent = 0
        while sent < total:
            lo = sent % 100_000
            hi = min(lo + chunk, 100_000)
            yield Dataset(points=X[lo:hi])
            sent += hi - lo

    bs = 1024
    # warmup fit compiles the fused step + dist_argmin at this shape;
    # the warm eval compiles the fast-qerror chunk executable (the timed
    # eval below must measure evaluation, not a first-call compile
    # through the tunnel — symmetric with the train-side warmup)
    warm = SOMTrainer(codes, batch_size=bs, use_pallas=True)
    wout = warm.fit(stream(2 * bs), rlen=2 * bs, alpha=0.05, radius=32,
                    allow_short_stream=True)
    find_qerror(wout, data, mode="fast")

    trainer = SOMTrainer(codes, batch_size=bs, use_pallas=True)
    t0 = time.perf_counter()
    out = trainer.fit(stream(100_000), rlen=100_000, alpha=0.05, radius=32,
                      allow_short_stream=True)
    t_train = time.perf_counter() - t0
    # evaluate against a device-resident copy: training already moved
    # every vector once, so the eval measures EVALUATION, not a second
    # redundant host->device pass of the same data
    data_dev = Dataset(points=jnp.asarray(X))
    jax.block_until_ready(data_dev.points)
    t0 = time.perf_counter()
    q = find_qerror(out, data_dev, mode="fast") / data.n
    t_eval = time.perf_counter() - t0
    steps = 100_000 // bs
    return {
        "train_s": round(t_train, 2),
        "qerror_eval_s": round(t_eval, 2),
        "qerror_per_sample": round(q, 4),
        "evals_per_s": round(steps * bs * 128 * 128 / t_train),
        "shape": "128x128 hexa gaussian map, 100k x 64-dim streamed, 1 lap",
    }


def main():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    # lane-padded residents: zero columns leave distances/updates
    # unchanged and kill all per-step pad/slice codebook copies
    codes = jnp.zeros((N, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k1, (N, D), dtype=jnp.float32))
    xb = jnp.zeros((B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k2, (B, D), dtype=jnp.float32) * 3)
    xn = jnp.zeros((B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k3, (B, D), dtype=jnp.float32) * 3)
    codes_bf16 = codes.astype(jnp.bfloat16)
    _, bmu0 = dist_argmin(xb, codes)
    # larger-batch variants: B doubles the MXU work per codebook byte
    # moved — the arithmetic-intensity lever for this compute-bound
    # shape; B >= 4096 runs the r4 batch-chunked kernel (the (TN, B)
    # blocks no longer fit scoped VMEM whole)
    k4, k5 = jax.random.split(jax.random.PRNGKey(1))
    xb2 = jnp.zeros((2 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k4, (2 * B, D), dtype=jnp.float32) * 3)
    xn2 = jnp.zeros((2 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k5, (2 * B, D), dtype=jnp.float32) * 3)
    _, bmu0_2 = dist_argmin(xb2, codes)
    k6, k7 = jax.random.split(jax.random.PRNGKey(2))
    xb4 = jnp.zeros((4 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k6, (4 * B, D), dtype=jnp.float32) * 3)
    xn4 = jnp.zeros((4 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k7, (4 * B, D), dtype=jnp.float32) * 3)
    _, bmu0_4 = dist_argmin(xb4, codes)
    k8, k9 = jax.random.split(jax.random.PRNGKey(3))
    xb8 = jnp.zeros((8 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k8, (8 * B, D), dtype=jnp.float32) * 3)
    xn8 = jnp.zeros((8 * B, DP), jnp.float32).at[:, :D].set(
        jax.random.normal(k9, (8 * B, D), dtype=jnp.float32) * 3)
    _, bmu0_8 = dist_argmin(xb8, codes)

    extra = {}
    t_all = time.perf_counter()

    # ---------------- WARM phase: compile everything, essentials first.
    # The budget clock for MEASUREMENT starts only after this phase, so
    # a slow compile window can cost configs (recorded as such) but can
    # never erase already-compiled sub-second measurements (r02 bug).
    compile_budget = float(os.environ.get(
        "SOMVQ_BENCH_COMPILE_BUDGET_S", "900"))
    # fused-config registry: name -> (B of the config, roofline meta).
    # meta: code_item / batch_item = HBM itemsizes of the codebook and
    # batch residents, d_win = winner contraction depth.  Explicit
    # metadata, not name-parsing — the r3 bench derived itemsize from
    # the substring "bf16" and would mis-floor the bf16-BATCH configs.
    FUSED_META = {
        "fused_fact_dreal_bf16": (B, dict(code_item=2, batch_item=4, d_win=D)),
        "fused_fact_dreal_f32": (B, dict(code_item=4, batch_item=4, d_win=D)),
        "fused_plain_f32_tile512": (B, dict(code_item=4, batch_item=4,
                                            d_win=DP)),
        "fused_fact_dreal_f32_B2048": (2 * B, dict(code_item=4, batch_item=4,
                                                   d_win=D)),
        "fused_fact_dreal_f32_B4096": (
            4 * B, dict(code_item=4, batch_item=4, d_win=D)),
        # K=128 winner contraction at the B=4096 chunked shape: if the
        # winner matmul is latency- rather than depth-bound, this costs
        # ~nothing over d_real=64 and the "structural" useful-MFU story
        # changes (VERDICT r4 task 5)
        "fused_fact_B4096_k128": (
            4 * B, dict(code_item=4, batch_item=4, d_win=DP)),
        "fused_fact_dreal_f32_B8192_xbf16": (
            8 * B, dict(code_item=4, batch_item=2, d_win=D)),
        "fused_fact_f32": (B, dict(code_item=4, batch_item=4, d_win=DP)),
        "fused_plain_bf16_tile512": (B, dict(code_item=2, batch_item=4,
                                             d_win=DP)),
    }
    warm_specs = [
        # headline candidates (essential: always attempted)
        ("fused_fact_dreal_f32_B8192_xbf16", lambda: prep_fused(
            codes, xb8, xn8, bmu0_8, tile_n=256, factored=True, d_real=D,
            batch_chunk=1024, wxa_bf16=True, batch_bf16=True)),
        ("fused_fact_dreal_f32_B4096", lambda: prep_fused(
            codes, xb4, xn4, bmu0_4, tile_n=256, factored=True, d_real=D,
            batch_chunk=1024, wxa_bf16=True)),
        ("fused_fact_B4096_k128", lambda: prep_fused(
            codes, xb4, xn4, bmu0_4, tile_n=256, factored=True, d_real=None,
            batch_chunk=1024, wxa_bf16=True)),
        ("fused_fact_dreal_f32_B2048", lambda: prep_fused(
            codes, xb2, xn2, bmu0_2, tile_n=256, factored=True, d_real=D)),
        ("fused_fact_dreal_f32", lambda: prep_fused(
            codes, xb, xn, bmu0, tile_n=512, factored=True, d_real=D)),
        # probes (cheap, needed for roofline); skeletons = matmul-only
        # twins of the headline candidates (the attainable floor)
        ("hbm_probe", prep_hbm_probe),
        ("mxu_probe", prep_mxu_probe),
        ("skeleton_B8192_xbf16", lambda: prep_skeleton(8 * B, 1024, True)),
        ("skeleton_B4096", lambda: prep_skeleton(4 * B, 1024, False)),
        ("skeleton_B2048", lambda: prep_skeleton(2 * B, 2048, False)),
        ("skeleton_B1024", lambda: prep_skeleton(B, 1024, False)),
        # attribution / comparison configs
        ("fused_fact_dreal_bf16", lambda: prep_fused(
            codes_bf16, xb, xn, bmu0, tile_n=512, factored=True, d_real=D)),
        ("fused_plain_f32_tile512", lambda: prep_fused(
            codes, xb, xn, bmu0, tile_n=512, factored=False, d_real=None)),
        ("fused_fact_f32", lambda: prep_fused(
            codes, xb, xn, bmu0, tile_n=512, factored=True, d_real=None)),
        ("fused_plain_bf16_tile512", lambda: prep_fused(
            codes_bf16, xb, xn, bmu0, tile_n=512, factored=False, d_real=None)),
        ("unfused_r1_style", lambda: prep_unfused(codes, xb)),
        ("dist_kernel", lambda: prep_dist(codes, xb)),
        ("olvq1", lambda: prep_olvq1(codes, xb)),
        ("sharded_1chip_mesh", lambda: prep_sharded(codes, xb)),
        ("sharded_fused_1chip_mesh", lambda: prep_sharded_fused(
            codes, xb, bmu0, tile_n=512)),
        ("sharded_fused_t256_1chip_mesh", lambda: prep_sharded_fused(
            codes, xb, bmu0, tile_n=256)),
        ("sharded_mixed_1chip_mesh", lambda: prep_sharded_mixed(
            codes, xb, bmu0)),
        ("vmem_resident", prep_vmem_steps),
        ("somexample_shape", prep_somexample_shape),
        ("vfind_parallel_trials", prep_vfind),
    ]
    # headline candidates + the probes are always compiled: the
    # roofline block needs hbm_probe AND mxu_probe together
    ESSENTIAL = 10
    measures = {}
    compile_s = {}
    for i, (name, prep) in enumerate(warm_specs):
        if i >= ESSENTIAL and time.perf_counter() - t_all > compile_budget:
            extra[name] = "skipped (compile budget)"
            continue
        t0 = time.perf_counter()
        try:
            measures[name] = prep()
            compile_s[name] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # record, never lose the line
            extra[name] = f"failed: {type(e).__name__}"
    extra["warm_phase_s"] = round(time.perf_counter() - t_all, 1)

    # ---------------- MEASURE phase: budget clock starts here.  Each
    # warmed config measures in < 1 s, so all of them normally run; the
    # only genuinely expensive entry (e2e config 4) goes last.
    t_meas = time.perf_counter()
    budget_s = float(os.environ.get("SOMVQ_BENCH_BUDGET_S", "600"))

    def measure(name, fn=None):
        fn = fn or measures.get(name)
        if fn is None:
            return None
        try:
            return fn()
        except Exception as e:
            extra[name] = f"failed: {type(e).__name__}"
            return None

    # interleaved sweep: one (short, long) slope sample per config per
    # round, three rounds — every config's repeats sample the same chip
    # phase, so a mid-sweep phase shift cannot masquerade as a config
    # difference; per-config value = median positive slope.  These are
    # the SELECTION numbers (reported as sweep_step_us_*); the headline
    # and all derived metrics come from the final same-window block.
    # agg="min" (above half-median): selecting the BEST config is a
    # capability comparison, and under heavy-tailed contention a median
    # lets a pocket-ridden strong config lose to a slow-but-lucky one
    # (run 12 picked plain_f32 over every factored config in a bad
    # window, with attainable_pct 157 % as the tell)
    sweep_dts, sweep_fb, sweep_fail = interleave_medians(
        {n: (measures[n], 50, 200) for n in FUSED_META if n in measures},
        agg="min")
    if sweep_fb:
        extra["sweep_noise_fallbacks"] = sorted(sweep_fb)
    for n in sweep_fail:
        extra[n] = "failed: interleaved sweep chain raised"
    sweep = {}   # name -> (dt, B of the config)
    for name, dt in sweep_dts.items():
        if dt is None:
            extra[name] = "failed: interleaved sweep"
            continue
        Bc = FUSED_META[name][0]
        sweep[name] = (dt, Bc)
        extra["sweep_step_us_" + name[6:]] = round(dt * 1e6, 1)
    # the K=128 winner-contraction A/B (same interleaved window as its
    # d_real=64 twin — VERDICT r4 task 5): ratio > ~1.3 would say the
    # winner matmul IS depth-bound and d_real genuinely saves its flops
    if ("fused_fact_B4096_k128" in sweep
            and "fused_fact_dreal_f32_B4096" in sweep
            and not {"fused_fact_B4096_k128",
                     "fused_fact_dreal_f32_B4096"} & sweep_fb):
        extra["k128_vs_d64_step_ratio"] = round(
            sweep["fused_fact_B4096_k128"][0]
            / sweep["fused_fact_dreal_f32_B4096"][0], 3)
    if not sweep:
        print(json.dumps({
            "metric": "som_train_step_evals_per_s_chip", "value": 0,
            "unit": "no fused config compiled", "vs_baseline": 0,
            "extra": extra}))
        return
    best_name = max(sweep, key=lambda n: sweep[n][1] / sweep[n][0])
    dt_fused, B_best = sweep[best_name]
    evals = B_best * N
    extra["headline_config"] = best_name[6:]

    # ---- SELF-CONSISTENT HEADLINE WINDOW (VERDICT r3 task 2, tightened
    # r5): the headline step, its matmul-only SKELETON, and both probes
    # are measured ROUND-ROBIN in one interleaved window, so every
    # derived metric below (roofline_pct, attainable_pct, MFU) compares
    # numbers from the same chip phase — the r5 run-3 record showed
    # attainable_pct 111 % when the skeleton was timed in a different
    # phase pocket than the step.  If the window's step differs from the
    # sweep median by > 10 % the sweep value stays visible as
    # sweep_step_us_<headline>.
    skel_name = ("skeleton_B8192_xbf16" if B_best == 8 * B else
                 "skeleton_B4096" if B_best == 4 * B else
                 "skeleton_B2048" if B_best == 2 * B else
                 "skeleton_B1024" if B_best == B else None)
    hw = {"headline": (measures[best_name], 50, 200)}
    if skel_name and skel_name in measures:
        hw["skeleton"] = (measures[skel_name], 50, 200)
    if "hbm_probe" in measures:
        hw["hbm_probe"] = (measures["hbm_probe"], 10, 40)
    if "mxu_probe" in measures:
        hw["mxu_probe"] = (measures["mxu_probe"], 10, 40)
    rh, fbh, failh = interleave_medians(hw, rounds=3)
    if fbh:
        extra["headline_window_noise_fallbacks"] = sorted(fbh)
    for n in failh:
        extra["headline_window_" + n] = "failed: chain raised"

    def window_slope(nm):
        # fallback values are long-chain AVERAGES carrying dispatch
        # overhead — the derived roofline/MFU metrics must come from
        # true slopes only (the function's own contract)
        return rh.get(nm) if nm not in fbh else None

    headline_ok = window_slope("headline") is not None
    if headline_ok:
        dt_fused = rh["headline"]
    else:
        extra["headline_window"] = ("no true slope this window; headline "
                                    "uses the sweep median and the "
                                    "roofline metrics are omitted")
    extra["step_us_" + best_name[6:]] = round(dt_fused * 1e6, 1)
    # probes gate on the headline's validity too: a roofline ratio of a
    # sweep-phase step against new-window probes would reintroduce the
    # cross-phase mixing this window exists to eliminate
    bw = (HBM_PROBE_BYTES / window_slope("hbm_probe")
          if headline_ok and window_slope("hbm_probe") else None)
    mxu = (MXU_PROBE_FLOPS / window_slope("mxu_probe")
           if headline_ok and window_slope("mxu_probe") else None)
    if bw:
        extra["hbm_probe_tb_s"] = round(bw / 1e12, 2)
    if mxu:
        extra["mxu_probe_tflops"] = round(mxu / 1e12, 1)

    # ---- roofline for the best config: which resource binds?
    meta = FUSED_META[best_name][1]
    step_bytes = (2 * N * DP * meta["code_item"]
                  + 2 * B_best * DP * meta["batch_item"] + 2 * B_best * 4)
    d_win = meta["d_win"]
    flops_padded = 2 * B_best * N * DP + 2 * B_best * N * d_win  # upd + win
    flops_useful = 4 * B_best * N * D                   # real-D work only
    if bw and mxu:
        hbm_floor = step_bytes / bw
        mxu_floor = flops_padded / mxu
        extra["hbm_floor_us"] = round(hbm_floor * 1e6, 1)
        extra["mxu_floor_us"] = round(mxu_floor * 1e6, 1)
        binding = "mxu" if mxu_floor > hbm_floor else "hbm"
        extra["binding_roofline"] = binding
        extra["roofline_pct"] = round(
            100 * max(hbm_floor, mxu_floor) / dt_fused, 1)
        # the no-overlap bound: if the codebook stream and the matmuls
        # serialized entirely, the step could not beat hbm+mxu
        extra["serial_floor_us"] = round((hbm_floor + mxu_floor) * 1e6, 1)
        extra["pct_of_serial_floor"] = round(
            100 * (hbm_floor + mxu_floor) / dt_fused, 1)
        extra["mfu_pct_padded_vs_probe"] = round(
            100 * flops_padded / dt_fused / mxu, 1)
        extra["mfu_pct_useful_vs_probe"] = round(
            100 * flops_useful / dt_fused / mxu, 1)
    extra["mfu_pct_padded_vs_peak197"] = round(
        100 * flops_padded / dt_fused / (PEAK_BF16_TFLOPS * 1e12), 1)

    # ---- attainable floor: the matmul-only SKELETON of the headline
    # config (same grid/tiles/contractions, zero weight-gen/blend/
    # argmax), measured INTERLEAVED with the headline above.  The
    # square-probe roofline charges the kernel for MXU efficiency that
    # NO implementation of these contraction shapes can reach (the
    # skeleton itself runs at only ~60-67 % of the 4096^3 probe);
    # roofline_attainable_pct is the honest share of the real ceiling.
    skel_dt = window_slope("skeleton") if headline_ok else None
    if skel_dt:
        extra["skeleton_step_us"] = round(skel_dt * 1e6, 1)
        extra["roofline_attainable_pct"] = round(
            100 * skel_dt / dt_fused, 1)
        if mxu:
            extra["skeleton_mxu_eff_pct"] = round(
                100 * flops_padded / skel_dt / mxu, 1)

    # ---- extras, measured as INTERLEAVED COMPARISON GROUPS (VERDICT r4
    # task 2: the r4 driver record's sequential extras contradicted the
    # builder's claims — fused TP 1.05x over two-pass against 4.6x,
    # dist kernel 32x below r3 — because each extra sampled a different
    # chip phase).  Every ratio below is computed between chains sampled
    # round-robin in ONE window; each group carries a same-window anchor
    # (the meshless fused step / the MXU probe) so a global phase shift
    # is visible as the anchor moving, not as a bogus config delta.

    # group 1: the sharded-step family + the meshless fused anchor
    g1 = {}
    if "fused_fact_dreal_f32" in measures:
        g1["anchor_fused_B1024"] = (measures["fused_fact_dreal_f32"], 50, 200)
    for nm in ("sharded_1chip_mesh", "sharded_fused_1chip_mesh",
               "sharded_fused_t256_1chip_mesh", "sharded_mixed_1chip_mesh"):
        if nm in measures:
            g1[nm] = (measures[nm], 50, 200)
    r1, fb1, fail1 = interleave_medians(g1, rounds=6, agg="min")
    extra["sharded_group_agg"] = ("min (>= half-median) of 6 interleaved "
                                  "slope rounds")
    if fb1:
        extra["sharded_group_noise_fallbacks"] = sorted(fb1)
    for n in fail1:
        extra[n] = "failed: chain raised"
    for nm, dt in r1.items():
        if dt is not None:
            extra[("step_us_" + nm) if nm.startswith("anchor")
                  else nm.replace("_1chip_mesh", "_step_us_1chip_mesh")] = \
                round(dt * 1e6, 1)

    def true_slope(r, fb, nm):
        return r.get(nm) if nm not in fb else None

    two_pass = true_slope(r1, fb1, "sharded_1chip_mesh")
    fused_tp = true_slope(r1, fb1, "sharded_fused_1chip_mesh")
    fused_tp256 = true_slope(r1, fb1, "sharded_fused_t256_1chip_mesh")
    mixed = true_slope(r1, fb1, "sharded_mixed_1chip_mesh")
    if two_pass and fused_tp:
        extra["fused_tp_vs_two_pass_speedup"] = round(two_pass / fused_tp, 2)
    if two_pass and mixed:
        extra["mixed_vs_two_pass_speedup"] = round(two_pass / mixed, 2)
    if fused_tp and fused_tp256:
        # the r4-verdict tile A/B: trainer-auto tile 256 vs bench tile
        # 512 in one window — a big ratio here would mean a real
        # tile-geometry regression rather than chip phase
        extra["fused_tp_t256_vs_t512_ratio"] = round(fused_tp256 / fused_tp, 2)

    # group 2: throughput extras + the MXU probe as the phase anchor
    g2 = {}
    if "mxu_probe" in measures:
        g2["mxu_anchor"] = (measures["mxu_probe"], 10, 40)
    if "hbm_probe" in measures:
        # the dist kernel re-streams the whole codebook once per batch
        # tile — HBM-bound, so its cross-run swings track bandwidth
        # weather; the same-window HBM anchor makes that visible
        g2["hbm_anchor"] = (measures["hbm_probe"], 10, 40)
    if "fused_fact_dreal_f32" in measures:
        g2["anchor_fused_B1024"] = (measures["fused_fact_dreal_f32"], 50, 200)
    dist_chains = measures.get("dist_kernel") or {}
    for nm, ch in dist_chains.items():
        g2[nm] = (ch, 50, 200)
    if "olvq1" in measures:
        g2["olvq1"] = (measures["olvq1"], 50, 200)
    if "unfused_r1_style" in measures:
        g2["unfused_r1_style"] = (measures["unfused_r1_style"], 50, 200)
    # the VMEM-resident chains run K steps per dispatch, so their whole
    # (short, long) pair spans only a few ms at the r4 lengths — the
    # driver records swung 2.6-7x on these two across rounds; longer
    # chains put each sample above the pocket timescale
    if "vmem_resident" in measures:
        g2["vmem_resident"] = (measures["vmem_resident"], 20, 80)
    if "somexample_shape" in measures:
        g2["somexample_shape"] = (measures["somexample_shape"], 40, 160)
    r2, fb2, fail2 = interleave_medians(g2, rounds=5, agg="min")
    extra["perf_group_agg"] = ("min (>= half-median) of 5 interleaved "
                               "slope rounds")
    if fb2:
        extra["perf_group_noise_fallbacks"] = sorted(fb2)
    for n in fail2:
        extra[n] = "failed: chain raised"
    if r2.get("mxu_anchor"):
        extra["extras_window_mxu_tflops"] = round(
            MXU_PROBE_FLOPS / r2["mxu_anchor"] / 1e12, 1)
    if r2.get("hbm_anchor"):
        extra["extras_window_hbm_tb_s"] = round(
            HBM_PROBE_BYTES / r2["hbm_anchor"] / 1e12, 2)
    dist_dts = [r2[nm] for nm in dist_chains if true_slope(r2, fb2, nm)]
    for nm in dist_chains:
        if r2.get(nm):
            extra["step_us_" + nm] = round(r2[nm] * 1e6, 1)
    if dist_dts:
        extra["dist_kernel_evals_per_s"] = round(B * N / min(dist_dts))
        if r2.get("hbm_anchor") and "hbm_anchor" not in fb2:
            # HBM floor of the winning tiling: ~2 codebook re-streams
            # (B=1024 over tile_b=512) x N*DP*4 bytes at the SAME
            # window's bandwidth — the dist extra's honest context
            # (its cross-run swings are bandwidth weather, not code)
            bw2 = HBM_PROBE_BYTES / r2["hbm_anchor"]
            floor = 2 * N * DP * 4 / bw2
            extra["dist_kernel_hbm_floor_pct"] = round(
                100 * floor / min(dist_dts), 1)
    if true_slope(r2, fb2, "olvq1"):
        extra["olvq1_step_evals_per_s"] = round(B * N / r2["olvq1"])
    if r2.get("unfused_r1_style"):
        dt = r2["unfused_r1_style"]
        extra["step_us_unfused_r1_style"] = round(dt * 1e6, 1)
        base = (true_slope(r2, fb2, "anchor_fused_B1024")
                or true_slope(r1, fb1, "anchor_fused_B1024"))
        if base and "unfused_r1_style" not in fb2:
            extra["fused_vs_unfused_speedup"] = round(dt / base, 2)
    if r2.get("vmem_resident"):
        dt_vmem = r2["vmem_resident"] / VMEM_K
        extra["vmem_resident_step_us"] = round(dt_vmem * 1e6, 1)
        extra["vmem_resident_evals_per_s"] = round(
            VMEM_NOC * VMEM_B / dt_vmem)
    if r2.get("somexample_shape"):
        se = SOMEX_NOC * SOMEX_B / (r2["somexample_shape"] / SOMEX_K)
        extra["somexample_shape_evals_per_s"] = round(se)
        extra["somexample_shape_vs_reference"] = round(
            se / BASELINE_EVALS_PER_S, 1)
    r = measure("vfind_parallel_trials")
    if r:
        extra["vfind_parallel_trials"] = r

    # ---- end-to-end BASELINE config 4 (the one expensive extra; its
    # compiles are its own, so it runs only with real budget left)
    if time.perf_counter() - t_meas < budget_s - 120:
        try:
            extra["e2e_128x128_100k"] = run_e2e_config4()
        except Exception as e:
            extra["e2e_128x128_100k"] = f"failed: {type(e).__name__}"
    else:
        extra["e2e_128x128_100k"] = "skipped (time budget)"

    # the literal BASELINE.md north-star (1M x 65k): the most expensive
    # extra — runs only with generous budget left (~4 min incl. its own
    # compiles and ~0.5 GB of tunnel transfers)
    if time.perf_counter() - t_meas < budget_s - 240:
        try:
            extra["e2e_256x256_1M"] = run_e2e_1m_65k()
        except Exception as e:
            extra["e2e_256x256_1M"] = f"failed: {type(e).__name__}"
    else:
        extra["e2e_256x256_1M"] = "skipped (time budget)"

    # (the r3 budget-end re-measure is gone: it produced a headline step
    # from a different chip phase than the derived metrics — the
    # self-consistent window above is now the single source of truth)

    extra["compile_s"] = compile_s
    extra["multi_host"] = (
        "1 chip == 1 host here; N-host execution is validated "
        "functionally (tests/test_multihost.py 2-process jax.distributed; "
        "dryrun_multichip 8-device mesh) — no multi-chip hardware in "
        "this environment")
    extra["note"] = (
        "per-step times are fetch-forced chain slopes (best of 3) — "
        "immune to dispatch floor and tunnel readiness slack; the shared "
        "TPU has fast/slow phases, so compare fields within this line, "
        "not across runs; roofline floors use the same-process probes")

    # ---- tail-proof SUMMARY: the driver records only the LAST ~4 KB of
    # this line (the r4 record truncated away every headline field —
    # VERDICT r4 task 1), so the verdict-grade numbers are repeated in a
    # compact object as the FINAL key.  Detail stays in `extra` up front.
    def _e2e(key):
        d = extra.get(key)
        if not isinstance(d, dict):
            return d if isinstance(d, str) else None
        return {k: d.get(k) for k in
                ("train_s", "qerror_eval_s", "qerror_per_sample",
                 "train_bf16_stream_s") if k in d}

    summary = {
        "headline_config": best_name[6:],
        "step_us": round(dt_fused * 1e6, 1),
        "evals_per_s": round(evals / dt_fused),
        "vs_baseline_x": round(evals / dt_fused / BASELINE_EVALS_PER_S, 1),
        "roofline_pct": extra.get("roofline_pct"),
        "roofline_attainable_pct": extra.get("roofline_attainable_pct"),
        "mfu_useful_pct": extra.get("mfu_pct_useful_vs_probe"),
        "mfu_padded_pct": extra.get("mfu_pct_padded_vs_probe"),
        "mxu_probe_tflops": extra.get("mxu_probe_tflops"),
        "hbm_probe_tb_s": extra.get("hbm_probe_tb_s"),
        "fused_tp_vs_two_pass": extra.get("fused_tp_vs_two_pass_speedup"),
        "mixed_vs_two_pass": extra.get("mixed_vs_two_pass_speedup"),
        "dist_kernel_evals_per_s": extra.get("dist_kernel_evals_per_s"),
        "dist_kernel_hbm_floor_pct": extra.get("dist_kernel_hbm_floor_pct"),
        "k128_vs_d64_step_ratio": extra.get("k128_vs_d64_step_ratio"),
        "vmem_resident_evals_per_s": extra.get("vmem_resident_evals_per_s"),
        "somexample_vs_reference_x": extra.get(
            "somexample_shape_vs_reference"),
        "e2e_128x128_100k": _e2e("e2e_128x128_100k"),
        "e2e_256x256_1M": _e2e("e2e_256x256_1M"),
    }

    print(json.dumps({
        "metric": "som_train_step_evals_per_s_chip",
        "value": round(evals / dt_fused),
        "unit": ("codebook-distance evals/s/chip, fused single-pass train "
                 f"step (B={B_best},N=65536,D=64 in 128 lanes, "
                 f"best config: {best_name[6:]})"),
        "vs_baseline": round(evals / dt_fused / BASELINE_EVALS_PER_S, 1),
        "extra": extra,
        "summary": summary,
    }))


if __name__ == "__main__":
    main()
