"""Production training drivers: the TPU-throughput front end.

The parity trainers (som.som_train / lvq.olvq1_train) replicate the
reference's online loops bit-for-bit; these drivers are the
scale path — minibatch steps on one chip or a (data, model) mesh, with
streaming input, interval checkpoints (codebook + alphas + step + RNG)
and resume.  They compose the pieces the reference keeps implicit:
LOADMODE_BUFFER streaming (datafile.c:237-344) -> data.streaming,
snapshot checkpoints (lvq_pak.c:663-867) -> utils.checkpoint,
the winner/update loops (som_rout.c:556-671) -> fused device steps."""

from __future__ import annotations

from dataclasses import replace
from typing import Iterable, Optional, Union

import numpy as np

from ..data.dataset import Dataset, Neighborhood, Topology
from ..utils.checkpoint import Checkpointer, TrainState
from ..utils.progress import StepTimer
from .common import alpha_schedule, radius_schedule
from .fast import olvq1_batch_step, som_batch_step, unit_coords


class SOMTrainer:
    """Minibatch SOM training at device speed.

    mesh=None runs the single-chip fused step; passing a
    jax.sharding.Mesh with ('data', 'model') axes runs the sharded step
    (codebook TP + batch DP, parallel.sharded)."""

    def __init__(
        self,
        codes: Dataset,
        batch_size: int = 1024,
        update: str = "sum",
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_interval: int = 0,
        seed: int = 0,
        use_pallas: Optional[bool] = None,
        bf16: bool = False,
        vmem_steps: Optional[bool] = None,
        stream_bf16: bool = False,
    ):
        """`bf16=True` keeps the training-resident codebook in bfloat16
        on the fused path — halves the step's HBM traffic (the fused
        kernel accumulates in f32 either way); the returned/checkpointed
        codebook is float32.  `vmem_steps`: None = auto (use the
        VMEM-resident multi-step kernel when the codebook fits), False =
        never, True has no effect beyond auto.  `stream_bf16=True` ships
        streamed input batches host->device in bfloat16 (halving the
        transfer bytes — the TPU tunnel here moves ~25-45 MB/s, so a
        1M x 64-dim lap pays ~6-10 s of f32 transfer); samples are
        upcast on device, so only the input quantization changes
        (quality-gated in tests, not bit parity)."""
        import jax

        if not codes.is_map:
            raise ValueError("SOMTrainer needs a map codebook")
        self.bf16 = bf16
        self.stream_bf16 = stream_bf16
        self.vmem_steps = vmem_steps
        self.meta = codes
        self.batch_size = batch_size
        self.update = update
        self.mesh = mesh
        self.seed = seed
        self.gaussian = codes.neigh == Neighborhood.GAUSSIAN
        self.coords = unit_coords(
            codes.xdim, codes.ydim, codes.topol == Topology.HEXA
        )
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.ckpt = None
        self.checkpoint_interval = checkpoint_interval
        if checkpoint_dir is not None:
            self.ckpt = Checkpointer(checkpoint_dir, background=True)

        self._sharded_cache = {}

    # -- internals -------------------------------------------------------

    def _sharded_step(self, flags):
        """Sharded step closure for (masked, weighted, fixed) flags."""
        if flags not in self._sharded_cache:
            from ..parallel.sharded import make_sharded_som_train_step

            masked, weighted, fixed = flags
            self._sharded_cache[flags] = make_sharded_som_train_step(
                self.mesh, gaussian=self.gaussian, use_pallas=self.use_pallas,
                masked=masked, weighted=weighted, fixed=fixed,
            )
        return self._sharded_cache[flags]

    def _one_step(self, M, xb, a, r, mask=None, weights=None, fixed_bmu=None):
        import jax.numpy as jnp

        if getattr(xb, "dtype", None) is not None and xb.dtype != jnp.float32:
            xb = jnp.asarray(xb).astype(jnp.float32)  # bf16-streamed batch
        if self.mesh is None:
            return som_batch_step(
                M, xb, self.coords, jnp.float32(a), jnp.float32(r),
                gaussian=self.gaussian, update=self.update,
                use_pallas=self.use_pallas,
                xdim=self.meta.xdim,
                hexa=self.meta.topol == Topology.HEXA,
                mask=mask, weights=weights, fixed_bmu=fixed_bmu,
            )
        from ..parallel.sharded import shard_arrays

        step = self._sharded_step(
            (mask is not None, weights is not None, fixed_bmu is not None)
        )
        cs, xs, cl, cf = shard_arrays(self.mesh, M, xb, self.coords)
        extras = []
        from jax.sharding import NamedSharding, PartitionSpec as P

        import jax

        for arr, spec in ((mask, P("data", None)), (weights, P("data")),
                          (fixed_bmu, P("data"))):
            if arr is not None:
                extras.append(jax.device_put(arr, NamedSharding(self.mesh, spec)))
        return step(cs, xs, cl, cf, jnp.float32(a), jnp.float32(r), *extras)

    # -- API -------------------------------------------------------------

    def fit(
        self,
        data: Union[Dataset, Iterable[Dataset]],
        rlen: int,
        alpha: float,
        radius: float,
        alpha_type: str = "linear",
        resume: bool = True,
        progress: Optional[StepTimer] = None,
        use_weights: bool = False,
        use_fixed: bool = False,
        allow_short_stream: bool = False,
    ) -> Dataset:
        """Train for `rlen` samples (grouped into batches).

        `data` is a Dataset — consumed in per-lap shuffled order, the
        batch analogue of the reference's -rand lap semantics
        (datafile.c:338-341) — or an iterable of chunk Datasets (e.g.
        StreamingReader.chunks(laps=N)); chunks prefetch to the device
        one step ahead.  A stream that runs dry before `rlen` samples
        raises (pass laps=None for an endless stream, or
        allow_short_stream=True to accept the truncated run).

        use_weights / use_fixed: honor per-sample weight= / fixed=
        tokens like the reference trainers (som_rout.c:612-632; off by
        default like the C -weights/-fixed flags).  Masks always apply.
        With a checkpoint dir and resume=True, continues from the latest
        step."""
        import jax
        import jax.numpy as jnp

        nb = max(1, rlen // self.batch_size)
        talp = alpha_schedule(rlen, alpha, alpha_type)[:: max(1, self.batch_size)][:nb]
        trad = radius_schedule(rlen, radius)[:: max(1, self.batch_size)][:nb]

        start = 0
        M = jnp.asarray(self.meta.points)
        key = jax.random.PRNGKey(self.seed)
        if self.ckpt is not None and resume:
            st = self.ckpt.load()
            if st is not None and st.step < nb:
                M = jnp.asarray(st.codes)
                start = st.step
                if st.prng_key is not None:
                    key = jnp.asarray(st.prng_key)

        xdim = self.meta.xdim

        def fixed_flat(ds: Dataset):
            if not use_fixed or ds.fixed is None:
                return None
            fx = ds.fixed
            return np.where(
                (fx[:, 0] >= 0) & (fx[:, 1] >= 0),
                fx[:, 1] * xdim + fx[:, 0], -1,
            ).astype(np.int32)

        if isinstance(data, Dataset):
            X = jnp.asarray(data.points)
            mk = None if data.mask is None else jnp.asarray(data.mask)
            wt = (jnp.asarray(data.weight)
                  if use_weights and data.weight is not None else None)
            ff = fixed_flat(data)
            ff = None if ff is None else jnp.asarray(ff)
            n = data.n

            perm_cache = {}

            def lap_perm(lap):
                # resume-safe: lap perms derive from fold_in(seed, lap),
                # not from consumed key state; cache the current lap's
                # (recomputing an n-element permutation per batch is an
                # O(n) host pull each step)
                if lap not in perm_cache:
                    perm_cache.clear()
                    perm_cache[lap] = np.asarray(
                        jax.random.permutation(jax.random.fold_in(key, lap), n))
                return perm_cache[lap]

            def batches():
                # per-lap shuffled order: lap l is an independent
                # permutation of all n samples, batches cut from the
                # concatenated laps — the batch analogue of the
                # reference's per-lap shuffle (datafile.c:338-341)
                for b in range(start, nb):
                    lo = b * self.batch_size
                    idx_np = np.empty((self.batch_size,), dtype=np.int64)
                    got = 0
                    while got < self.batch_size:
                        lap, off = divmod(lo + got, n)
                        perm = lap_perm(lap)
                        take = min(self.batch_size - got, n - off)
                        idx_np[got:got + take] = perm[off:off + take]
                        got += take
                    idx = jnp.asarray(idx_np)
                    yield (b, X[idx],
                           None if mk is None else mk[idx],
                           None if wt is None else wt[idx],
                           None if ff is None else ff[idx])
        else:
            chunk_iter = iter(data)

            def batches():
                # Buffer chunks HOST-side (NumPy), ship SUPERBLOCKS of
                # ~16 MB in one device_put each, and slice per-batch
                # views on the DEVICE.  The TPU tunnel's H2D path was
                # measured at ~25-45 MB/s with a large per-transfer
                # fixed cost (1 MB pieces collapse to ~2 MB/s), so
                # per-batch puts dominated the r4 1M-train wall
                # (VERDICT r4 task 4); block transfers at the measured
                # sweet spot cut the overhead to the bandwidth floor,
                # and stream_bf16 halves the bytes on top.  The reader's
                # background thread still parses ahead; device_put is
                # async against the chained steps.
                import jax

                if self.stream_bf16:
                    import ml_dtypes

                    stream_dtype = ml_dtypes.bfloat16
                else:
                    stream_dtype = np.float32

                def pack(chunk):
                    return (
                        np.ascontiguousarray(chunk.points),
                        chunk.mask,
                        (chunk.weight if use_weights and chunk.weight is not None
                         else None),
                        fixed_flat(chunk),
                        chunk.n,
                    )

                def next_chunk():
                    try:
                        return pack(next(chunk_iter))
                    except StopIteration:
                        return None

                bufs = []  # list of (X, mk, wt, ff, n) host tuples
                buffered = 0
                b = start
                pending = next_chunk()  # parsed one chunk ahead
                # resume-exact streaming: fast-forward start*batch_size
                # samples so batch b trains on the same stream positions
                # it would have seen in the uninterrupted run (a resumed
                # late-schedule batch must not retrain the stream's head)
                skip = start * self.batch_size
                while skip > 0 and pending is not None:
                    pending, skip = _skip_stream_samples(pending, skip)
                    if pending is None:
                        pending = next_chunk()
                s = self.batch_size
                itemsize = 2 if self.stream_bf16 else 4
                target_rows = max(s, (16 << 20) // max(1, D * itemsize))
                while b < nb:
                    # fill to at least one batch, ideally a full block
                    while (buffered < s
                           or (buffered < target_rows and pending is not None)):
                        if pending is None:
                            if buffered >= s:
                                break
                            if allow_short_stream:
                                return
                            raise RuntimeError(
                                f"input stream exhausted at batch {b}/{nb} "
                                f"({buffered} samples buffered, "
                                f"{s} needed): size laps to "
                                "cover rlen, pass laps=None, or set "
                                "allow_short_stream=True"
                            )
                        bufs.append(pending)
                        buffered += pending[-1]
                        pending = next_chunk()

                    def cat(i, fill, shape, dtype):
                        parts = [t[i] for t in bufs]
                        if all(p is None for p in parts):
                            return None
                        parts = [
                            (p if p is not None
                             else np.full((t[-1],) + shape, fill, dtype=dtype))
                            for p, t in zip(parts, bufs)
                        ]
                        return np.concatenate(parts) if len(parts) > 1 else parts[0]

                    Dc = bufs[0][0].shape[1]
                    X = cat(0, 0.0, (Dc,), np.float32)
                    mk = cat(1, 0, (Dc,), np.uint8)
                    wt = cat(2, 0.0, (), np.float32)
                    ff = cat(3, -1, (), np.int32)
                    # ship whole batches only; the remainder stays HOST-
                    # side for the next block (mixing device leftovers
                    # back into np.concatenate would fetch them D2H)
                    nfull = min(buffered // s, nb - b) * s
                    Xd = jax.device_put(
                        np.ascontiguousarray(X[:nfull], dtype=stream_dtype))
                    mkd = None if mk is None else jax.device_put(mk[:nfull])
                    wtd = None if wt is None else jax.device_put(wt[:nfull])
                    ffd = None if ff is None else jax.device_put(ff[:nfull])
                    # per-batch mask/fixed presence, decided on the HOST copy:
                    # a clean batch inside a block that contains masked
                    # chunks elsewhere must yield mask=None — an all-zero
                    # mask array would route it down the masked kernel,
                    # whose different rounding can flip near-tie winners —
                    # and consumers then branch on `is not None` alone
                    # with no per-batch device sync (review finding r5)
                    mk_any = (None if mk is None else
                              [bool(mk[o:o + s].any())
                               for o in range(0, nfull, s)])
                    ff_any = (None if ff is None else
                              [bool((ff[o:o + s] >= 0).any())
                               for o in range(0, nfull, s)])
                    off = 0
                    j = 0
                    while off < nfull and b < nb:
                        yield (b, Xd[off:off + s],
                               (mkd[off:off + s]
                                if mkd is not None and mk_any[j] else None),
                               None if wtd is None else wtd[off:off + s],
                               (ffd[off:off + s]
                                if ffd is not None and ff_any[j] else None))
                        off += s
                        buffered -= s
                        b += 1
                        j += 1
                    bufs = [(X[nfull:], None if mk is None else mk[nfull:],
                             None if wt is None else wt[nfull:],
                             None if ff is None else ff[nfull:], buffered)]

        # The single-chip Pallas path runs the software-pipelined FUSED
        # step: update(batch t) + winner-search(batch t+1) in one pass
        # over the codebook (ops.pallas_som.som_fused_train_step) — one
        # codebook read + write per step instead of three reads + write.
        # A Dataset with masks falls back to the two-kernel step wholesale
        # (every batch would be masked); STREAMS ride the fused path — the
        # large-N streamed SOM is the north-star workload — with any
        # masked chunk's batches handled by a per-batch two-kernel
        # fallback inside the fused loop.
        use_fused = (
            self.mesh is None and self.use_pallas
            and (not isinstance(data, Dataset) or data.mask is None)
        )
        D = self.meta.dim

        # interval checkpoints fire whenever >= interval batches have
        # elapsed since the last save — on the VMEM multi-step path
        # maybe_ckpt only runs at group boundaries, so an exact-modulo
        # test would silently skip every interval that doesn't divide a
        # boundary step (e.g. interval=10 with 63 batches wrote nothing)
        last_ckpt = start

        def maybe_ckpt(b, M):
            nonlocal last_ckpt
            if (
                self.ckpt is not None
                and self.checkpoint_interval
                and (b + 1) - last_ckpt >= self.checkpoint_interval
            ):
                last_ckpt = b + 1
                self.ckpt.save(TrainState(
                    codes=np.asarray(M, dtype=np.float32)[:, :D], step=b + 1,
                    prng_key=np.asarray(key),
                    extra={"alpha": float(alpha), "radius": float(radius)},
                ))

        Dp = -(-D // 128) * 128
        hexa = self.meta.topol == Topology.HEXA

        def pad(xb):
            # also upcasts bf16-streamed batches to the kernel's f32
            if xb.shape[1] == Dp:
                return (xb if xb.dtype == jnp.float32
                        else xb.astype(jnp.float32))
            return jnp.zeros((xb.shape[0], Dp), jnp.float32).at[
                :, :xb.shape[1]].set(xb)

        def eff_alpha(b, wt_b, mk_b):
            a = jnp.full((self.batch_size,), jnp.float32(talp[b]))
            if wt_b is not None:
                w = jnp.where(wt_b > 0.0, wt_b, 1.0).astype(jnp.float32)
                a = 1.0 - jnp.power(1.0 - a, w)
            if mk_b is not None:
                a = jnp.where(jnp.all(mk_b != 0, axis=-1), 0.0, a)
            return a

        # pure-TP meshes (data-axis 1) run the pipelined fused TP step:
        # each model shard reads+writes its codebook rows ONCE per step
        # (update of batch t + winner candidates of batch t+1 in one
        # pass), global winner via allgather-min (parallel.sharded).
        # Streams and masked data stay on the per-batch two-pass path.
        n_shards = 0 if self.mesh is None else self.mesh.shape.get("model", 0)
        use_fused_tp = (
            self.mesh is not None and self.use_pallas
            and self.mesh.shape.get("data", 0) == 1
            and isinstance(data, Dataset) and data.mask is None
            and n_shards > 0 and self.meta.n % n_shards == 0
            and (self.meta.n // n_shards) % 8 == 0
            and not self.bf16
        )
        # mixed data x model meshes: accumulate-psum-blend fused step
        # (parallel.sharded.make_mixed_fused_som_train_step) — one
        # codebook read+write plus one winner read per step per shard,
        # vs the two-pass sharded_som_step fallback's W-materializing
        # update (VERDICT r3 task 4)
        use_fused_mixed = (
            self.mesh is not None and self.use_pallas and not use_fused_tp
            and self.mesh.shape.get("data", 0) >= 1
            and isinstance(data, Dataset) and data.mask is None
            and n_shards > 0 and self.meta.n % n_shards == 0
            and (self.meta.n // n_shards) % 8 == 0
            and self.batch_size % max(1, self.mesh.shape.get("data", 1)) == 0
            and not self.bf16
        )

        if use_fused:
            import jax

            from ..ops.pallas_distance import dist_argmin
            from ..ops.pallas_som import (
                _factored_geometry_ok,
                pick_fused_tile_n,
                som_fused_train_step,
            )

            Mp = jnp.zeros((self.meta.n, Dp), jnp.float32).at[:, :D].set(M)
            if self.bf16:
                Mp = Mp.astype(jnp.bfloat16)

            # small codebooks (fits VMEM alongside working blocks): run
            # K steps per kernel dispatch with the codebook VMEM-resident
            # throughout (ops.pallas_som.som_vmem_train_steps) — one
            # codebook read+write per K steps and no per-step dispatch.
            row_chunk = next(
                (rc for rc in (512, 256, 128, 64, self.meta.n)
                 if self.meta.n % rc == 0 and rc <= self.meta.n), None)
            use_vmem = (
                self.vmem_steps is not False
                and self.meta.n * Dp * 4 <= (4 << 20)
                and row_chunk is not None
                # user-set batch sizes must leave the (row_chunk, B)
                # working blocks + resident codebook under the ~16 MB
                # scoped-VMEM limit or Mosaic compilation fails
                and (2 * self.meta.n * Dp * 4 + 2 * self.batch_size * Dp * 4
                     + 3 * (row_chunk or 0) * self.batch_size * 4) <= (14 << 20)
                and not (use_fixed and getattr(data, "fixed", None) is not None)
                and not self.bf16
            )
            if use_vmem:
                from ..ops.pallas_som import som_vmem_train_steps

                def group_dirty(group):
                    # streams may carry per-component masks or fixed=
                    # tokens per chunk, which the grouped kernel cannot
                    # honor; a group containing any runs the two-kernel
                    # step batch by batch instead.  The streaming
                    # batches() yields mask/fixed slices ONLY for
                    # batches that actually contain them (host-side
                    # any-check), so not-None alone decides — no
                    # per-group device sync (Dataset input never
                    # reaches here with either: mask=None on this
                    # branch, fixed gated by use_vmem above)
                    return any(g[2] is not None or g[4] is not None
                               for g in group)

                GK = 32
                it = batches()
                group = []
                nxt = next(it, None)
                bmu = None
                while nxt is not None:
                    group.append(nxt)
                    nxt = next(it, None)
                    if len(group) == GK or nxt is None:
                        if group_dirty(group):
                            M1 = Mp[:, :D].astype(jnp.float32)
                            for b, xb, mk_b, wt_b, ff_b in group:
                                M1 = self._one_step(
                                    M1, xb, talp[b], trad[b], mask=mk_b,
                                    weights=wt_b, fixed_bmu=ff_b)
                                if progress is not None:
                                    progress.step(self.batch_size)
                            Mp = jnp.zeros((self.meta.n, Dp),
                                           jnp.float32).at[:, :D].set(M1)
                            maybe_ckpt(group[-1][0], Mp)
                            bmu = None  # next clean group re-seeds
                            group = []
                            continue
                        if bmu is None:
                            _, bmu = dist_argmin(pad(group[0][1]), Mp)
                        xs = jnp.stack([pad(g[1]) for g in group])
                        aws = jnp.stack([eff_alpha(g[0], g[3], g[2])
                                         for g in group])
                        rads = jnp.asarray([trad[g[0]] for g in group],
                                           jnp.float32)
                        nf = pad(nxt[1]) if nxt is not None else None
                        Mp, bmu = som_vmem_train_steps(
                            Mp, xs, bmu, aws, rads, self.meta.xdim, hexa,
                            gaussian=self.gaussian, row_chunk=row_chunk,
                            next_first=nf,
                        )
                        if progress is not None:
                            progress.step(self.batch_size * len(group))
                        maybe_ckpt(group[-1][0], Mp)
                        group = []
                self.meta = replace(self.meta,
                                    points=np.asarray(Mp[:, :D]), comments=[])
                if self.ckpt is not None:
                    self.ckpt.save(TrainState(
                        codes=np.asarray(Mp)[:, :D], step=nb,
                        prng_key=np.asarray(key)))
                    self.ckpt.wait()
                return self.meta

            # VMEM-safe tile size for the user's batch_size; prefer the
            # separable-neighborhood kernel when the grid geometry allows
            tn_fact = pick_fused_tile_n(self.meta.n, self.batch_size, Dp,
                                        xdim=self.meta.xdim, factored=True)
            factored = _factored_geometry_ok(
                self.meta.n, self.meta.xdim, tn_fact, hexa)
            tile_n = tn_fact if factored else pick_fused_tile_n(
                self.meta.n, self.batch_size, Dp)
            d_real = D if (D < Dp and D % 8 == 0) else None
            # large batches: the batch-chunked kernel keeps the map's
            # natural tile (the (TN, B) blocks stream in 1024-lane
            # slices) instead of shrinking tile_n to fit VMEM — the r4
            # measured-fastest shape for B >= 4096.  The combination is
            # accepted only if its estimated working set fits the scoped
            # VMEM budget (bf16 x-pattern for gaussian; batches go bf16
            # as the last resort at B >= 8192)
            batch_chunk = None
            chunk_bf16 = {}
            if (factored and self.batch_size >= 4096
                    and self.batch_size % 1024 == 0):
                from ..ops.pallas_som import chunked_step_vmem_bytes

                tn_big = pick_fused_tile_n(
                    self.meta.n, 1024, Dp, xdim=self.meta.xdim,
                    factored=True)
                if _factored_geometry_ok(self.meta.n, self.meta.xdim,
                                         tn_big, hexa):
                    budget = 14 << 20
                    for wxa_b, bat_b in ((self.gaussian, False),
                                         (self.gaussian, True)):
                        if chunked_step_vmem_bytes(
                                tn_big, self.batch_size, 1024, Dp,
                                self.meta.xdim, hexa, wxa_bf16=wxa_b,
                                batch_bf16=bat_b) <= budget:
                            tile_n = tn_big
                            batch_chunk = 1024
                            chunk_bf16 = dict(wxa_bf16=wxa_b,
                                              batch_bf16=bat_b)
                            break

            it = batches()
            prev = next(it, None)
            if prev is not None:
                xb0 = pad(prev[1])
                _, bmu = dist_argmin(xb0, Mp)
                if prev[4] is not None:
                    bmu = jnp.where(prev[4] >= 0, prev[4], bmu)
            while prev is not None:
                b, xb, mk_b, wt_b, ff_b = prev
                nxt = next(it, None)
                xb_p = pad(xb)
                xn_p = pad(nxt[1]) if nxt is not None else xb_p
                if mk_b is not None:
                    # masked stream batch (batches() yields a mask slice
                    # only when the batch truly has masked entries — no
                    # device .any() sync here): the fused kernel carries
                    # no per-component mask — run this batch through the
                    # two-kernel masked step and re-seed the BMU pipeline
                    # for the next batch against the updated codebook
                    M1 = self._one_step(
                        Mp[:, :D].astype(jnp.float32), xb,
                        talp[b], trad[b],
                        mask=mk_b, weights=wt_b, fixed_bmu=ff_b)
                    Mp = jnp.zeros((self.meta.n, Dp), jnp.float32).at[
                        :, :D].set(M1)
                    if self.bf16:
                        Mp = Mp.astype(jnp.bfloat16)
                    if nxt is not None:
                        _, bmu = dist_argmin(xn_p, Mp)
                        if nxt[4] is not None:
                            bmu = jnp.where(nxt[4] >= 0, nxt[4], bmu)
                    if progress is not None:
                        progress.step(self.batch_size)
                    maybe_ckpt(b, Mp)
                    prev = nxt
                    continue
                Mp, bmu_next, _ = som_fused_train_step(
                    Mp, xb_p, bmu, xn_p, self.meta.xdim, hexa,
                    eff_alpha(b, wt_b, mk_b), jnp.float32(trad[b]),
                    gaussian=self.gaussian, tile_n=tile_n,
                    factored=factored, d_real=d_real,
                    batch_chunk=batch_chunk, **chunk_bf16,
                )
                if nxt is not None:
                    bmu = bmu_next
                    if nxt[4] is not None:
                        bmu = jnp.where(nxt[4] >= 0, nxt[4], bmu)
                if progress is not None:
                    progress.step(self.batch_size)
                maybe_ckpt(b, Mp)
                prev = nxt
            M = Mp[:, :D].astype(jnp.float32)
        elif use_fused_tp or use_fused_mixed:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..ops.pallas_distance import dist_argmin
            from ..ops.pallas_som import pick_fused_tile_n

            n_local = self.meta.n // n_shards
            d_real = D if (D < Dp and D % 8 == 0) else None
            if use_fused_tp:
                from ..parallel.sharded import (
                    make_sharded_fused_som_train_step,
                )

                tile_n = min(
                    pick_fused_tile_n(self.meta.n, self.batch_size, Dp),
                    max(8, n_local))
                step = make_sharded_fused_som_train_step(
                    self.mesh, gaussian=self.gaussian, xdim=self.meta.xdim,
                    hexa=hexa, tile_n=tile_n, d_real=d_real)
            else:
                from ..parallel.sharded import (
                    make_mixed_fused_som_train_step,
                )

                # overlap_segments=2: each row-segment's data-axis psum
                # hides under the next segment's accumulate (exactly
                # equal results; engages only when the data axis > 1)
                step = make_mixed_fused_som_train_step(
                    self.mesh, gaussian=self.gaussian, xdim=self.meta.xdim,
                    hexa=hexa, tile_n=min(512, n_local), d_real=d_real,
                    overlap_segments=2)

            # shared software pipeline: winner of batch t comes from step
            # t-1; the prologue searches batch 0 against the initial
            # codebook before it is placed on the mesh
            Mp = jnp.zeros((self.meta.n, Dp), jnp.float32).at[:, :D].set(M)
            it = batches()
            prev = next(it, None)
            bmu = None
            if prev is not None:
                _, bmu = dist_argmin(pad(prev[1]), Mp)
                if prev[4] is not None:
                    bmu = jnp.where(prev[4] >= 0, prev[4], bmu)
            Mp = jax.device_put(Mp, NamedSharding(self.mesh,
                                                  P("model", None)))
            while prev is not None:
                b, xb, mk_b, wt_b, ff_b = prev
                nxt = next(it, None)
                xb_p = pad(xb)
                xn_p = pad(nxt[1]) if nxt is not None else xb_p
                Mp, bmu_next = step(
                    Mp, xb_p, bmu, xn_p, eff_alpha(b, wt_b, mk_b),
                    jnp.float32(trad[b]))
                if nxt is not None:
                    bmu = bmu_next
                    if nxt[4] is not None:
                        bmu = jnp.where(nxt[4] >= 0, nxt[4], bmu)
                if progress is not None:
                    progress.step(self.batch_size)
                maybe_ckpt(b, Mp)
                prev = nxt
            M = jnp.asarray(Mp)[:, :D]
        else:
            for b, xb, mk_b, wt_b, ff_b in batches():
                M = self._one_step(M, xb, talp[b], trad[b],
                                   mask=mk_b, weights=wt_b, fixed_bmu=ff_b)
                if progress is not None:
                    progress.step(self.batch_size)
                maybe_ckpt(b, M)

        if self.ckpt is not None:
            self.ckpt.save(TrainState(
                codes=np.asarray(M)[:, :D], step=nb, prng_key=np.asarray(key),
            ))
            self.ckpt.wait()
        self.meta = replace(self.meta, points=np.asarray(M)[:, :D], comments=[])
        return self.meta


def _skip_stream_samples(t, skip):
    """Drop the first `skip` samples from a packed chunk tuple
    (*arrays_or_None, n) — the resume-exact stream fast-forward shared
    by SOMTrainer's and the LVQ drivers' streaming branches.  Returns
    (tuple_or_None, remaining_skip); None = the chunk was consumed
    entirely."""
    n = t[-1]
    if n <= skip:
        return None, skip - n
    if skip == 0:
        return t, 0
    return tuple(a if a is None else a[skip:] for a in t[:-1]) + (n - skip,), 0


def _labeled_batches(data, start, nb, batch_size, keybox,
                     allow_short_stream=False):
    """Yield (b, xb, xlab, mask) minibatches for the LVQ drivers.

    `data` is a Dataset (batches sampled with replacement, advancing
    keybox['key'] one split per batch — resume-stable because the key is
    checkpointed) or an iterable of chunk Datasets (host-side buffering
    with fixed-shape device transfers; resume fast-forwards
    start*batch_size stream samples — see SOMTrainer's streaming branch
    for the rationale)."""
    import jax

    np_ = np
    if isinstance(data, Dataset):
        import jax.numpy as jnp

        X = jnp.asarray(data.points)
        xlab = jnp.asarray(data.first_labels())
        mk = None if data.mask is None else jnp.asarray(data.mask)
        n = data.n
        for b in range(start, nb):
            keybox["key"], sub = jax.random.split(keybox["key"])
            idx = jax.random.randint(sub, (batch_size,), 0, n)
            yield (b, X[idx], xlab[idx], None if mk is None else mk[idx])
        return

    chunk_iter = iter(data)
    bufs = []
    buffered = 0
    b = start
    skip = start * batch_size
    s = batch_size
    # superblock transfers (see SOMTrainer's streaming branch): the
    # tunnel's H2D path has a large per-transfer cost, so ship ~16 MB
    # blocks in one device_put each and slice batches on device
    target_rows = None
    while b < nb:
        while (buffered < s
               or (target_rows is not None and buffered < target_rows)):
            try:
                c = next(chunk_iter)
            except StopIteration:
                if buffered >= s:
                    break
                if allow_short_stream:
                    return
                raise RuntimeError(
                    f"input stream exhausted at batch {b}/{nb}: "
                    "size laps to cover rlen, pass laps=None, "
                    "or set allow_short_stream=True")
            t = (np_.ascontiguousarray(c.points), c.first_labels(),
                 c.mask, c.n)
            if skip > 0:
                t, skip = _skip_stream_samples(t, skip)
                if t is None:
                    continue
            if target_rows is None:
                target_rows = max(s, (16 << 20) // max(1, t[0].shape[1] * 4))
            bufs.append(t)
            buffered += t[3]
        X = np_.concatenate([t[0] for t in bufs])
        L = np_.concatenate([t[1] for t in bufs])
        has_mask = any(t[2] is not None for t in bufs)
        if has_mask:
            mk = np_.concatenate([
                (t[2] if t[2] is not None
                 else np_.zeros((t[3], X.shape[1]), np_.uint8))
                for t in bufs])
        else:
            mk = None
        nfull = min(buffered // s, nb - b) * s
        Xd = jax.device_put(X[:nfull])
        Ld = jax.device_put(L[:nfull])
        mkd = None if mk is None else jax.device_put(mk[:nfull])
        mk_any = (None if mk is None else
                  [bool(mk[o:o + s].any()) for o in range(0, nfull, s)])
        off = 0
        j = 0
        while off < nfull and b < nb:
            yield (b, Xd[off:off + s], Ld[off:off + s],
                   (mkd[off:off + s]
                    if mkd is not None and mk_any[j] else None))
            off += s
            buffered -= s
            b += 1
            j += 1
        bufs = [(X[nfull:], L[nfull:],
                 None if mk is None else mk[nfull:], buffered)]


class LVQTrainer:
    """Minibatch lvq1 / lvq2.1 / lvq3 training at device speed — the
    production-driver counterpart of the reference's lvqtrain dispatch
    (lvqtrain.c:214-237) for the fixed-alpha algorithms; olvq1's
    adaptive-alpha driver is OLVQ1Trainer.  Batched steps:
    models.fast.lvq1_batch_step / lvq23_batch_step."""

    def __init__(
        self,
        codes: Dataset,
        algorithm: str = "lvq1",
        batch_size: int = 1024,
        winlen: float = 0.3,
        epsilon: float = 0.1,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_interval: int = 0,
        seed: int = 0,
        use_pallas: Optional[bool] = None,
    ):
        """`mesh`: a (data, model) jax.sharding.Mesh runs the sharded
        step (codebook TP + batch DP, parallel.sharded.sharded_lvq_step;
        masks unsupported there — masked batches raise)."""
        import jax

        if algorithm not in ("lvq1", "lvq2", "lvq3"):
            raise ValueError(
                f"unknown algorithm {algorithm!r} (lvq1|lvq2|lvq3; "
                "use OLVQ1Trainer for olvq1)")
        self.meta = codes
        self.algorithm = algorithm
        self.batch_size = batch_size
        self.winlen = float(winlen)
        self.epsilon = float(epsilon)
        self.mesh = mesh
        self.seed = seed
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self._sharded = None
        if mesh is not None:
            from ..parallel.sharded import make_sharded_lvq_train_step

            self._sharded = make_sharded_lvq_train_step(
                mesh, algorithm=algorithm, winlen=self.winlen,
                epsilon=self.epsilon, use_pallas=self.use_pallas)
        self.ckpt = None
        self.checkpoint_interval = checkpoint_interval
        if checkpoint_dir is not None:
            self.ckpt = Checkpointer(checkpoint_dir, background=True)

    def fit(self, data: Union[Dataset, Iterable[Dataset]], rlen: int,
            alpha: float, alpha_type: str = "linear",
            resume: bool = True,
            progress: Optional[StepTimer] = None,
            allow_short_stream: bool = False) -> Dataset:
        """Train for `rlen` samples (grouped into batches); the alpha
        schedule (linear_alpha / inverse_t_alpha, lvq_pak.c:901-921) is
        evaluated at each batch's first sample."""
        import jax
        import jax.numpy as jnp

        from .fast import lvq1_batch_step, lvq23_batch_step

        nb = max(1, rlen // self.batch_size)
        talp = alpha_schedule(rlen, alpha, alpha_type)[
            :: max(1, self.batch_size)][:nb]
        M = jnp.asarray(self.meta.points)
        clabels = jnp.asarray(self.meta.first_labels())
        keybox = {"key": jax.random.PRNGKey(self.seed)}
        start = 0
        if self.ckpt is not None and resume:
            st = self.ckpt.load()
            if st is not None and st.step < nb:
                M = jnp.asarray(st.codes)
                if st.prng_key is not None:
                    keybox["key"] = jnp.asarray(st.prng_key)
                start = st.step

        last_ckpt = start
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            M = jax.device_put(M, NamedSharding(self.mesh, P("model", None)))
        for b, xb, xl, mb in _labeled_batches(
                data, start, nb, self.batch_size, keybox, allow_short_stream):
            a = jnp.float32(talp[b])
            if self.mesh is not None:
                if mb is not None and bool(jnp.any(mb != 0)):
                    raise ValueError(
                        "LVQTrainer(mesh=...): masked batches are not "
                        "supported on the sharded step")
                from jax.sharding import NamedSharding, PartitionSpec as P

                M = self._sharded(
                    M, clabels,
                    jax.device_put(xb, NamedSharding(self.mesh, P("data", None))),
                    jax.device_put(xl, NamedSharding(self.mesh, P("data"))),
                    a)
            elif self.algorithm == "lvq1":
                M = lvq1_batch_step(M, clabels, xb, xl, a,
                                    use_pallas=self.use_pallas, mask=mb)
            else:
                M = lvq23_batch_step(
                    M, clabels, xb, xl, a, jnp.float32(self.winlen),
                    epsilon=jnp.float32(self.epsilon),
                    lvq3=self.algorithm == "lvq3",
                    use_pallas=self.use_pallas, mask=mb)
            if progress is not None:
                progress.step(self.batch_size)
            if (self.ckpt is not None and self.checkpoint_interval
                    and (b + 1) - last_ckpt >= self.checkpoint_interval):
                last_ckpt = b + 1
                self.ckpt.save(TrainState(
                    codes=np.asarray(M), step=b + 1,
                    prng_key=np.asarray(keybox["key"])))
        if self.ckpt is not None:
            self.ckpt.save(TrainState(codes=np.asarray(M), step=nb,
                                      prng_key=np.asarray(keybox["key"])))
            self.ckpt.wait()
        self.meta = replace(self.meta, points=np.asarray(M), comments=[])
        return self.meta


class OLVQ1Trainer:
    """Minibatch olvq1 training with per-code adaptive learning rates
    (sharded over the mesh when given)."""

    def __init__(
        self,
        codes: Dataset,
        batch_size: int = 1024,
        alpha: float = 0.3,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_interval: int = 0,
        seed: int = 0,
        use_pallas: Optional[bool] = None,
    ):
        import jax

        self.meta = codes
        self.batch_size = batch_size
        self.clip = float(alpha)
        self.mesh = mesh
        self.seed = seed
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.ckpt = None
        self.checkpoint_interval = checkpoint_interval
        if checkpoint_dir is not None:
            self.ckpt = Checkpointer(checkpoint_dir, background=True)
        if mesh is not None:
            from ..parallel.sharded import make_sharded_olvq1_train_step

            self._sharded = make_sharded_olvq1_train_step(mesh, clip=self.clip,
                                                          use_pallas=use_pallas)

    def fit(self, data: Union[Dataset, Iterable[Dataset]], rlen: int,
            resume: bool = True,
            progress: Optional[StepTimer] = None,
            allow_short_stream: bool = False) -> Dataset:
        """`data` is a Dataset (batches sampled with replacement) or an
        iterable of chunk Datasets (StreamingReader.chunks — the
        reference's -buffer reading for lvqtrain, lvqtrain.c:181);
        a stream that runs dry before rlen raises unless
        allow_short_stream=True."""
        import jax
        import jax.numpy as jnp

        nb = max(1, rlen // self.batch_size)
        M = jnp.asarray(self.meta.points)
        clabels = jnp.asarray(self.meta.first_labels())
        alphas = jnp.full((self.meta.n,), self.clip, dtype=jnp.float32)
        keybox = {"key": jax.random.PRNGKey(self.seed)}
        start = 0
        if self.ckpt is not None and resume:
            st = self.ckpt.load()
            if st is not None and st.step < nb:
                M = jnp.asarray(st.codes)
                if st.alphas is not None:
                    alphas = jnp.asarray(st.alphas)
                if st.prng_key is not None:
                    keybox["key"] = jnp.asarray(st.prng_key)
                start = st.step

        for b, xb, xl, mb in _labeled_batches(
                data, start, nb, self.batch_size, keybox, allow_short_stream):
            if self.mesh is None:
                M, alphas = olvq1_batch_step(M, clabels, alphas, xb, xl,
                                             clip=self.clip,
                                             use_pallas=self.use_pallas,
                                             mask=mb)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                M, alphas = self._sharded(
                    jax.device_put(M, NamedSharding(self.mesh, P("model", None))),
                    clabels, alphas,
                    jax.device_put(xb, NamedSharding(self.mesh, P("data", None))),
                    jax.device_put(xl, NamedSharding(self.mesh, P("data"))),
                )
            if progress is not None:
                progress.step(self.batch_size)
            if (self.ckpt is not None and self.checkpoint_interval
                    and (b + 1) % self.checkpoint_interval == 0):
                self.ckpt.save(TrainState(codes=np.asarray(M), step=b + 1,
                                          alphas=np.asarray(alphas),
                                          prng_key=np.asarray(keybox["key"])))
        if self.ckpt is not None:
            self.ckpt.save(TrainState(codes=np.asarray(M), step=nb,
                                      alphas=np.asarray(alphas),
                                      prng_key=np.asarray(keybox["key"])))
            self.ckpt.wait()
        self.meta = replace(self.meta, points=np.asarray(M), comments=[])
        return self.meta
