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
    ):
        import jax

        if not codes.is_map:
            raise ValueError("SOMTrainer needs a map codebook")
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

        self._step_fn = None
        if mesh is not None:
            from ..parallel.sharded import make_sharded_som_train_step

            self._sharded = make_sharded_som_train_step(
                mesh, gaussian=self.gaussian, use_pallas=use_pallas
            )

    # -- internals -------------------------------------------------------

    def _one_step(self, M, xb, a, r):
        import jax.numpy as jnp

        if self.mesh is None:
            return som_batch_step(
                M, xb, self.coords, jnp.float32(a), jnp.float32(r),
                gaussian=self.gaussian, update=self.update,
                use_pallas=self.use_pallas,
                xdim=self.meta.xdim,
                hexa=self.meta.topol == Topology.HEXA,
            )
        from ..parallel.sharded import shard_arrays

        cs, xs, cl, cf = shard_arrays(self.mesh, M, xb, self.coords)
        return self._sharded(cs, xs, cl, cf, jnp.float32(a), jnp.float32(r))

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
    ) -> Dataset:
        """Train for `rlen` samples (grouped into batches).  `data` is a
        Dataset (sampled with replacement) or an iterable of chunk
        Datasets (e.g. StreamingReader.chunks(laps=None)).  With a
        checkpoint dir and resume=True, continues from the latest step."""
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

        if isinstance(data, Dataset):
            X = jnp.asarray(data.points)
            n = data.n

            def batches():
                nonlocal key
                for b in range(start, nb):
                    key, sub = jax.random.split(key)
                    idx = jax.random.randint(sub, (self.batch_size,), 0, n)
                    yield b, X[idx]
        else:
            chunk_iter = iter(data)

            def batches():
                buf = None
                b = start
                while b < nb:
                    try:
                        chunk = next(chunk_iter)
                    except StopIteration:
                        return
                    arr = jnp.asarray(chunk.points)
                    buf = arr if buf is None else jnp.concatenate([buf, arr])
                    while buf.shape[0] >= self.batch_size and b < nb:
                        yield b, buf[: self.batch_size]
                        buf = buf[self.batch_size:]
                        b += 1

        for b, xb in batches():
            M = self._one_step(M, xb, talp[b], trad[b])
            if progress is not None:
                progress.step(self.batch_size)
            if (
                self.ckpt is not None
                and self.checkpoint_interval
                and (b + 1) % self.checkpoint_interval == 0
            ):
                self.ckpt.save(TrainState(
                    codes=np.asarray(M), step=b + 1,
                    prng_key=np.asarray(key),
                    extra={"alpha": float(alpha), "radius": float(radius)},
                ))

        if self.ckpt is not None:
            self.ckpt.save(TrainState(
                codes=np.asarray(M), step=nb, prng_key=np.asarray(key),
            ))
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

    def fit(self, data: Dataset, rlen: int, resume: bool = True,
            progress: Optional[StepTimer] = None) -> Dataset:
        import jax
        import jax.numpy as jnp

        nb = max(1, rlen // self.batch_size)
        M = jnp.asarray(self.meta.points)
        clabels = jnp.asarray(self.meta.first_labels())
        alphas = jnp.full((self.meta.n,), self.clip, dtype=jnp.float32)
        key = jax.random.PRNGKey(self.seed)
        start = 0
        if self.ckpt is not None and resume:
            st = self.ckpt.load()
            if st is not None and st.step < nb:
                M = jnp.asarray(st.codes)
                if st.alphas is not None:
                    alphas = jnp.asarray(st.alphas)
                if st.prng_key is not None:
                    key = jnp.asarray(st.prng_key)
                start = st.step

        X = jnp.asarray(data.points)
        xlab = jnp.asarray(data.first_labels())
        n = data.n
        for b in range(start, nb):
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (self.batch_size,), 0, n)
            xb, xl = X[idx], xlab[idx]
            if self.mesh is None:
                M, alphas = olvq1_batch_step(M, clabels, alphas, xb, xl,
                                             clip=self.clip,
                                             use_pallas=self.use_pallas)
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
                                          prng_key=np.asarray(key)))
        if self.ckpt is not None:
            self.ckpt.save(TrainState(codes=np.asarray(M), step=nb,
                                      alphas=np.asarray(alphas),
                                      prng_key=np.asarray(key)))
            self.ckpt.wait()
        self.meta = replace(self.meta, points=np.asarray(M), comments=[])
        return self.meta
