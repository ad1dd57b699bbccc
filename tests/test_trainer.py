"""Production trainer drivers: quality vs parity, streaming input,
checkpoint/resume, sharded execution."""

import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data.dataset import Neighborhood, Topology
from som_lvq_pak_tpu.data.io import read_data
from som_lvq_pak_tpu.data.streaming import StreamingReader
from som_lvq_pak_tpu.models import som
from som_lvq_pak_tpu.models.trainer import OLVQ1Trainer, SOMTrainer
from som_lvq_pak_tpu.utils.rng import CRandom


@pytest.fixture
def ex_dat(ref_dir):
    return read_data(os.path.join(ref_dir, "ex.dat"))


def _qerror_per_sample(codes, data):
    return som.find_qerror(codes, data, mode="fast") / data.n


def test_som_trainer_quality(ex_dat):
    """Minibatch training reaches a quantization error in the same range
    as the reference pipeline (3.57 per sample on ex.dat)."""
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 12, 8,
                        CRandom(123))
    q0 = _qerror_per_sample(init, ex_dat)
    tr = SOMTrainer(init, batch_size=64, update="mean", use_pallas=False, seed=1)
    out = tr.fit(ex_dat, rlen=11000, alpha=0.05, radius=10.0)
    q1 = _qerror_per_sample(out, ex_dat)
    assert q1 < q0 * 0.6
    assert q1 < 4.6  # parity pipeline reaches 3.571; batch mode close


def test_som_trainer_streaming_input(ex_dat, ref_dir):
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 8, 6,
                        CRandom(7))
    sr = StreamingReader(os.path.join(ref_dir, "ex.dat"), buffer=512)
    tr = SOMTrainer(init, batch_size=128, update="mean", use_pallas=False)
    out = tr.fit(sr.chunks(laps=None), rlen=2048, alpha=0.05, radius=6.0)
    assert _qerror_per_sample(out, ex_dat) < _qerror_per_sample(init, ex_dat)


def test_som_trainer_checkpoint_resume(ex_dat, tmp_path):
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 6, 4,
                        CRandom(3))
    d = str(tmp_path / "ck")
    tr = SOMTrainer(init, batch_size=128, checkpoint_dir=d,
                    checkpoint_interval=2, use_pallas=False, seed=5)
    full = tr.fit(ex_dat, rlen=128 * 8, alpha=0.05, radius=4.0)

    # re-run from the 4-step checkpoint: must reproduce the final map
    tr2 = SOMTrainer(init, batch_size=128, checkpoint_dir=d,
                     use_pallas=False, seed=5)
    st = tr2.ckpt.load(4)
    assert st is not None and st.step == 4
    # drop newer checkpoints, then resume
    for s in tr2.ckpt.steps():
        if s > 4:
            os.remove(os.path.join(d, f"step_{s}.npz"))
    resumed = tr2.fit(ex_dat, rlen=128 * 8, alpha=0.05, radius=4.0, resume=True)
    np.testing.assert_allclose(resumed.points, full.points, rtol=1e-6, atol=1e-6)


def test_olvq1_trainer_improves_accuracy(ref_dir):
    from som_lvq_pak_tpu.models import eval as ev
    from som_lvq_pak_tpu.models import lvq

    d1 = read_data(os.path.join(ref_dir, "ex1.dat"))
    d2 = read_data(os.path.join(ref_dir, "ex2.dat"))
    codes = lvq.eveninit(d1, noc=200)
    pct0, _, _ = ev.accuracy(d2, codes)
    tr = OLVQ1Trainer(codes, batch_size=32, use_pallas=False, seed=2)
    out = tr.fit(d1, rlen=5000)
    pct1, _, _ = ev.accuracy(d2, out)
    assert pct1 > pct0 - 0.5  # batch olvq1 must not degrade the init
    assert pct1 > 85.0


def test_som_trainer_sharded(ex_dat):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 8, 4,
                        CRandom(11))
    tr = SOMTrainer(init, batch_size=64, mesh=mesh, use_pallas=False, seed=4)
    out = tr.fit(ex_dat, rlen=1024, alpha=0.05, radius=4.0)
    assert _qerror_per_sample(out, ex_dat) < _qerror_per_sample(init, ex_dat)


def test_olvq1_batch_alpha_saturates():
    """Many wrong hits on one code in a single batch must saturate its
    learning rate at the clip, never go negative (the sequential
    reference clips after every sample, lvq_rout.c:668-672)."""
    import jax.numpy as jnp

    from som_lvq_pak_tpu.models.fast import olvq1_batch_step

    codes = jnp.asarray([[0.0, 0.0], [10.0, 10.0]], dtype=jnp.float32)
    clabels = jnp.asarray([1, 2])
    alphas = jnp.asarray([0.3, 0.3], dtype=jnp.float32)
    # 8 samples, all winning code 0, all labeled wrong
    xb = jnp.tile(jnp.asarray([[0.1, 0.1]], dtype=jnp.float32), (8, 1))
    xl = jnp.full((8,), 2)
    _, new_a = olvq1_batch_step(codes, clabels, alphas, xb, xl,
                                clip=0.3, use_pallas=False)
    a = np.asarray(new_a)
    assert (a > 0).all() and (a <= 0.3 + 1e-6).all(), a


def test_som_trainer_stream_exhaustion_raises(ex_dat, ref_dir):
    """A stream that runs dry before rlen must raise (silent
    under-training was a r1 defect), unless allow_short_stream=True."""
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 6, 4,
                        CRandom(7))
    sr = StreamingReader(os.path.join(ref_dir, "ex.dat"), buffer=512)
    tr = SOMTrainer(init, batch_size=128, use_pallas=False)
    with pytest.raises(RuntimeError, match="stream exhausted"):
        tr.fit(sr.chunks(laps=1), rlen=8192, alpha=0.05, radius=4.0)

    sr = StreamingReader(os.path.join(ref_dir, "ex.dat"), buffer=512)
    tr = SOMTrainer(init, batch_size=128, use_pallas=False)
    out = tr.fit(sr.chunks(laps=1), rlen=8192, alpha=0.05, radius=4.0,
                 allow_short_stream=True)
    assert np.isfinite(out.points).all()


def test_som_trainer_streaming_masked_weighted(golden_dir):
    """Streaming chunks carrying masks and weights flow through to the
    masked minibatch step."""
    sr = StreamingReader(os.path.join(golden_dir, "wmask.dat"), buffer=32)
    codes = read_data(os.path.join(golden_dir, "wmask_r.cod"))
    data = read_data(os.path.join(golden_dir, "wmask.dat"))
    tr = SOMTrainer(codes, batch_size=16, use_pallas=False, seed=3)
    out = tr.fit(sr.chunks(laps=None), rlen=480, alpha=0.05, radius=3.0,
                 use_weights=True)
    assert np.isfinite(out.points).all()
    q = som.find_qerror(out, data, mode="parity") / data.n
    q0 = som.find_qerror(codes, data, mode="parity") / data.n
    assert q < 1.5 * q0


def test_olvq1_trainer_streaming_input(ref_dir):
    """OLVQ1Trainer with a StreamingReader input (the -buffer analogue
    for LVQ training, lvqtrain.c:181) trains to a usable accuracy."""
    from som_lvq_pak_tpu.models import eval as ev
    from som_lvq_pak_tpu.models import lvq

    d1 = read_data(os.path.join(ref_dir, "ex1.dat"))
    d2 = read_data(os.path.join(ref_dir, "ex2.dat"))
    codes = lvq.eveninit(d1, noc=100)
    sr = StreamingReader(os.path.join(ref_dir, "ex1.dat"), buffer=256)
    tr = OLVQ1Trainer(codes, batch_size=64, use_pallas=False, seed=2)
    out = tr.fit(sr.chunks(laps=None), rlen=3000)
    pct, _, _ = ev.accuracy(d2, out)
    assert pct > 82.0

    sr = StreamingReader(os.path.join(ref_dir, "ex1.dat"), buffer=256)
    tr = OLVQ1Trainer(codes, batch_size=64, use_pallas=False, seed=2)
    with pytest.raises(RuntimeError, match="stream exhausted"):
        tr.fit(sr.chunks(laps=1), rlen=30000)


def test_lvq_trainer_streamed_batches_exact(ref_dir):
    """The LVQ streamed superblock path must feed EXACTLY the stream's
    batches in order — including a masked chunk mid-stream (its batch
    rides the masked kernel; clean batches in the same transfer block
    keep mask=None) — matching a manual lvq1_batch_step drive."""
    import jax.numpy as jnp

    from som_lvq_pak_tpu.data.dataset import Dataset
    from som_lvq_pak_tpu.models import lvq
    from som_lvq_pak_tpu.models.fast import lvq1_batch_step

    d1 = read_data(os.path.join(ref_dir, "ex1.dat"))
    codes = lvq.eveninit(d1, noc=50)
    X = d1.points[:256]
    L = d1.first_labels()[:256]
    mask = np.zeros((64, d1.dim), np.uint8)
    mask[:, 3] = 1

    def stream():
        yield Dataset(points=X[:64], labels=L[:64])
        yield Dataset(points=X[64:128], labels=L[64:128], mask=mask)
        yield Dataset(points=X[128:192], labels=L[128:192])
        yield Dataset(points=X[192:256], labels=L[192:256])

    from som_lvq_pak_tpu.models.trainer import LVQTrainer

    tr = LVQTrainer(codes, algorithm="lvq1", batch_size=64,
                    use_pallas=False, seed=0)
    out = tr.fit(stream(), rlen=256, alpha=0.05)

    from som_lvq_pak_tpu.models.common import alpha_schedule

    talp = alpha_schedule(256, 0.05, "linear")[::64][:4]
    M = jnp.asarray(codes.points)
    cl = jnp.asarray(codes.first_labels())
    for b in range(4):
        mb = jnp.asarray(mask) if b == 1 else None
        M = lvq1_batch_step(M, cl, jnp.asarray(X[b * 64:(b + 1) * 64]),
                            jnp.asarray(L[b * 64:(b + 1) * 64]),
                            jnp.float32(talp[b]), use_pallas=False, mask=mb)
    np.testing.assert_allclose(out.points, np.asarray(M), rtol=1e-6,
                               atol=1e-6)


def test_som_trainer_checkpoint_resume_pallas(ex_dat, tmp_path):
    """Resume through the Pallas path reproduces the uninterrupted run
    (lap permutations derive from fold_in(seed, lap), so a restart
    regenerates the identical batch sequence).  40 batches = a full
    32-step VMEM group + a partial group; the VMEM path checkpoints at
    group boundaries, so resume restarts from step 32 exactly."""
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 6, 4,
                        CRandom(3))
    d = str(tmp_path / "ckp")
    tr = SOMTrainer(init, batch_size=128, checkpoint_dir=d,
                    checkpoint_interval=2, use_pallas=True, seed=5)
    full = tr.fit(ex_dat, rlen=128 * 40, alpha=0.05, radius=4.0)

    tr2 = SOMTrainer(init, batch_size=128, checkpoint_dir=d,
                     use_pallas=True, seed=5)
    assert 32 in tr2.ckpt.steps(), tr2.ckpt.steps()
    for s in tr2.ckpt.steps():
        if s > 32:
            os.remove(os.path.join(d, f"step_{s}.npz"))
    resumed = tr2.fit(ex_dat, rlen=128 * 40, alpha=0.05, radius=4.0, resume=True)
    np.testing.assert_allclose(resumed.points, full.points, rtol=1e-5, atol=1e-5)


def test_vmem_path_interval_checkpoints_fire_between_boundaries(ex_dat,
                                                                tmp_path):
    """The VMEM multi-step path checkpoints only at 32-batch group
    boundaries; an interval that doesn't divide a boundary step must
    still fire whenever >= interval batches elapsed since the last save
    (ADVICE r2: interval=10 with 63 batches used to write nothing)."""
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 6, 4,
                        CRandom(3))
    d = str(tmp_path / "ckint")
    tr = SOMTrainer(init, batch_size=32, checkpoint_dir=d,
                    checkpoint_interval=10, use_pallas=True, seed=5)
    tr.fit(ex_dat, rlen=32 * 63, alpha=0.05, radius=4.0)
    steps = tr.ckpt.steps()
    assert any(s < 63 for s in steps), f"no interval checkpoint: {steps}"


def test_som_trainer_streaming_resume_fast_forwards(ex_dat, ref_dir,
                                                    tmp_path):
    """Resume with a streaming input must fast-forward the stream by
    start*batch_size samples so resumed batches train on their original
    stream positions (ADVICE r2: it used to replay the stream head)."""
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.BUBBLE, 6, 4,
                        CRandom(3))
    path = os.path.join(ref_dir, "ex.dat")
    d = str(tmp_path / "cksr")
    kw = dict(batch_size=128, use_pallas=False, seed=5, update="mean")
    tr = SOMTrainer(init, checkpoint_dir=d, checkpoint_interval=3, **kw)
    full = tr.fit(StreamingReader(path, buffer=512).chunks(laps=None),
                  rlen=128 * 10, alpha=0.05, radius=4.0)

    tr2 = SOMTrainer(init, checkpoint_dir=d, **kw)
    assert 6 in tr2.ckpt.steps(), tr2.ckpt.steps()
    for s in tr2.ckpt.steps():
        if s > 6:
            os.remove(os.path.join(d, f"step_{s}.npz"))
    resumed = tr2.fit(StreamingReader(path, buffer=512).chunks(laps=None),
                      rlen=128 * 10, alpha=0.05, radius=4.0)
    np.testing.assert_allclose(resumed.points, full.points,
                               rtol=1e-5, atol=1e-5)


def test_olvq1_streaming_resume_fast_forwards(ref_dir, tmp_path):
    """Same stream fast-forward contract for OLVQ1Trainer."""
    from som_lvq_pak_tpu.models import lvq

    d1 = read_data(os.path.join(ref_dir, "ex1.dat"))
    codes = lvq.eveninit(d1, noc=100)
    path = os.path.join(ref_dir, "ex1.dat")
    d = str(tmp_path / "ckolvq")
    kw = dict(batch_size=64, use_pallas=False, seed=2)
    tr = OLVQ1Trainer(codes, checkpoint_dir=d, checkpoint_interval=4, **kw)
    full = tr.fit(StreamingReader(path, buffer=256).chunks(laps=None),
                  rlen=64 * 12)

    tr2 = OLVQ1Trainer(codes, checkpoint_dir=d, **kw)
    assert 8 in tr2.ckpt.steps(), tr2.ckpt.steps()
    for s in tr2.ckpt.steps():
        if s > 8:
            os.remove(os.path.join(d, f"step_{s}.npz"))
    resumed = tr2.fit(StreamingReader(path, buffer=256).chunks(laps=None),
                      rlen=64 * 12)
    np.testing.assert_allclose(resumed.points, full.points,
                               rtol=1e-6, atol=1e-6)


def test_som_trainer_streaming_rides_fused_path(ex_dat, ref_dir):
    """Streams (no masks) now ride the fused Pallas step — the large-N
    streamed SOM is the north-star workload.  On CPU the kernel runs in
    interpret mode; the result must match the two-kernel (use_pallas=
    False) path on the same stream order to float tolerance (identical
    step semantics: winner of batch t against codes after step t-1)."""
    from som_lvq_pak_tpu.data.dataset import Dataset

    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(7))
    X = ex_dat.points[:1024]

    def stream():
        for lo in range(0, 1024, 256):
            yield Dataset(points=X[lo:lo + 256])

    tr_f = SOMTrainer(init, batch_size=128, use_pallas=True, vmem_steps=False)
    out_f = tr_f.fit(stream(), rlen=1024, alpha=0.05, radius=4.0)
    tr_u = SOMTrainer(init, batch_size=128, use_pallas=False)
    out_u = tr_u.fit(stream(), rlen=1024, alpha=0.05, radius=4.0)
    # fp evaluation order differs between the kernels (argmin flips on
    # near-ties compound over batches); agreement is to ~1e-2
    np.testing.assert_allclose(out_f.points, out_u.points, rtol=2e-2,
                               atol=2e-2)
    q_f = _qerror_per_sample(out_f, ex_dat)
    q_u = _qerror_per_sample(out_u, ex_dat)
    assert abs(q_f - q_u) < 0.02 * q_u


def test_som_trainer_streaming_masked_chunk_fallback(ex_dat):
    """A masked chunk inside an otherwise clean stream is handled by the
    per-batch two-kernel fallback (the fused kernel carries no
    per-component mask) and must match the all-unfused run."""
    from som_lvq_pak_tpu.data.dataset import Dataset

    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 6, 6,
                        CRandom(9))
    X = ex_dat.points[:512]
    mask = np.zeros((128, ex_dat.dim), np.uint8)
    mask[:, 2] = 1  # component 2 masked for the whole second chunk

    def stream():
        yield Dataset(points=X[:128])
        yield Dataset(points=X[128:256], mask=mask)
        yield Dataset(points=X[256:384])
        yield Dataset(points=X[384:512])

    tr_f = SOMTrainer(init, batch_size=128, use_pallas=True, vmem_steps=False)
    out_f = tr_f.fit(stream(), rlen=512, alpha=0.05, radius=3.0)
    tr_u = SOMTrainer(init, batch_size=128, use_pallas=False)
    out_u = tr_u.fit(stream(), rlen=512, alpha=0.05, radius=3.0)
    np.testing.assert_allclose(out_f.points, out_u.points, rtol=2e-2,
                               atol=2e-2)


def test_som_trainer_stream_bf16_quality(ex_dat):
    """stream_bf16=True ships streamed batches in bfloat16 (halving the
    host->device bytes — the TPU-tunnel ingest lever, VERDICT r4 task 4);
    only the input quantization changes, so the trained map's qerror
    must stay within a fraction of a percent of the f32-streamed run."""
    from som_lvq_pak_tpu.data.dataset import Dataset

    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(11))
    X = ex_dat.points[:2048]

    def stream():
        for lo in range(0, 2048, 256):
            yield Dataset(points=X[lo:lo + 256])

    out_f32 = SOMTrainer(init, batch_size=256, use_pallas=True).fit(
        stream(), rlen=2048, alpha=0.05, radius=4.0)
    out_bf16 = SOMTrainer(init, batch_size=256, use_pallas=True,
                          stream_bf16=True).fit(
        stream(), rlen=2048, alpha=0.05, radius=4.0)
    data = Dataset(points=X)
    q32 = som.find_qerror(out_f32, data, mode="fast") / data.n
    q16 = som.find_qerror(out_bf16, data, mode="fast") / data.n
    assert abs(q16 - q32) / q32 < 0.005, (q32, q16)


def test_som_trainer_streaming_vmem_group_path(ex_dat):
    """Small-map streams ride the VMEM multi-step group kernel (the 16x
    path); result must match the two-kernel path on the same stream."""
    from som_lvq_pak_tpu.data.dataset import Dataset

    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(5))
    X = ex_dat.points[:1024]

    def stream():
        for lo in range(0, 1024, 256):
            yield Dataset(points=X[lo:lo + 256])

    tr_v = SOMTrainer(init, batch_size=128, use_pallas=True)  # vmem auto
    out_v = tr_v.fit(stream(), rlen=1024, alpha=0.05, radius=4.0)
    tr_u = SOMTrainer(init, batch_size=128, use_pallas=False)
    out_u = tr_u.fit(stream(), rlen=1024, alpha=0.05, radius=4.0)
    np.testing.assert_allclose(out_v.points, out_u.points, rtol=2e-2,
                               atol=2e-2)


def test_som_trainer_streaming_vmem_masked_group_fallback(ex_dat):
    """A masked chunk makes its VMEM group fall back to per-batch
    two-kernel steps; the run must still match the all-unfused path."""
    from som_lvq_pak_tpu.data.dataset import Dataset

    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(6))
    X = ex_dat.points[:512]
    mask = np.zeros((128, ex_dat.dim), np.uint8)
    mask[:, 1] = 1

    def stream():
        yield Dataset(points=X[:128])
        yield Dataset(points=X[128:256], mask=mask)
        yield Dataset(points=X[256:512])

    tr_v = SOMTrainer(init, batch_size=128, use_pallas=True)
    out_v = tr_v.fit(stream(), rlen=512, alpha=0.05, radius=3.0)
    tr_u = SOMTrainer(init, batch_size=128, use_pallas=False)
    out_u = tr_u.fit(stream(), rlen=512, alpha=0.05, radius=3.0)
    np.testing.assert_allclose(out_v.points, out_u.points, rtol=2e-2,
                               atol=2e-2)


def test_som_trainer_tp_mesh_fused_path(ex_dat):
    """On a pure-TP mesh (data=1) the trainer runs the pipelined fused
    TP step; the result must match the two-pass mesh path on the same
    batches to float tolerance."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, data=1, model=8)
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(13))
    tr_f = SOMTrainer(init, batch_size=128, mesh=mesh, use_pallas=True,
                      seed=4)
    out_f = tr_f.fit(ex_dat, rlen=1024, alpha=0.05, radius=4.0)
    tr_u = SOMTrainer(init, batch_size=128, mesh=mesh, use_pallas=False,
                      seed=4)
    out_u = tr_u.fit(ex_dat, rlen=1024, alpha=0.05, radius=4.0)
    np.testing.assert_allclose(out_f.points, out_u.points, rtol=2e-2,
                               atol=2e-2)
    q_f = _qerror_per_sample(out_f, ex_dat)
    q_u = _qerror_per_sample(out_u, ex_dat)
    assert abs(q_f - q_u) < 0.05 * q_u, (q_f, q_u)


def test_lvq_trainer_mesh_matches_single_device(ref_dir):
    """LVQTrainer on the (data, model) mesh equals the single-device
    run batch for batch (same keybox seed -> same batches)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.models.trainer import LVQTrainer
    from som_lvq_pak_tpu.parallel.mesh import make_mesh

    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    base = data.take(np.arange(128))  # 128 codes from the data
    mesh = make_mesh(8)
    for algorithm in ("lvq1", "lvq3"):
        tr_m = LVQTrainer(base, algorithm=algorithm, batch_size=64,
                          mesh=mesh, use_pallas=False, seed=9)
        out_m = tr_m.fit(data, rlen=64 * 6, alpha=0.05)
        tr_s = LVQTrainer(base, algorithm=algorithm, batch_size=64,
                          use_pallas=False, seed=9)
        out_s = tr_s.fit(data, rlen=64 * 6, alpha=0.05)
        np.testing.assert_allclose(out_m.points, out_s.points,
                                   rtol=1e-5, atol=1e-5)


def test_som_trainer_mixed_mesh_fused_path(ex_dat):
    """On a mixed 2x4 mesh the trainer takes the accumulate-psum-blend
    fused step (use_fused_mixed); result matches the two-pass mesh path
    on the same batches to float tolerance."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from som_lvq_pak_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, data=2, model=4)
    init = som.randinit(ex_dat, Topology.HEXA, Neighborhood.GAUSSIAN, 8, 8,
                        CRandom(13))
    tr_f = SOMTrainer(init, batch_size=128, mesh=mesh, use_pallas=True,
                      seed=4)
    out_f = tr_f.fit(ex_dat, rlen=1024, alpha=0.05, radius=4.0)
    tr_u = SOMTrainer(init, batch_size=128, mesh=mesh, use_pallas=False,
                      seed=4)
    out_u = tr_u.fit(ex_dat, rlen=1024, alpha=0.05, radius=4.0)
    np.testing.assert_allclose(out_f.points, out_u.points, rtol=2e-2,
                               atol=2e-2)
    q_f = _qerror_per_sample(out_f, ex_dat)
    q_u = _qerror_per_sample(out_u, ex_dat)
    assert abs(q_f - q_u) < 0.05 * q_u, (q_f, q_u)
