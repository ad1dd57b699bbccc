"""TrainState checkpoint + progress meter tests."""

import io
import os

import numpy as np

from som_lvq_pak_tpu.utils.checkpoint import Checkpointer, TrainState
from som_lvq_pak_tpu.utils.progress import Mprint, StepTimer


def test_checkpoint_roundtrip(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "run"), keep=2)
    codes = np.random.rand(16, 4).astype(np.float32)
    alphas = np.full(16, 0.3, dtype=np.float32)
    for step in (10, 20, 30):
        ckpt.save(TrainState(codes=codes * step, step=step, alphas=alphas,
                             rng_state=12345, extra={"alpha": 0.05}))
    # keep=2: step 10 garbage-collected
    assert ckpt.steps() == [20, 30]
    st = ckpt.load()
    assert st.step == 30
    np.testing.assert_array_equal(st.codes, codes * 30)
    np.testing.assert_array_equal(st.alphas, alphas)
    assert st.rng_state == 12345
    assert st.extra == {"alpha": 0.05}
    st20 = ckpt.load(20)
    np.testing.assert_array_equal(st20.codes, codes * 20)


def test_checkpoint_background(tmp_path):
    with Checkpointer(str(tmp_path / "bg"), background=True) as ckpt:
        codes = np.zeros((4, 2), dtype=np.float32)
        ckpt.save(TrainState(codes=codes, step=1))
        codes += 99  # mutation after save must not affect the checkpoint
        ckpt.save(TrainState(codes=codes, step=2))
    st1 = ckpt.load(1)
    assert (st1.codes == 0).all()
    assert ckpt.latest_step() == 2


def test_checkpoint_empty(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "empty"))
    assert ckpt.load() is None
    assert ckpt.latest_step() is None


def test_mprint_format():
    buf = io.StringIO()
    mp = Mprint(stream=buf)
    mp(100)
    mp(50)
    mp(0)
    out = buf.getvalue()
    assert "-" * 60 in out       # the header ruler
    assert "sec." in out
    assert out.rstrip("\n").endswith("." * 60)  # finished bar


def test_step_timer():
    t = StepTimer()
    t.step(32)
    t.step(32)
    sps, xps = t.rates()
    assert sps > 0 and xps > 0
    assert "2 steps (64 samples)" in t.report()


def test_trainer_progress_hook(ref_dir):
    """som_train drives the progress callback with remaining counts."""
    from som_lvq_pak_tpu.data.dataset import Neighborhood, Topology
    from som_lvq_pak_tpu.data.io import read_data
    from som_lvq_pak_tpu.models import som
    from som_lvq_pak_tpu.utils.rng import CRandom

    data = read_data(os.path.join(ref_dir, "ex_ndy.dat"))
    codes = som.randinit(data, Topology.HEXA, Neighborhood.BUBBLE, 4, 3, CRandom(5))
    seen = []
    som.som_train(codes, data, rlen=10, alpha=0.05, radius=2.0,
                  progress=seen.append)
    assert seen == [10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
