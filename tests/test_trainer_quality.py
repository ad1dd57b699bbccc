"""Learning-quality tests for the minibatch throughput path.

The parity trainers are anchored bit-for-bit by goldens; these tests
anchor the FAST path's semantics: the minibatch SOM step (both update
modes, including the exact hyperparameters bench.py times) must actually
learn, stay finite in the saturating regime, and land near the parity
trainer's quality; minibatch olvq1 must land within ~1 pt of the
reference pipeline's 90.11 % accuracy (BASELINE.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from som_lvq_pak_tpu.data import Neighborhood, Topology, read_data
from som_lvq_pak_tpu.models.som import find_qerror, randinit
from som_lvq_pak_tpu.models.trainer import OLVQ1Trainer, SOMTrainer
from som_lvq_pak_tpu.utils.rng import CRandom

PARITY_QERROR = 3.571006  # somexample golden, per sample (BASELINE.md)
PARITY_ACCURACY = 90.11   # lvqexample golden, percent (BASELINE.md)


@pytest.fixture(scope="module")
def ex_dat():
    path = "/root/reference/ex.dat"
    if not os.path.exists(path):
        pytest.skip("reference data missing")
    return read_data(path)


def _rand_codes(ex_dat, neigh=Neighborhood.BUBBLE, xdim=12, ydim=8):
    rng = CRandom()
    rng.init_random(123)
    return randinit(ex_dat, Topology.HEXA, neigh, xdim, ydim, rng)


@pytest.mark.parametrize("update", ["sum", "mean"])
def test_somtrainer_reaches_parity_quality(ex_dat, update):
    """SOMTrainer on the somexample workload (12x8 hexa bubble, two-phase
    schedule) must land near the parity trainer's 3.571006 qerror."""
    codes = _rand_codes(ex_dat)
    q0 = find_qerror(codes, ex_dat, mode="fast") / ex_dat.n

    tr = SOMTrainer(codes, batch_size=128, update=update, use_pallas=False)
    codes = tr.fit(ex_dat, rlen=10000, alpha=0.05, radius=10.0)
    tr = SOMTrainer(codes, batch_size=128, update=update, use_pallas=False)
    codes = tr.fit(ex_dat, rlen=20000, alpha=0.02, radius=3.0)

    q = find_qerror(codes, ex_dat, mode="fast") / ex_dat.n
    assert np.isfinite(np.asarray(codes.points)).all()
    assert q < q0, f"training must reduce qerror ({q0} -> {q})"
    # near the parity trainer's level (not bit-equal: different semantics)
    assert q < 1.25 * PARITY_QERROR, f"fast-{update} qerror {q} too far from parity"


def test_som_sum_update_stable_at_bench_hyperparams(ex_dat):
    """The exact regime bench.py times (alpha=0.02, gaussian r=3, large
    batch) drives per-unit weight mass wsum >> 1; the saturating guard
    must keep the step finite AND learning (pre-guard this diverged)."""
    from som_lvq_pak_tpu.models.fast import (
        neighborhood_matrix,
        som_batch_step,
        unit_coords,
    )

    codes = _rand_codes(ex_dat, neigh=Neighborhood.GAUSSIAN)
    coords = unit_coords(12, 8, hexa=True)
    M = jnp.asarray(codes.points)
    X = jnp.asarray(ex_dat.points)
    key = jax.random.PRNGKey(0)

    # confirm the workload really is in the saturating regime
    idx = jax.random.randint(key, (2048,), 0, ex_dat.n)
    from som_lvq_pak_tpu.ops.distance import find_winners

    bmu, _ = find_winners(X[idx], M)
    W = neighborhood_matrix(coords, bmu, jnp.float32(3.0), jnp.float32(0.02), True)
    assert float(jnp.max(jnp.sum(W, axis=0))) > 1.0, "test workload not saturating"

    q0 = find_qerror(codes, ex_dat, mode="fast") / ex_dat.n
    for i in range(30):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (2048,), 0, ex_dat.n)
        M = som_batch_step(
            M, X[idx], coords, jnp.float32(0.02), jnp.float32(3.0),
            gaussian=True, update="sum", use_pallas=False,
        )
    Mn = np.asarray(M)
    assert np.isfinite(Mn).all(), "sum update diverged at bench hyperparameters"
    from dataclasses import replace

    q = find_qerror(replace(codes, points=Mn), ex_dat, mode="fast") / ex_dat.n
    assert q < q0, f"sum update must learn at bench hyperparameters ({q0} -> {q})"


def test_olvq1_trainer_accuracy_near_golden(ref_dir, golden_dir):
    """Minibatch OLVQ1Trainer from the balanced init codebook on ex1.dat,
    evaluated on ex2.dat: the batched alpha recurrence is an approximation
    of the sequential reference, but accuracy must land within ~1 pt of
    the 90.11 % golden (lvq_rout.c:584-697; Makefile:207-212 pipeline)."""
    from som_lvq_pak_tpu.models.eval import accuracy

    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    train = read_data(os.path.join(ref_dir, "ex1.dat"))
    test = read_data(os.path.join(ref_dir, "ex2.dat"))

    tr = OLVQ1Trainer(codes, batch_size=64, alpha=0.3, use_pallas=False, seed=1)
    out = tr.fit(train, rlen=5000)
    pct, _, _ = accuracy(test, out)
    assert pct > PARITY_ACCURACY - 1.5, f"olvq1 minibatch accuracy {pct:.2f}%"


def test_large_som_example_regression():
    """examples/large_som.py at small shapes: the map must be the size
    asked for (regression: arg-order bug trained a 3x2 map) and pass the
    example's own quality gates."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from examples.large_som import check_summary, run_large_som

    s = run_large_som(n=1500, dim=32, side=12, batch=256, rlen=20000,
                      sammon_sub=128)
    assert s["map"] == [12, 12]
    check_summary(s)
