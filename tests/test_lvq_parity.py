"""Golden parity tests for the LVQ pipeline: every stage of the
lvqexample chain byte-identical, final accuracy 90.11 % (BASELINE.md)."""

import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import read_data, write_data
from som_lvq_pak_tpu.models.eval import accuracy, classify, confusion_matrix, knn_accuracy, mcnemar
from som_lvq_pak_tpu.models.lvq import (
    balance,
    eveninit,
    lvq1_train,
    lvq2_train,
    lvq3_train,
    olvq1_train,
)
from som_lvq_pak_tpu.utils.rng import CRandom


def _write_str(ds):
    buf = io.StringIO()
    write_data(ds, None, fileobj=buf)
    return buf.getvalue()


@pytest.fixture(scope="function")
def ex1(ref_dir):
    return read_data(os.path.join(ref_dir, "ex1.dat"))


@pytest.fixture(scope="function")
def ex2(ref_dir):
    return read_data(os.path.join(ref_dir, "ex2.dat"))


def test_eveninit_matches_golden(ex1, golden_dir):
    codes = eveninit(ex1, noc=200, knn=5)
    with open(os.path.join(golden_dir, "lvq_e.cod")) as f:
        assert _write_str(codes) == f.read()


def test_balance_matches_golden(ex1, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_e.cod"))
    out, alphas = None, None
    out = balance(codes, ex1, knn=5)
    with open(os.path.join(golden_dir, "lvq_b.cod")) as f:
        assert _write_str(out) == f.read()


def test_balance_alpha_sidecar(ex1, golden_dir, tmp_path):
    """balance's olvq1 pass writes the .lra sidecar the later olvq1 run
    resumes from (balance.c:195-202 + datafile.c:1062-1086)."""
    codes = read_data(os.path.join(golden_dir, "lvq_e.cod"))
    out = balance(codes, ex1, knn=5, alpha_file_out=str(tmp_path / "b.cod"))
    with open(tmp_path / "b.lra") as f:
        ours = f.read()
    with open(os.path.join(golden_dir, "lvq_b.lra")) as f:
        golden = f.read()
    # the reference's stale num_entries makes the sidecar shorter than
    # the codebook (197 lines for 200 codes) — byte-replicated
    assert ours == golden
    assert len(ours.splitlines()) < out.n


def test_olvq1_resume_matches_golden(ex1, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    from som_lvq_pak_tpu.data.io import read_alpha_file

    alphas = read_alpha_file(os.path.join(golden_dir, "lvq_b.lra"), codes.n)
    out = olvq1_train(codes, ex1, rlen=5000, alpha=0.0, init_alphas=alphas)
    with open(os.path.join(golden_dir, "lvq_o.cod")) as f:
        assert _write_str(out) == f.read()


def test_accuracy_golden(ex1, ex2, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    pct, report, cf = accuracy(ex2, codes)
    with open(os.path.join(golden_dir, "lvq_accuracy.txt")) as f:
        assert report == f.read()
    assert "%.2f" % pct == "90.11"
    with open(os.path.join(golden_dir, "lvq_o.cfo")) as f:
        golden_cf = [int(x) for x in f.read().split()]
    assert cf.tolist() == golden_cf


def test_olvq1_random_order_matches_golden(ex1, golden_dir):
    """-rand 71: LCG-seeded shuffle of the sample order."""
    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    from som_lvq_pak_tpu.data.io import read_alpha_file

    alphas = read_alpha_file(os.path.join(golden_dir, "lvq_b.lra"), codes.n)
    rng = CRandom()
    rng.init_random(71)
    out = olvq1_train(
        codes, ex1, rlen=5000, alpha=0.0, init_alphas=alphas, random_order=True, rng=rng
    )
    with open(os.path.join(golden_dir, "lvq_or.cod")) as f:
        assert _write_str(out) == f.read()


def test_lvq1_matches_golden(ex1, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    out = lvq1_train(codes, ex1, rlen=5000, alpha=0.05)
    with open(os.path.join(golden_dir, "lvq1.cod")) as f:
        assert _write_str(out) == f.read()


def test_lvq2_matches_golden(ex1, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    out = lvq2_train(codes, ex1, rlen=5000, alpha=0.05, winlen=0.3)
    with open(os.path.join(golden_dir, "lvq2.cod")) as f:
        assert _write_str(out) == f.read()


def test_lvq3_matches_golden(ex1, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    out = lvq3_train(codes, ex1, rlen=5000, alpha=0.05, winlen=0.3, epsilon=0.1)
    with open(os.path.join(golden_dir, "lvq3.cod")) as f:
        assert _write_str(out) == f.read()


def test_knntest_golden(ex2, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    pct, report = knn_accuracy(ex2, codes, knn=5)
    with open(os.path.join(golden_dir, "knntest.txt")) as f:
        assert report == f.read()


def test_classify_golden(ex2, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    out, _ = classify(ex2, codes)
    with open(os.path.join(golden_dir, "classify.dat")) as f:
        assert _write_str(out) == f.read()


def test_cmatr_golden(ex2, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    report, mat, ok = confusion_matrix(ex2, codes)
    with open(os.path.join(golden_dir, "cmatr.txt")) as f:
        assert report == f.read()
    assert mat.sum() == ex2.n
    assert ok.sum() == mat.trace()


def test_mcnemar_golden(golden_dir):
    c1 = np.loadtxt(os.path.join(golden_dir, "lvq_o.cfo"), dtype=np.int64)
    c2 = np.loadtxt(os.path.join(golden_dir, "lvq_b.cfo"), dtype=np.int64)
    report = mcnemar(c1, c2)
    with open(os.path.join(golden_dir, "mcnemar.txt")) as f:
        assert report == f.read()


def test_olvq1_fast_close_to_parity(ex1, ex2, golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    par = olvq1_train(codes, ex1, rlen=2000, alpha=0.3, mode="parity")
    fast = olvq1_train(codes, ex1, rlen=2000, alpha=0.3, mode="fast")
    pp, _, _ = accuracy(ex2, par)
    pf, _, _ = accuracy(ex2, fast)
    assert abs(pp - pf) < 1.0
