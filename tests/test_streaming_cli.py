"""Bounded-memory streamed -buffer training/eval: byte parity against
the compiled reference (goldens generated with /tmp/ref_build binaries
at `vsom -buffer 300 -rand 1` / `olvq1 -buffer 400 -rand 1`) and
equality with the full-load buffered-order path (VERDICT r3 task 5)."""

import io
import os
import sys

import numpy as np
import pytest

from som_lvq_pak_tpu.cli import main
from som_lvq_pak_tpu.cli.params import verbose
from som_lvq_pak_tpu.data import read_data
from som_lvq_pak_tpu.data.streaming import StreamingReader, streamed_samples
from som_lvq_pak_tpu.models import lvq as mlvq
from som_lvq_pak_tpu.models import som as msom
from som_lvq_pak_tpu.utils.rng import CRandom


@pytest.fixture(autouse=True)
def reset_verbosity():
    verbose(1)
    yield
    verbose(1)


def run(tool, *flags):
    old_out = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = main([tool] + [str(f) for f in flags])
        return rc, sys.stdout.getvalue()
    finally:
        sys.stdout = old_out


def test_vsom_buffered_cli_matches_reference(ref_dir, golden_dir, tmp_path):
    """randinit + `vsom -buffer 300 -rand 1` through the STREAMED loader
    byte-matches the compiled reference's buffered run."""
    os.chdir(tmp_path)
    rc, _ = run("randinit", "-din", f"{ref_dir}/ex.dat", "-cout", "s0.cod",
                "-xdim", 12, "-ydim", 8, "-topol", "hexa", "-neigh",
                "bubble", "-rand", 123)
    assert rc == 0
    assert open("s0.cod").read().splitlines()[0] == \
        open(f"{golden_dir}/som_buf0.cod").read().splitlines()[0]
    rc, _ = run("vsom", "-din", f"{ref_dir}/ex.dat", "-cin", "s0.cod",
                "-cout", "sb.cod", "-rlen", 2000, "-alpha", 0.05,
                "-radius", 10, "-buffer", 300, "-rand", 1)
    assert rc == 0
    assert open("sb.cod").read() == open(f"{golden_dir}/som_buf.cod").read()


def test_olvq1_buffered_cli_matches_reference(ref_dir, golden_dir, tmp_path):
    """`olvq1 -buffer 400 -rand 1` (with the .lra sidecar resume)
    byte-matches the reference's buffered run."""
    os.chdir(tmp_path)
    with open(f"{golden_dir}/lvq_b.cod") as f:
        open("ob.cod", "w").write(f.read())
    with open(f"{golden_dir}/lvq_b.lra") as f:
        open("ob.lra", "w").write(f.read())
    rc, _ = run("olvq1", "-din", f"{ref_dir}/ex1.dat", "-cin", "ob.cod",
                "-cout", "obuf.cod", "-rlen", 2000, "-buffer", 400,
                "-rand", 1)
    assert rc == 0
    assert open("obuf.cod").read() == \
        open(f"{golden_dir}/lvq_obuf.cod").read()


def test_streamed_som_equals_fullload(ref_dir, golden_dir):
    """som_train over a StreamingReader == som_train over the fully
    loaded file with the same -buffer (bit equality), including the
    buffer > n LOADMODE_ALL switch (datafile.c:330-333)."""
    codes = read_data(os.path.join(golden_dir, "som_buf0.cod"))
    data = read_data(os.path.join(ref_dir, "ex.dat"))
    for buf in (300, 5000):  # buffered; > n switches to ALL mode
        rng_a, rng_b = CRandom(), CRandom()
        rng_a.init_random(1)
        rng_b.init_random(1)
        full = msom.som_train(codes, data, 2000, 0.05, 10.0,
                              random_order=True, rng=rng_a, buffer=buf)
        reader = StreamingReader(os.path.join(ref_dir, "ex.dat"), buf)
        stream = msom.som_train(codes, reader, 2000, 0.05, 10.0,
                                random_order=True, rng=rng_b)
        np.testing.assert_array_equal(full.points, stream.points)


def test_streamed_lvq23_equals_fullload(ref_dir, golden_dir):
    """lvq3_train over a StreamingReader == full-load buffered order."""
    codes = read_data(os.path.join(golden_dir, "lvq_b.cod"))
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    rng_a, rng_b = CRandom(), CRandom()
    rng_a.init_random(3)
    rng_b.init_random(3)
    full = mlvq.lvq3_train(codes, data, 1500, 0.05, 0.3, 0.1,
                           random_order=True, rng=rng_a, buffer=500)
    reader = StreamingReader(os.path.join(ref_dir, "ex1.dat"), 500)
    stream = mlvq.lvq3_train(codes, reader, 1500, 0.05, 0.3, 0.1,
                             random_order=True, rng=rng_b)
    np.testing.assert_array_equal(full.points, stream.points)


def test_streamed_eval_matches_full(ref_dir, golden_dir, tmp_path):
    """qerror (parity + qetype 1) and accuracy through -buffer equal the
    full-load results (same accumulation order, bounded memory)."""
    os.chdir(tmp_path)
    # qerror over the SOM golden map
    rc, full_q = run("qerror", "-din", f"{ref_dir}/ex.dat",
                     "-cin", f"{golden_dir}/som_buf.cod")
    rc2, buf_q = run("qerror", "-din", f"{ref_dir}/ex.dat",
                     "-cin", f"{golden_dir}/som_buf.cod", "-buffer", 700)
    assert rc == 0 and rc2 == 0
    assert full_q == buf_q
    rc, full_q2 = run("qerror", "-din", f"{ref_dir}/ex.dat",
                      "-cin", f"{golden_dir}/som_buf.cod",
                      "-qetype", 1, "-radius", 3)
    rc2, buf_q2 = run("qerror", "-din", f"{ref_dir}/ex.dat",
                      "-cin", f"{golden_dir}/som_buf.cod",
                      "-qetype", 1, "-radius", 3, "-buffer", 700)
    assert rc == 0 and rc2 == 0
    assert full_q2 == buf_q2
    # accuracy over the LVQ golden codebook
    rc, full_a = run("accuracy", "-din", f"{ref_dir}/ex2.dat",
                     "-cin", f"{golden_dir}/lvq_obuf.cod")
    rc2, buf_a = run("accuracy", "-din", f"{ref_dir}/ex2.dat",
                     "-cin", f"{golden_dir}/lvq_obuf.cod", "-buffer", 321)
    assert rc == 0 and rc2 == 0
    assert full_a == buf_a


def test_streamed_samples_order_matches_sample_order(ref_dir):
    """The stream's (chunk, row) visit order equals sample_order(...,
    buffer=B) index-for-index — the exact LCG contract both share."""
    from som_lvq_pak_tpu.models.common import sample_order

    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    n, rlen, buf = data.n, 4000, 777
    rng_a, rng_b = CRandom(), CRandom()
    rng_a.init_random(9)
    rng_b.init_random(9)
    want = sample_order(n, rlen, True, rng_a, buffer=buf)
    reader = StreamingReader(os.path.join(ref_dir, "ex1.dat"), buf)
    got = []
    base = 0
    cur = None
    for chunk, s in streamed_samples(reader, rlen, True, rng_b):
        if chunk is not cur:
            # chunks arrive in file order; recover the global row index
            if cur is not None:
                base = (base + cur.n) % n
            cur = chunk
        got.append((base + s) % n)
    np.testing.assert_array_equal(want, np.asarray(got, dtype=np.int32))


def test_streamed_tools_match_full(ref_dir, golden_dir, tmp_path):
    """visual/vcal/classify/knntest/cmatr through -buffer produce
    byte-identical output to their full-load runs."""
    os.chdir(tmp_path)
    som_cod = f"{golden_dir}/som_buf.cod"
    lvq_cod = f"{golden_dir}/lvq_obuf.cod"
    # visual: per-sample streamed writes
    rc, _ = run("visual", "-din", f"{ref_dir}/ex.dat", "-cin", som_cod,
                "-dout", "v_full.dat")
    rc2, _ = run("visual", "-din", f"{ref_dir}/ex.dat", "-cin", som_cod,
                 "-dout", "v_buf.dat", "-buffer", 700)
    assert rc == 0 and rc2 == 0
    assert open("v_full.dat").read() == open("v_buf.dat").read()
    # vcal: accumulated unit hitlists
    rc, _ = run("vcal", "-din", f"{ref_dir}/ex_fts.dat", "-cin", som_cod,
                "-cout", "c_full.cod")
    rc2, _ = run("vcal", "-din", f"{ref_dir}/ex_fts.dat", "-cin", som_cod,
                 "-cout", "c_buf.cod", "-buffer", 100)
    assert rc == 0 and rc2 == 0
    assert open("c_full.cod").read() == open("c_buf.cod").read()
    # classify: streamed entry + cfout writes
    rc, _ = run("classify", "-din", f"{ref_dir}/ex2.dat", "-cin", lvq_cod,
                "-dout", "cl_full.dat", "-cfout", "cl_full.cfo")
    rc2, _ = run("classify", "-din", f"{ref_dir}/ex2.dat", "-cin", lvq_cod,
                 "-dout", "cl_buf.dat", "-cfout", "cl_buf.cfo",
                 "-buffer", 321)
    assert rc == 0 and rc2 == 0
    assert open("cl_full.dat").read() == open("cl_buf.dat").read()
    assert open("cl_full.cfo").read() == open("cl_buf.cfo").read()
    # knntest + cmatr: accumulated tallies -> identical reports
    rc, full_k = run("knntest", "-din", f"{ref_dir}/ex2.dat",
                     "-cin", lvq_cod, "-knn", 3)
    rc2, buf_k = run("knntest", "-din", f"{ref_dir}/ex2.dat",
                     "-cin", lvq_cod, "-knn", 3, "-buffer", 500)
    assert rc == 0 and rc2 == 0
    assert full_k == buf_k
    rc, full_c = run("cmatr", "-din", f"{ref_dir}/ex2.dat", "-cin", lvq_cod)
    rc2, buf_c = run("cmatr", "-din", f"{ref_dir}/ex2.dat", "-cin", lvq_cod,
                     "-buffer", 500)
    assert rc == 0 and rc2 == 0
    assert full_c == buf_c


def test_streamed_setlabel_matches_full(ref_dir, golden_dir, tmp_path):
    """setlabel -buffer: streamed top-k merge (C insertion key) is
    byte-identical to the full-load run."""
    os.chdir(tmp_path)
    rc, _ = run("setlabel", "-din", f"{ref_dir}/ex1.dat",
                "-cin", f"{golden_dir}/lvq_obuf.cod",
                "-cout", "sl_full.cod", "-knn", 5)
    rc2, _ = run("setlabel", "-din", f"{ref_dir}/ex1.dat",
                 "-cin", f"{golden_dir}/lvq_obuf.cod",
                 "-cout", "sl_buf.cod", "-knn", 5, "-buffer", 321)
    assert rc == 0 and rc2 == 0
    assert open("sl_full.cod").read() == open("sl_buf.cod").read()


def test_streamed_with_empty_entries_matches_fullload(tmp_path):
    """Refill boundaries count ACCEPTED entries like the reference
    loader (skipped all-masked lines do not count, datafile.c:676-686),
    so streamed == full-load buffered output even when the file contains
    empty entries (r4 review finding)."""
    path = str(tmp_path / "emp.dat")
    rng = np.random.RandomState(3)
    with open(path, "w") as f:
        f.write("2\n")
        for i in range(10):
            if i == 4:
                f.write("x x L1\n")  # all-masked: loaded-entry skip
            f.write("%.3f %.3f L%d\n" % (rng.rand(), rng.rand(), i % 2 + 1))
    data = read_data(path)
    codes = data.take(np.arange(4))
    rng_a, rng_b = CRandom(), CRandom()
    rng_a.init_random(1)
    rng_b.init_random(1)
    full = mlvq.lvq1_train(codes, data, 30, 0.05, random_order=True,
                           rng=rng_a, buffer=4)
    reader = StreamingReader(path, 4)
    stream = mlvq.lvq1_train(codes, reader, 30, 0.05, random_order=True,
                             rng=rng_b)
    np.testing.assert_array_equal(full.points, stream.points)


def test_streamed_all_empty_file_raises(tmp_path):
    """A file whose every data line is all-masked must raise, not spin
    forever re-reading the file (r4 review finding)."""
    path = str(tmp_path / "allemp.dat")
    with open(path, "w") as f:
        f.write("2\n")
        for _ in range(5):
            f.write("x x\n")
    reader = StreamingReader(path, 2)
    with pytest.raises(ValueError, match="no .*entries"):
        list(streamed_samples(reader, 10, False, None))
