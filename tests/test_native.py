"""Native C++ IO engine tests (native/somvq_io.cpp via ctypes): byte
parity with the Python parser/writer over every fixture, plus the
streaming loader built on top."""

import glob
import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import native_io
from som_lvq_pak_tpu.data.io import read_data, write_data
from som_lvq_pak_tpu.data.labels import GLOBAL_LABELS, LabelTable
from som_lvq_pak_tpu.data.streaming import StreamingReader

needs_native = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


def _fixtures(ref_dir, golden_dir):
    return [
        os.path.join(ref_dir, f)
        for f in ("ex.dat", "ex1.dat", "ex2.dat", "ex_fts.dat", "ex_ndy.dat")
    ] + sorted(glob.glob(os.path.join(golden_dir, "*.cod")))


@needs_native
def test_native_read_parity(ref_dir, golden_dir, monkeypatch):
    for f in _fixtures(ref_dir, golden_dir):
        GLOBAL_LABELS.reset()
        monkeypatch.setenv("SOMVQ_NATIVE", "0")
        a = read_data(f)
        GLOBAL_LABELS.reset()
        monkeypatch.setenv("SOMVQ_NATIVE", "1")
        b = read_data(f)
        assert a.n == b.n and a.dim == b.dim, f
        assert (a.points == b.points).all(), f
        assert (a.mask is None) == (b.mask is None), f
        if a.mask is not None:
            assert (a.mask == b.mask).all(), f
        assert (a.labels is None) == (b.labels is None), f
        if a.labels is not None:
            assert (a.labels == b.labels).all(), f
        assert (a.topol, a.neigh, a.xdim, a.ydim) == (b.topol, b.neigh, b.xdim, b.ydim)
        assert a.comments == b.comments, f


@needs_native
def test_native_write_parity(ref_dir, golden_dir, monkeypatch):
    for f in _fixtures(ref_dir, golden_dir):
        GLOBAL_LABELS.reset()
        ds = read_data(f)
        sa, sb = io.StringIO(), io.StringIO()
        monkeypatch.setenv("SOMVQ_NATIVE", "0")
        write_data(ds, "x", fileobj=sa)
        monkeypatch.setenv("SOMVQ_NATIVE", "1")
        write_data(ds, "x", fileobj=sb)
        assert sa.getvalue() == sb.getvalue(), f


@needs_native
def test_native_masks_weights_fixed(tmp_path):
    path = str(tmp_path / "m.dat")
    with open(path, "w") as f:
        f.write("3\n1 x 3 A weight=2 fixed=1,2\nx x x EMPTY\n4 5 6 B C\n")
    GLOBAL_LABELS.reset()
    ds = native_io.read_data_native(path, skip_empty=True)
    assert ds.n == 2  # the all-masked line is skipped
    assert ds.mask is not None and ds.mask[0].tolist() == [0, 1, 0]
    assert ds.weight is not None and ds.weight[0] == 2.0
    assert ds.fixed is not None and ds.fixed[0].tolist() == [1, 2]
    assert ds.labels.shape[1] == 2  # B C on the last line

    GLOBAL_LABELS.reset()
    keep = native_io.read_data_native(path, skip_empty=False)
    assert keep.n == 3


@needs_native
def test_native_multithread_parse_identical(tmp_path, monkeypatch):
    """The slab-parallel parser (>4 MB bodies, thread-per-slab with an
    order-preserving merge — VERDICT r4 task 4) must produce arrays
    byte-identical to the single-threaded parse, across slab boundaries
    falling on labeled/weighted/fixed/masked/empty/comment lines."""
    rng = np.random.default_rng(3)
    rows = []
    for i in range(120_000):  # ~5.5 MB body => the MT path engages
        vals = " ".join("%g" % v for v in rng.normal(0, 1, 5))
        if i % 37 == 0:
            rows.append("# body comment %d" % i)
        if i % 23 == 0:
            rows.append("x x x x x SKIPME")      # all-masked: skipped
        if i % 11 == 0:
            rows.append("1 x 3 4 5 L%d weight=%d fixed=%d,%d"
                        % (i % 97, i % 5 + 1, i % 12, i % 8))
        else:
            rows.append("%s L%d" % (vals, i % 97))
    path = str(tmp_path / "big.dat")
    with open(path, "w") as f:
        f.write("5\n" + "\n".join(rows) + "\n")

    GLOBAL_LABELS.reset()
    monkeypatch.setenv("SOMVQ_PARSE_THREADS", "1")
    a = native_io.read_data_native(path)
    GLOBAL_LABELS.reset()
    monkeypatch.setenv("SOMVQ_PARSE_THREADS", "4")
    b = native_io.read_data_native(path)
    assert a.n == b.n and a.n > 100_000
    assert (a.points == b.points).all()
    assert (a.mask == b.mask).all()
    assert (a.weight == b.weight).all()
    assert (a.fixed == b.fixed).all()
    assert (a.labels == b.labels).all()
    assert a.comments == b.comments


def test_streaming_reader_matches_full_read(ref_dir):
    GLOBAL_LABELS.reset()
    full = read_data(os.path.join(ref_dir, "ex1.dat"))
    GLOBAL_LABELS.reset()
    sr = StreamingReader(os.path.join(ref_dir, "ex1.dat"), buffer=300)
    chunks = list(sr)
    assert sum(c.n for c in chunks) == full.n
    assert all(c.dim == full.dim for c in chunks)
    pts = np.concatenate([c.points for c in chunks])
    assert (pts == full.points).all()
    labs = np.concatenate([c.labels[:, 0] for c in chunks])
    assert (labs == full.labels[:, 0]).all()


def test_streaming_reader_laps(ref_dir):
    GLOBAL_LABELS.reset()
    sr = StreamingReader(os.path.join(ref_dir, "ex_ndy.dat"), buffer=50)
    n_one = sum(c.n for c in sr.chunks(laps=1))
    n_two = sum(c.n for c in sr.chunks(laps=2))
    assert n_two == 2 * n_one


def test_streaming_reader_gzip(ref_dir, tmp_path):
    import gzip
    import shutil

    src = os.path.join(ref_dir, "ex_ndy.dat")
    dst = str(tmp_path / "d.dat.gz")
    with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    GLOBAL_LABELS.reset()
    full = read_data(src)
    GLOBAL_LABELS.reset()
    chunks = list(StreamingReader(dst, buffer=40))
    assert sum(c.n for c in chunks) == full.n
    pts = np.concatenate([c.points for c in chunks])
    assert (pts == full.points).all()


def test_streaming_reader_sharded(ref_dir):
    """shard=(k, n) splits entries round-robin across hosts with no
    overlap and full coverage."""
    GLOBAL_LABELS.reset()
    full = read_data(os.path.join(ref_dir, "ex1.dat"))
    parts = []
    for k in range(3):
        GLOBAL_LABELS.reset()
        sr = StreamingReader(os.path.join(ref_dir, "ex1.dat"), buffer=200,
                             shard=(k, 3))
        parts.append(np.concatenate([c.points for c in sr]))
    assert sum(len(p) for p in parts) == full.n
    assert (parts[0][0] == full.points[0]).all()
    assert (parts[1][0] == full.points[1]).all()
    assert (parts[2][0] == full.points[2]).all()
