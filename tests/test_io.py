"""Data-format round-trip tests against the reference's own files."""

import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import Dataset, Topology, Neighborhood, read_data, write_data
from som_lvq_pak_tpu.data.io import _alpha_basename, format_entry, parse_header
from som_lvq_pak_tpu.data.labels import GLOBAL_LABELS


def test_parse_headers():
    assert parse_header("5") == (5, Topology.UNKNOWN, Neighborhood.UNKNOWN, 0, 0)
    assert parse_header("20 lvq") == (20, Topology.LVQ, Neighborhood.UNKNOWN, 0, 0)
    assert parse_header("5 hexa 12 8 bubble") == (5, Topology.HEXA, Neighborhood.BUBBLE, 12, 8)


def test_read_ex1(ref_dir):
    ds = read_data(os.path.join(ref_dir, "ex1.dat"))
    assert ds.dim == 20
    assert ds.n == 1962
    assert ds.labels is not None
    # every entry labeled with one of the phoneme classes
    assert (ds.first_labels() > 0).all()


def test_read_ex_unlabeled(ref_dir):
    ds = read_data(os.path.join(ref_dir, "ex.dat"))
    assert ds.dim == 5
    assert ds.n == 3840
    assert ds.labels is None


def test_roundtrip_codebook(golden_dir):
    """Our writer must be byte-identical to the reference writer for a
    reference-produced codebook (same %g formatting and spacing)."""
    path = os.path.join(golden_dir, "som_2.cod")
    ds = read_data(path)
    assert ds.topol == Topology.HEXA and (ds.xdim, ds.ydim) == (12, 8)
    buf = io.StringIO()
    write_data(ds, None, fileobj=buf)
    ours = buf.getvalue()
    with open(path) as f:
        theirs = f.read()
    assert ours == theirs


def test_roundtrip_lvq_codebook(golden_dir):
    path = os.path.join(golden_dir, "lvq_o.cod")
    ds = read_data(path)
    assert ds.topol == Topology.LVQ
    buf = io.StringIO()
    write_data(ds, None, fileobj=buf)
    with open(path) as f:
        assert buf.getvalue() == f.read()


def test_masked_and_extras():
    text = "3\n# a comment\n1 x 3 lab1 lab2 weight=2 fixed=1,2\nx x x\n0.5 2 x lab1\n"
    ds = read_data(None, fileobj=io.StringIO(text))
    # all-masked line skipped by default (datafile.c:676-686)
    assert ds.n == 2
    assert ds.mask is not None and ds.mask[0].tolist() == [0, 1, 0]
    assert ds.points[0].tolist() == [1.0, 0.0, 3.0]
    assert ds.weight is not None and ds.weight[0] == 2.0
    assert ds.fixed is not None and ds.fixed[0].tolist() == [1, 2]
    assert ds.labels[0].tolist() == [1, 2]
    assert ds.labels[1].tolist() == [1, 0]
    out = format_entry(ds, 0)
    assert out == "1 x 3 lab1 lab2 "


def test_noskip_keeps_empty():
    text = "2\nx x\n1 2\n"
    ds = read_data(None, fileobj=io.StringIO(text), skip_empty=False)
    assert ds.n == 2
    assert ds.mask[0].tolist() == [1, 1]


def test_alpha_basename_strtok_semantics():
    assert _alpha_basename("ex1b.cod") == "ex1b.lra"
    assert _alpha_basename("golden/e.bal") == "golden/e.lra"
    # strtok skips leading '.' delimiters, then stops at the next '.'
    assert _alpha_basename("./foo/bar.cod") == "/foo/bar.lra"
    assert _alpha_basename("noext") == "noext.lra"


def test_label_interning_order(ref_dir):
    read_data(os.path.join(ref_dir, "ex1.dat"))
    # ids assigned in order of first appearance, starting at 1
    n = GLOBAL_LABELS.number_of_labels()
    assert n > 1
    assert GLOBAL_LABELS.to_index(GLOBAL_LABELS.to_label(1)) == 1


# --- compress-command passthrough (fileio.c:132-187, config.h:45-50) -----

def _tiny_ds():
    text = "3\n1 2 3 lab1\n4 5 6 lab2\n"
    return read_data(None, fileobj=io.StringIO(text))


def test_gz_roundtrip_default_command(tmp_path):
    ds = _tiny_ds()
    path = str(tmp_path / "t.dat.gz")
    write_data(ds, path)
    back = read_data(path)
    assert back.n == 2
    np.testing.assert_allclose(back.points, ds.points)


def test_capital_z_read_via_pipe(tmp_path):
    """.Z files go through the configured uncompress command (Python's
    gzip module cannot read compress(1) output; the stock `gzip -d -c`
    can)."""
    import gzip as _gz
    import subprocess

    ds = _tiny_ds()
    plain = str(tmp_path / "t.dat")
    write_data(ds, plain)
    zpath = plain + ".Z"
    # gzip-format bytes under a .Z name: `gzip -d -c` decodes either
    with open(plain, "rb") as f:
        raw = f.read()
    with open(zpath, "wb") as f:
        f.write(_gz.compress(raw))
    back = read_data(zpath)
    assert back.n == 2
    np.testing.assert_allclose(back.points, ds.points)


def test_custom_compress_command_roundtrip(tmp_path, monkeypatch):
    """A custom LVQSOM_(UN)COMPRESS_COMMAND pair actually runs (the
    reference pipes through popen, fileio.c:132-187) — here: cat with a
    marker file proving the subprocess executed."""
    ds = _tiny_ds()
    path = str(tmp_path / "t.dat.gz")
    wmark = str(tmp_path / "wrote")
    rmark = str(tmp_path / "readm")
    monkeypatch.setenv("LVQSOM_COMPRESS_COMMAND",
                       "touch %s; cat >%%s" % wmark)
    monkeypatch.setenv("LVQSOM_UNCOMPRESS_COMMAND",
                       "touch %s; cat %%s" % rmark)
    write_data(ds, path)
    assert os.path.exists(wmark), "custom compress command did not run"
    back = read_data(path)
    assert os.path.exists(rmark), "custom uncompress command did not run"
    assert back.n == 2
    np.testing.assert_allclose(back.points, ds.points)
