"""Golden tests for the remaining toolbox programs."""

import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import read_data, write_data
from som_lvq_pak_tpu.data.labels import GLOBAL_LABELS
from som_lvq_pak_tpu.models.tools import (
    elimin,
    extract,
    setlabel,
    showlabs,
    stddev_report,
    vcal,
    visual,
    mindist_report,
)
from som_lvq_pak_tpu.models.lvq import pick_codes


def _write_str(ds):
    buf = io.StringIO()
    write_data(ds, None, fileobj=buf)
    return buf.getvalue()


def test_vcal_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex_fts.dat"))
    codes = read_data(os.path.join(golden_dir, "som_2.cod"))
    out = vcal(codes, data, numlabs=1)
    with open(os.path.join(golden_dir, "som_v.cod")) as f:
        assert _write_str(out) == f.read()


def test_visual_golden(ref_dir, golden_dir):
    codes = read_data(os.path.join(golden_dir, "som_v.cod"))
    for din, gold in (("ex_ndy.dat", "som_n.vis"), ("ex_fdy.dat", "som_f.vis")):
        data = read_data(os.path.join(ref_dir, din))
        out = visual(codes, data)
        with open(os.path.join(golden_dir, gold)) as f:
            assert _write_str(out) == f.read()


def test_setlabel_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    codes = read_data(os.path.join(golden_dir, "lvq_e.cod"))
    out = setlabel(codes, data, knn=5)
    with open(os.path.join(golden_dir, "setlabel.cod")) as f:
        assert _write_str(out) == f.read()


def test_elimin_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    out = elimin(data, knn=5)
    with open(os.path.join(golden_dir, "elimin.dat")) as f:
        assert _write_str(out) == f.read()


def test_pick_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    out = pick_codes(50, data)
    with open(os.path.join(golden_dir, "pick.cod")) as f:
        assert _write_str(out) == f.read()


def test_extract_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    out = extract(data, GLOBAL_LABELS.to_index("tAA"))
    with open(os.path.join(golden_dir, "extract.dat")) as f:
        assert _write_str(out) == f.read()


def test_showlabs_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    report = showlabs(data)
    with open(os.path.join(golden_dir, "showlabs.txt")) as f:
        assert report == f.read()


def test_stddev_golden(ref_dir, golden_dir):
    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    report = stddev_report(data)
    with open(os.path.join(golden_dir, "stddev.txt")) as f:
        assert report == f.read()


def test_mindist_golden(golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_e.cod"))
    report = mindist_report(codes)
    with open(os.path.join(golden_dir, "lvq_mindist.txt")) as f:
        assert report == f.read()


def test_parity_knn_never_routes_to_device(ref_dir, monkeypatch):
    """mode='parity' kNN must use the exact C-order host path at EVERY
    size — byte-anchored eveninit/setlabel/elimin/knntest output must not
    silently change above a pair-count threshold (advisor r3, medium)."""
    import som_lvq_pak_tpu.ops.distance as dist
    from som_lvq_pak_tpu.models import eval as ev
    from som_lvq_pak_tpu.models import lvq as mlvq
    from som_lvq_pak_tpu.models import tools as mtools

    def boom(*a, **k):
        raise AssertionError("parity kNN routed through the device path")

    monkeypatch.setattr(dist, "auto_pairwise_topk", boom)
    # a threshold of 0 pairs would previously have flipped every call
    monkeypatch.setenv("SOMVQ_AUTO_TOPK_PAIRS", "0")

    data = read_data(os.path.join(ref_dir, "ex1.dat"))
    small = data.take(np.arange(60))
    mask = mlvq.knn_correct_mask(small, 3)
    assert mask.shape == (60,)
    codes = pick_codes(10, small)
    mtools.setlabel(codes, small, knn=3)
    mtools.elimin(small, knn=3)
    ev.knn_accuracy(small, codes, knn=3)
    # fast mode is the one that goes through the scale-aware router
    with pytest.raises(AssertionError):
        mtools.setlabel(codes, small, knn=3, mode="fast")
