"""U-matrix golden tests: the computation and the emitted EPS/PS command
stream must match the reference (CreationDate line excluded; the golden
files embed the reference's own PS prolog via -headerfile parity mode)."""

import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import read_data
from som_lvq_pak_tpu.models.umatrix import average_umatrix, calc_umatrix, median_umatrix
from som_lvq_pak_tpu.viz.umat_ps import print_eps, print_page

REF_HEADER = "/root/reference/header.ps"


def _strip_date(text):
    return [l for l in text.splitlines() if not l.startswith("%%CreationDate")]


@pytest.fixture
def som_v(golden_dir):
    return read_data(os.path.join(golden_dir, "som_v.cod"))


def test_umat_eps_golden(golden_dir, som_v, ref_dir):
    um = calc_umatrix(som_v)
    buf = io.StringIO()
    print_eps(um, buf, title="golden/som_v.cod",
              headerfile=os.path.join(ref_dir, "header.ps"))
    with open(os.path.join(golden_dir, "umat.eps")) as f:
        golden = f.read()
    assert _strip_date(buf.getvalue()) == _strip_date(golden)


def test_umat_avg_ps_golden(golden_dir, som_v, ref_dir):
    um = calc_umatrix(som_v)
    average_umatrix(um)
    buf = io.StringIO()
    print_page(um, buf, title="golden/som_v.cod", paper="A4",
               headerfile=os.path.join(ref_dir, "header.ps"))
    with open(os.path.join(golden_dir, "umat_avg.ps")) as f:
        golden = f.read()
    assert _strip_date(buf.getvalue()) == _strip_date(golden)


def test_own_prolog_is_valid_structure(som_v):
    um = calc_umatrix(som_v)
    buf = io.StringIO()
    print_eps(um, buf, title="t")
    text = buf.getvalue()
    assert text.startswith("%!PS-Adobe-3.0 EPSF-3.0")
    assert "/H {" in text or "/H\n" in text  # our own prolog present
    assert text.count("NL") >= um.uydim


def test_median_filter_runs(som_v):
    um = calc_umatrix(som_v)
    before = um.uvalue.copy()
    median_umatrix(um)
    assert um.uvalue.shape == before.shape
    assert not (um.uvalue == before).all()


def test_rect_umatrix(golden_dir):
    codes = read_data(os.path.join(golden_dir, "som_g.cod"))
    um = calc_umatrix(codes)
    assert um.uvalue.min() >= 0.0 and um.uvalue.max() <= 1.0
