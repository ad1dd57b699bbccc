"""U-matrix golden tests: the computation and the emitted EPS/PS command
stream must match the reference (CreationDate line excluded; the golden
files embed the reference's own PS prolog via -headerfile parity mode)."""

import io
import os

import numpy as np
import pytest

from som_lvq_pak_tpu.data import read_data
from som_lvq_pak_tpu.utils.rng import CRandom
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


def test_umat_degenerate_one_row_map():
    """1-row/1-column maps must not crash (the reference reads past its
    array here; we median over the in-bounds neighbors)."""
    import io

    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.umatrix import calc_umatrix
    from som_lvq_pak_tpu.viz.umat_ps import print_eps

    pts = np.asarray([[0.0, 0], [1, 0], [3, 0], [6, 0]], dtype=np.float32)
    codes = Dataset(points=pts, topol=Topology.RECT,
                    neigh=Neighborhood.BUBBLE, xdim=4, ydim=1)
    um = calc_umatrix(codes)
    assert um.uvalue.shape == (7, 1)
    assert np.isfinite(um.uvalue).all()
    buf = io.StringIO()
    print_eps(um, buf)
    assert "%%EndComments" in buf.getvalue()

    tall = Dataset(points=pts, topol=Topology.RECT,
                   neigh=Neighborhood.BUBBLE, xdim=1, ydim=4)
    um2 = calc_umatrix(tall)
    assert np.isfinite(um2.uvalue).all()


def test_umat_flat_map_no_nan():
    import io

    from som_lvq_pak_tpu.data.dataset import Dataset, Neighborhood, Topology
    from som_lvq_pak_tpu.models.umatrix import calc_umatrix
    from som_lvq_pak_tpu.viz.umat_ps import print_eps

    pts = np.zeros((6, 3), dtype=np.float32)
    codes = Dataset(points=pts, topol=Topology.HEXA,
                    neigh=Neighborhood.BUBBLE, xdim=3, ydim=2)
    um = calc_umatrix(codes)
    assert np.isfinite(um.uvalue).all()
    buf = io.StringIO()
    print_eps(um, buf)  # must not raise on any cell


def test_umat_prolog_label_advance_and_swap():
    """The built-in prolog must advance label ops by 2 xsteps (labels
    walk the map grid over the 2x-1 u-grid) and implement swapx/swapy."""
    from som_lvq_pak_tpu.viz.umat_ps import PROLOG

    # LN, LAB and ML each advance curx by two xsteps
    assert PROLOG.count("/curx curx xstep 2 mul add def") == 3
    assert "/xstep xstep neg def" in PROLOG      # swapx
    assert "/ystep ystep neg def" in PROLOG      # swapy


def test_sammon_eps_golden(golden_dir):
    """-eps output byte-identical to the reference binary (including the
    %%BoundingBox DSC line)."""
    import io

    from som_lvq_pak_tpu.models.sammon import sammon
    from som_lvq_pak_tpu.viz.eps import sammon_eps

    codes = read_data(os.path.join(golden_dir, "som_2.cod"))
    rng = CRandom()
    rng.init_random(3)
    proj, _ = sammon(codes, length=50, rng=rng)
    buf = io.StringIO()
    sammon_eps(proj, "x", ps=False, draw_grid=True, fileobj=buf)
    with open(os.path.join(golden_dir, "sammon_map_sa.eps")) as f:
        golden = f.read()
    assert buf.getvalue() == golden
    assert "%%BoundingBox:" in golden


def test_planes_all_golden(golden_dir, tmp_path):
    """Every available som_v_p*.ps fixture byte-matches print_plane."""
    import glob as _glob
    import io

    from som_lvq_pak_tpu.viz.planes import print_plane

    codes = read_data(os.path.join(golden_dir, "som_v.cod"))
    fixtures = sorted(_glob.glob(os.path.join(golden_dir, "som_v_p*.ps")))
    assert fixtures
    for fx in fixtures:
        plane = int(fx.rsplit("_p", 1)[1].split(".")[0]) - 1
        buf = io.StringIO()
        print_plane(codes, plane, buf, ps=True)
        with open(fx) as f:
            assert buf.getvalue() == f.read(), fx
