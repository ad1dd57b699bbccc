"""Sammon projection golden tests (sammon.c): bit-exact projection files
and byte-identical PS output."""

import io
import os

import numpy as np

from som_lvq_pak_tpu.data import read_data, write_data
from som_lvq_pak_tpu.models.sammon import mapping_error, remove_identicals, sammon
from som_lvq_pak_tpu.ops import exact
from som_lvq_pak_tpu.utils.rng import CRandom
from som_lvq_pak_tpu.viz.eps import sammon_base_name, sammon_eps


def _write_str(ds):
    buf = io.StringIO()
    write_data(ds, None, fileobj=buf)
    return buf.getvalue()


def test_sammon_lvq_golden(golden_dir):
    codes = read_data(os.path.join(golden_dir, "lvq_o.cod"))
    rng = CRandom()
    rng.init_random(3)
    proj, _ = sammon(codes, length=100, rng=rng)
    with open(os.path.join(golden_dir, "sammon.sam")) as f:
        assert _write_str(proj) == f.read()


def test_sammon_map_golden_with_ps(golden_dir):
    codes = read_data(os.path.join(golden_dir, "som_2.cod"))
    rng = CRandom()
    rng.init_random(3)
    proj, _ = sammon(codes, length=50, rng=rng)
    with open(os.path.join(golden_dir, "sammon_map.sam")) as f:
        assert _write_str(proj) == f.read()

    buf = io.StringIO()
    sammon_eps(proj, sammon_base_name("sammon_map.sam"), ps=True,
               draw_grid=True, fileobj=buf)
    with open(os.path.join(golden_dir, "sammon_map_sa.ps")) as f:
        assert buf.getvalue() == f.read()


def test_remove_identicals():
    codes = read_data(os.path.join(os.path.dirname(__file__), "golden", "lvq_o.cod"))
    base = remove_identicals(codes)
    # appending a duplicate of row 0 must not change the deduped size
    dup = codes.concat(codes.take([0]))
    out = remove_identicals(dup)
    assert out.n == base.n
    assert (out.points == base.points).all()


def test_mapping_error_decreases(golden_dir):
    codes = read_data(os.path.join(golden_dir, "som_2.cod"))
    dmat = exact.pairwise_dist_euc(codes.points, codes.points)
    rng = CRandom()
    rng.init_random(3)
    p10, _ = sammon(codes, length=5, rng=rng)
    rng2 = CRandom()
    rng2.init_random(3)
    p50, _ = sammon(codes, length=50, rng=rng2)
    assert mapping_error(p50, dmat) < mapping_error(p10, dmat)


def test_sammon_fast_quality(golden_dir):
    """The device-vectorized iteration reaches a mapping error in the
    same range as the parity path on the trained map."""
    from som_lvq_pak_tpu.models.sammon import sammon_fast

    codes = read_data(os.path.join(golden_dir, "som_2.cod"))
    rng = CRandom()
    rng.init_random(3)
    proj_ref, dd = sammon(codes, length=50, rng=rng)
    proj_fast, _ = sammon_fast(codes, length=50, seed=3)
    dmat = exact.pairwise_dist_euc(dd.points, dd.points)
    e_ref = mapping_error(proj_ref, dmat)
    e_fast = mapping_error(proj_fast, dmat)
    assert e_fast < e_ref * 1.5
    assert np.isfinite(proj_fast.points).all()
