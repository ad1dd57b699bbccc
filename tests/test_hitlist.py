"""Hitlist ordering semantics (labels.c:278-443) and the closed-form
majority rule used on device."""

import numpy as np

from som_lvq_pak_tpu.utils.hitlist import Hitlist, majority_label, majority_label_matrix


def test_basic_ordering():
    hl = Hitlist.from_labels([1, 2, 1, 2, 3])
    # 1 reached count 2 before 2 did -> head stays 1
    assert hl.head == (1, 2)
    assert [l for l, _ in hl.items()] == [1, 2, 3]


def test_promotion_on_strictly_greater():
    hl = Hitlist.from_labels([2, 1, 1, 2])
    # 1 hit count 2 first and swapped past 2; 2 then tied but no swap
    assert hl.head == (1, 2)


def test_closed_form_matches_list():
    rng = np.random.RandomState(0)
    for _ in range(500):
        seq = rng.randint(1, 6, size=rng.randint(1, 12))
        assert majority_label(seq) == Hitlist.from_labels(seq).head[0], seq


def test_matrix_majority():
    rng = np.random.RandomState(1)
    rows = rng.randint(0, 7, size=(200, 5))
    got = majority_label_matrix(rows, 7)
    want = [Hitlist.from_labels(r).head[0] for r in rows]
    assert got.tolist() == want


def test_label_freq():
    hl = Hitlist.from_labels([4, 4, 9])
    assert hl.label_freq(4) == 2
    assert hl.label_freq(9) == 1
    assert hl.label_freq(5) == 0
