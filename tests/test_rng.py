"""LCG parity tests. Oracle values were produced by linking a tiny driver
against the compiled reference objects (osrand/orand, lvq_pak.c:459-484)."""

import numpy as np

from som_lvq_pak_tpu.utils.rng import CRandom

ORACLE = {
    1: [23, 529, 12167, 17705, 14011, 32233, 8664, 7553],
    123: [2829, 32300, 22026, 15093, 20883, 25813, 8776, 9488],
    71: [1633, 4792, 11915, 11909, 31303, 29807, 7220, 13405],
    0x7FFFFFFF: [15351, 29645, 13260, 11491, 9868, 30362, 29751, 28933],
    -5: [7014, 8667, 10450, 28458, 26437, 19659, 30428, 32683],
}


def test_orand_matches_c():
    for seed, expected in ORACLE.items():
        r = CRandom(seed)
        got = [r.orand() for _ in range(8)]
        assert got == expected, seed


def test_orand_array_matches_scalar():
    r1, r2 = CRandom(77), CRandom(77)
    arr = r1.orand_array(100)
    sca = np.array([r2.orand() for _ in range(100)])
    assert (arr == sca).all()
    assert r1.state == r2.state


def test_shuffle_matches_c():
    # oracle: osrand(123); swap-shuffle of arange(10)
    r = CRandom(123)
    order = r.shuffle_order(10)
    assert order.tolist() == [1, 0, 6, 5, 3, 4, 2, 8, 9, 7]


def test_negative_seed_wraps_like_unsigned_long():
    r = CRandom(-5)
    assert [r.orand() for _ in range(3)] == ORACLE[-5][:3]
