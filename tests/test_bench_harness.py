"""Unit tests for bench.py's interleaved slope engine — the measurement
machinery the driver record rests on (median/min aggregation, the
half-median pocket guard, noise fallbacks, failure surfacing)."""

import bench


def _const_chain(per_iter):
    return lambda iters: per_iter * iters


def test_median_agg_basic():
    specs = {"a": (_const_chain(1e-4), 50, 200),
             "b": (_const_chain(2e-4), 50, 200)}
    out, fb, failed = bench.interleave_medians(specs, rounds=3)
    assert abs(out["a"] - 1e-4) < 1e-9
    assert abs(out["b"] - 2e-4) < 1e-9
    assert not fb and not failed


def test_min_agg_rejects_pocket_straddle():
    """A round whose short chain hits a slow pocket while the long chain
    runs at the floor produces a spuriously tiny slope; agg='min' must
    not latch onto it (the half-median guard)."""
    seq = iter([
        # round 1: short 50 iters at 1.5 ms/iter, long 200 at 0.4 ms
        50 * 1.5e-3, 200 * 0.4e-3,   # slope = (0.08-0.075)/150 = 33 us
        # rounds 2-3: honest 0.4 ms floor
        50 * 0.4e-3, 200 * 0.4e-3,
        50 * 0.4e-3, 200 * 0.4e-3,
    ])

    def chain(iters):
        return next(seq)

    out, fb, failed = bench.interleave_medians(
        {"x": (chain, 50, 200)}, rounds=3, agg="min")
    # raw min would be ~33 us; the guard keeps the 0.4 ms floor
    assert out["x"] > 0.3e-3, out["x"]
    assert not fb and not failed


def test_noise_fallback_flagged():
    """All-noise slopes (long chain faster than short) fall back to the
    min long-chain average AND are flagged so ratio consumers skip."""
    seq = iter([0.5, 0.1, 0.5, 0.1, 0.5, 0.1])

    def chain(iters):
        return next(seq)

    out, fb, failed = bench.interleave_medians(
        {"x": (chain, 50, 200)}, rounds=3)
    assert "x" in fb
    assert abs(out["x"] - 0.1 / 200) < 1e-9


def test_failed_chain_surfaced():
    def boom(iters):
        raise RuntimeError("tunnel down")

    out, fb, failed = bench.interleave_medians(
        {"x": (boom, 50, 200), "y": (_const_chain(1e-4), 50, 200)},
        rounds=2)
    assert "x" in failed and out["x"] is None
    assert abs(out["y"] - 1e-4) < 1e-9
