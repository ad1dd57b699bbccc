"""Host-side progress/tracing utilities.

Mprint replicates the reference's 60-dot progress meter with elapsed/ETA
in seconds or minutes (mprint, lvq_pak.c:418-456), called from every
long loop at verbosity >= 1.  StepTimer + trace() are the TPU additions:
wall-clock step rates and an optional jax.profiler capture around a
training region (SURVEY.md §5 'Tracing / profiling')."""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Optional


class Mprint:
    """Stateful progress meter: call with the REMAINING count each step,
    then with 0 to finish (the reference's calling convention)."""

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stderr
        self.totlen = 0
        self.startt = 0.0
        self.prevt = -1.0

    def __call__(self, rlen: int) -> None:
        currt = int(time.time())
        if not self.totlen:
            self.totlen = rlen
            self.startt = currt
            self.stream.write(" " * 15 + "-" * 60)
        if currt != self.prevt or not rlen:
            t1 = currt - self.startt
            if rlen != self.totlen:
                t2 = int((currt - self.startt) * float(self.totlen) / (self.totlen - rlen))
            else:
                t2 = 0
            if t2 > 9999:
                t1 //= 60
                t2 //= 60
                unit = "min."
            else:
                unit = "sec."
            self.stream.write("\r%4u/%4u %4s " % (int(t1), int(t2), unit))
            if self.totlen:
                dots = int(60 * float(self.totlen - rlen) / self.totlen)
                self.stream.write("." * dots)
            self.stream.flush()
            self.prevt = currt
        if not rlen:
            self.totlen = 0
            self.stream.write("\n")


class StepTimer:
    """Accumulates step wall-times; reports steps/s and samples/s."""

    def __init__(self):
        self.steps = 0
        self.samples = 0
        self.start = time.time()

    def step(self, n_samples: int = 1) -> None:
        self.steps += 1
        self.samples += n_samples

    @property
    def elapsed(self) -> float:
        return time.time() - self.start

    def rates(self):
        dt = max(self.elapsed, 1e-9)
        return self.steps / dt, self.samples / dt

    def report(self) -> str:
        sps, xps = self.rates()
        return "%d steps (%.0f samples) in %.2fs: %.1f steps/s, %.0f samples/s" % (
            self.steps, self.samples, self.elapsed, sps, xps,
        )


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Optional jax.profiler capture around a training region; a no-op
    when no logdir is given."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
