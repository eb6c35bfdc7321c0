"""Phase timing + profiler hooks.

Parity with the reference's ``cfg.report_time`` wall-clock prints scattered
through every module (SURVEY §5.1), plus first-class ``jax.profiler``
integration the reference lacks.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating named-phase timer.

    >>> timer = PhaseTimer(enabled=True)
    >>> with timer("fk"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            print(f"{name} time: {dt:.4f}")

    def report(self) -> dict:
        out = {k: {"total_s": round(v, 4), "calls": self.counts[k]}
               for k, v in self.totals.items()}
        if self.enabled:
            for k, v in out.items():
                print(f"[timing] {k}: {v['total_s']}s over {v['calls']} calls")
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Wrap a region in a ``jax.profiler`` trace when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def retry_transient(fn, what: str = "device call", attempts: int = 4,
                    wait_s: float = 75.0, log=None):
    """Retry ``fn()`` across transient remote-TPU infrastructure faults.

    The axon chip intermittently faults (``UNAVAILABLE``/``ABORTED``,
    recovering in ~1-5 min); a long suite run or benchmark must not lose
    everything to one blip.  Only infrastructure errors retry — anything
    else re-raises immediately.
    """
    import time as _time

    emit = log or (lambda m: print(m, flush=True))
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax raises XlaRuntimeError subclasses
            msg = f"{type(e).__name__}: {e}"
            transient = any(s in msg for s in
                            ("UNAVAILABLE", "ABORTED", "DEADLINE_EXCEEDED",
                             "INTERNAL", "Unavailable", "device error"))
            if not transient or k == attempts - 1:
                raise
            emit(f"[retry] transient fault during {what} "
                 f"(attempt {k + 1}/{attempts}): {msg[:200]}; "
                 f"retrying in {wait_s:.0f}s")
            _time.sleep(wait_s)
            wait_s *= 2
