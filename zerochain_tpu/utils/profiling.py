"""Profiling / tracing for the proving pipeline (SURVEY.md §5).

The reference has no timers around proving at all (only Substrate's
informant logger, src/cli.rs:65); the TPU build's observability story is
(1) xprof device traces via ``jax.profiler`` and (2) structured
host-side stage timings.  Both are zero-cost when disabled.

Usage:
    with device_trace("/tmp/xprof"):      # XLA/TPU op-level trace
        prover.prove(assignments)

    rec = StageRecorder()
    with rec.stage("msm_a"):
        ...
    rec.report()   # -> {"msm_a": 6.1, ...}

``ZEROCHAIN_TRACE=<dir>`` turns on a device trace around each
``ConfidentialProver.prove`` call without touching call sites.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


@contextlib.contextmanager
def device_trace(log_dir: str | None = None):
    """xprof trace context; no-op if log_dir is falsy.

    The trace (viewable in TensorBoard / xprof) shows per-op device time
    — the tool SURVEY.md §5 prescribes in place of the reference's
    absent tracing."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageRecorder:
    """Wall-clock stage timings with an optional JSON-lines sink.

    Replaces ad-hoc stderr marks: each ``stage`` context records
    (name, seconds) in insertion order; ``report`` returns the dict and
    optionally appends one JSON line per run to ``path`` so repeated
    bench runs accumulate a comparable log."""

    def __init__(self):
        self.timings: dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.time() - t0
            )

    def mark(self, name: str) -> None:
        """Record time since the previous mark (or construction)."""
        now = time.time()
        self.timings[name] = self.timings.get(name, 0.0) + (now - self._t0)
        self._t0 = now

    def report(self, path: str | None = None, **extra) -> dict:
        out = {k: round(v, 3) for k, v in self.timings.items()}
        if path:
            with open(path, "a") as f:
                f.write(json.dumps({**out, **extra}) + "\n")
        return out


def trace_dir_from_env() -> str | None:
    return os.environ.get("ZEROCHAIN_TRACE") or None


def annotate(name: str):
    """Named region visible in xprof traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
