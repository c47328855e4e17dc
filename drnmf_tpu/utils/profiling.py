"""Tracing & profiling: per-stage wall-clock, real-time factor, XLA traces.

The reference's observability was MATLAB tic/toc around the MU loop
(sparse_nmf_gpu.m:207,299) and Keras progress bars.  This module provides the
TPU-native replacement promised in SURVEY.md §5:

* ``StageTimer`` -- hierarchical named wall-clock stages with a printable
  report and JSON export; the north-star *real-time factor* (seconds of audio
  processed per second of compute) is a first-class aggregate.
* ``trace`` -- context manager around ``jax.profiler`` traces (TensorBoard /
  Perfetto-viewable) gated so it is a no-op when profiling is off.
* ``device_sync`` -- block until all dispatched device work completes, so
  timers measure compute rather than dispatch.
"""

import contextlib
import json
import time

import jax


def device_sync():
    """Block until outstanding device computations finish (all devices --
    a dummy-op flush only covers the default device)."""
    for arr in jax.live_arrays():
        arr.block_until_ready()
    (jax.device_put(0.0) + 0).block_until_ready()


class StageTimer:
    """Named wall-clock stages with real-time-factor accounting.

    Usage::

        timer = StageTimer()
        with timer.stage("featurize", audio_seconds=123.4):
            ...
        print(timer.report())
    """

    def __init__(self):
        self.stages = []  # (name, seconds, audio_seconds)

    @contextlib.contextmanager
    def stage(self, name, audio_seconds=None, sync=False):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if sync:
                device_sync()
            self.stages.append((name, time.perf_counter() - t0, audio_seconds))

    def total_seconds(self):
        return sum(s for _, s, _ in self.stages)

    def realtime_factor(self):
        """Total audio seconds / total compute seconds over RTF stages."""
        audio = sum(a for _, _, a in self.stages if a)
        compute = sum(s for _, s, a in self.stages if a)
        return (audio / compute) if compute > 0 else float("inf")

    def report(self):
        lines = []
        for name, secs, audio in self.stages:
            rtf = f"  ({audio / secs:.1f}x real-time)" if audio else ""
            lines.append(f"  {name}: {secs:.3f}s{rtf}")
        lines.append(f"  total: {self.total_seconds():.3f}s")
        audio = sum(a for _, _, a in self.stages if a)
        if audio:
            lines.append(
                f"  real-time factor: {self.realtime_factor():.1f}x "
                f"({audio:.1f}s audio)"
            )
        return "\n".join(lines)

    def to_json(self):
        rtf = self.realtime_factor()
        return json.dumps({
            "stages": [
                {"name": n, "seconds": s, "audio_seconds": a}
                for n, s, a in self.stages
            ],
            "total_seconds": self.total_seconds(),
            # None instead of float('inf'): json.dumps would emit the
            # non-standard literal Infinity
            "realtime_factor": rtf if rtf != float("inf") else None,
        })


@contextlib.contextmanager
def trace(log_dir=None):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None.

    View with TensorBoard (profile plugin) or Perfetto.
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache.

    min_compile_time_secs is 0 because under axon the remote compile wait is
    not counted as compile time, so any nonzero threshold filters everything.
    Returns True on success."""
    import os

    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.expanduser("~/.cache/drnmf_tpu/xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception as e:  # misconfiguration should be visible, not fatal
        import sys

        print(f"warning: compilation cache disabled ({e})", file=sys.stderr)
        return False
