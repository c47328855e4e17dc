"""Profiling utilities: stage timers, RTF accounting, trace contexts."""

import json
import time

from drnmf_tpu.utils import StageTimer, trace


def test_stage_timer_rtf():
    t = StageTimer()
    with t.stage("a", audio_seconds=10.0):
        time.sleep(0.01)
    with t.stage("b"):  # non-RTF stage, excluded from the factor
        time.sleep(0.01)
    assert t.total_seconds() >= 0.02
    rtf = t.realtime_factor()
    assert 0 < rtf < 10.0 / 0.01
    rep = t.report()
    assert "real-time factor" in rep and "a:" in rep and "b:" in rep
    data = json.loads(t.to_json())
    assert len(data["stages"]) == 2
    assert data["stages"][0]["audio_seconds"] == 10.0


def test_trace_noop():
    with trace(None):
        pass  # must not start a profiler


def test_trace_writes(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        (jnp.ones(8) * 2).block_until_ready()
    # jax profiler writes a plugins/profile tree
    assert any(tmp_path.rglob("*.xplane.pb")) or any(tmp_path.iterdir())
