"""Observability: stage recorder + xprof trace wrapper (SURVEY.md §5)."""

import json
import time

from zerochain_tpu.utils.profiling import (
    StageRecorder, device_trace, trace_dir_from_env,
)


def test_stage_recorder_contexts_and_marks(tmp_path):
    rec = StageRecorder()
    with rec.stage("a"):
        time.sleep(0.01)
    rec.mark("b")
    with rec.stage("a"):  # accumulates
        time.sleep(0.01)
    out = rec.report(path=str(tmp_path / "t.jsonl"), run=1)
    assert out["a"] >= 0.02 and "b" in out
    line = json.loads((tmp_path / "t.jsonl").read_text().strip())
    assert line["run"] == 1 and line["a"] == out["a"]


def test_device_trace_noop_and_real(tmp_path):
    with device_trace(None):  # disabled: must be free
        pass
    with device_trace(str(tmp_path / "xprof")):
        import jax.numpy as jnp

        (jnp.arange(8) * 2).block_until_ready()
    # the profiler must have written something under the dir
    assert any((tmp_path / "xprof").rglob("*"))


def test_trace_dir_env(monkeypatch):
    monkeypatch.delenv("ZEROCHAIN_TRACE", raising=False)
    assert trace_dir_from_env() is None
    monkeypatch.setenv("ZEROCHAIN_TRACE", "/tmp/x")
    assert trace_dir_from_env() == "/tmp/x"
