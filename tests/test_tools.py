"""Tests for the ops CLI tools (videosd_tpu/tools/).

The heavy paths (real compiles) are exercised live in the field; here we
pin the orchestration: which buckets/steps the cache warmer compiles and
that its report covers each one.
"""

from __future__ import annotations

import json

import pytest


def test_warm_cache_warms_each_bucket_step_pair(tmp_path, monkeypatch, capsys):
    from videosd_tpu.runtime.engine import Engine
    from videosd_tpu.tools import warm_cache

    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        "family: tiny\nweights: random\nbatch_buckets: [2, 1, 2]\n"
        "frame_hw: [32, 32]\n"
    )

    calls = []

    def fake_init(self, config, **kw):
        self.config = config

    def fake_warmup(self, batch_sizes=(1,), steps=(4,), **kw):
        calls.append((tuple(batch_sizes), tuple(steps)))

    monkeypatch.setattr(Engine, "__init__", fake_init)
    monkeypatch.setattr(Engine, "warmup", fake_warmup)

    warm_cache.main(["--config", str(cfg), "--steps", "2", "4"])

    # dedup + sort of buckets, one warmup per (bucket, step) signature —
    # matching Engine.warmup's own loop so cache keys line up
    assert calls == [((1,), (2,)), ((1,), (4,)), ((2,), (2,)), ((2,), (4,))]

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(report["buckets"]) == {"b1_s2", "b1_s4", "b2_s2", "b2_s4"}
    assert report["total_s"] >= 0
    assert report["cache_dir"]
