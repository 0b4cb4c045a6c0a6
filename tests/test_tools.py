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


def test_warm_cache_cn_interval_flag(tmp_path, monkeypatch):
    """--cn-interval threads through to Engine.warmup so the warmed
    programs match what option_defaults streams will request."""
    from videosd_tpu.runtime.engine import Engine
    from videosd_tpu.tools import warm_cache

    cfg = tmp_path / "c.yaml"
    cfg.write_text("family: tiny\nbatch_buckets: [1]\n")
    seen = []

    def fake_warmup(self, batch_sizes=(1,), steps=(4,), cn_interval=None, **kw):
        seen.append((tuple(batch_sizes), tuple(steps), cn_interval))

    monkeypatch.setattr(Engine, "warmup", fake_warmup)
    warm_cache.main(["--config", str(cfg), "--cn-interval", "4"])
    assert seen == [((1,), (4,), 4)]


def test_engine_warmup_defaults_interval_from_config():
    """Engine.warmup with no explicit interval warms the option_defaults
    variant — the programs new streams will actually hit."""
    import jax.numpy as jnp

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    eng = Engine(
        ServerConfig(option_defaults={"controlnet_interval": 2}),
        bundle=bundle,
        max_streams=1,
        frame_hw=(32, 32),
    )
    specs = []
    eng._warm_spec = lambda spec, ref_mode: specs.append(spec)
    eng.warmup(batch_sizes=(1,), steps=(2,), height=32, width=32)
    assert [s.controlnet_interval for s in specs] == [2]
