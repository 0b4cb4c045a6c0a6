"""Multi-model serving: named extra checkpoints (config `models:`) served
alongside the default, selected per-stream via the live "model" option.

Design under test (runtime/engine.py multi-model registry): same-family
checkpoints share every compiled frame program — params are a program
ARGUMENT, so batches simply group per model and pass their own tree.  The
reference serves exactly one checkpoint per GPU-pinned actor
(videopipeline.py:49-72); changing models there means restarting actors.
"""

import asyncio

import numpy as np
import pytest

from videosd_tpu.config import ServerConfig, coerce_option


def _mk_engine(models: dict | None = None):
    import jax.numpy as jnp

    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    cfg = ServerConfig.from_dict(
        {
            "family": "tiny",
            "dtype": "float32",
            "weights": "random",
            "models": models or {},
        }
    )
    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    return Engine(
        cfg, bundle=bundle, max_streams=4, max_batch=4,
        deadline_ms=5, frame_hw=(32, 32),
    )


async def _first_real(eng, st, frame, timeout=300.0):
    loop = asyncio.get_running_loop()
    t0 = loop.time()
    while True:
        before = eng.telemetry.frames_out
        out = await asyncio.wait_for(
            eng.submit_frame(st.stream_id, frame), timeout
        )
        if eng.telemetry.frames_out > before:
            return out
        if loop.time() - t0 > timeout:
            raise TimeoutError("no real generation before timeout")
        await asyncio.sleep(0.2)


# ------------------------------------------------------------------ config


def test_models_config_normalization():
    cfg = ServerConfig.from_dict(
        {
            "controlnet": "cn/default",
            "models": {
                "anime": "repo/anime",
                "photo": {"model": "repo/photo", "controlnet": "cn/other"},
            },
        }
    )
    assert cfg.models["anime"] == {
        "model": "repo/anime", "controlnet": "cn/default", "lora": None,
    }
    assert cfg.models["photo"]["controlnet"] == "cn/other"


@pytest.mark.parametrize(
    "bad",
    [
        {"models": {"default": "repo/x"}},  # reserved name
        {"models": {"": "repo/x"}},  # empty name
        {"models": {"a": {}}},  # no model key
        {"models": ["repo/x"]},  # not a mapping
    ],
)
def test_models_config_rejects(bad):
    with pytest.raises(ValueError):
        ServerConfig.from_dict(bad)


def test_model_option_coerces_to_str():
    assert coerce_option("model", 123) == "123"
    assert coerce_option("model", "anime") == "anime"


# ------------------------------------------------------------------ engine


def test_two_models_serve_distinct_outputs_share_programs(rng):
    """Two streams on two checkpoints: same frame/seed/prompt produce
    DIFFERENT outputs (the alt entry is a distinct tree), while the
    compiled program count stays what a single-model engine needs (the
    spec is shared; params are an argument)."""

    async def run():
        eng = _mk_engine({"alt": "repo/alt"})
        eng.load_models()
        assert eng.model_names == ["alt"]
        eng.start()
        try:
            opts = {"height": 32, "width": 32, "steps": 1, "seed": 7}
            st_def = eng.open_stream(dict(opts))
            st_alt = eng.open_stream(dict(opts, model="alt"))
            frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            out_def = await _first_real(eng, st_def, frame)
            programs_after_default = len(eng._programs)
            out_alt = await _first_real(eng, st_alt, frame)
            assert out_alt.shape == out_def.shape
            assert np.abs(
                out_alt.astype(np.int32) - out_def.astype(np.int32)
            ).max() > 0, "alt checkpoint served identical pixels"
            # program reuse: the alt batch compiled nothing new for its
            # bucket (batch-1 spec already existed)
            assert len(eng._programs) == programs_after_default
            # prompt cache rows are per (model, prompt)
            models_cached = {m for (m, _p) in eng._prompt_cache}
            assert {"", "alt"} <= models_cached
            assert eng.stats()["models"] == {"alt": "loaded"}
        finally:
            await eng.stop()

    asyncio.run(run())


def test_unknown_model_serves_default(rng):
    """A junk "model" option falls back to the default checkpoint (the
    data channel tolerates unknown values like the reference's generic
    option merge, server.py:194-195)."""

    async def run():
        eng = _mk_engine({"alt": "repo/alt"})
        eng.load_models()
        eng.start()
        try:
            opts = {"height": 32, "width": 32, "steps": 1, "seed": 7}
            st_def = eng.open_stream(dict(opts))
            st_bad = eng.open_stream(dict(opts, model="no-such-entry"))
            frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            out_def = await _first_real(eng, st_def, frame)
            out_bad = await _first_real(eng, st_bad, frame)
            np.testing.assert_array_equal(out_bad, out_def)
        finally:
            await eng.stop()

    asyncio.run(run())


def test_cold_model_lazy_loads_in_background(rng):
    """Without load_models(), the first frame that selects a cold entry is
    served on the DEFAULT params (no stall, the model-load analog of a
    cold bucket's fallback) and the entry loads in the background."""

    async def run():
        eng = _mk_engine({"alt": "repo/alt"})
        eng.start()
        try:
            opts = {"height": 32, "width": 32, "steps": 1, "seed": 7}
            st_def = eng.open_stream(dict(opts))
            st_alt = eng.open_stream(dict(opts, model="alt"))
            frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            out_def = await _first_real(eng, st_def, frame)
            # drive frames until the background load lands and the alt
            # stream's output diverges from the default checkpoint's
            deadline = asyncio.get_running_loop().time() + 300.0
            diverged = False
            while asyncio.get_running_loop().time() < deadline:
                out_alt = await _first_real(eng, st_alt, frame)
                if np.abs(
                    out_alt.astype(np.int32) - out_def.astype(np.int32)
                ).max() > 0:
                    diverged = True
                    break
                await asyncio.sleep(0.2)
            assert diverged, "alt entry never took over after lazy load"
            assert eng.stats()["models"] == {"alt": "loaded"}
        finally:
            await eng.stop()

    asyncio.run(run())


def test_live_model_switch_no_recompile(rng):
    """Flipping the "model" option mid-stream swaps checkpoints on the
    next batch with zero new program compiles."""

    async def run():
        eng = _mk_engine({"alt": "repo/alt"})
        eng.load_models()
        eng.start()
        try:
            opts = {"height": 32, "width": 32, "steps": 1, "seed": 7}
            st = eng.open_stream(dict(opts))
            frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            out_a = await _first_real(eng, st, frame)
            programs = len(eng._programs)
            eng.update_options(st.stream_id, {"model": "alt"})
            out_b = await _first_real(eng, st, frame)
            assert np.abs(
                out_b.astype(np.int32) - out_a.astype(np.int32)
            ).max() > 0
            assert len(eng._programs) == programs
            eng.update_options(st.stream_id, {"model": ""})
            out_c = await _first_real(eng, st, frame)
            np.testing.assert_array_equal(out_c, out_a)
        finally:
            await eng.stop()

    asyncio.run(run())
