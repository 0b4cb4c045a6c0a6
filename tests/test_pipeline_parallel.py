"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

The reference has no PP (SURVEY.md §2.4); parallel/pipe.py adds the
stage-split tier for capacity-bound configs (SDXL 1024²).  These tests
pin (1) the encoder/decoder split reproduces unet_apply exactly, (2) the
2-stage pipelined UNet on disjoint submeshes (dp×tp inside each stage)
matches the single-device forward, (3) stage params are placed ONLY on
their own submesh (the memory claim), and (4) the full pipelined frame
engine matches the monolithic frame program at parity semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.models.unet import UNET_PRESETS, unet_apply, unet_init
from videosd_tpu.parallel.pipe import (
    PipelinedFrameEngine,
    PipelinedUNet,
    split_unet_params,
    unet_decoder_apply,
    unet_encoder_apply,
)
from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_frame_program,
    build_prompt_encoder,
)


def _unet_inputs(cfg, b=2, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    sample = jnp.asarray(rng.standard_normal((b, hw, hw, cfg.in_channels)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 999, (b,)), jnp.int32)
    ctx = jnp.asarray(
        rng.standard_normal((b, 7, cfg.cross_attention_dim)), jnp.float32
    )
    kw = {}
    if cfg.time_cond_proj_dim is not None:
        kw["timestep_cond"] = jnp.asarray(
            rng.standard_normal((b, cfg.time_cond_proj_dim)), jnp.float32
        )
    if cfg.addition_embed_type == "text_time":
        pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
        kw["added_cond_kwargs"] = {
            "text_embeds": jnp.asarray(
                rng.standard_normal((b, pooled_dim)), jnp.float32
            ),
            "time_ids": jnp.asarray(
                np.tile([[8, 8, 0, 0, 8, 8]], (b, 1)), jnp.float32
            ),
        }
    return sample, t, ctx, kw


@pytest.mark.parametrize("family", ["tiny", "tiny-xl"])
def test_split_apply_matches_unet_apply(family):
    """Encoder+decoder halves = the monolithic forward, bit-exact (fp32,
    same device: the split only moves function boundaries)."""
    cfg = UNET_PRESETS[family]
    params = unet_init(jax.random.PRNGKey(0), cfg)
    sample, t, ctx, kw = _unet_inputs(cfg)

    want = unet_apply(params, cfg, sample, t, ctx, **kw)

    p0, p1 = split_unet_params(params)
    x, down_res, temb = unet_encoder_apply(p0, cfg, sample, t, ctx, **kw)
    got = unet_decoder_apply(p1, cfg, x, down_res, temb, ctx)

    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_split_partition_is_total():
    cfg = UNET_PRESETS["tiny"]
    params = unet_init(jax.random.PRNGKey(0), cfg)
    p0, p1 = split_unet_params(params)
    merged = {**p0, **p1}
    assert set(merged) == set(params)
    with pytest.raises(ValueError):
        split_unet_params({**params, "mystery": jnp.zeros(())})


def test_pipelined_unet_matches_single_device():
    """2 stages x (2 data x 2 model) over 8 CPU devices == unet_apply."""
    cfg = UNET_PRESETS["tiny"]
    params = unet_init(jax.random.PRNGKey(0), cfg)
    sample, t, ctx, kw = _unet_inputs(cfg, b=4)

    want = np.asarray(unet_apply(params, cfg, sample, t, ctx, **kw))
    pipe = PipelinedUNet(params, cfg, model_parallel=2)
    got = np.asarray(pipe(sample, t, ctx, **kw))

    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stage_params_live_only_on_their_submesh():
    """The capacity claim: each stage's weights occupy ONLY its devices."""
    cfg = UNET_PRESETS["tiny"]
    params = unet_init(jax.random.PRNGKey(0), cfg)
    pipe = PipelinedUNet(params, cfg, model_parallel=2)

    dev0 = set(pipe.mesh0.devices.flat)
    dev1 = set(pipe.mesh1.devices.flat)
    assert dev0.isdisjoint(dev1) and len(dev0) == len(dev1) == 4

    for leaf in jax.tree.leaves(pipe.p0):
        assert set(leaf.sharding.device_set) <= dev0
    for leaf in jax.tree.leaves(pipe.p1):
        assert set(leaf.sharding.device_set) <= dev1


def test_pipelined_unet_with_controlnet_matches():
    """CN rides stage 0; residual adds pre-transfer == unet_apply's adds."""
    from videosd_tpu.models.controlnet import controlnet_apply, controlnet_init

    cfg = UNET_PRESETS["tiny"]
    params = unet_init(jax.random.PRNGKey(0), cfg)
    cn_params = controlnet_init(jax.random.PRNGKey(1), cfg)
    sample, t, ctx, kw = _unet_inputs(cfg, b=4)
    rng = np.random.default_rng(3)
    ctrl = jnp.asarray(rng.random((4, 64, 64, 3)), jnp.float32)
    scale = jnp.asarray([1.5, 0.5, 2.0, 0.0], jnp.float32)

    down, mid = controlnet_apply(
        cn_params, cfg, sample, t, ctx, ctrl, conditioning_scale=scale,
        timestep_cond=kw.get("timestep_cond"),
    )
    want = np.asarray(
        unet_apply(
            params, cfg, sample, t, ctx,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
            **kw,
        )
    )

    pipe = PipelinedUNet(params, cfg, controlnet_params=cn_params, model_parallel=1)
    got = np.asarray(pipe(sample, t, ctx, ctrl=ctrl, cn_scale=scale, **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _frame_inputs(bundle, spec, seed=0):
    rng = np.random.default_rng(seed)
    b = spec.batch
    frames = jnp.asarray(
        rng.integers(0, 256, (b, spec.height, spec.width, 3), dtype=np.uint8)
    )
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["a cat"] * 1), jnp.int32)
    ctx, pooled = enc(bundle.params, ids)
    embeds = jnp.concatenate([ctx] * b, axis=0)
    kw = {}
    if bundle.unet_cfg.addition_embed_type == "text_time":
        kw["pooled_embeds"] = jnp.concatenate([pooled] * b, axis=0)
    strength = jnp.linspace(0.5, 0.8, b).astype(jnp.float32)
    guidance = jnp.full((b,), 5.0, jnp.float32)
    cn = jnp.full((b,), 2.0, jnp.float32)
    seeds = jnp.arange(7, 7 + b, dtype=jnp.int32)
    return frames, embeds, strength, guidance, cn, seeds, kw


@pytest.mark.parametrize(
    "family",
    [
        "tiny",
        # the sdxl-topology variant (text_time conditioning through both
        # stages) compiles a second full program pair — slow tier
        pytest.param("tiny-xl", marks=pytest.mark.slow),
    ],
)
def test_pipelined_frame_engine_matches_frame_program(family):
    """Full-chain equality: pipelined engine == monolithic program.

    fp32; the stage cut only moves jit boundaries, so uint8 outputs agree
    within reduction-order tolerance (the dp x tp verify's bar,
    parallel/verify.py)."""
    bundle = ModelBundle.random(family, dtype=jnp.float32, with_controlnet=True)
    spec = FrameSpec(batch=2, height=64, width=64, steps=2)
    frames, embeds, strength, guidance, cn, seeds, kw = _frame_inputs(bundle, spec)

    prog = build_frame_program(bundle, spec)
    want_img, want_lat = prog(
        bundle.params, frames, embeds, strength, guidance, cn, seeds, **kw
    )

    eng = PipelinedFrameEngine(bundle, model_parallel=2)
    got_img, got_lat = eng.run(
        spec, frames, embeds, strength, guidance, cn, seeds, **kw
    )

    diff = np.abs(
        np.asarray(got_img).astype(np.int32) - np.asarray(want_img).astype(np.int32)
    )
    assert diff.max() <= 2, f"max u8 diff {diff.max()}"
    np.testing.assert_allclose(
        np.asarray(got_lat, np.float32), np.asarray(want_lat, np.float32),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow
def test_pipelined_engine_overlapped_schedule_matches():
    """run_pipelined with 2 concurrent microbatches: same outputs as two
    independent runs (the interleaved dispatch changes timing, not math)."""
    bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
    spec = FrameSpec(batch=2, height=64, width=64, steps=2)
    in_a = _frame_inputs(bundle, spec, seed=0)
    in_b = _frame_inputs(bundle, spec, seed=1)

    eng = PipelinedFrameEngine(bundle, model_parallel=2)
    outs = eng.run_pipelined(
        spec,
        [
            dict(frame_u8=a, embeds=b, strength=c, guidance=d, cn=e, seed=f, **kw)
            for (a, b, c, d, e, f, kw) in (in_a, in_b)
        ],
    )
    solo = [eng.run(spec, *args[:-1], **args[-1]) for args in (in_a, in_b)]
    for (img_p, lat_p), (img_s, lat_s) in zip(outs, solo):
        np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_s))
        np.testing.assert_array_equal(np.asarray(lat_p), np.asarray(lat_s))


def test_pipelined_engine_rejects_turbo_specs():
    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    eng = PipelinedFrameEngine(bundle, model_parallel=2)
    spec = FrameSpec(batch=2, height=64, width=64, steps=2, controlnet_interval=2)
    with pytest.raises(ValueError, match="parity-only"):
        eng.run(spec, *_frame_inputs(bundle, spec)[:-1])


def test_engine_serves_pipelined(rng):
    """The SERVING engine drives pipeline parallelism from config
    (mesh_pipe=2): programs come from PipelinedFrameEngine, batch buckets
    are data-axis multiples, and the full submit -> batcher -> pipelined
    stages -> reply path yields real frames."""
    import asyncio

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine

    async def serve():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            ServerConfig(gpus=8, mesh_model=2, mesh_pipe=2),
            bundle=bundle,
            max_streams=2,
            max_batch=8,
            deadline_ms=5,
            frame_hw=(64, 64),
        )
        assert eng.pipe_engine is not None
        assert eng.mesh is None  # PP owns the devices; no flat mesh
        assert eng.data_axis == 2
        eng.start()
        try:
            # controlnet_interval is a PUBLIC live option; under mesh_pipe
            # it must coerce to parity (1), not crash the dispatch loop
            st = eng.open_stream(
                {"height": 64, "width": 64, "steps": 1, "controlnet_interval": 4}
            )
            frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            loop = asyncio.get_running_loop()
            t0 = loop.time()
            out = None
            while loop.time() - t0 < 300:
                before = eng.telemetry.frames_out
                out = await asyncio.wait_for(
                    eng.submit_frame(st.stream_id, frame), 300
                )
                if eng.telemetry.frames_out > before:
                    break
                await asyncio.sleep(0.2)
            assert eng.telemetry.frames_out >= 1
            assert out.shape == (64, 64, 3) and out.dtype == np.uint8
            stats = eng.stats()
            assert stats["devices"] == {"data": 2, "model": 2, "pipe": 2}
            assert all(
                b["batch"] % eng.data_axis == 0 for b in stats["ready_buckets"]
            )
            # the turbo option was coerced to a parity spec
            assert all(
                sp.controlnet_interval == 1 and sp.deepcache_interval == 1
                for sp, _rm in eng._ready_specs
            )
            # stage params really live on disjoint submeshes
            pipe = eng.pipe_engine.pipe
            dev0 = set(pipe.mesh0.devices.flat)
            for leaf in jax.tree.leaves(pipe.p0):
                assert set(leaf.sharding.device_set) <= dev0
        finally:
            await eng.stop()

    asyncio.run(serve())


def test_engine_serves_pipelined_controlnet_off(rng):
    """controlnet:false is a PUBLIC live option; under mesh_pipe the
    stage-0 program must withhold the (always-present) ControlNet params
    when the spec disables it — a crash here is swallowed by the dispatch
    loop and the stream silently serves stale frames forever."""
    import asyncio

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine

    async def serve():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            ServerConfig(gpus=8, mesh_model=2, mesh_pipe=2),
            bundle=bundle,
            max_streams=1,
            max_batch=8,
            deadline_ms=5,
            frame_hw=(64, 64),
        )
        assert eng.pipe_engine is not None
        eng.start()
        try:
            st = eng.open_stream(
                {"height": 64, "width": 64, "steps": 1, "controlnet": False}
            )
            frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            loop = asyncio.get_running_loop()
            t0 = loop.time()
            out = None
            while loop.time() - t0 < 300:
                before = eng.telemetry.frames_out
                out = await asyncio.wait_for(
                    eng.submit_frame(st.stream_id, frame), 300
                )
                if eng.telemetry.frames_out > before:
                    break
                await asyncio.sleep(0.2)
            # a REAL frame came back (a crashed batch only ever resolves
            # waiters with the stale last_output)
            assert eng.telemetry.frames_out >= 1, eng.stats()
            assert out.shape == (64, 64, 3) and out.dtype == np.uint8
            assert all(
                not sp.use_controlnet for sp, _rm in eng._ready_specs
            )
        finally:
            await eng.stop()

    asyncio.run(serve())


def test_config_validates_mesh_pipe():
    from videosd_tpu.config import ServerConfig

    cfg = ServerConfig.from_dict(
        {"gpus": 8, "mesh_model": 2, "mesh_pipe": 2, "family": "tiny"}
    )
    assert cfg.mesh_data == 2
    with pytest.raises(ValueError, match="mesh_pipe must be 1 or 2"):
        ServerConfig.from_dict({"gpus": 8, "mesh_pipe": 4})
    # 0/negative must fail loudly too, not be silently coerced to 1
    with pytest.raises(ValueError, match="mesh_pipe must be 1 or 2"):
        ServerConfig.from_dict({"gpus": 8, "mesh_pipe": 0})
    with pytest.raises(ValueError, match="mesh_pipe must be 1 or 2"):
        ServerConfig.from_dict({"gpus": 8, "mesh_pipe": -2})
    with pytest.raises(ValueError, match="must equal gpus"):
        ServerConfig.from_dict(
            {"gpus": 8, "mesh_pipe": 2, "mesh_model": 2, "mesh_data": 4}
        )
    with pytest.raises(ValueError, match="single-model"):
        ServerConfig.from_dict(
            {
                "gpus": 8,
                "mesh_pipe": 2,
                "models": {"alt": {"model": "x"}},
            }
        )


@pytest.mark.slow
def test_sdxl_pipelined_matches_single_device():
    """PP's actual use case at honest geometry: the REAL sdxl family
    (dual towers, text_time, full channel counts) at 256x256 / 2 steps,
    2 stages x (2 data x 2 model) over the 8-device mesh, output equality
    vs single-device + stage-local placement (the dp x tp slow test's
    geometry, test_parallel.py::test_sdxl_sharded_matches_single_device,
    through the pipelined path)."""
    from videosd_tpu.parallel.verify import verify_pipeline_parallel

    result = verify_pipeline_parallel(
        8, model_parallel=2, family="sdxl", size=256, steps=2
    )
    assert result["stage_mesh"] == (2, 2)
    assert result["max_diff"] <= 2
    assert result["latents_allclose"]


def test_engine_degrades_when_devices_short():
    """mesh_pipe with more gpus than devices: warn + serve unpipelined
    (the mesh property's degradation contract, extended to PP)."""
    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine

    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    eng = Engine(
        ServerConfig(gpus=16, mesh_model=1, mesh_pipe=2),
        bundle=bundle,
        frame_hw=(32, 32),
    )
    assert eng.pipe_engine is None
    assert eng.data_axis >= 1  # falls through to mesh/single-device path


def test_refresh_params_swaps_weights_without_rebuild():
    """Live checkpoint swap under PP: re-place stage params (device_put
    only), KEEP the jitted stage programs, outputs track the new weights."""
    cfg = UNET_PRESETS["tiny"]
    params_a = unet_init(jax.random.PRNGKey(0), cfg)
    params_b = unet_init(jax.random.PRNGKey(9), cfg)
    sample, t, ctx, kw = _unet_inputs(cfg, b=4)

    import dataclasses

    bundle = dataclasses.replace(
        ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=False)
    )
    bundle.params = dict(bundle.params)
    bundle.params["unet"] = params_a
    eng = PipelinedFrameEngine(bundle, model_parallel=2)

    out_a = np.asarray(eng.pipe(sample, t, ctx, **kw))
    stage0_before = eng.pipe._stage0

    bundle.params["unet"] = params_b
    eng.refresh_params()
    out_b = np.asarray(eng.pipe(sample, t, ctx, **kw))

    assert eng.pipe._stage0 is stage0_before  # executables kept
    want_b = np.asarray(unet_apply(params_b, cfg, sample, t, ctx, **kw))
    np.testing.assert_allclose(out_b, want_b, rtol=2e-5, atol=2e-5)
    assert np.abs(out_a - out_b).max() > 0  # weights really changed


@pytest.mark.parametrize(
    "variant", ["kl_vae", "i420"]
)
def test_pipelined_engine_alternate_io_paths(variant):
    """The stage cut's other IO paths: the KL VAE's encoder/decoder split
    (quant_conv lives in the encoder, post_quant_conv in the decoder —
    models/vae.py) and packed i420 camera uploads, each equal to the
    monolithic program."""
    bundle = ModelBundle.random(
        "tiny", dtype=jnp.float32, with_controlnet=True, with_kl_vae=True
    )
    kw_spec = {}
    if variant == "kl_vae":
        kw_spec["vae"] = "kl"
    if variant == "i420":
        kw_spec["in_format"] = "i420"
    spec = FrameSpec(batch=2, height=64, width=64, steps=1, **kw_spec)
    frames, embeds, strength, guidance, cn, seeds, kw = _frame_inputs(bundle, spec)
    if variant == "i420":
        from videosd_tpu.ops.preprocess import rgb_to_i420

        frames = rgb_to_i420(frames)

    prog = build_frame_program(bundle, spec)
    want_img, want_lat = prog(
        bundle.params, frames, embeds, strength, guidance, cn, seeds, **kw
    )
    eng = PipelinedFrameEngine(bundle, model_parallel=2)
    got_img, got_lat = eng.run(
        spec, frames, embeds, strength, guidance, cn, seeds, **kw
    )
    diff = np.abs(
        np.asarray(got_img).astype(np.int32) - np.asarray(want_img).astype(np.int32)
    )
    assert diff.max() <= 2, f"max u8 diff {diff.max()}"
    np.testing.assert_allclose(
        np.asarray(got_lat, np.float32), np.asarray(want_lat, np.float32),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.slow
def test_pipelined_engine_option_churn(rng):
    """Live-option churn under mesh_pipe serving: traced options never
    add programs, interval turbo options coerce to parity instead of
    crashing the dispatch loop, and every stream keeps generating
    (the non-pipe fuzz's invariants, test_runtime.py, on the PP path)."""
    import asyncio
    import random as _random

    from videosd_tpu.config import ServerConfig
    from videosd_tpu.runtime.engine import Engine

    fuzz = _random.Random(0)

    async def run():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            ServerConfig(gpus=8, mesh_model=2, mesh_pipe=2),
            bundle=bundle,
            max_streams=2,
            max_batch=4,
            deadline_ms=5,
            frame_hw=(32, 32),
        )
        eng.warmup(batch_sizes=(1,), steps=(1,), height=32, width=32)
        eng.start()
        try:
            sts = [
                eng.open_stream(
                    {"height": 32, "width": 32, "steps": 1, "prompt": f"p{i}"}
                )
                for i in range(2)
            ]
            warmed = len(eng._programs)

            async def churn(st, n):
                for _ in range(n):
                    frame = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                    msg = fuzz.choice(
                        [
                            lambda: {"strength": round(fuzz.uniform(0.05, 1.0), 3)},
                            lambda: {"seed": fuzz.randrange(0, 10_000)},
                            lambda: {"controlnet_scale": round(fuzz.uniform(0.05, 3.0), 2)},
                            # interval options MUST coerce under PP
                            lambda: {"controlnet_interval": fuzz.choice([1, 2, 4])},
                            lambda: {"deepcache_interval": fuzz.choice([1, 3])},
                        ]
                    )()
                    eng.update_options(st.stream_id, msg)
                    out = await asyncio.wait_for(
                        eng.submit_frame(st.stream_id, frame), 120
                    )
                    assert out.shape == (32, 32, 3) and out.dtype == np.uint8

            await asyncio.wait_for(
                asyncio.gather(*[churn(st, 12) for st in sts]), 300
            )
            # interval churn coerces to the parity program: no new buckets
            assert len(eng._programs) == warmed, sorted(eng._programs)
            assert eng.telemetry.frames_out > 0
        finally:
            await eng.stop()

    asyncio.run(run())
