"""Temporal DeepCache (cross-frame trunk reuse) program invariants.

FrameSpec.deepcache_temporal's two modes (lcm_img2img.frame_program):
produce = the parity program + a free capture of the per-step deep-trunk
features; reuse = shallow blocks only over carried features.  The
correctness anchor: reuse fed with caches produced from the SAME inputs
must be BIT-EXACT with the parity program (the deep_feature split's
pinned property, models/unet.py) — anything less means the shallow path
diverged.  Cross-frame quality is measured, not asserted
(tools/temporal_gate.py, PERF.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_frame_program,
    build_prompt_encoder,
)


@pytest.fixture(scope="module")
def setup():
    bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["a cat"]), jnp.int32)
    ctx, _ = enc(bundle.params, ids)
    b = 2
    embeds = jnp.concatenate([ctx] * b, axis=0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, 64, 64, 3), dtype=np.uint8))
    args = (
        jnp.linspace(0.5, 0.8, b).astype(jnp.float32),
        jnp.full((b,), 5.0, jnp.float32),
        jnp.full((b,), 2.0, jnp.float32),
        jnp.arange(7, 7 + b, dtype=jnp.int32),
    )
    return bundle, frames, embeds, args, rng


def test_produce_mode_bit_matches_parity_and_reuse_roundtrip(setup):
    bundle, frames, embeds, args, rng = setup
    b = frames.shape[0]
    parity = build_frame_program(bundle, FrameSpec(batch=b, height=64, width=64, steps=2))
    img_p, lat_p = parity(bundle.params, frames, embeds, *args)

    spec_t = FrameSpec(batch=b, height=64, width=64, steps=2, deepcache_temporal=True)
    prog_t = build_frame_program(bundle, spec_t)

    # produce: parity outputs + [B, S, h', w', c'] trunk captures
    img_f, lat_f, caches = prog_t(bundle.params, frames, embeds, *args)
    assert caches.shape[:2] == (b, 2)
    np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_p))
    np.testing.assert_array_equal(np.asarray(lat_f), np.asarray(lat_p))

    # reuse with same-input caches: bit-exact with parity
    img_r, lat_r = prog_t(bundle.params, frames, embeds, *args, deep_caches=caches)
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_p))
    np.testing.assert_array_equal(np.asarray(lat_r), np.asarray(lat_p))

    # reuse on a different frame: the approximation actually engages
    frames2 = jnp.asarray(
        rng.integers(0, 256, (b, 64, 64, 3), dtype=np.uint8)
    )
    img_r2, _ = prog_t(bundle.params, frames2, embeds, *args, deep_caches=caches)
    assert (
        np.abs(np.asarray(img_r2).astype(int) - np.asarray(img_p).astype(int)).max()
        > 0
    )


def test_temporal_rejects_interval_combination(setup):
    bundle, frames, embeds, args, _ = setup
    b = frames.shape[0]
    spec = FrameSpec(
        batch=b, height=64, width=64, steps=2,
        deepcache_temporal=True, deepcache_interval=2,
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_frame_program(bundle, spec)(bundle.params, frames, embeds, *args)


async def _await_reuse_ready(eng, timeout: float = 300.0):
    """Wait until the temporal REUSE jit variant is servable.

    engine._process_group downgrades reuse batches to produce while that
    variant compiles in the background (ADVICE r4) — correct serving
    behavior, but it would make age-cadence assertions racy without this
    barrier."""
    import asyncio

    loop = asyncio.get_running_loop()
    t0 = loop.time()
    while loop.time() - t0 < timeout:
        if any(sp.deepcache_temporal for sp, _rm in eng._ready_reuse):
            return
        await asyncio.sleep(0.1)
    raise TimeoutError("temporal reuse variant never became ready")


def test_engine_serves_temporal_cadence(rng):
    """Serving path: option deepcache_temporal=N alternates produce/reuse
    batches per stream (trunk rows device-resident, age-tracked), keeps
    generating, and toggling the option off drops the carried rows."""
    import asyncio

    from videosd_tpu.runtime.engine import Engine

    async def run():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            bundle=bundle, max_streams=2, max_batch=2, deadline_ms=5,
            frame_hw=(64, 64),
        )
        eng.start()
        try:
            st = eng.open_stream(
                {"height": 64, "width": 64, "steps": 2, "deepcache_temporal": 3}
            )
            ages = []
            for i in range(7):
                frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                before = eng.telemetry.frames_out
                # a cold bucket serves passthrough while compiling; loop
                # until this submit produced a REAL generation
                loop = asyncio.get_running_loop()
                t0 = loop.time()
                while loop.time() - t0 < 300:
                    out = await asyncio.wait_for(
                        eng.submit_frame(st.stream_id, frame), 300
                    )
                    if eng.telemetry.frames_out > before:
                        break
                    await asyncio.sleep(0.1)
                assert eng.telemetry.frames_out > before
                if i == 0:
                    # the first real frame can land while the reuse
                    # variant still compiles; wait so the cadence below
                    # is deterministic
                    await _await_reuse_ready(eng)
                ages.append(st.temporal_age)
                assert st.deep_rows is not None
                assert st.deep_rows_key == (2, 64, 64, "")
            # produce resets age to 1; reuse increments: 1,2,3,1,2,3,1
            assert ages == [1, 2, 3, 1, 2, 3, 1], ages
            assert out.shape == (64, 64, 3)

            # toggling off clears the carried rows on the next frame
            eng.update_options(st.stream_id, {"deepcache_temporal": 0})
            before = eng.telemetry.frames_out
            loop = asyncio.get_running_loop()
            t0 = loop.time()
            while loop.time() - t0 < 300:
                await asyncio.wait_for(
                    eng.submit_frame(
                        st.stream_id,
                        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
                    ),
                    300,
                )
                if eng.telemetry.frames_out > before:
                    break
                await asyncio.sleep(0.1)
            assert st.deep_rows is None
        finally:
            await eng.stop()

    asyncio.run(run())


def test_engine_temporal_two_streams_desync(rng):
    """Two streams with the same option but desynced ages group into
    SEPARATE produce/reuse batches in the same tick (the produce/reuse
    split is part of the bucket key) and both keep generating with
    correct per-stream state."""
    import asyncio

    from videosd_tpu.runtime.engine import Engine

    async def run():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            bundle=bundle, max_streams=2, max_batch=2, deadline_ms=5,
            frame_hw=(64, 64),
        )
        eng.start()
        try:
            opts = {"height": 64, "width": 64, "steps": 2, "deepcache_temporal": 2}
            st_a = eng.open_stream(dict(opts))

            async def one_real(st):
                loop = asyncio.get_running_loop()
                t0 = loop.time()
                while loop.time() - t0 < 300:
                    before = eng.telemetry.frames_out
                    out = await asyncio.wait_for(
                        eng.submit_frame(
                            st.stream_id,
                            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
                        ),
                        300,
                    )
                    if eng.telemetry.frames_out > before:
                        return out
                    await asyncio.sleep(0.1)
                raise TimeoutError(eng.stats())

            # desync: stream A generates one frame alone (age 1) before
            # stream B exists (age None -> produce due)
            await one_real(st_a)
            assert st_a.temporal_age == 1
            await _await_reuse_ready(eng)
            st_b = eng.open_stream(dict(opts))

            # same tick: A is reuse-eligible, B must produce — different
            # group keys, so both resolve without corrupting each other
            out_a, out_b = await asyncio.gather(one_real(st_a), one_real(st_b))
            assert out_a.shape == out_b.shape == (64, 64, 3)
            assert st_a.deep_rows is not None and st_b.deep_rows is not None
            # A reused (age advanced), B produced (age reset to 1)
            assert st_a.temporal_age == 2, st_a.temporal_age
            assert st_b.temporal_age == 1, st_b.temporal_age
        finally:
            await eng.stop()

    asyncio.run(run())


def test_warmup_temporal_compiles_both_variants(rng):
    """engine.warmup(temporal=True) warms the temporal bucket end-to-end
    (produce + reuse jit variants — _warm_spec chains a reuse run off the
    produce run's caches) so a first reuse batch never cold-stalls."""
    from videosd_tpu.runtime.engine import Engine

    bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
    eng = Engine(
        bundle=bundle, max_streams=2, max_batch=2, deadline_ms=5,
        frame_hw=(64, 64),
    )
    eng.warmup(batch_sizes=(1,), steps=(2,), height=64, width=64, temporal=True)
    assert any(sp.deepcache_temporal for sp, _rm in eng._ready_specs)


def test_reuse_batch_downgrades_while_reuse_variant_cold(rng):
    """A reuse-eligible batch whose REUSE jit variant has not completed a
    run (temporal enabled live: produce warmed first, reuse still
    compiling) must dispatch as PRODUCE — parity output, rows refreshed —
    instead of cold-compiling on the single dispatch worker.  Keyed by
    engine._ready_reuse (ADVICE r4, engine._process_group)."""
    import asyncio

    from videosd_tpu.runtime.engine import Engine

    async def run():
        bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
        eng = Engine(
            bundle=bundle, max_streams=1, max_batch=1, deadline_ms=5,
            frame_hw=(64, 64),
        )
        eng.start()
        try:
            opts = {"height": 64, "width": 64, "steps": 2, "deepcache_temporal": 3}
            st = eng.open_stream(dict(opts))

            async def one_real():
                loop = asyncio.get_running_loop()
                t0 = loop.time()
                while loop.time() - t0 < 300:
                    before = eng.telemetry.frames_out
                    out = await asyncio.wait_for(
                        eng.submit_frame(
                            st.stream_id,
                            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
                        ),
                        300,
                    )
                    if eng.telemetry.frames_out > before:
                        return out
                    await asyncio.sleep(0.1)
                raise TimeoutError(eng.stats())

            # first frame: produce (compiles both variants in background)
            await one_real()
            assert st.temporal_age == 1 and st.deep_rows is not None
            await _await_reuse_ready(eng)
            # second frame: reuse variant ready -> age advances
            await one_real()
            assert st.temporal_age == 2

            # simulate the cold-reuse window: produce ready, reuse not.
            # Pre-claim the compiling marker so the downgrade path's
            # background warm dedups instead of re-running in the test.
            eng._ready_reuse.clear()
            claimed = {
                (sp, rm) for sp, rm in eng._ready_specs if sp.deepcache_temporal
            }
            eng._compiling |= claimed
            try:
                await one_real()
                # downgraded to produce: fresh rows, age RESET to 1 (a
                # reuse dispatch would have advanced it to 3)
                assert st.temporal_age == 1, st.temporal_age
            finally:
                eng._compiling -= claimed
        finally:
            await eng.stop()

    asyncio.run(run())
