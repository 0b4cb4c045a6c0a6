"""Reference-attention pipeline tests (tiny family).

Behavior contract from lcm_reference_pipeline.py: banked self-attention
K/V + AdaIN stat matching from a noised reference image; ref image must
influence the output; determinism preserved.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_prompt_encoder,
)
from videosd_tpu.pipelines.reference_attn import AdainBank, build_reference_program

SPEC = FrameSpec(batch=1, height=32, width=32, steps=2, use_controlnet=False)


@pytest.fixture(scope="module")
def bundle():
    return ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=False)


@pytest.fixture(scope="module")
def embeds(bundle):
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["style"]), jnp.int32)
    return enc(bundle.params, ids)[0]


def _opts(sf=1.0):
    return (
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([sf], jnp.float32),
        jnp.array([23], jnp.int32),
    )


def test_adain_bank_write_read_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    w = AdainBank("write")
    assert np.asarray(w(x)).shape == x.shape
    assert len(w.stats) == 1
    # reading own stats with fidelity 1 is identity (same distribution)
    r = AdainBank("read", stats=w.stats, fidelity=1.0)
    np.testing.assert_allclose(np.asarray(r(x)), np.asarray(x), atol=1e-5)
    # reading different stats shifts the activation statistics
    y = jnp.asarray(rng.standard_normal((1, 4, 4, 8)) * 3 + 2, jnp.float32)
    w2 = AdainBank("write")
    w2(y)
    r2 = AdainBank("read", stats=w2.stats, fidelity=1.0)
    out = np.asarray(r2(x))
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), np.asarray(y).mean(axis=(1, 2)), atol=1e-4
    )


def test_reference_program_end_to_end(bundle, embeds, rng):
    prog = build_reference_program(bundle, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, lat = prog(bundle.params, frame, ref, embeds, *_opts())
    assert out.shape == (1, 32, 32, 3) and out.dtype == jnp.uint8
    assert np.isfinite(np.asarray(lat)).all()

    # determinism
    out2, _ = prog(bundle.params, frame, ref, embeds, *_opts())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_reference_image_influences_output(bundle, embeds, rng):
    prog = build_reference_program(bundle, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref_a = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref_b = jnp.asarray(np.full((1, 32, 32, 3), 255, np.uint8))
    out_a, _ = prog(bundle.params, frame, ref_a, embeds, *_opts())
    out_b, _ = prog(bundle.params, frame, ref_b, embeds, *_opts())
    assert np.abs(np.asarray(out_a).astype(int) - np.asarray(out_b).astype(int)).max() > 0


def test_style_fidelity_zero_reduces_to_plain_program(bundle, embeds, rng):
    """sf=0 must mean "ignore the reference" LITERALLY: the output equals
    the plain (no-ControlNet) frame program's output bit-for-bit.  An
    implementation that scales banked tokens by sf instead would leave
    zero-tokens occupying softmax mass and fail this.
    Matches lcm_reference_pipeline.py:545,605 intent."""
    from videosd_tpu.pipelines.lcm_img2img import build_frame_program

    ref_prog = build_reference_program(bundle, SPEC)
    plain_prog = build_frame_program(bundle, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref = jnp.asarray(np.full((1, 32, 32, 3), 255, np.uint8))  # loud ref
    strength, guidance, sf0, seed = _opts(0.0)
    out_ref, lat_ref = ref_prog(bundle.params, frame, ref, embeds, strength, guidance, sf0, seed)
    out_plain, lat_plain = plain_prog(
        bundle.params, frame, embeds, strength, guidance,
        jnp.array([2.0], jnp.float32), seed,
    )
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_plain))
    np.testing.assert_allclose(
        np.asarray(lat_ref), np.asarray(lat_plain), atol=1e-6
    )


def test_style_fidelity_interpolates_monotonically(bundle, embeds, rng):
    """Raising sf moves the output monotonically away from the sf=0
    (plain) image toward the fully-banked sf=1 image."""
    prog = build_reference_program(bundle, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref = jnp.asarray(np.full((1, 32, 32, 3), 255, np.uint8))
    outs = {}
    for sf in (0.0, 0.33, 0.66, 1.0):
        out, _ = prog(bundle.params, frame, ref, embeds, *_opts(sf))
        outs[sf] = np.asarray(out).astype(np.float64)
    d = [np.abs(outs[sf] - outs[0.0]).mean() for sf in (0.33, 0.66, 1.0)]
    assert d[0] > 0  # the reference has SOME pull at sf>0
    assert d[0] < d[1] < d[2], d  # and the pull grows with sf


def test_independent_attn_adain_toggles(bundle, embeds, rng):
    """The reference exposes ``reference_attn`` and ``reference_adain`` as
    independent booleans (lcm_reference_pipeline.py:426-427).  Traced
    form: style_fidelity as [B, 2] (attn fidelity, adain fidelity).
    Each mechanism alone must change the output, differently from the
    other; both at 0 must reduce to the [B]-form sf=0 (plain) output;
    both at 1 must equal the [B]-form sf=1 output."""
    prog = build_reference_program(bundle, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref = jnp.asarray(np.full((1, 32, 32, 3), 255, np.uint8))
    strength, guidance, _, seed = _opts()

    def run(attn_sf, adain_sf):
        sf2 = jnp.array([[attn_sf, adain_sf]], jnp.float32)
        out, _ = prog(bundle.params, frame, ref, embeds, strength, guidance, sf2, seed)
        return np.asarray(out).astype(np.float64)

    both_off = run(0.0, 0.0)
    attn_only = run(1.0, 0.0)
    adain_only = run(0.0, 1.0)
    both_on = run(1.0, 1.0)

    out_plain, _ = prog(bundle.params, frame, ref, embeds, *_opts(0.0))
    out_full, _ = prog(bundle.params, frame, ref, embeds, *_opts(1.0))
    np.testing.assert_array_equal(both_off, np.asarray(out_plain).astype(np.float64))
    np.testing.assert_array_equal(both_on, np.asarray(out_full).astype(np.float64))

    assert np.abs(attn_only - both_off).max() > 0
    assert np.abs(adain_only - both_off).max() > 0
    assert np.abs(attn_only - adain_only).max() > 0


def test_reference_program_sdxl_family(rng):
    """text_time micro-conditioning threads through both UNet passes."""
    xb = ModelBundle.random("tiny-xl", dtype=jnp.float32, with_controlnet=False)
    enc = build_prompt_encoder(xb)
    ids = jnp.asarray(xb.tokenizer(["style"]), jnp.int32)
    ctx, pooled = enc(xb.params, ids)
    prog = build_reference_program(xb, SPEC)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    ref = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, lat = prog(xb.params, frame, ref, ctx, *_opts(), pooled_embeds=pooled)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(lat)).all()


def test_warmup_ref_compiles_ref_bucket():
    """engine.warmup(ref=True) warms the reference-attention program for
    each bucket (tools/warm_cache --ref) so a first ref-mode stream never
    cold-stalls; the warmed spec mirrors the batcher's ref coercions
    (use_controlnet=False, intervals 1)."""
    import jax.numpy as jnp

    from videosd_tpu.pipelines.lcm_img2img import ModelBundle
    from videosd_tpu.runtime.engine import Engine

    bundle = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=True)
    eng = Engine(
        bundle=bundle, max_streams=1, max_batch=1, deadline_ms=5,
        frame_hw=(64, 64),
    )
    eng.warmup(batch_sizes=(1,), steps=(2,), height=64, width=64, ref=True)
    ref_specs = [sp for sp, rm in eng._ready_specs if rm]
    assert ref_specs, eng._ready_specs
    assert all(
        not sp.use_controlnet
        and sp.controlnet_interval == 1
        and sp.deepcache_interval == 1
        and not sp.deepcache_temporal
        for sp in ref_specs
    )
    # the plain bucket was warmed too
    assert any(not rm for _sp, rm in eng._ready_specs)
