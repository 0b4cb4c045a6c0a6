"""End-to-end frame-program tests on the tiny family.

Covers the minimum end-to-end slice of SURVEY.md §7 step 3: uint8 frame in
-> uint8 frame out, determinism by seed, live-parameter tracing (no
recompile), per-element strength masking, and warm latent reuse.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    build_frame_program,
    build_prompt_encoder,
)

SPEC = FrameSpec(batch=1, height=32, width=32, steps=2)


@pytest.fixture(scope="module")
def bundle():
    return ModelBundle.random("tiny", dtype=jnp.float32)


@pytest.fixture(scope="module")
def program(bundle):
    return build_frame_program(bundle, SPEC)


def _opts(b=1, strength=0.6, guidance=5.0, cn=2.0, seed=23):
    return (
        jnp.full((b,), strength, jnp.float32),
        jnp.full((b,), guidance, jnp.float32),
        jnp.full((b,), cn, jnp.float32),
        jnp.full((b,), seed, jnp.int32),
    )


@pytest.fixture(scope="module")
def embeds(bundle):
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["a cat"]), jnp.int32)
    ctx, _ = enc(bundle.params, ids)
    return ctx


def test_frame_program_end_to_end(bundle, program, embeds, rng):
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, latents = program(bundle.params, frame, embeds, *_opts())
    assert out.shape == (1, 32, 32, 3) and out.dtype == jnp.uint8
    assert latents.shape == (1, 4, 4, 4)
    assert np.isfinite(np.asarray(latents)).all()


def test_determinism_by_seed(bundle, program, embeds, rng):
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    o1, _ = program(bundle.params, frame, embeds, *_opts(seed=7))
    o2, _ = program(bundle.params, frame, embeds, *_opts(seed=7))
    o3, _ = program(bundle.params, frame, embeds, *_opts(seed=8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.abs(np.asarray(o3).astype(int) - np.asarray(o1).astype(int)).max() > 0


def test_sliders_do_not_recompile(bundle, embeds, rng):
    traces = []
    spec = SPEC

    from videosd_tpu.pipelines import lcm_img2img as m

    orig = m.frame_program

    def counting(*a, **kw):
        traces.append(1)
        return orig(*a, **kw)

    m.frame_program = counting
    try:
        prog = build_frame_program(ModelBundle.random("tiny", dtype=jnp.float32), spec)
        b = ModelBundle.random("tiny", dtype=jnp.float32)
        frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
        for s, g, c, sd in [(0.6, 5.0, 2.0, 1), (0.3, 7.0, 0.5, 2), (0.9, 1.0, 3.0, 3)]:
            prog(b.params, frame, embeds, *_opts(strength=s, guidance=g, cn=c, seed=sd))
    finally:
        m.frame_program = orig
    assert len(traces) == 1


def test_strength_changes_output(bundle, program, embeds, rng):
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    lo, _ = program(bundle.params, frame, embeds, *_opts(strength=0.2))
    hi, _ = program(bundle.params, frame, embeds, *_opts(strength=0.9))
    assert np.abs(np.asarray(lo).astype(int) - np.asarray(hi).astype(int)).max() > 0


def test_batched_heterogeneous_options(bundle, embeds, rng):
    """Two streams with different sliders in ONE batch must equal two
    singleton calls — the core cross-stream batching invariant."""
    spec2 = FrameSpec(batch=2, height=32, width=32, steps=2)
    prog2 = build_frame_program(bundle, spec2)
    prog1 = build_frame_program(bundle, SPEC)

    frames = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    emb2 = jnp.concatenate([embeds, embeds], axis=0)
    strength = jnp.array([0.6, 0.3], jnp.float32)
    guidance = jnp.array([5.0, 8.0], jnp.float32)
    cn = jnp.array([2.0, 0.7], jnp.float32)
    seed = jnp.array([23, 42], jnp.int32)

    out2, lat2 = prog2(bundle.params, frames, emb2, strength, guidance, cn, seed)
    for i in range(2):
        o1, l1 = prog1(
            bundle.params,
            frames[i : i + 1],
            embeds,
            strength[i : i + 1],
            guidance[i : i + 1],
            cn[i : i + 1],
            seed[i : i + 1],
        )
        np.testing.assert_allclose(
            np.asarray(out2[i]).astype(int), np.asarray(o1[0]).astype(int), atol=2
        )


def test_no_controlnet_variant(rng):
    b = ModelBundle.random("tiny", dtype=jnp.float32, with_controlnet=False)
    spec = FrameSpec(batch=1, height=32, width=32, steps=1, use_controlnet=False)
    prog = build_frame_program(b, spec)
    enc = build_prompt_encoder(b)
    ids = jnp.asarray(b.tokenizer(["x"]), jnp.int32)
    ctx, _ = enc(b.params, ids)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, _ = prog(b.params, frame, ctx, *_opts())
    assert out.shape == (1, 32, 32, 3)


def test_kl_vae_variant(rng):
    b = ModelBundle.random("tiny", dtype=jnp.float32, with_kl_vae=True)
    spec = FrameSpec(batch=1, height=32, width=32, steps=1, vae="kl")
    prog = build_frame_program(b, spec)
    enc = build_prompt_encoder(b)
    ids = jnp.asarray(b.tokenizer(["x"]), jnp.int32)
    ctx, _ = enc(b.params, ids)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, lat = prog(b.params, frame, ctx, *_opts())
    assert out.shape == (1, 32, 32, 3)
    assert lat.shape == (1, 4, 4, 4)


def test_camera_shape_crop(bundle, rng, embeds):
    """Non-square camera input center-crops on device."""
    spec = FrameSpec(batch=1, height=32, width=32, in_height=48, in_width=96, steps=1)
    prog = build_frame_program(bundle, spec)
    frame = jnp.asarray(rng.integers(0, 256, (1, 48, 96, 3), dtype=np.uint8))
    out, _ = prog(bundle.params, frame, embeds, *_opts())
    assert out.shape == (1, 32, 32, 3)


def test_tokenizer_fallback_stable():
    from videosd_tpu.text.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer(None)
    a = tok(["a photo of a cat"])
    b = tok(["a photo of a cat"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 77)
    assert a[0, 0] == tok.BOT
    assert (a[0] == tok.EOT).any()


def test_safety_hook_seam(bundle, embeds, rng):
    """The optional post-decode safety hook (reference seam:
    lcm_controlnet.py:593-608) blacks out flagged rows inside the same
    XLA program; default (no hook) output is untouched."""
    import dataclasses

    from videosd_tpu.pipelines.safety import make_blackout_hook

    frame = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))

    # flag row 1 only (a stand-in classifier; production supplies a real
    # safety head through the same seam)
    def classify(img01):
        return jnp.asarray([False, True])

    guarded = dataclasses.replace(
        bundle, safety_hook=make_blackout_hook(classify)
    )
    spec2 = dataclasses.replace(SPEC, batch=2)
    prog_g = build_frame_program(guarded, spec2)
    prog_p = build_frame_program(bundle, spec2)
    opts = _opts(b=2)
    out_g, _ = prog_g(bundle.params, frame, jnp.concatenate([embeds] * 2), *opts)
    out_p, _ = prog_p(bundle.params, frame, jnp.concatenate([embeds] * 2), *opts)
    np.testing.assert_array_equal(np.asarray(out_g[0]), np.asarray(out_p[0]))
    assert int(np.asarray(out_g[1]).sum()) == 0  # flagged row is black
    assert int(np.asarray(out_p[1]).sum()) > 0


def test_warm_alpha_zero_bit_identical(bundle, program, embeds, rng):
    """warm_alpha=0 must be bit-identical to the no-warm path: the blend
    (1-a)*latents + a*warm in fp32 is exact at a=0 regardless of the warm
    buffer's contents (the serving engine always passes warm arrays, so a
    stream that never enables warm-start must not pay ANY numeric drift)."""
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    opts = _opts(b=1)
    out_plain, lat_plain = program(bundle.params, frame, embeds, *opts)
    warm = jnp.asarray(
        rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    )  # arbitrary non-zero history
    out_warm, lat_warm = program(
        bundle.params, frame, embeds, *opts,
        warm_latents=warm, warm_alpha=jnp.array([0.0], jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_warm))
    np.testing.assert_array_equal(np.asarray(lat_plain), np.asarray(lat_warm))


def test_skin_stats_classifier_flags_skin_chroma():
    """The built-in safety classifier (YCbCr skin-chroma box) flags a
    skin-toned image and passes a blue one."""
    from videosd_tpu.pipelines.safety import skin_stats_classifier

    classify = skin_stats_classifier(threshold=0.5)
    skin = jnp.broadcast_to(
        jnp.asarray([224 / 255.0, 172 / 255.0, 140 / 255.0]), (1, 32, 32, 3)
    )
    blue = jnp.broadcast_to(jnp.asarray([0.1, 0.2, 0.9]), (1, 32, 32, 3))
    both = jnp.concatenate([skin, blue], axis=0)
    flagged = np.asarray(classify(both))
    assert flagged.tolist() == [True, False]


def test_builtin_safety_blackout_end_to_end(bundle, embeds, rng):
    """Config-style built-in safety: a flagged frame comes back BLACK
    through the full frame program (VERDICT round-2 item 8); the
    never-flag threshold reproduces the unguarded output bit-exactly."""
    import dataclasses

    from videosd_tpu.pipelines.safety import default_safety_hook

    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    always = dataclasses.replace(bundle, safety_hook=default_safety_hook(-1.0))
    never = dataclasses.replace(bundle, safety_hook=default_safety_hook(2.0))
    prog_a = build_frame_program(always, SPEC)
    prog_n = build_frame_program(never, SPEC)
    prog_p = build_frame_program(bundle, SPEC)
    opts = _opts(b=1)
    out_a, _ = prog_a(bundle.params, frame, embeds, *opts)
    out_n, _ = prog_n(bundle.params, frame, embeds, *opts)
    out_p, _ = prog_p(bundle.params, frame, embeds, *opts)
    assert int(np.asarray(out_a).sum()) == 0  # flagged -> black
    np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_p))


def test_i420_input_program_parity(bundle, program, embeds, rng):
    """in_format=i420: the packed-input program on a packed smooth frame
    stays close to the RGB program on the source frame — the only
    divergence budget is the chroma 2x2 subsample, which the diffusion
    process must not amplify into a different image."""
    from videosd_tpu.ops import rgb_to_i420_host

    base = rng.integers(40, 216, (4, 4, 3)).astype(np.float32)
    img = np.clip(
        np.stack([np.kron(base[..., c], np.ones((8, 8))) for c in range(3)], -1),
        0,
        255,
    ).astype(np.uint8)  # 32x32 smooth

    spec_i420 = FrameSpec(batch=1, height=32, width=32, steps=2, in_format="i420")
    prog_i420 = build_frame_program(bundle, spec_i420)

    packed = rgb_to_i420_host(img)[None]
    out_i, lat_i = prog_i420(bundle.params, jnp.asarray(packed), embeds, *_opts())
    out_r, _ = program(bundle.params, jnp.asarray(img[None]), embeds, *_opts())

    assert out_i.shape == (1, 32, 32, 3) and out_i.dtype == jnp.uint8
    assert np.isfinite(np.asarray(lat_i)).all()
    diff = np.abs(
        np.asarray(out_i, np.float32) - np.asarray(out_r, np.float32)
    ).mean()
    assert diff < 8.0, diff


def test_controlnet_interval_single_step_is_exact(bundle, embeds, rng):
    """With a 1-step ladder every interval evaluates the ControlNet exactly
    once at the same (latents, t), so interval>1 must be numerically
    identical to the reference-parity interval=1 program."""
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    s1 = FrameSpec(batch=1, height=32, width=32, steps=1)
    s4 = FrameSpec(batch=1, height=32, width=32, steps=1, controlnet_interval=4)
    o1, _ = build_frame_program(bundle, s1)(bundle.params, frame, embeds, *_opts())
    o4, _ = build_frame_program(bundle, s4)(bundle.params, frame, embeds, *_opts())
    np.testing.assert_allclose(
        np.asarray(o1, np.int32), np.asarray(o4, np.int32), atol=1
    )


def test_controlnet_interval_reuses_residuals(bundle, embeds, rng):
    """steps=4 @ interval=2 traces exactly 2 ControlNet calls (s=0,2) and
    its output differs from interval=1 (the stale-latent approximation is
    real, not a silent no-op).  The random-init ControlNet's output convs
    are zero (residuals vanish, models/controlnet.py zero-init), so the
    zero convs are perturbed to make residuals observable."""
    from videosd_tpu.pipelines import lcm_img2img as m

    # give the zero-convs nonzero kernels so residuals actually land
    prng = np.random.default_rng(3)
    params = dict(bundle.params)
    params["controlnet"] = jax.tree.map(
        lambda a: jnp.asarray(prng.normal(0, 0.05, a.shape), a.dtype)
        if a.ndim in (1, 4)
        else a,
        bundle.params["controlnet"],
    )

    calls = []
    orig = m.controlnet_apply

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    spec2 = FrameSpec(batch=1, height=32, width=32, steps=4, controlnet_interval=2)
    spec1 = FrameSpec(batch=1, height=32, width=32, steps=4)
    m.controlnet_apply = counting
    try:
        out2, _ = build_frame_program(bundle, spec2)(params, frame, embeds, *_opts())
        n2 = len(calls)
    finally:
        m.controlnet_apply = orig
    assert n2 == 2, n2
    out1, _ = build_frame_program(bundle, spec1)(params, frame, embeds, *_opts())
    assert np.abs(np.asarray(out2, int) - np.asarray(out1, int)).max() > 0


def test_deepcache_interval_single_step_is_exact(bundle, embeds, rng):
    """With a 1-step ladder every interval runs exactly one FULL UNet pass
    (the capture step), so deepcache_interval>1 must be numerically
    identical to the reference-parity interval=1 program."""
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    s1 = FrameSpec(batch=1, height=32, width=32, steps=1)
    s4 = FrameSpec(batch=1, height=32, width=32, steps=1, deepcache_interval=4)
    o1, _ = build_frame_program(bundle, s1)(bundle.params, frame, embeds, *_opts())
    o4, _ = build_frame_program(bundle, s4)(bundle.params, frame, embeds, *_opts())
    np.testing.assert_allclose(
        np.asarray(o1, np.int32), np.asarray(o4, np.int32), atol=1
    )


def test_deepcache_interval_reuses_trunk(bundle, embeds, rng):
    """steps=4 @ deepcache_interval=2 traces 2 full (capture) passes and 2
    shallow passes, and its output differs from interval=1 (the stale
    trunk approximation is real, not a silent no-op)."""
    from videosd_tpu.pipelines import lcm_img2img as m

    calls = {"full": 0, "shallow": 0}
    orig = m.unet_apply

    def counting(*a, **kw):
        if kw.get("deep_feature") is not None:
            calls["shallow"] += 1
        else:
            calls["full"] += 1
        return orig(*a, **kw)

    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    spec2 = FrameSpec(batch=1, height=32, width=32, steps=4, deepcache_interval=2)
    spec1 = FrameSpec(batch=1, height=32, width=32, steps=4)
    m.unet_apply = counting
    try:
        out2, _ = build_frame_program(bundle, spec2)(
            bundle.params, frame, embeds, *_opts()
        )
    finally:
        m.unet_apply = orig
    assert calls == {"full": 2, "shallow": 2}, calls
    out1, _ = build_frame_program(bundle, spec1)(bundle.params, frame, embeds, *_opts())
    assert np.abs(np.asarray(out2, int) - np.asarray(out1, int)).max() > 0


def test_controlnet_interval_keep_window(bundle, embeds, rng):
    """Interval mode still honors the reference keep-schedule
    (lcm_controlnet.py:521-529): with control_guidance_end excluding the
    final step, that step's reused residuals are scaled to zero — so the
    program equals the same schedule at interval=1 on a 2-step ladder
    where each retained step IS an eval step."""
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    # 2 steps, end=0.5: only step 0 keeps residuals; step 1 (s+1)/S=1.0>0.5
    a = FrameSpec(batch=1, height=32, width=32, steps=2, control_guidance_end=0.5)
    b = FrameSpec(
        batch=1, height=32, width=32, steps=2, control_guidance_end=0.5,
        controlnet_interval=2,
    )
    oa, _ = build_frame_program(bundle, a)(bundle.params, frame, embeds, *_opts())
    ob, _ = build_frame_program(bundle, b)(bundle.params, frame, embeds, *_opts())
    np.testing.assert_allclose(
        np.asarray(oa, np.int32), np.asarray(ob, np.int32), atol=1
    )


def test_refresh_last_parity_noop(bundle, embeds, rng):
    """interval_refresh_last with both intervals at 1 is the parity
    program bit-for-bit (the flag only gates cache-refresh branches that
    do not exist at interval 1)."""
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    spec = FrameSpec(batch=1, height=32, width=32, steps=2)
    spec_rl = dataclasses.replace(spec, interval_refresh_last=True)
    o_rl, _ = build_frame_program(bundle, spec_rl)(
        bundle.params, frame, embeds, *_opts()
    )
    o, _ = build_frame_program(bundle, spec)(bundle.params, frame, embeds, *_opts())
    np.testing.assert_array_equal(np.asarray(o_rl), np.asarray(o))


def test_refresh_last_deepcache_final_step_fresh(bundle, embeds, rng):
    """steps=4 @ dc=2: plain interval refreshes s=0,2 (final step stale);
    +last refreshes s=0,2,3.  The extra full pass must change the output
    (the trained-weight gate showed final-step freshness dominates
    quality — PERF.md round 4), and the +last program must trace one
    more FULL UNet pass than the plain one."""
    from videosd_tpu.pipelines import lcm_img2img as m

    full_calls = []
    orig = m.unet_apply

    def counting(*a, **kw):
        if kw.get("return_deep_feature"):
            full_calls.append(1)
        return orig(*a, **kw)

    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    spec_p = FrameSpec(batch=1, height=32, width=32, steps=4, deepcache_interval=2)
    spec_rl = FrameSpec(
        batch=1, height=32, width=32, steps=4, deepcache_interval=2,
        interval_refresh_last=True,
    )
    m.unet_apply = counting
    try:
        out_p, _ = build_frame_program(bundle, spec_p)(
            bundle.params, frame, embeds, *_opts()
        )
        n_plain = len(full_calls)
        full_calls.clear()
        out_rl, _ = build_frame_program(bundle, spec_rl)(
            bundle.params, frame, embeds, *_opts()
        )
        n_rl = len(full_calls)
    finally:
        m.unet_apply = orig
    assert (n_plain, n_rl) == (2, 3), (n_plain, n_rl)
    assert np.abs(np.asarray(out_rl, int) - np.asarray(out_p, int)).max() > 0
