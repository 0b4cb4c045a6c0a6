"""Golden-output regression: the tiny frame program's numerics are pinned.

Guards the whole chain (preprocess -> sobel -> VAE encode -> masked
2-step LCM denoise with ControlNet -> TAESD decode -> postprocess)
against accidental numerics drift from refactors — e.g. an op rewrite
that is "mathematically identical" but reassociates differently than
intended.  Regenerate the fixture ONLY for intentional numerics changes:

    python tests/test_golden.py --regen
"""

import os

import numpy as np

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_tiny_2step.npz")


def _run():
    import jax.numpy as jnp

    from videosd_tpu.pipelines.lcm_img2img import (
        FrameSpec,
        ModelBundle,
        build_frame_program,
        build_prompt_encoder,
    )

    bundle = ModelBundle.random("tiny", dtype=jnp.float32)
    spec = FrameSpec(batch=1, height=32, width=32, in_height=32, in_width=32, steps=2)
    prog = build_frame_program(bundle, spec)
    enc = build_prompt_encoder(bundle)
    ids = jnp.asarray(bundle.tokenizer(["golden prompt"]), jnp.int32)
    embeds, _ = enc(bundle.params, ids)
    rng = np.random.default_rng(1234)
    frame = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))
    out, lat = prog(
        bundle.params,
        frame,
        embeds,
        jnp.array([0.6], jnp.float32),
        jnp.array([5.0], jnp.float32),
        jnp.array([2.0], jnp.float32),
        jnp.array([23], jnp.int32),
    )
    return np.asarray(out), np.asarray(lat, np.float32)


def test_tiny_pipeline_matches_golden():
    golden = np.load(_FIXTURE)
    image, latents = _run()
    # fp32 CPU is deterministic for a fixed jax version; loose-enough
    # tolerances absorb compiler-version reassociation, tight enough to
    # catch real numerics changes (latents std is ~2.5)
    np.testing.assert_allclose(latents, golden["latents"], atol=5e-4, rtol=1e-4)
    assert np.abs(image.astype(int) - golden["image"].astype(int)).max() <= 1


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        image, latents = _run()
        np.savez(_FIXTURE, image=image, latents=latents)
        print("regenerated", _FIXTURE)
