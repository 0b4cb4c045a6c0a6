"""Reference-attention ("reference-only") style-transfer frame program.

Functional rewrite of the reference's monkey-patch design
(diffusert/lcm/lcm_reference_pipeline.py): there, UNet internals are
runtime-patched so a WRITE pass on a noised reference image banks each
self-attention's pre-attention hidden states
(``hacked_basic_transformer_inner_forward``, :498-585) and per-block
GroupNorm statistics (mid :587-608, down :610-703, up :705-794), and the
READ pass concatenates the banked tokens into self-attention K/V and
AdaIN-matches activations to the banked statistics; each denoise step runs
the UNet twice (:873-890).

Here the banks are explicit values: the WRITE pass returns
``(attn_bank, adain_stats)`` as outputs and the READ pass takes them as
inputs (the ``bank``/``adain`` hooks threaded through
videosd_tpu/models/unet.py) — no mutation, fully jittable, and the
2x-UNet cost is visible in the program instead of hidden in patched
closures.

CFG note: the reference blends banked vs. plain branches with
``style_fidelity`` only for the *unconditional* half of a CFG batch
(:545, :605).  LCM runs without CFG (lcm_controlnet.py:197-198), where the
reference's math reduces to fully-banked attention + AdaIN regardless of
``style_fidelity``; we therefore apply ``style_fidelity`` as an explicit
OUTPUT blend between the banked and plain self-attention branches (and
between AdaIN-styled and raw activations), which recovers the reference's
*intent* (0 = ignore reference, 1 = full reference) in the no-CFG regime.
sf=0 reduces bit-exactly to the plain (no-ControlNet) frame program —
pinned by tests/test_reference_attn.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videosd_tpu.models.layers import guidance_embedding
from videosd_tpu.models.unet import BankReader, unet_apply
from videosd_tpu.ops import (
    crop_resize,
    i420_to_rgb255,
    postprocess_image,
    preprocess_frame,
)
from videosd_tpu.pipelines.lcm_img2img import (
    FrameSpec,
    ModelBundle,
    _decode_latents,
    _encode_latents,
)
from videosd_tpu.schedulers import step, timestep_schedule

__all__ = ["AdainBank", "reference_frame_program", "build_reference_program"]


class AdainBank:
    """Ordered per-block GroupNorm statistic bank.

    write mode: records (mean, std) over the spatial dims per call site,
    passes activations through (lcm_reference_pipeline.py:591-596 analog).
    read mode: re-normalizes activations to the recorded stats with a
    ``fidelity`` blend (see module docstring).
    """

    def __init__(self, mode: str, stats=None, fidelity=1.0, eps: float = 1e-5):
        assert mode in ("write", "read", "off")
        self.mode = mode
        self.stats = list(stats) if stats is not None else []
        self.fidelity = fidelity
        self.eps = eps
        self._i = 0

    def __call__(self, x):
        if self.mode == "off":
            return x
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        std = jnp.sqrt(var + self.eps)
        if self.mode == "write":
            self.stats.append((mean, std))
            return x
        ref_mean, ref_std = self.stats[self._i]
        self._i += 1
        styled = ((xf - mean) / std) * ref_std + ref_mean
        out = self.fidelity * styled + (1.0 - self.fidelity) * xf
        return out.astype(x.dtype)


def reference_frame_program(
    params: dict,
    spec: FrameSpec,
    unet_cfg,
    sched_cfg,
    taesd_cfg,
    vae_cfg,
    alphas_cumprod,
    dtype,
    frame_u8,
    ref_frame_u8,
    prompt_embeds,
    strength,
    guidance_scale,
    style_fidelity,
    seed,
    pooled_embeds=None,
    src_box=None,
    ref_box=None,
):
    """Reference-mode frame step.

    ref_frame_u8: [B, H, W, 3] style reference image (the reference keeps
    it per track and re-noises it each step, lcm_reference_pipeline.py:
    865-880).  No ControlNet in this mode, matching the reference's
    reference-pipeline variant.  src_box/ref_box: optional traced [B,4]
    (top, left, height, width) camera/ref extents inside the mailbox
    (see lcm_img2img.frame_program).
    """
    B, S = spec.batch, spec.steps
    cfgs = (taesd_cfg, vae_cfg)

    if spec.in_format == "i420":
        # camera frames upload packed 4:2:0 (lcm_img2img.frame_program);
        # the style reference stays RGB (uploaded once per set_ref)
        frame_u8 = i420_to_rgb255(frame_u8)
    if src_box is not None:
        img01 = crop_resize(frame_u8, src_box, spec.height, spec.width, dtype=jnp.float32)
    else:
        img01 = preprocess_frame(frame_u8, spec.height, spec.width, dtype=jnp.float32)
    if ref_box is not None:
        ref01 = crop_resize(ref_frame_u8, ref_box, spec.height, spec.width, dtype=jnp.float32)
    else:
        ref01 = preprocess_frame(ref_frame_u8, spec.height, spec.width, dtype=jnp.float32)
    latents0 = _encode_latents(cfgs, params, spec, (img01 * 2 - 1).astype(dtype))
    ref_lat0 = _encode_latents(cfgs, params, spec, (ref01 * 2 - 1).astype(dtype))

    ts, valid = jax.vmap(
        lambda s: timestep_schedule(sched_cfg, S, s, spec.lcm_origin_steps)
    )(strength)
    keys = jax.vmap(jax.random.PRNGKey)(seed)

    def elem_noise(k, fold):
        return jax.random.normal(
            jax.random.fold_in(k, fold), latents0.shape[1:], jnp.float32
        )

    first_idx = jnp.argmax(valid, axis=1)
    t_first = jnp.take_along_axis(ts, first_idx[:, None], axis=1)[:, 0]
    noise0 = jax.vmap(lambda k: elem_noise(k, 0))(keys)
    a0 = jnp.take(alphas_cumprod, t_first)[:, None, None, None]
    latents = (
        jnp.sqrt(a0) * latents0.astype(jnp.float32) + jnp.sqrt(1.0 - a0) * noise0
    ).astype(dtype)

    # the reference draws ONE noise tensor for the ref image and re-noises
    # it to each step's t (lcm_reference_pipeline.py:865-880)
    ref_noise = jax.vmap(lambda k: elem_noise(k, 10_000))(keys)

    w_emb = None
    if unet_cfg.time_cond_proj_dim is not None:
        w_emb = guidance_embedding(guidance_scale, unet_cfg.time_cond_proj_dim).astype(
            dtype
        )
    context = prompt_embeds.astype(dtype)
    denoised = latents0
    # style_fidelity: [B] (one blend for both mechanisms) or [B, 2] with
    # per-element (attention fidelity, adain fidelity) — the traced form
    # of the reference's independent ``reference_attn``/``reference_adain``
    # booleans (lcm_reference_pipeline.py:426-427): a disabled mechanism is
    # fidelity 0, which reduces that branch exactly to the plain program.
    if style_fidelity.ndim == 2:
        sf_attn, sf_adain = style_fidelity[:, 0], style_fidelity[:, 1]
    else:
        sf_attn = sf_adain = style_fidelity
    sf = sf_attn[:, None, None]  # blend over [B, tokens, ch]

    # SDXL text_time micro-conditioning (same as lcm_img2img.frame_program)
    added_cond = None
    if unet_cfg.addition_embed_type == "text_time":
        if pooled_embeds is None:
            raise ValueError("sdxl family requires pooled_embeds")
        time_ids = jnp.tile(
            jnp.asarray(
                [[spec.height, spec.width, 0, 0, spec.height, spec.width]],
                jnp.float32,
            ),
            (B, 1),
        )
        added_cond = {"text_embeds": pooled_embeds.astype(dtype), "time_ids": time_ids}

    for s in range(S):
        t = ts[:, s]
        t_prev = ts[:, s + 1] if s + 1 < S else t

        a_t = jnp.take(alphas_cumprod, t)[:, None, None, None]
        ref_xt = (
            jnp.sqrt(a_t) * ref_lat0.astype(jnp.float32)
            + jnp.sqrt(1.0 - a_t) * ref_noise
        ).astype(dtype)

        # WRITE pass: bank attention tokens + adain stats from the ref
        bank_out: list = []
        adain_w = AdainBank("write")
        unet_apply(
            params["unet"],
            unet_cfg,
            ref_xt,
            t,
            context,
            timestep_cond=w_emb,
            added_cond_kwargs=added_cond,
            bank_out=bank_out,
            adain=adain_w,
        )

        # style_fidelity blends the banked vs. plain self-attention OUTPUTS
        # inside each block (unet.transformer_block_apply): sf=0 reduces
        # exactly to the no-reference program — scaling the banked tokens
        # instead would leave zero-tokens holding softmax mass at sf=0
        bank = BankReader([b.astype(dtype) for b in bank_out], fidelity=sf)

        # READ pass on the actual latents
        adain_r = AdainBank(
            "read", stats=adain_w.stats, fidelity=sf_adain[:, None, None, None]
        )
        eps = unet_apply(
            params["unet"],
            unet_cfg,
            latents,
            t,
            context,
            timestep_cond=w_emb,
            added_cond_kwargs=added_cond,
            bank=bank,
            adain=adain_r,
        )

        step_noise = jax.vmap(lambda k: elem_noise(k, s + 1))(keys) if S > 1 else None
        new_lat, new_den = step(
            sched_cfg,
            alphas_cumprod,
            eps,
            t,
            t_prev,
            latents,
            noise=step_noise,
            multistep=(S > 1),
        )
        m = valid[:, s][:, None, None, None]
        latents = jnp.where(m, new_lat, latents)
        denoised = jnp.where(m, new_den, denoised)

    out = _decode_latents(cfgs, params, spec, denoised)
    return postprocess_image(out), denoised


def build_reference_program(bundle: ModelBundle, spec: FrameSpec):
    """jit the reference-mode program for one bucket; signature
    f(params, frame_u8, ref_u8, embeds, strength, guidance,
    style_fidelity, seed)."""

    def wrapper(
        params, frame_u8, ref_u8, prompt_embeds, strength, guidance, sf, seed,
        pooled_embeds=None, src_box=None, ref_box=None,
    ):
        return reference_frame_program(
            params,
            spec,
            bundle.unet_cfg,
            bundle.sched_cfg,
            bundle.taesd_cfg,
            bundle.vae_cfg,
            bundle.alphas_cumprod,
            bundle.dtype,
            frame_u8,
            ref_u8,
            prompt_embeds,
            strength,
            guidance,
            sf,
            seed,
            pooled_embeds=pooled_embeds,
            src_box=src_box,
            ref_box=ref_box,
        )

    return jax.jit(wrapper)
