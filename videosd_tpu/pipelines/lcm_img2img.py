"""The per-frame LCM img2img (+ControlNet) program — ONE jitted XLA graph.

This is the TPU-native replacement for the reference's per-frame chain
(diffusert/videopipeline.py:75-128 -> lcm/lcm_controlnet.py:380-618):
host PIL crop/resize -> GPU canny -> CLIP -> VAE encode -> K-step denoise ->
decode -> PIL.  Here the entire chain after prompt encoding is a single
``jax.jit`` program over device-resident uint8 frames:

    preprocess (crop/resize/[0,1]) -> sobel control image -> VAE encode ->
    add_noise @ first ladder step -> K x (ControlNet + UNet + LCM step) ->
    VAE decode -> uint8 postprocess

Design points (vs. the reference):
* ``strength``, ``guidance_scale``, ``controlnet_scale``, ``seed`` are
  traced PER-BATCH-ELEMENT arrays: concurrent streams with different live
  settings batch into one program (reference: one Ray actor call per frame).
* The denoise loop is unrolled over the static step count with per-element
  validity masks (see schedulers/lcm.py), so per-element strength maps to
  per-element timestep ladders inside one compiled graph.
* PRNG is explicit: per-element ``PRNGKey(seed)`` + fold_in(step), giving
  the reference's per-frame determinism (videopipeline.py:110-126) without
  global RNG state.
* steps/resolution/batch are static bucket keys; everything else is traced
  (no recompiles from slider moves).
"""

from __future__ import annotations

import dataclasses
import functools
import typing
from typing import Any

import jax
import jax.numpy as jnp

from videosd_tpu.models import (
    CLIP_PRESETS,
    TAESDConfig,
    UNET_PRESETS,
    clip_text_apply,
    clip_text_init,
    controlnet_apply,
    controlnet_init,
    taesd_decode,
    taesd_encode,
    taesd_init,
    unet_apply,
    unet_init,
    vae_decode,
    vae_encode,
    vae_init,
    VAEConfig,
)
from videosd_tpu.models.layers import guidance_embedding
from videosd_tpu.ops import (
    crop_resize,
    i420_to_rgb255,
    postprocess_image,
    preprocess_frame,
    sobel_control_image,
)
from videosd_tpu.schedulers import (
    LCMSchedulerConfig,
    add_noise,
    make_alphas_cumprod,
    step,
    timestep_schedule,
)
from videosd_tpu.text.tokenizer import CLIPTokenizer, find_vocab_dir

__all__ = ["FrameSpec", "ModelBundle", "build_frame_program", "build_prompt_encoder"]


@dataclasses.dataclass(frozen=True)
class FrameSpec:
    """Static compile key for one frame-program bucket."""

    batch: int = 1
    height: int = 512
    width: int = 512
    # camera input shape before center-crop (defaults: already target-sized)
    in_height: int | None = None
    in_width: int | None = None
    # camera-frame upload layout: "rgb" = uint8 NHWC [B,Hin,Win,3];
    # "i420" = packed planar 4:2:0 [B,Hin*3//2,Win] (ops.rgb_to_i420
    # layout) — half the host->device bytes, unpacked on device where the
    # conversion fuses into preprocess (ops.i420_to_rgb255)
    in_format: str = "rgb"
    steps: int = 4
    use_controlnet: bool = True
    vae: str = "taesd"  # taesd | kl
    # canny thresholds: the reference hardcodes these at the call site
    # (videopipeline.py:109)
    canny_low: float = 0.11
    canny_high: float = 0.8
    lcm_origin_steps: int = 50
    # ControlNet keep-window (lcm_controlnet.py:521-529): step i keeps the
    # residuals iff i/steps >= start and (i+1)/steps <= end
    control_guidance_start: float = 0.0
    control_guidance_end: float = 1.0
    # ControlNet evaluation interval: 1 (default) = run the ControlNet
    # every denoise step, exactly like the reference's loop
    # (lcm_controlnet.py:558-566).  k>1 = recompute residuals only on
    # steps s % k == 0 and REUSE them in between (the control image is
    # frame-constant; only the latent input goes stale).  An opt-in
    # throughput lever for TPU serving — the ControlNet encoder is ~23%
    # of flagship device time (PERF.md by-block profile) — measured, not
    # parity: leave at 1 to match the reference bit-for-bit.
    controlnet_interval: int = 1
    # DeepCache interval (Ma et al., arXiv:2312.00858 — public technique,
    # absent from the reference): 1 (default) = full UNet every step,
    # reference parity.  k>1 = recompute the deep UNet trunk (down1..mid
    # ..up_{n-2}) only on steps s % k == 0 and reuse its cached output
    # feature in between, re-evaluating just the shallow high-res blocks
    # (conv_in/down0/up_last — where the long attentions live) every step.
    # An opt-in throughput lever: the deep trunk is ~50% of flagship UNet
    # time (PERF.md by-block profile); stacks with controlnet_interval.
    # Stacking tradeoff: on cached (shallow) steps only the first
    # layers_per_block+1 ControlNet down residuals condition the pass —
    # freshly computed MID and deep-down residuals are DISCARDED there
    # (the trunk they would condition is the cached one), so with
    # controlnet_interval=1 the ControlNet's per-step mid conditioning
    # only lands on DeepCache eval steps.
    deepcache_interval: int = 1
    # Temporal DeepCache (cross-FRAME trunk reuse; video-serving lever
    # absent from the reference and from the original DeepCache paper's
    # per-sample setting): when True the program runs in one of two
    # modes selected by the ``deep_caches`` argument —
    #   produce (deep_caches=None): full parity denoise, additionally
    #     returning the per-step deep-trunk features [B, S, h', w', c']
    #     as a third output (a free tensor alias; outputs bit-match the
    #     parity program);
    #   reuse (deep_caches given): every step runs ONLY the shallow
    #     blocks over the carried trunk features — the whole deep trunk
    #     (~50% of UNet time, PERF.md by-block profile) drops out of the
    #     frame.  Fed with caches produced from the SAME inputs it is
    #     bit-exact; fed with a previous frame's caches it is the
    #     temporal approximation (quality-gated in PERF.md).
    # The serving engine refreshes every N frames per stream (option
    # "deepcache_temporal"; see runtime/engine.py).  Mutually exclusive
    # with deepcache_interval>1 (the per-step cache would fight the
    # carried one).
    deepcache_temporal: bool = False
    # Refresh both caches on the FINAL denoise step regardless of the
    # interval phase.  Round-4 trained-weight gating found the last
    # step's freshness dominates output quality: at steps=4, dc=3
    # (refreshes s=0,3) scored ~9 dB higher PSNR than dc=2 (refreshes
    # s=0,2 — final step stale) at the SAME eval count, and a trained
    # ControlNet's stale residuals on the final step were the main
    # interval quality cost (PERF.md "Round 4: trained-weight quality
    # gates").  Off by default: parity configs (intervals 1) are
    # unaffected either way, and recorded interval measurements keyed
    # s % k == 0 stay reproducible.
    interval_refresh_last: bool = False

    def resolved_in_shape(self) -> tuple[int, int]:
        return (self.in_height or self.height, self.in_width or self.width)


@dataclasses.dataclass
class ModelBundle:
    """All params + configs for one model family, device-resident."""

    family: str
    unet_cfg: Any
    clip_cfg: Any
    sched_cfg: LCMSchedulerConfig
    params: dict  # {"unet","controlnet","vae","taesd","clip"}
    alphas_cumprod: jax.Array
    tokenizer: CLIPTokenizer
    taesd_cfg: TAESDConfig = dataclasses.field(default_factory=TAESDConfig)
    vae_cfg: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    clip2_cfg: Any = None  # second text tower (SDXL family)
    dtype: Any = jnp.bfloat16
    # optional post-decode safety hook (the reference pipeline's optional
    # safety_checker seam, lcm_controlnet.py:593-608): a jittable
    # images_pm1 [B,H,W,3] -> images_pm1 callable applied between VAE
    # decode and postprocess.  None = off, matching the reference's
    # TAESD deployment (checker disabled in practice).
    safety_hook: Any = None

    _random_cache: typing.ClassVar[dict] = {}

    @classmethod
    def random(
        cls,
        family: str = "sd15",
        *,
        seed: int = 0,
        dtype=jnp.bfloat16,
        with_controlnet: bool = True,
        with_kl_vae: bool = False,
    ) -> "ModelBundle":
        """Randomly-initialized bundle (tests / weightless benchmarking).

        Real checkpoints load through videosd_tpu.io.weights when a local
        HF cache is mounted (zero-egress environments can't download).
        Bundles are cached per config — params are immutable pytrees, so
        sharing across callers is safe and saves repeated init compiles.
        """
        cache_key = (family, seed, jnp.dtype(dtype).name, with_controlnet, with_kl_vae)
        cached = cls._random_cache.get(cache_key)
        if cached is not None:
            return cached
        unet_cfg = UNET_PRESETS[family]
        clip_key = {
            "sd15": "sd15",
            "sd21": "sd21",
            "sdxl": "sdxl-1",
            "tiny": "tiny",
            "tiny-xl": "tiny",
        }.get(family, "sd15")
        clip_cfg = CLIP_PRESETS[clip_key]
        keys = jax.random.split(jax.random.PRNGKey(seed), 6)
        if family == "tiny":
            taesd_cfg = TAESDConfig(hidden=16, blocks_per_stage=1)
            vae_cfg = VAEConfig(
                block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4
            )
        else:
            taesd_cfg = TAESDConfig()
            vae_cfg = VAEConfig()
        # jit each init: one compiled program per model instead of thousands
        # of eager RNG dispatches (matters on remote-dispatch backends).
        # NOTE: attention weights are NOT pre-concatenated here — the
        # fused-wqkv variant (models.unet.precat_attention_weights)
        # measured NEUTRAL on the flagship (PERF.md round-2 closed
        # investigations) and duplicating the projections costs HBM and
        # makes naive differentiation through bundle params train only
        # the fused copies.
        jinit = lambda f, k: jax.jit(f)(k)  # noqa: E731
        params = {
            "unet": jinit(lambda k: unet_init(k, unet_cfg, dtype=dtype), keys[0]),
            "clip": jinit(lambda k: clip_text_init(k, clip_cfg, dtype=dtype), keys[2]),
            "taesd": jinit(lambda k: taesd_init(k, taesd_cfg, dtype=dtype), keys[3]),
        }
        if with_controlnet:
            params["controlnet"] = jinit(
                lambda k: controlnet_init(k, unet_cfg, dtype=dtype), keys[1]
            )
        if with_kl_vae:
            params["vae"] = jinit(lambda k: vae_init(k, vae_cfg, dtype=dtype), keys[4])
        clip2_cfg = None
        if unet_cfg.addition_embed_type == "text_time":
            # SDXL-family: two text towers — context = concat(768, 1280)
            # -> 2048; pooled output comes from tower 2's projection head.
            # (tiny-xl reuses the tiny tower for both in tests.)
            clip2_cfg = CLIP_PRESETS["sdxl-2" if family == "sdxl" else "tiny"]
            params["clip2"] = jinit(
                lambda k: clip_text_init(k, clip2_cfg, dtype=dtype), keys[5]
            )
        sched_cfg = LCMSchedulerConfig()
        tok = CLIPTokenizer(find_vocab_dir(), vocab_size=clip_cfg.vocab_size)
        bundle = cls(
            family=family,
            unet_cfg=unet_cfg,
            clip_cfg=clip_cfg,
            sched_cfg=sched_cfg,
            params=params,
            alphas_cumprod=jnp.asarray(make_alphas_cumprod(sched_cfg)),
            tokenizer=tok,
            taesd_cfg=taesd_cfg,
            vae_cfg=vae_cfg,
            clip2_cfg=clip2_cfg,
            dtype=dtype,
        )
        cls._random_cache[cache_key] = bundle
        return bundle

    @classmethod
    def from_dir(
        cls,
        path: str,
        *,
        family: str = "sd15",
        dtype=None,
        **kw,
    ) -> "ModelBundle":
        """Load a checkpoint dir of EITHER layout, auto-detected:

        * an io/checkpoint.save_bundle dir (``bundle.json`` manifest —
          e.g. a tools/train_toy.py artifact or a fine-tune snapshot)
          loads via load_bundle_params onto a random-init bundle of the
          recorded family;
        * anything else goes through :meth:`from_pretrained` (a local
          diffusers HF snapshot, the reference's checkpoint layout).

        ``dtype=None`` picks fp32 for tiny families (the test/CPU
        convention) and bf16 otherwise.
        """
        import os

        manifest = os.path.join(path, "bundle.json")
        if os.path.isfile(manifest):
            import json

            with open(manifest) as f:
                fam = json.load(f).get("family", family)
            if dtype is None:
                dtype = jnp.float32 if fam.startswith("tiny") else jnp.bfloat16
            # forward the kwargs cls.random understands; reject the rest
            # loudly rather than silently ignoring them (ADVICE r3)
            rand_kw = {
                k: kw.pop(k)
                for k in ("seed", "with_controlnet", "with_kl_vae")
                if k in kw
            }
            if kw:
                raise TypeError(
                    f"from_dir(bundle.json layout) got unsupported kwargs {sorted(kw)}"
                )
            bundle = dataclasses.replace(cls.random(fam, dtype=dtype, **rand_kw))
            from videosd_tpu.io.checkpoint import load_bundle_params

            bundle.params = load_bundle_params(bundle, path, dtype=dtype)
            return bundle
        if dtype is None:
            dtype = jnp.bfloat16
        return cls.from_pretrained(path, family=family, dtype=dtype, **kw)

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        *,
        family: str = "sd15",
        controlnet_dir: str | None = None,
        taesd_dir: str | None = None,
        dtype=jnp.bfloat16,
        with_controlnet: bool | None = None,
    ) -> "ModelBundle":
        """Load a diffusers-layout checkpoint directory (local HF snapshot:
        unet/ vae/ text_encoder/ tokenizer/ subdirs), converting torch
        tensors via the io.weights plans.  The same checkpoints the
        reference pulls at actor start (videopipeline.py:49-72), minus the
        hub download (zero-egress: the cache must be mounted).

        ``with_controlnet=True`` keeps a random-init ControlNet even when
        ``controlnet_dir`` is None — a safe no-op (its output convs are
        zero at init), so serving engines can still build ControlNet
        programs when only the base model is cached.
        """
        from videosd_tpu.io import weights as W

        if with_controlnet is None:
            with_controlnet = controlnet_dir is not None
        # copy the (possibly cached/shared) random bundle before mutating
        bundle = dataclasses.replace(
            cls.random(family, dtype=dtype, with_controlnet=with_controlnet)
        )
        params = dict(bundle.params)
        params["unet"] = W.load_model_dir(
            model_dir, "unet", W.unet_plan(bundle.unet_cfg), dtype
        )
        params["clip"] = W.load_model_dir(
            model_dir, "text_encoder", W.clip_plan(bundle.clip_cfg), dtype
        )
        try:
            params["vae"] = W.load_model_dir(
                model_dir, "vae", W.vae_plan(bundle.vae_cfg), dtype
            )
        except (FileNotFoundError, KeyError):
            pass  # TAESD-only deployments (the reference swaps the VAE out)
        if controlnet_dir:
            params["controlnet"] = W.load_model_dir(
                controlnet_dir, "", W.controlnet_plan(bundle.unet_cfg), dtype
            )
        if taesd_dir:
            params["taesd"] = W.load_model_dir(
                taesd_dir, "", W.taesd_plan(bundle.taesd_cfg), dtype
            )
        bundle.params = params
        tok_dir = None
        for sub in ("tokenizer", ""):
            import os

            cand = os.path.join(model_dir, sub)
            if os.path.isfile(os.path.join(cand, "vocab.json")):
                tok_dir = cand
                break
        if tok_dir:
            bundle.tokenizer = CLIPTokenizer(
                tok_dir, pad_to_eos=(family != "sd21")
            )
        return bundle

    @property
    def latent_scale(self) -> float:
        return 1.0  # TAESD scaling_factor; KL path applies vae_cfg.scaling_factor


def _encode_latents(bundle_cfgs, params, spec: FrameSpec, img_pm1):
    taesd_cfg, vae_cfg = bundle_cfgs
    if spec.vae == "taesd":
        return taesd_encode(params["taesd"], img_pm1, taesd_cfg)
    z = vae_encode(params["vae"], img_pm1, vae_cfg)
    return z * vae_cfg.scaling_factor


def _decode_latents(bundle_cfgs, params, spec: FrameSpec, z):
    taesd_cfg, vae_cfg = bundle_cfgs
    if spec.vae == "taesd":
        return taesd_decode(params["taesd"], z, taesd_cfg)
    return vae_decode(params["vae"], z / vae_cfg.scaling_factor, vae_cfg)


def frame_program(
    params: dict,
    spec: FrameSpec,
    unet_cfg,
    sched_cfg: LCMSchedulerConfig,
    taesd_cfg: TAESDConfig,
    vae_cfg: VAEConfig,
    alphas_cumprod,
    dtype,
    frame_u8,
    prompt_embeds,
    strength,
    guidance_scale,
    controlnet_scale,
    seed,
    warm_latents=None,
    warm_alpha=None,
    pooled_embeds=None,
    src_box=None,
    safety_hook=None,
    deep_caches=None,
):
    """The pure frame function (jit via :func:`build_frame_program`).

    frame_u8: [B, Hin, Win, 3] uint8 device-resident camera frames.
    src_box: optional [B, 4] int32 (top, left, height, width) — the TRUE
    camera extent inside a fixed-size mailbox buffer, as a traced value:
    one compiled program then serves every camera geometry that fits the
    mailbox, center-cropping exactly what the reference's full-resolution
    host crop would (videopipeline.py:91-107).  None = the whole frame is
    valid (static center-crop path; tools/bench).
    prompt_embeds: [B, 77, D] pre-encoded text context (prompt caching is
    the server's job; reference re-encodes per frame, lcm_controlnet.py:449).
    strength/guidance_scale/controlnet_scale: [B] fp32.  seed: [B] int32.
    warm_latents/warm_alpha: optional temporal warm-start — blends the
    previous frame's denoised latents into the img2img base
    (latents0 = (1-a)*encode(frame) + a*prev), stabilizing video output
    across frames (StreamDiffusion-style; absent from the reference).
    ``warm_alpha`` is per-element traced, so 0 disables it with no
    recompile.

    Returns (images_u8 [B,H,W,3], denoised_latents [B,h,w,4]) — latents are
    surfaced for temporal warm-starting.
    """
    B, S = spec.batch, spec.steps
    cfgs = (taesd_cfg, vae_cfg)

    # --- preprocess: crop geometry (videopipeline.py:91-107) + [0,1]
    # named scopes label the HLO op metadata so /profile can symbolize
    # fusions back to model blocks (zero runtime/compile-cache cost)
    with jax.named_scope("preprocess"):
        if spec.in_format == "i420":
            # packed 4:2:0 upload (half the H2D bytes): unpack fuses here
            frame_u8 = i420_to_rgb255(frame_u8)
        if src_box is not None:
            img01 = crop_resize(
                frame_u8, src_box, spec.height, spec.width, dtype=jnp.float32
            )
        else:
            img01 = preprocess_frame(
                frame_u8, spec.height, spec.width, dtype=jnp.float32
            )

        ctrl = None
        if spec.use_controlnet:
            ctrl = sobel_control_image(img01, spec.canny_low, spec.canny_high).astype(dtype)

        img_pm1 = (img01 * 2.0 - 1.0).astype(dtype)
    with jax.named_scope("vae_encode"):
        latents0 = _encode_latents(cfgs, params, spec, img_pm1)
    if warm_latents is not None:
        a = jnp.asarray(warm_alpha, jnp.float32)[:, None, None, None]
        latents0 = (
            (1.0 - a) * latents0.astype(jnp.float32)
            + a * warm_latents.astype(jnp.float32)
        ).astype(latents0.dtype)

    # --- per-element timestep ladders
    ts, valid = jax.vmap(
        lambda s: timestep_schedule(sched_cfg, S, s, spec.lcm_origin_steps)
    )(strength)  # [B,S] each

    keys = jax.vmap(jax.random.PRNGKey)(seed)  # [B,2]

    def elem_noise(k, fold):
        return jax.random.normal(
            jax.random.fold_in(k, fold), latents0.shape[1:], jnp.float32
        )

    # --- forward-noise to the first VALID ladder step
    first_idx = jnp.argmax(valid, axis=1)  # [B]
    t_first = jnp.take_along_axis(ts, first_idx[:, None], axis=1)[:, 0]
    noise0 = jax.vmap(lambda k: elem_noise(k, 0))(keys)
    a0 = jnp.take(alphas_cumprod, t_first)[:, None, None, None]
    latents = (
        jnp.sqrt(a0) * latents0.astype(jnp.float32) + jnp.sqrt(1.0 - a0) * noise0
    ).astype(dtype)

    # --- LCM guidance embedding (lcm_controlnet.py:516-519, dim 256)
    w_emb = None
    if unet_cfg.time_cond_proj_dim is not None:
        w_emb = guidance_embedding(guidance_scale, unet_cfg.time_cond_proj_dim).astype(
            dtype
        )

    context = prompt_embeds.astype(dtype)
    denoised = latents0

    # SDXL "text_time" micro-conditioning: pooled embeds + static
    # (orig_h, orig_w, crop_t, crop_l, target_h, target_w) ids
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

    # --- unrolled denoise loop (S static; per-element masks handle shorter
    # ladders, see schedulers/lcm.py docstring)
    cn_interval = max(1, int(spec.controlnet_interval))
    cn_cache = None  # residuals at base scale, reused between eval steps
    dc_interval = max(1, int(spec.deepcache_interval))
    dc_cache = None  # DeepCache: deep-trunk feature reused between evals
    if spec.deepcache_temporal and dc_interval != 1:
        raise ValueError(
            "deepcache_temporal is mutually exclusive with "
            "deepcache_interval>1 (per-step vs carried trunk caches)"
        )
    temporal_produce = spec.deepcache_temporal and deep_caches is None
    temporal_reuse = spec.deepcache_temporal and deep_caches is not None
    new_caches: list = []

    def _refresh(s: int, k: int) -> bool:
        # static per step: the branch is resolved at trace time
        return s % k == 0 or (spec.interval_refresh_last and s == S - 1)

    for s in range(S):
        t = ts[:, s]
        t_prev = ts[:, s + 1] if s + 1 < S else t

        down_res = mid_res = None
        # reference keep-schedule (lcm_controlnet.py:521-529): 0.0 outside
        # the [start, end) window — static per step, so the whole ControlNet
        # call is dropped from the graph for excluded steps
        keep = 1.0 - float(
            s / S < spec.control_guidance_start
            or (s + 1) / S > spec.control_guidance_end
        )
        if spec.use_controlnet and keep > 0.0:
            if cn_interval == 1:
                # reference semantics: evaluate every step
                # (lcm_controlnet.py:558-566)
                with jax.named_scope("controlnet"):
                    down_res, mid_res = controlnet_apply(
                        params["controlnet"],
                        unet_cfg,
                        latents,
                        t,
                        context,
                        ctrl,
                        conditioning_scale=controlnet_scale * keep,
                        timestep_cond=w_emb,
                        added_cond_kwargs=added_cond,
                    )
            else:
                # interval mode: recompute on s % k == 0, reuse otherwise.
                # Residuals are linear in conditioning_scale (the ControlNet
                # output convs scale them multiplicatively), so the cache
                # holds base-scale residuals and `keep` applies at use-site
                # — identical math at eval steps, stale-latent approximation
                # in between.
                if cn_cache is None or _refresh(s, cn_interval):
                    with jax.named_scope("controlnet"):
                        cn_cache = controlnet_apply(
                            params["controlnet"],
                            unet_cfg,
                            latents,
                            t,
                            context,
                            ctrl,
                            conditioning_scale=controlnet_scale,
                            timestep_cond=w_emb,
                            added_cond_kwargs=added_cond,
                        )
                down_res, mid_res = cn_cache
                if keep != 1.0:
                    down_res = [r * keep for r in down_res]
                    mid_res = mid_res * keep

        with jax.named_scope("unet"):
            if temporal_reuse:
                # shallow blocks only, over the carried previous-frame
                # trunk feature for THIS step (mid/deep CN residuals are
                # discarded on shallow passes — the dc-interval caveat)
                eps = unet_apply(
                    params["unet"],
                    unet_cfg,
                    latents,
                    t,
                    context,
                    timestep_cond=w_emb,
                    added_cond_kwargs=added_cond,
                    down_block_additional_residuals=down_res,
                    deep_feature=deep_caches[:, s],
                )
            elif temporal_produce:
                # full parity pass + free capture of the trunk feature
                eps, deep = unet_apply(
                    params["unet"],
                    unet_cfg,
                    latents,
                    t,
                    context,
                    timestep_cond=w_emb,
                    added_cond_kwargs=added_cond,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                    return_deep_feature=True,
                )
                new_caches.append(deep)
            elif dc_interval == 1:
                # reference semantics: full UNet every step
                eps = unet_apply(
                    params["unet"],
                    unet_cfg,
                    latents,
                    t,
                    context,
                    timestep_cond=w_emb,
                    added_cond_kwargs=added_cond,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                )
            elif dc_cache is None or _refresh(s, dc_interval):
                # DeepCache eval step: full pass + capture the deep trunk
                # output (identical math to the plain pass; the capture is
                # a free tensor alias)
                eps, dc_cache = unet_apply(
                    params["unet"],
                    unet_cfg,
                    latents,
                    t,
                    context,
                    timestep_cond=w_emb,
                    added_cond_kwargs=added_cond,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residual=mid_res,
                    return_deep_feature=True,
                )
            else:
                # cached step: shallow blocks only over the stale trunk
                eps = unet_apply(
                    params["unet"],
                    unet_cfg,
                    latents,
                    t,
                    context,
                    timestep_cond=w_emb,
                    added_cond_kwargs=added_cond,
                    down_block_additional_residuals=down_res,
                    deep_feature=dc_cache,
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

    with jax.named_scope("vae_decode"):
        out = _decode_latents(cfgs, params, spec, denoised)
    if safety_hook is not None:
        # reference seam: safety checker between decode and postprocess
        # (lcm_controlnet.py:593-608); the hook typically classifies and
        # zeroes flagged rows inside the same XLA program
        with jax.named_scope("safety"):
            out = safety_hook(out)
    with jax.named_scope("postprocess"):
        if temporal_produce:
            return (
                postprocess_image(out),
                denoised,
                jnp.stack(new_caches, axis=1),  # [B, S, h', w', c']
            )
        return postprocess_image(out), denoised


def build_frame_program(bundle: ModelBundle, spec: FrameSpec):
    """jit-compile the frame program for one (bundle, spec) bucket.

    Returns ``f(params, frame_u8, prompt_embeds, strength, guidance,
    controlnet_scale, seed) -> (images_u8, denoised_latents)``; pass
    ``bundle.params`` per call (params stay device-resident, the executable
    is cached by jit).
    """
    fn = functools.partial(
        frame_program,
        spec=spec,
        unet_cfg=bundle.unet_cfg,
        sched_cfg=bundle.sched_cfg,
        taesd_cfg=bundle.taesd_cfg,
        vae_cfg=bundle.vae_cfg,
        dtype=bundle.dtype,
        safety_hook=bundle.safety_hook,
    )

    def wrapper(
        params,
        frame_u8,
        prompt_embeds,
        strength,
        guidance,
        cn_scale,
        seed,
        warm_latents=None,
        warm_alpha=None,
        pooled_embeds=None,
        src_box=None,
        deep_caches=None,
    ):
        return fn(
            params,
            alphas_cumprod=bundle.alphas_cumprod,
            frame_u8=frame_u8,
            prompt_embeds=prompt_embeds,
            strength=strength,
            guidance_scale=guidance,
            controlnet_scale=cn_scale,
            seed=seed,
            warm_latents=warm_latents,
            warm_alpha=warm_alpha,
            pooled_embeds=pooled_embeds,
            src_box=src_box,
            deep_caches=deep_caches,
        )

    return jax.jit(wrapper)


def build_prompt_encoder(bundle: ModelBundle):
    """jitted input_ids -> (context [B,77,D], pooled [B,D]).

    The server caches results per prompt string (the reference re-runs CLIP
    every frame inside the pipeline, lcm_controlnet.py:449-454 — pure waste
    for a static prompt).  SDXL bundles encode both towers: context is the
    768+1280 concat, pooled comes from tower 2's projection head.
    """

    @jax.jit
    def encode(params, input_ids):
        ctx, pooled = clip_text_apply(params["clip"], bundle.clip_cfg, input_ids)
        if "clip2" in params:
            ctx2, pooled = clip_text_apply(params["clip2"], bundle.clip2_cfg, input_ids)
            ctx = jnp.concatenate([ctx, ctx2], axis=-1)
        return ctx, pooled

    return encode
