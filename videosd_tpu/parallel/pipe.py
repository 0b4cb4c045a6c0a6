"""Pipeline parallelism: UNet stage split across disjoint device submeshes.

The reference has NO pipeline parallelism (SURVEY.md §2.4 — it scales by
replicating whole models into Ray actors, diffusert/videopipeline.py:11).
This module adds the TPU-native PP tier the survey sketches for the
SDXL-1024² config ("optional stage split … across devices"): when one
model's weights + activation working set outgrow a single chip's HBM,
split the denoiser into stages and give each stage its own slice of the
mesh.

Design (TPU-first, not a GPipe translation):

* **Stage cut at the UNet waist.**  Stage 0 = time embedding + conv_in +
  down blocks + the VAE/TAESD *encoder* (+ the ControlNet, whose encoder
  mirrors stage 0's and balances its load); stage 1 = mid block + up
  blocks + out head + the VAE/TAESD *decoder*.  The U-shape's skip
  tensors are all live exactly at the cut, so ONE transfer per step
  carries the full inter-stage state (x, skips, temb) — there is no
  better cut point in a UNet.
* **Each stage is its own ("data","model") submesh** — PP composes with
  the existing dp×tp rules (parallel/mesh.PARAM_RULES), giving dp×tp×pp
  over a single host's chips.  Stage params live ONLY on their submesh
  (that is the point: per-chip HBM holds ~a stage's fraction of weights).
* **Per-stage jitted programs + explicit ICI transfers.**  Stages are
  separate XLA programs on disjoint device sets; ``jax.device_put`` moves
  the cut tensors (device-to-device over ICI on TPU — the host never
  touches them).  Because per-device execution queues run in order,
  cross-frame overlap needs interleaved DISPATCH order, which
  :meth:`PipelinedFrameEngine.run_pipelined` provides (the 1F inference
  schedule: while stage 1 denoises frame f, stage 0 is already on
  frame f+1).
* **Numerics identical by construction**: the stage functions call the
  SAME block-apply functions as models.unet.unet_apply in the same
  order; splitting only moves the jit boundary.  Equality vs the
  monolithic frame program is pinned by tests/test_pipeline_parallel.py.

When to use which axis (honest guidance, PERF.md "Headline metric
story"): data-parallel batching is strictly better while the model fits
(no inter-stage transfers, one fused program); TP cuts latency when one
frame must finish faster than one chip allows; PP is the capacity
lever — SDXL-class weights at 1024² with deep activation working sets.
The serving Engine therefore keeps dp×tp as its default mesh mode and
PP stays an explicit opt-in.

Parity scope: the pipelined frame engine implements the reference loop
semantics (every-step ControlNet with the keep-window, per-element
ladders/masks, explicit PRNG) — the turbo approximations
(controlnet_interval / deepcache_interval) and warm-start are
single-program features and are rejected here rather than silently
ignored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videosd_tpu.models.controlnet import controlnet_apply
from videosd_tpu.models.layers import conv2d, group_norm, guidance_embedding, silu
from videosd_tpu.models.unet import (
    UNetConfig,
    compute_add_embedding,
    compute_time_embedding,
    down_block_apply,
    mid_block_apply,
    up_block_apply,
)

__all__ = [
    "split_unet_params",
    "unet_encoder_apply",
    "unet_decoder_apply",
    "PipelinedUNet",
    "PipelinedFrameEngine",
]

# param-tree keys per stage; the split is a pure dict partition (no copies)
_STAGE0_KEYS = ("conv_in", "time_embedding", "add_embedding", "down_blocks")
_STAGE1_KEYS = ("mid_block", "up_blocks", "conv_norm_out", "conv_out")


def split_unet_params(params: dict) -> tuple[dict, dict]:
    """Partition a UNet param tree at the waist (encoder | decoder).

    Returns (stage0, stage1) dicts sharing the original leaves; every key
    must land in exactly one stage so a checkpoint round-trips through
    ``{**s0, **s1}``.
    """
    s0 = {k: params[k] for k in _STAGE0_KEYS if k in params}
    s1 = {k: params[k] for k in _STAGE1_KEYS if k in params}
    leftover = set(params) - set(s0) - set(s1)
    if leftover:
        raise ValueError(f"unrecognized UNet param keys: {sorted(leftover)}")
    return s0, s1


def unet_encoder_apply(
    p0: dict,
    cfg: UNetConfig,
    sample,
    timesteps,
    encoder_hidden_states,
    *,
    timestep_cond=None,
    added_cond_kwargs=None,
):
    """Stage 0 of the UNet: temb + conv_in + down blocks.

    Same math as the first half of models.unet.unet_apply (same block
    functions, same order); returns the full cut state
    ``(x, down_res tuple, temb)``.
    """
    temb = compute_time_embedding(p0, cfg, timesteps, timestep_cond)
    if cfg.addition_embed_type == "text_time":
        aek = added_cond_kwargs or {}
        temb = temb + compute_add_embedding(p0, cfg, aek["text_embeds"], aek["time_ids"])

    context = encoder_hidden_states.astype(sample.dtype)
    x = conv2d(p0["conv_in"], sample)
    down_res: list = [x]
    for i, blk in enumerate(p0["down_blocks"]):
        with jax.named_scope(f"down{i}"):
            x, res = down_block_apply(blk, cfg, i, x, temb, context)
        down_res.extend(res)
    return x, tuple(down_res), temb


def unet_decoder_apply(
    p1: dict,
    cfg: UNetConfig,
    x,
    down_res,
    temb,
    encoder_hidden_states,
    *,
    mid_block_additional_residual=None,
):
    """Stage 1 of the UNet: mid block + up blocks + out head.

    ``down_res``: the encoder's skip stack.  ControlNet down-residuals,
    if any, are already added in — they are elementwise adds, so applying
    them stage-0-side before the transfer is the same math as
    unet_apply's post-encoder add (models/unet.py:765-769) and avoids
    shipping a second skip stack across the cut.
    """
    context = encoder_hidden_states.astype(x.dtype)
    down_res = list(down_res)

    with jax.named_scope("mid"):
        x = mid_block_apply(p1["mid_block"], cfg, x, temb, context)
    if mid_block_additional_residual is not None:
        x = x + mid_block_additional_residual.astype(x.dtype)

    for i, blk in enumerate(p1["up_blocks"]):
        n = cfg.layers_per_block + 1
        res_samples = down_res[-n:]
        down_res = down_res[:-n]
        with jax.named_scope(f"up{i}"):
            x = up_block_apply(blk, cfg, i, x, res_samples, temb, context)

    x = silu(group_norm(p1["conv_norm_out"], x, groups=cfg.norm_num_groups))
    return conv2d(p1["conv_out"], x)


def _submeshes(n_stages: int, devices=None, *, model_parallel: int = 1):
    """Split the device list into n_stages contiguous ("data","model")
    submeshes.  Contiguity keeps each stage's collectives on neighboring
    chips (ICI locality); the single inter-stage hop crosses one boundary."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_stages:
        raise ValueError(f"{n} devices not divisible by {n_stages} stages")
    per = n // n_stages
    if per % model_parallel:
        raise ValueError(
            f"{per} devices/stage not divisible by model_parallel={model_parallel}"
        )
    meshes = []
    for s in range(n_stages):
        arr = np.asarray(devices[s * per : (s + 1) * per]).reshape(
            per // model_parallel, model_parallel
        )
        meshes.append(Mesh(arr, ("data", "model")))
    return meshes


def _batch_put(sharding):
    """device_put batch-leading arrays onto ``sharding``; replicate rank-0
    leaves (traced scalars like a uniform cn_scale) onto its mesh."""
    rep = NamedSharding(sharding.mesh, P())

    def put(a):
        if a is None:
            return None
        a = jnp.asarray(a)
        return jax.device_put(a, sharding if a.ndim >= 1 else rep)

    return put


class PipelinedUNet:
    """The UNet (+ optional ControlNet) split over 2 stage submeshes.

    Parameters are placed ONCE at construction: stage 0's encoder (and the
    ControlNet) on submesh 0, stage 1's decoder on submesh 1 — each via the
    same dp×tp PARAM_RULES used by single-stage serving, so attention/FF
    weights tensor-shard within a stage.  ``__call__`` matches
    unet_apply's (sample, t, context) -> eps contract for drop-in
    verification.
    """

    def __init__(
        self,
        unet_params: dict,
        cfg: UNetConfig,
        *,
        controlnet_params: dict | None = None,
        devices=None,
        model_parallel: int = 1,
    ):
        from videosd_tpu.parallel.mesh import shard_params

        self.cfg = cfg
        self.mesh0, self.mesh1 = _submeshes(2, devices, model_parallel=model_parallel)
        p0, p1 = split_unet_params(unet_params)
        self.p0 = shard_params(p0, self.mesh0)
        self.p1 = shard_params(p1, self.mesh1)
        self.cn = (
            shard_params(controlnet_params, self.mesh0)
            if controlnet_params is not None
            else None
        )
        self._put0 = _batch_put(NamedSharding(self.mesh0, P("data")))
        self._put1 = _batch_put(NamedSharding(self.mesh1, P("data")))

        def stage0(p0, cn, sample, t, context, timestep_cond, added_cond,
                   ctrl, cn_scale):
            x, down_res, temb = unet_encoder_apply(
                p0, cfg, sample, t, context,
                timestep_cond=timestep_cond, added_cond_kwargs=added_cond,
            )
            mid_res = None
            if cn is not None:
                cn_down, mid_res = controlnet_apply(
                    cn, cfg, sample, t, context, ctrl,
                    conditioning_scale=cn_scale,
                    timestep_cond=timestep_cond,
                    added_cond_kwargs=added_cond,
                )
                # elementwise skip adds pre-transfer (see unet_decoder_apply)
                down_res = tuple(
                    r + a.astype(r.dtype) for r, a in zip(down_res, cn_down)
                )
            return x, down_res, temb, mid_res

        def stage1(p1, x, down_res, temb, context, mid_res):
            return unet_decoder_apply(
                p1, cfg, x, down_res, temb, context,
                mid_block_additional_residual=mid_res,
            )

        self._stage0 = jax.jit(stage0)
        self._stage1 = jax.jit(stage1)

    def to_stage1(self, tree):
        """Move cut tensors to stage 1's submesh (batch stays sharded over
        its data axis; device-to-device over ICI on TPU)."""
        return jax.tree.map(self._put1, tree)

    def encode(self, sample, t, context, *, timestep_cond=None,
               added_cond_kwargs=None, ctrl=None, cn_scale=1.0,
               use_controlnet=True):
        put = self._put0
        added = (
            {k: put(v) for k, v in added_cond_kwargs.items()}
            if added_cond_kwargs
            else None
        )
        # A spec with controlnet disabled must withhold the CN params from
        # the trace: stage0 branches on `cn is not None`, and ctrl is None
        # for such specs (distinct jit variant, cached like any other).
        cn = self.cn if (use_controlnet and ctrl is not None) else None
        return self._stage0(
            self.p0, cn, put(sample), put(t), put(context),
            put(timestep_cond), added, put(ctrl), put(cn_scale),
        )

    def decode(self, x, down_res, temb, context, mid_res=None):
        x, down_res, temb, mid_res, context = self.to_stage1(
            (x, down_res, temb, mid_res, context)
        )
        return self._stage1(self.p1, x, down_res, temb, context, mid_res)

    def __call__(self, sample, t, context, *, timestep_cond=None,
                 added_cond_kwargs=None, ctrl=None, cn_scale=1.0,
                 use_controlnet=True):
        x, down_res, temb, mid_res = self.encode(
            sample, t, context, timestep_cond=timestep_cond,
            added_cond_kwargs=added_cond_kwargs, ctrl=ctrl, cn_scale=cn_scale,
            use_controlnet=use_controlnet,
        )
        return self.decode(x, down_res, temb, context, mid_res)


class PipelinedFrameEngine:
    """The full frame chain (preprocess → encode → K-step denoise → decode)
    pipeline-parallel over 2 stage submeshes.

    The pipelines.lcm_img2img.frame_program semantics, re-cut at the UNet
    waist: stage 0 owns preprocess/Sobel/VAE-encode/ladder/UNet-encoder/
    ControlNet; stage 1 owns UNet-decoder/scheduler-step/VAE-decode/
    postprocess.  Per denoise step one cut-state transfer goes
    stage0→stage1 and the stepped latents come back (tiny, [B,h,w,4]).

    ``run`` matches ShardedFrameEngine.run's contract (same inputs, same
    (images_u8, denoised_latents) outputs, reference parity semantics);
    ``run_pipelined`` overlaps several concurrent microbatches with the
    interleaved dispatch order that keeps both submeshes busy.
    """

    def __init__(self, bundle, *, devices=None, model_parallel: int = 1):
        from videosd_tpu.parallel.mesh import shard_params

        self.bundle = bundle
        self.pipe = PipelinedUNet(
            bundle.params["unet"],
            bundle.unet_cfg,
            controlnet_params=bundle.params.get("controlnet"),
            devices=devices,
            model_parallel=model_parallel,
        )
        m0, m1 = self.pipe.mesh0, self.pipe.mesh1
        # VAE split rides the same cut: encoder with stage 0, decoder with 1
        self.vae0: dict = {}
        self.vae1: dict = {}
        for name in ("taesd", "vae"):
            if name in bundle.params:
                self.vae0[name] = shard_params(
                    {"encoder": bundle.params[name]["encoder"]}, m0
                )
                self.vae1[name] = shard_params(
                    {"decoder": bundle.params[name]["decoder"]}, m1
                )
        self._alphas1 = jax.device_put(
            bundle.alphas_cumprod, NamedSharding(m1, P())
        )
        self._programs: dict = {}

    @property
    def data_size(self) -> int:
        return self.pipe.mesh0.shape["data"]

    def refresh_params(self) -> None:
        """Re-place stage params from the (mutated) bundle — device_put
        transfers only, NO recompiles: every jitted stage program takes
        its params as arguments, so a same-structure checkpoint swap
        (runtime/engine.swap_params) keeps all executables."""
        from videosd_tpu.parallel.mesh import shard_params

        params = self.bundle.params
        p0, p1 = split_unet_params(params["unet"])
        self.pipe.p0 = shard_params(p0, self.pipe.mesh0)
        self.pipe.p1 = shard_params(p1, self.pipe.mesh1)
        if self.pipe.cn is not None and "controlnet" in params:
            self.pipe.cn = shard_params(params["controlnet"], self.pipe.mesh0)
        for name in ("taesd", "vae"):
            if name in params:
                self.vae0[name] = shard_params(
                    {"encoder": params[name]["encoder"]}, self.pipe.mesh0
                )
                self.vae1[name] = shard_params(
                    {"decoder": params[name]["decoder"]}, self.pipe.mesh1
                )

    # ---------------------------------------------------------------- build

    def _build(self, spec):
        from videosd_tpu.pipelines.lcm_img2img import _decode_latents, _encode_latents
        from videosd_tpu.schedulers import step as sched_step
        from videosd_tpu.schedulers import timestep_schedule
        from videosd_tpu.ops import (
            crop_resize,
            i420_to_rgb255,
            postprocess_image,
            preprocess_frame,
            sobel_control_image,
        )

        if (
            spec.controlnet_interval != 1
            or spec.deepcache_interval != 1
            or spec.deepcache_temporal
        ):
            raise ValueError(
                "PipelinedFrameEngine is parity-only: controlnet_interval/"
                "deepcache_interval/deepcache_temporal are single-program "
                "turbo levers"
            )
        bundle = self.bundle
        cfg = bundle.unet_cfg
        sched_cfg = bundle.sched_cfg
        cfgs = (bundle.taesd_cfg, bundle.vae_cfg)
        dtype = bundle.dtype
        B, S = spec.batch, spec.steps

        def prelude(vae0, frame_u8, strength, guidance, seed,
                    warm_latents, warm_alpha, src_box):
            # mirror of frame_program's pre-loop section (lcm_img2img.py)
            with jax.named_scope("preprocess"):
                if spec.in_format == "i420":
                    frame_u8 = i420_to_rgb255(frame_u8)
                if src_box is not None:
                    img01 = crop_resize(
                        frame_u8, src_box, spec.height, spec.width,
                        dtype=jnp.float32,
                    )
                else:
                    img01 = preprocess_frame(
                        frame_u8, spec.height, spec.width, dtype=jnp.float32
                    )
                ctrl = None
                if spec.use_controlnet:
                    ctrl = sobel_control_image(
                        img01, spec.canny_low, spec.canny_high
                    ).astype(dtype)
                img_pm1 = (img01 * 2.0 - 1.0).astype(dtype)
            with jax.named_scope("vae_encode"):
                latents0 = _encode_latents(cfgs, vae0, spec, img_pm1)
            if warm_latents is not None:
                a = jnp.asarray(warm_alpha, jnp.float32)[:, None, None, None]
                latents0 = (
                    (1.0 - a) * latents0.astype(jnp.float32)
                    + a * warm_latents.astype(jnp.float32)
                ).astype(latents0.dtype)

            ts, valid = jax.vmap(
                lambda s: timestep_schedule(sched_cfg, S, s, spec.lcm_origin_steps)
            )(strength)
            keys = jax.vmap(jax.random.PRNGKey)(seed)
            first_idx = jnp.argmax(valid, axis=1)
            t_first = jnp.take_along_axis(ts, first_idx[:, None], axis=1)[:, 0]
            noise0 = jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, 0), latents0.shape[1:], jnp.float32
                )
            )(keys)
            a0 = jnp.take(bundle.alphas_cumprod, t_first)[:, None, None, None]
            latents = (
                jnp.sqrt(a0) * latents0.astype(jnp.float32)
                + jnp.sqrt(1.0 - a0) * noise0
            ).astype(dtype)
            w_emb = None
            if cfg.time_cond_proj_dim is not None:
                w_emb = guidance_embedding(
                    guidance, cfg.time_cond_proj_dim
                ).astype(dtype)
            return latents, latents0, ctrl, ts, valid, keys, w_emb

        def step1(p1, vae1, alphas, x, down_res, temb, context, mid_res,
                  latents, denoised, t, t_prev, keys, fold, valid_s):
            with jax.named_scope("unet_decoder"):
                eps = unet_decoder_apply(
                    p1, cfg, x, down_res, temb, context,
                    mid_block_additional_residual=mid_res,
                )
            noise = None
            if S > 1:
                noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, fold), latents.shape[1:], jnp.float32
                    )
                )(keys)
            new_lat, new_den = sched_step(
                sched_cfg, alphas, eps, t, t_prev, latents,
                noise=noise, multistep=(S > 1),
            )
            m = valid_s[:, None, None, None]
            latents = jnp.where(m, new_lat, latents)
            denoised = jnp.where(m, new_den, denoised)
            return latents, denoised

        def finale(vae1, denoised):
            with jax.named_scope("vae_decode"):
                out = _decode_latents(cfgs, vae1, spec, denoised)
            if bundle.safety_hook is not None:
                with jax.named_scope("safety"):
                    out = bundle.safety_hook(out)
            with jax.named_scope("postprocess"):
                return postprocess_image(out)

        return {
            "prelude": jax.jit(prelude),
            "step1": jax.jit(step1),
            "finale": jax.jit(finale),
        }

    def _progs(self, spec):
        progs = self._programs.get(spec)
        if progs is None:
            progs = self._build(spec)
            self._programs[spec] = progs
        return progs

    # ----------------------------------------------------------------- run

    def _start(self, spec, frame_u8, embeds, strength, guidance, cn, seed,
               pooled_embeds=None, warm_latents=None, warm_alpha=None,
               src_box=None):
        """Dispatch the prelude; returns the mutable per-microbatch state."""
        progs = self._progs(spec)
        put0, put1 = self.pipe._put0, self.pipe._put1
        bundle = self.bundle
        latents, latents0, ctrl, ts, valid, keys, w_emb = progs["prelude"](
            self.vae0, put0(frame_u8), put0(strength), put0(guidance), put0(seed),
            put0(warm_latents), put0(warm_alpha), put0(src_box),
        )
        added = None
        if bundle.unet_cfg.addition_embed_type == "text_time":
            if pooled_embeds is None:
                raise ValueError("sdxl family requires pooled_embeds")
            time_ids = jnp.tile(
                jnp.asarray(
                    [[spec.height, spec.width, 0, 0, spec.height, spec.width]],
                    jnp.float32,
                ),
                (spec.batch, 1),
            )
            added = {
                "text_embeds": pooled_embeds.astype(bundle.dtype),
                "time_ids": time_ids,
            }
        return {
            "latents": latents,            # on mesh0 (stage-0 input)
            "denoised": put1(latents0),    # accumulates on mesh1
            "ctrl": ctrl,
            "ts": np_like_rows(ts),        # host copy: tiny [B,S] ladder
            "valid": np_like_rows(valid),
            "keys1": put1(keys),
            "keys_host": keys,
            "w_emb": w_emb,
            "context0": put0(embeds.astype(bundle.dtype)),
            "context1": put1(embeds.astype(bundle.dtype)),
            "added": added,
            "cn": put0(cn),
        }

    def _step(self, spec, st, s: int):
        """Dispatch denoise step ``s``: stage-0 encoder (+CN) then stage-1
        decoder + scheduler step; updates ``st['latents']/'denoised']``."""
        progs = self._progs(spec)
        S = spec.steps
        t = jnp.asarray(st["ts"][:, s])
        t_prev = jnp.asarray(st["ts"][:, s + 1] if s + 1 < S else st["ts"][:, s])
        valid_s = jnp.asarray(st["valid"][:, s])
        # reference keep-window (lcm_controlnet.py:521-529), static per step
        keep = 1.0 - float(
            s / S < spec.control_guidance_start
            or (s + 1) / S > spec.control_guidance_end
        )
        cn_scale = st["cn"] * keep if st["cn"] is not None else 1.0
        x, down_res, temb, mid_res = self.pipe.encode(
            st["latents"], t, st["context0"],
            timestep_cond=st["w_emb"], added_cond_kwargs=st["added"],
            ctrl=st["ctrl"], cn_scale=cn_scale,
            use_controlnet=spec.use_controlnet,
        )
        x, down_res, temb, mid_res = self.pipe.to_stage1(
            (x, down_res, temb, mid_res)
        )
        put1 = self.pipe._put1
        latents1, st["denoised"] = progs["step1"](
            self.pipe.p1, self.vae1, self._alphas1,
            x, down_res, temb, st["context1"], mid_res,
            put1(st["latents"]), st["denoised"],
            put1(t), put1(t_prev), st["keys1"],
            jnp.int32(s + 1), put1(valid_s),
        )
        # stepped latents return to stage 0 for the next step's encoder+CN
        st["latents"] = self.pipe._put0(latents1)

    def _finish(self, spec, st):
        progs = self._progs(spec)
        images = progs["finale"](self.vae1, st["denoised"])
        return images, st["denoised"]

    def run(self, spec, frame_u8, embeds, strength, guidance, cn, seed,
            pooled_embeds=None, warm_latents=None, warm_alpha=None,
            src_box=None):
        """One batch through the pipelined chain (ShardedFrameEngine.run
        contract).  Single-batch calls serialize the two stages — use
        :meth:`run_pipelined` with >=2 concurrent microbatches to fill
        both submeshes."""
        return self.run_pipelined(
            spec,
            [dict(frame_u8=frame_u8, embeds=embeds, strength=strength,
                  guidance=guidance, cn=cn, seed=seed,
                  pooled_embeds=pooled_embeds, warm_latents=warm_latents,
                  warm_alpha=warm_alpha, src_box=src_box)],
        )[0]

    def serving_program(self, spec):
        """A runtime/engine-compatible program: same call signature as a
        (sharded) build_frame_program jit, dispatching through the
        pipelined chain.  ``params`` must be THIS engine's bundle params —
        stage placement happens at construction (or refresh_params), so
        the multi-model registry's swap-params-per-batch trick can't apply
        here (mesh_pipe serving is single-model; config validation
        enforces it).
        """

        def prog(params, frame_u8, embeds, strength, guidance, cn, seed,
                 warm_latents=None, warm_alpha=None, pooled_embeds=None,
                 src_box=None):
            if params is not self.bundle.params:
                raise ValueError(
                    "pipelined serving runs the stage-placed bundle params; "
                    "per-batch param swapping (models registry) is not "
                    "supported under mesh_pipe"
                )
            return self.run(
                spec, frame_u8, embeds, strength, guidance, cn, seed,
                pooled_embeds=pooled_embeds, warm_latents=warm_latents,
                warm_alpha=warm_alpha, src_box=src_box,
            )

        return prog

    def run_pipelined(self, spec, batches: list[dict]):
        """Run several microbatches with interleaved dispatch so stage 0
        works on microbatch m+1 while stage 1 finishes m.

        Per-device queues execute in order, so OVERLAP IS A DISPATCH-ORDER
        PROPERTY: dispatching all of frame f's steps before frame f+1's
        would serialize the submeshes even though they could run
        concurrently.  This loop issues stage-0/stage-1 work breadth-first
        across microbatches (the 1F inference schedule).
        """
        states = [self._start(spec, **b) for b in batches]
        for s in range(spec.steps):
            for st in states:
                self._step(spec, st, s)
        return [self._finish(spec, st) for st in states]


def np_like_rows(a):
    """Host copy of a tiny per-element table ([B,S] ladders): step indexing
    happens on the host, so keep it out of the device dispatch path."""
    return np.asarray(a)
