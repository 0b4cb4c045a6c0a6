"""Training/fine-tuning step for the UNet (noise-prediction objective).

The reference ships no training (all weights from the HF hub,
SURVEY.md §5 "Checkpoint/resume: none"); this framework adds a first-class
pjit train step so deployments can fine-tune / LCM-distill on-TPU:
standard eps-prediction MSE over random timesteps, AdamW, with params
tensor-sharded per videosd_tpu.parallel.mesh.PARAM_RULES and the batch
sharded over the ``data`` axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from videosd_tpu.models.controlnet import controlnet_apply
from videosd_tpu.models.unet import UNetConfig, unet_apply
from videosd_tpu.parallel.mesh import data_sharding, replicated, shard_params
from videosd_tpu.schedulers import LCMSchedulerConfig, add_noise, make_alphas_cumprod

__all__ = [
    "make_train_step",
    "make_controlnet_train_step",
    "make_controlnet_eval",
    "init_train_state",
]


def init_train_state(params, optimizer):
    return {"params": params, "opt_state": optimizer.init(params)}


def make_train_step(
    unet_cfg: UNetConfig,
    sched_cfg: LCMSchedulerConfig,
    optimizer,
    mesh=None,
):
    """Build the jitted train step.

    step(state, batch, key) -> (state, metrics); batch is a dict with
    ``latents`` [B,h,w,4], ``context`` [B,S,D], and (when the config uses
    LCM guidance conditioning) ``w_cond`` [B, time_cond_proj_dim].

    With ``mesh``, the step is jitted with explicit in/out shardings:
    batch over ("data",), params per PARAM_RULES — XLA inserts the
    gradient psums over ICI.
    """
    alphas = jnp.asarray(make_alphas_cumprod(sched_cfg))

    def loss_fn(params, batch, key):
        latents = batch["latents"]
        b = latents.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, sched_cfg.num_train_timesteps)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        noisy = add_noise(alphas, latents, noise, t)
        pred = unet_apply(
            params,
            unet_cfg,
            noisy,
            t,
            batch["context"],
            timestep_cond=batch.get("w_cond"),
        )
        err = pred.astype(jnp.float32) - noise
        return jnp.mean(err * err)

    def train_step(state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, key)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, {"loss": loss}

    if mesh is None:
        return jax.jit(train_step)

    def shard_batch(batch):
        return {
            k: jax.device_put(v, data_sharding(mesh, v.ndim)) for k, v in batch.items()
        }

    jitted = jax.jit(train_step)

    def sharded_step(state, batch, key):
        """Shard params with parallel.mesh.shard_params BEFORE
        init_train_state — optax moment buffers then inherit the param
        shardings via zeros_like, keeping state sharding congruent."""
        return jitted(state, shard_batch(batch), jax.device_put(key, replicated(mesh)))

    return sharded_step


def make_controlnet_train_step(
    unet_cfg: UNetConfig,
    sched_cfg: LCMSchedulerConfig,
    optimizer,
    t_max: int | None = None,
):
    """Train the ControlNet against a FROZEN UNet (the ControlNet paper's
    recipe, arXiv:2302.05543 §4 — base weights locked, only the trainable
    copy + zero convs get gradients; the reference never trains, it loads
    a hub checkpoint, videopipeline.py:56-60).

    step(state, unet_params, batch, key) -> (state, metrics).  batch adds
    ``control`` [B,H,W,3] (the canny map in [0,1], pixel resolution —
    exactly what the serving pipeline feeds, lcm_img2img.py
    sobel_control_image) to the make_train_step batch contract.  The loss
    is the same eps-prediction MSE, with the ControlNet residuals wired
    into the UNet skip stack exactly as the frame program wires them.

    ``t_max``: upper bound (exclusive) on sampled timesteps — serving
    only ever evaluates the ControlNet on the img2img ladder, which for
    strength s spans t ∈ [0, s·T) (schedulers/lcm.timestep_schedule;
    reference lcm_controlnet.py:928-938), so training mass above s·T is
    wasted.  Default: the full schedule.
    """
    alphas = jnp.asarray(make_alphas_cumprod(sched_cfg))
    t_hi = int(t_max or sched_cfg.num_train_timesteps)

    def loss_fn(cn_params, unet_params, batch, key):
        latents = batch["latents"]
        b = latents.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, t_hi)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        noisy = add_noise(alphas, latents, noise, t)
        down, mid = controlnet_apply(
            cn_params,
            unet_cfg,
            noisy,
            t,
            batch["context"],
            batch["control"],
            conditioning_scale=1.0,
            timestep_cond=batch.get("w_cond"),
        )
        pred = unet_apply(
            unet_params,
            unet_cfg,
            noisy,
            t,
            batch["context"],
            timestep_cond=batch.get("w_cond"),
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )
        err = pred.astype(jnp.float32) - noise
        return jnp.mean(err * err)

    import functools

    # donate the train state: the caller rebinds it every step, and the
    # undonated copy of CN params + opt state (~1.4 GB fp32 at sd15) is
    # exactly the headroom a 16 GB chip lacks once the paired holdout
    # eval's executable is also resident (round-5 OOM at 256²)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, unet_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], unet_params, batch, key
        )
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, {"loss": loss}

    return train_step


def make_controlnet_eval(unet_cfg: UNetConfig, sched_cfg: LCMSchedulerConfig):
    """Paired eval for the Stage-C convergence check: eps-prediction MSE
    with and WITHOUT the ControlNet residuals, on identical noise and
    explicit timesteps.  ``base_loss - cn_loss`` is the honest "did the
    ControlNet learn anything" signal — training-loss wiggle alone cannot
    distinguish a converged CN from a no-op (round-4 finding: a flat
    Stage-C curve made every cn-interval quality gate vacuous).

    Returns jitted ``eval(cn_params, unet_params, batch, t, key) ->
    (base_loss, cn_loss)``; batch as in make_controlnet_train_step,
    ``t`` [B] int32 explicit timesteps.
    """
    alphas = jnp.asarray(make_alphas_cumprod(sched_cfg))

    @jax.jit
    def evaluate(cn_params, unet_params, batch, t, key):
        latents = batch["latents"]
        noise = jax.random.normal(key, latents.shape, jnp.float32)
        noisy = add_noise(alphas, latents, noise, t)
        common = dict(timestep_cond=batch.get("w_cond"))
        base = unet_apply(
            unet_params, unet_cfg, noisy, t, batch["context"], **common
        )
        down, mid = controlnet_apply(
            cn_params, unet_cfg, noisy, t, batch["context"], batch["control"],
            conditioning_scale=1.0, **common,
        )
        with_cn = unet_apply(
            unet_params, unet_cfg, noisy, t, batch["context"],
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
            **common,
        )
        base_err = base.astype(jnp.float32) - noise
        cn_err = with_cn.astype(jnp.float32) - noise
        return jnp.mean(base_err * base_err), jnp.mean(cn_err * cn_err)

    return evaluate
