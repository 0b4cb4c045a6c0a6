"""Functional LCM (Latent Consistency Model) scheduler for TPU.

Re-derivation of the reference's LCM scheduler semantics
(reference: diffusert/lcm/lcm_scheduler.py and the strength-aware
``LCMScheduler_X`` embedded in diffusert/lcm/lcm_controlnet.py:713-1100)
as pure functions over explicit state — no mutable scheduler object, no
host-side timestep recomputation per frame.

TPU-first design notes
----------------------
* ``alphas_cumprod`` is a precomputed fp32 table (host, once per config);
  every per-step quantity is a traced gather from it, so ``strength`` /
  ``guidance_scale`` / ``seed`` are *traced* scalars: moving a client
  slider never triggers an XLA recompile.  (The reference rebuilds its
  timestep ladder in Python per call: lcm_controlnet.py:905-938.)
* The reference's strength-aware ladder has a *dynamic* length
  ``k = min(steps, floor(origin*strength))``.  Dynamic lengths don't jit,
  so :func:`timestep_schedule` returns a fixed ``steps``-slot schedule that
  is left-padded with invalid slots (``valid[s] == False``); the denoise
  loop masks padded slots into no-ops.  The final slot is always the last
  real step, so ``denoised`` from slot ``steps-1`` is always the answer.
* Stochastic re-noise between steps takes an explicit PRNG key
  (reference uses ambient torch global RNG: lcm_controlnet.py:1030-1038,
  reseeded per frame in diffusert/videopipeline.py:110-126).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LCMSchedulerConfig",
    "make_alphas_cumprod",
    "timestep_schedule",
    "boundary_scalings",
    "add_noise",
    "step",
    "get_velocity",
]


@dataclasses.dataclass(frozen=True)
class LCMSchedulerConfig:
    """Static scheduler configuration (hashable; safe as a jit static arg).

    Defaults match SD1.5-family checkpoints (scaled_linear 0.00085..0.012,
    1000 train steps) as consumed by the reference pipelines.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"  # epsilon | sample | v_prediction
    lcm_origin_steps: int = 50
    sigma_data: float = 0.5
    # The reference divides t by 0.1 in its boundary scalings
    # (lcm_controlnet.py:941-946); expressed here as a multiplier.
    timestep_scaling: float = 10.0
    set_alpha_to_one: bool = True
    rescale_betas_zero_snr: bool = False


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine (squaredcos_cap_v2) beta schedule (lcm_scheduler.py:63-92)."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-SNR rescale (Lin et al. 2023; lcm_scheduler.py:95-129)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt -= alphas_bar_sqrt_T
    alphas_bar_sqrt *= alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def make_alphas_cumprod(cfg: LCMSchedulerConfig) -> np.ndarray:
    """Precompute the fp32 ``alphas_cumprod`` table for a config.

    Mirrors the beta-schedule branches at lcm_scheduler.py:206-222.
    """
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        betas = _betas_for_alpha_bar(n)
    else:
        raise ValueError(f"unknown beta_schedule: {cfg.beta_schedule}")

    if cfg.rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)

    alphas_cumprod = np.cumprod(1.0 - betas)
    return alphas_cumprod.astype(np.float32)


def final_alpha_cumprod(cfg: LCMSchedulerConfig, alphas_cumprod) -> jnp.ndarray:
    if cfg.set_alpha_to_one:
        return jnp.float32(1.0)
    return jnp.asarray(alphas_cumprod)[0]


def timestep_schedule(
    cfg: LCMSchedulerConfig,
    num_inference_steps: int,
    strength,
    lcm_origin_steps: int | None = None,
):
    """Strength-aware LCM timestep ladder as a fixed-width masked schedule.

    Reference semantics (``LCMScheduler_X.set_timesteps``,
    lcm_controlnet.py:905-938)::

        c = num_train_timesteps // lcm_origin_steps
        origin_ts = arange(1, floor(origin*strength)+1) * c - 1   # len n
        skip = max(n // steps, 1)
        timesteps = origin_ts[::-skip][:steps]                    # len k<=steps

    Returns ``(timesteps, valid)`` each of shape ``(num_inference_steps,)``:
    the ``k`` real timesteps occupy the LAST ``k`` slots in decreasing-t
    order; earlier slots are padding with ``valid == False`` (their timestep
    value is clamped into range but must not be used).  ``strength`` may be
    a traced fp scalar; ``num_inference_steps`` must be static.
    """
    if lcm_origin_steps is None:
        lcm_origin_steps = cfg.lcm_origin_steps
    if num_inference_steps > cfg.num_train_timesteps:
        raise ValueError(
            f"num_inference_steps {num_inference_steps} > num_train_timesteps"
            f" {cfg.num_train_timesteps}"
        )

    steps = num_inference_steps
    c = cfg.num_train_timesteps // lcm_origin_steps
    strength = jnp.asarray(strength, jnp.float32)
    # n = floor(origin * strength), at least 0
    n = jnp.floor(jnp.float32(lcm_origin_steps) * strength).astype(jnp.int32)
    skip = jnp.maximum(n // steps, 1)
    # number of real steps taken: ceil(n / skip) capped at `steps`
    k = jnp.minimum((n + skip - 1) // skip, steps)

    # real step i (i in [0, k)) uses origin index j_i = (n-1) - i*skip
    # slot s in [0, steps) holds real step i = s - (steps - k)
    s = jnp.arange(steps, dtype=jnp.int32)
    i = s - (steps - k)
    valid = i >= 0
    j = (n - 1) - i * skip
    j = jnp.clip(j, 0, None)
    timesteps = (j + 1) * c - 1
    timesteps = jnp.clip(timesteps, 0, cfg.num_train_timesteps - 1)
    return timesteps, valid


def boundary_scalings(cfg: LCMSchedulerConfig, t):
    """LCM consistency boundary-condition scalings c_skip/c_out.

    Reference: lcm_controlnet.py:940-946 (sigma_data=0.5, t scaled by 10).
    """
    ts = jnp.asarray(t, jnp.float32) * cfg.timestep_scaling
    sd2 = cfg.sigma_data**2
    c_skip = sd2 / (ts**2 + sd2)
    c_out = ts / jnp.sqrt(ts**2 + sd2)
    return c_skip, c_out


def _gather_alpha(alphas_cumprod, t):
    return jnp.take(jnp.asarray(alphas_cumprod, jnp.float32), t, axis=0)


def add_noise(alphas_cumprod, original_samples, noise, t):
    """Forward-noise ``x0`` to timestep ``t`` (lcm_controlnet.py:1046-1071).

    ``t`` is a scalar or per-batch int array; broadcast over trailing dims.
    """
    a = _gather_alpha(alphas_cumprod, t)
    a = jnp.reshape(a, a.shape + (1,) * (original_samples.ndim - a.ndim))
    x = jnp.asarray(original_samples, jnp.float32)
    nz = jnp.asarray(noise, jnp.float32)
    out = jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * nz
    return out.astype(original_samples.dtype)


def get_velocity(alphas_cumprod, sample, noise, t):
    """v-parameterization target (lcm_scheduler.py:476-495)."""
    a = _gather_alpha(alphas_cumprod, t)
    a = jnp.reshape(a, a.shape + (1,) * (sample.ndim - a.ndim))
    x = jnp.asarray(sample, jnp.float32)
    nz = jnp.asarray(noise, jnp.float32)
    v = jnp.sqrt(a) * nz - jnp.sqrt(1.0 - a) * x
    return v.astype(sample.dtype)


def step(
    cfg: LCMSchedulerConfig,
    alphas_cumprod,
    model_output,
    t,
    t_prev,
    sample,
    *,
    key: jax.Array | None = None,
    noise: jax.Array | None = None,
    multistep: bool = True,
):
    """One LCM consistency step (lcm_controlnet.py:1018-1038).

    Args:
      model_output: raw UNet prediction at timestep ``t``.
      t: current timestep (traced int scalar).
      t_prev: the NEXT (smaller) timestep in the ladder; for the final step
        pass ``t`` itself (its re-noised output is discarded — callers use
        ``denoised``).
      key: PRNG key for the inter-step stochastic re-noise (multistep only).
        Mutually exclusive with ``noise`` (explicit noise tensor).
      multistep: statically False for 1-step samplers — skips the re-noise
        entirely (reference: ``len(timesteps) > 1`` gate).

    Returns ``(prev_sample, denoised)``, in ``sample``'s dtype.
    """
    x = jnp.asarray(sample, jnp.float32)
    eps = jnp.asarray(model_output, jnp.float32)

    def bcast(v):
        """scalar or per-batch [B] -> broadcastable against x."""
        v = jnp.asarray(v, jnp.float32)
        return jnp.reshape(v, v.shape + (1,) * (x.ndim - v.ndim))

    a_t = bcast(_gather_alpha(alphas_cumprod, t))
    b_t = 1.0 - a_t

    if cfg.prediction_type == "epsilon":
        pred_x0 = (x - jnp.sqrt(b_t) * eps) / jnp.sqrt(a_t)
    elif cfg.prediction_type == "sample":
        pred_x0 = eps
    elif cfg.prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(a_t) * x - jnp.sqrt(b_t) * eps
    else:
        raise ValueError(f"unknown prediction_type: {cfg.prediction_type}")

    c_skip, c_out = boundary_scalings(cfg, t)
    denoised = bcast(c_out) * pred_x0 + bcast(c_skip) * x

    if multistep:
        a_prev = bcast(_gather_alpha(alphas_cumprod, t_prev))
        if noise is None:
            if key is None:
                raise ValueError("multistep step() needs `key` or `noise`")
            noise = jax.random.normal(key, x.shape, jnp.float32)
        else:
            noise = jnp.asarray(noise, jnp.float32)
        prev_sample = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1.0 - a_prev) * noise
    else:
        prev_sample = denoised

    return prev_sample.astype(sample.dtype), denoised.astype(sample.dtype)
