from videosd_tpu.schedulers.lcm import (
    LCMSchedulerConfig,
    add_noise,
    boundary_scalings,
    get_velocity,
    make_alphas_cumprod,
    step,
    timestep_schedule,
)

__all__ = [
    "LCMSchedulerConfig",
    "add_noise",
    "boundary_scalings",
    "get_velocity",
    "make_alphas_cumprod",
    "step",
    "timestep_schedule",
]
