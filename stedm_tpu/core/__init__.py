from stedm_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

__all__ = [
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
]
