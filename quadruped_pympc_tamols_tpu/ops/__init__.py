from .rollout_pallas import (
    cem_sigma_update,
    make_pallas_gait_adaptive_solver,
    make_pallas_iteration,
    make_pallas_sampling_solver,
    mppi_combine,
    pallas_available,
)

__all__ = [
    "cem_sigma_update",
    "make_pallas_gait_adaptive_solver",
    "make_pallas_iteration",
    "make_pallas_sampling_solver",
    "mppi_combine",
    "pallas_available",
]
