from .rollout_pallas import (
    make_pallas_iteration,
    make_pallas_sampling_solver,
    pallas_available,
)

__all__ = ["make_pallas_iteration", "make_pallas_sampling_solver", "pallas_available"]
