from .splines import make_spline_basis, num_params_per_leg
from .sampling_mpc import SamplingMPC, SamplingState, make_sampling_solver

__all__ = [
    "make_spline_basis",
    "num_params_per_leg",
    "SamplingMPC",
    "SamplingState",
    "make_sampling_solver",
]
